package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HadoopCatalog
import graft.core._

/** ORC data files registered via add_files: footer-stats harvest, scan
  * (mixed with parquet in one snapshot), rename-after-registration through
  * the name mapping, and metrics pruning on ORC footer bounds (ref reads
  * ORC data files: io/pyarrow.py:1119–1125). */
class OrcSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warehouse: String = Files.createTempDirectory("graft-orc-wh").toString
  lazy val catalog = new HadoopCatalog(warehouse, spark)

  override def afterAll(): Unit = spark.stop()

  def part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")

  private def writeOrc(df: org.apache.spark.sql.DataFrame, n: Int = 1): Seq[String] = {
    val dir = Files.createTempDirectory("graft-orc").toString
    df.repartition(n).write.mode("overwrite").orc(dir)
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".orc"))
      .map(_.getAbsolutePath).toSeq
  }

  test("ORC add_files round-trips with footer stats") {
    val t = catalog.createTable("orc_rt", Schema.fromSpark(part.schema))
    val files = writeOrc(part, n = 2)
    t.addFiles(files)
    assert(t.scan.toDF.count() === part.count())
    // metadata-only count comes from the ORC footers
    assert(t.scan.count() === part.count())
    val dfs = new graft.table.IceScan(t).planFiles().map(_.file)
    assert(dfs.forall(_.fileFormat == "ORC"))
    // bounds harvested: p_partkey (long) and p_name (string, truncated)
    val pk = t.schema.byId.values.find(_.name == "p_partkey").get.id
    assert(dfs.forall(f => f.lowerBounds.contains(pk) && f.upperBounds.contains(pk)))
    // null counts sound (column has no nulls)
    assert(dfs.forall(_.nullValueCounts(pk) == 0L))
  }

  test("mixed parquet + ORC snapshot with rename resolves both") {
    val t = catalog.createTable("orc_mixed", Schema.fromSpark(part.schema))
    t.append(part.filter(col("p_partkey") % 2 === 0))
    t.addFiles(writeOrc(part.filter(col("p_partkey") % 2 === 1)))
    t.updateSchema.renameColumn("p_retailprice", "price").commit()
    // p_retailprice spans ~900–1000 in the testdata; the threshold must
    // select rows or this test is vacuous
    val got = t.scan("price > 910.0").select("p_partkey", "price").toDF
    val want = part.filter(col("p_retailprice") > 910.0)
      .select(col("p_partkey"), col("p_retailprice").as("price"))
    assert(want.count() > 0, "threshold selects nothing — vacuous test")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
  }

  test("position deletes apply to ORC-registered files (library + DSv2)") {
    val t = catalog.createTable("orc_mor_pos", Schema.fromSpark(part.schema))
    t.addFiles(writeOrc(part, n = 2))
    t.deletePositional("p_partkey <= 20")
    val want = part.filter(col("p_partkey") > 20)
    val got = t.scan.toDF
    assert(want.count() > 0 && want.count() < part.count())
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
    // DSv2 face routes the delete-bearing ORC task to the ORC row reader
    val dsv2 = spark.read.format("graft")
      .option("warehouse", warehouse).option("table", "orc_mor_pos").load()
    assert(dsv2.count() === want.count())
    assert(dsv2.filter(col("p_partkey") <= 20).count() === 0)
  }

  test("equality deletes apply to ORC-registered files") {
    val t = catalog.createTable("orc_mor_eq", Schema.fromSpark(part.schema))
    t.addFiles(writeOrc(part))
    t.deleteEqualityKeys(part.filter(col("p_partkey") % 10 === 0).select("p_partkey"))
    val want = part.filter(col("p_partkey") % 10 =!= 0)
    assert(t.scan.toDF.count() === want.count())
    val dsv2 = spark.read.format("graft")
      .option("warehouse", warehouse).option("table", "orc_mor_eq").load()
    assert(dsv2.count() === want.count())
  }

  test("deletion vectors (v3) apply to ORC-registered files") {
    val t = catalog.createTable("orc_mor_dv", Schema.fromSpark(part.schema))
    t.upgradeFormatVersion(3)
    t.addFiles(writeOrc(part, n = 2))
    t.deleteAsDeletionVector("p_size > 30")
    val want = part.filter(col("p_size") <= 30)
    assert(want.count() > 0 && want.count() < part.count())
    val got = t.scan.toDF
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
  }

  test("position deletes + rename resolve ORC through the name mapping") {
    val t = catalog.createTable("orc_mor_ren", Schema.fromSpark(part.schema))
    t.addFiles(writeOrc(part))
    t.updateSchema.renameColumn("p_retailprice", "price").commit()
    t.deletePositional("price > 915.0")
    val want = part.filter(col("p_retailprice") <= 915.0)
      .select(col("p_partkey"), col("p_retailprice").as("price"))
    assert(want.count() > 0 && want.count() < part.count())
    val got = t.scan.select("p_partkey", "price").toDF
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
  }

  test("metrics pruning skips ORC files on footer bounds") {
    val t = catalog.createTable("orc_prune", Schema.fromSpark(part.schema))
    val lo = writeOrc(part.filter(col("p_partkey") <= 50))
    val hi = writeOrc(part.filter(col("p_partkey") > 50))
    t.addFiles(lo ++ hi)
    val tasks = new graft.table.IceScan(t).filter("p_partkey <= 10").planFiles()
    assert(tasks.size === 1, "upper-half ORC file should be pruned by footer bounds")
    assert(t.scan("p_partkey <= 10").toDF.count() ===
      part.filter(col("p_partkey") <= 10).count())
  }

  test("ORC registration rejects duplicate paths and spans") {
    val t = catalog.createTable("orc_dup", Schema.fromSpark(part.schema))
    val files = writeOrc(part)
    t.addFiles(files)
    val e = intercept[IllegalArgumentException](t.addFiles(files))
    assert(e.getMessage.contains("already referenced"))
  }

  test("changelog covers ORC-registered files (CoW and MoR deletes)") {
    val t = catalog.createTable("orc_cdc", Schema.fromSpark(part.schema))
    t.addFiles(writeOrc(part, n = 2))
    // MoR: position deletes over the ORC files — deleted CONTENT must
    // come back through the ORC reader's (file, pos) tracking
    t.deletePositional("p_partkey <= 50")
    // CoW delete rewrites ORC files into parquet survivors
    t.delete(core.ExprParser.parse("p_partkey > 1900"))
    val log = graft.streaming.TableChanges.changelog(t)
    val inserts = log.filter(col("_change_type") === "insert")
    val deletes = log.filter(col("_change_type") === "delete")
    assert(inserts.filter(col("p_partkey") <= lit(50)).count() ===
      part.filter(col("p_partkey") <= 50).count())
    assert(deletes.filter(col("p_partkey") <= lit(50)).count() ===
      part.filter(col("p_partkey") <= 50).count())
    assert(deletes.filter(col("p_partkey") > lit(1900)).count() ===
      part.filter(col("p_partkey") > 1900).count())
    // net rows = current scan
    assert(t.scan.toDF.count() ===
      part.filter(col("p_partkey") > 50 && col("p_partkey") <= 1900).count())
  }

  test("write.format.default=orc: native ORC write path end-to-end") {
    val schema = Schema.fromSpark(part.schema)
    val t = catalog.createTable("orc_native", schema)
    t.setProperties("write.format.default" -> "orc")
    val rel = catalog.loadTable("orc_native")
    rel.append(part.limit(150))
    // files ARE orc, stats harvested from orc footers
    val files = rel.scan.planFiles().map(_.file)
    assert(files.nonEmpty && files.forall(_.fileFormat == "ORC"))
    assert(files.forall(_.recordCount > 0))
    assert(files.exists(_.lowerBounds.nonEmpty), "orc footer bounds harvested")
    // scans come back exact
    assert(rel.scan.toDF.count() === 150)
    assert(rel.scan("p_partkey <= 100").toDF.count() ===
      part.limit(150).filter(col("p_partkey") <= 100).count())
    // metadata count short-circuit works off orc footer stats
    assert(rel.scan.count() === 150)
    // CoW delete rewrites orc files as orc
    rel.delete("p_partkey <= 100")
    assert(rel.scan.toDF.count() ===
      part.limit(150).filter(col("p_partkey") > 100).count())
    assert(rel.scan.planFiles().map(_.file).forall(_.fileFormat == "ORC"))
  }

  test("partitioned ORC write: fan-out layout + partition pruning") {
    val schema = Schema.fromSpark(part.schema)
    val spec = graft.meta.PartitionSpec.build(schema, 0, ("p_brand", graft.core.IdentityTransform, "brand"))
    val t = catalog.createTable("orc_part", schema, spec)
    t.setProperties("write.format.default" -> "orc")
    val rel = catalog.loadTable("orc_part")
    rel.append(part)
    val all = rel.scan.planFiles()
    assert(all.map(_.file).forall(_.fileFormat == "ORC"))
    // partition tuples parsed from the fan-out dirs: pruning works
    val brand = part.select("p_brand").distinct().limit(1).head.getString(0)
    val pruned = rel.scan(s"p_brand = '$brand'")
    assert(pruned.planFiles().size < all.size)
    assert(pruned.toDF.count() === part.filter(col("p_brand") === brand).count())
    // full-scan row parity
    assert(rel.scan.toDF.count() === part.count())
  }
}
