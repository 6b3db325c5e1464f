package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HadoopCatalog
import graft.core._
import graft.meta._

/** Deletion vectors (v3): roaring codec round-trips plus end-to-end table
  * behavior (ref: pyiceberg/table/deletion_vector.py, table/puffin.py). */
class DeletionVectorSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warehouse: String = Files.createTempDirectory("graft-dv").toString
  lazy val catalog = new HadoopCatalog(warehouse, spark)

  override def afterAll(): Unit = spark.stop()

  def lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  // ---- codec ---------------------------------------------------------------

  test("roaring vector round-trips array, bitmap, and multi-key layouts") {
    val cases = Seq(
      Array.empty[Long],
      Array(0L),
      Array(1L, 5L, 65536L, 65537L), // two containers, array layout
      (0L until 5000L).toArray, // > 4096 => bitmap container
      Array(7L, (1L << 32) + 3L, (5L << 32)), // multiple 32-bit keys
      (0L until 200000L by 3L).toArray) // several containers, mixed sizes
    cases.foreach { positions =>
      val got = DeletionVector.deserializeVector(DeletionVector.serializeVector(positions))
      assert(got.toSeq === positions.toSeq)
    }
  }

  test("blob framing carries magic + length and round-trips positions") {
    val positions = Array(3L, 4L, 100000L, (2L << 32) + 9L)
    val blob = DeletionVector.frameBlob(positions)
    assert(blob.slice(4, 8).toSeq === DeletionVector.Magic.toSeq)
    assert(DeletionVector.readBlob(blob).toSeq === positions.toSeq)
    // corrupt magic must be rejected
    val bad = blob.clone(); bad(5) = 0x00
    intercept[IllegalArgumentException](DeletionVector.readBlob(bad))
  }

  test("run-container serialization is readable") {
    // hand-build a SERIAL_COOKIE (12347) bitmap with one run container:
    // values 10..20 in container key 0
    val buf = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 1 + 4 + 2 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(1L) // one 32-bit bitmap
    buf.putInt(0) // key 0
    buf.putInt(12347 | (0 << 16)) // cookie, size-1 = 0
    buf.put(1.toByte) // run flag bitset: container 0 is a run
    buf.putShort(0.toShort) // container key
    buf.putShort(10.toShort) // cardinality - 1 = 10 (11 values)
    buf.putShort(1.toShort) // number of runs
    buf.putShort(10.toShort) // run start
    buf.putShort(10.toShort) // run length - 1
    val got = DeletionVector.deserializeVector(buf.array())
    assert(got.toSeq === (10L to 20L))
  }

  // ---- table integration ----------------------------------------------------

  test("deleteAsDeletionVector hides rows and survives repeated deletes") {
    val t = catalog.createTable("t_dv", Schema.fromSpark(lineitem.schema))
    t.upgradeFormatVersion(3)
    t.append(lineitem)
    val total = lineitem.count()

    intercept[IllegalArgumentException](t.deletePositional("l_quantity > 45"))

    t.deleteAsDeletionVector("l_quantity > 45")
    val afterFirst = t.scan.toDF.count()
    assert(afterFirst === lineitem.filter(col("l_quantity") <= 45).count())

    // second DV delete must MERGE with the first (one DV per data file)
    t.deleteAsDeletionVector("l_quantity > 40")
    val afterSecond = t.scan.toDF.count()
    assert(afterSecond === lineitem.filter(col("l_quantity") <= 40).count())
    val dvPerFile = t.scan.planFiles()
      .map(_.deletes.count(_.isDeletionVector))
    assert(dvPerFile.forall(_ <= 1), s"expected at most one DV per file: $dvPerFile")

    // metadata-only count must not shortcut past the DVs
    assert(t.scan.count() === afterSecond)
    assert(total > afterSecond)
  }

  test("position_deletes inspect table decodes deletion vectors") {
    val t = catalog.createTable("t_dv_meta", Schema.fromSpark(lineitem.schema))
    t.upgradeFormatVersion(3)
    t.append(lineitem)
    t.deleteAsDeletionVector("l_quantity > 45")
    val deleted = lineitem.filter(col("l_quantity") > 45).count()
    val pd = t.inspect.positionDeletes()
    assert(pd.count() === deleted)
    val delPaths = pd.select("delete_file_path").distinct().collect().map(_.getString(0))
    assert(delPaths.nonEmpty && delPaths.forall(_.endsWith("-deletes.puffin")))
    // each (file_path, pos) is unique and references a live data file
    assert(pd.select("file_path", "pos").distinct().count() === deleted)
  }

  test("many DV-bearing files scan through ONE anti-join branch") {
    // every data file carries its own DV (unique delete signature); the
    // scan must still plan a single path-keyed anti-join — per-signature
    // branching would union one branch per file (plan explosion at scale)
    val t = catalog.createTable("t_dv_fanout", Schema.fromSpark(lineitem.schema))
    t.upgradeFormatVersion(3)
    (0 until 4).foreach(i => t.append(lineitem.filter(col("l_orderkey") % 4 === i)))
    t.deleteAsDeletionVector("l_quantity > 45")
    val tasks = t.scan.planFiles()
    assert(tasks.count(_.deletes.nonEmpty) === 4, "all four files should carry DVs")
    val df = t.scan.toDF
    val joins = "LeftAnti".r.findAllIn(df.queryExecution.optimizedPlan.toString).length
    assert(joins === 1, s"expected one shared anti-join, saw $joins")
    assert(df.count() === lineitem.filter(col("l_quantity") <= 45).count())
  }

  test("wide DV deletes assemble puffin files on executors, not the driver") {
    // blobs-per-puffin=1 forces one puffin per affected file: the write
    // must fan out to MULTIPLE puffin files (executor-side assembly) while
    // the driver handles only descriptors — a single driver-written puffin
    // would put every compressed blob on the driver heap (VERDICT r5 W2)
    val t = catalog.createTable("t_dv_fanout_write", Schema.fromSpark(lineitem.schema))
    t.upgradeFormatVersion(3)
    t.setProperties("write.dv.blobs-per-puffin" -> "1")
    // 8 files: paths are hash-partitioned into 8 reduce partitions, so the
    // chance of every path landing in ONE partition (which would write a
    // single puffin and flake the ≥2 assert) is 8·(1/8)^8 ≈ 5e-7
    (0 until 8).foreach(i => t.append(lineitem.filter(col("l_orderkey") % 8 === i)))
    t.deleteAsDeletionVector("l_quantity > 45")
    val dvs = t.scan.planFiles().flatMap(_.deletes).filter(_.isDeletionVector)
      .distinctBy(f => (f.filePath, f.contentOffset))
    assert(dvs.map(_.filePath).distinct.size >= 2,
      s"expected multiple puffin files, got ${dvs.map(_.filePath).distinct}")
    // each blob still reads standalone through its manifest byte range
    dvs.foreach { f =>
      val positions = DeletionVector.readPositions(
        f.filePath, f.contentOffset.get, f.contentSizeInBytes.get)
      assert(positions.length.toLong === f.recordCount)
    }
    assert(t.scan.toDF.count() === lineitem.filter(col("l_quantity") <= 45).count())
    // merge path across multiple puffins stays correct
    t.deleteAsDeletionVector("l_quantity > 40")
    assert(t.scan.toDF.count() === lineitem.filter(col("l_quantity") <= 40).count())
    assert(t.scan.planFiles().map(_.deletes.count(_.isDeletionVector)).forall(_ <= 1))
  }

  test("deletion vector supersedes older parquet position deletes") {
    val t = catalog.createTable("t_dv_merge", Schema.fromSpark(lineitem.schema))
    t.append(lineitem)
    // v2 parquet position deletes first…
    t.deletePositional("l_quantity > 45")
    assert(t.scan.toDF.count() === lineitem.filter(col("l_quantity") <= 45).count())
    // …then upgrade and write a DV: prior parquet deletes must be folded in
    t.upgradeFormatVersion(3)
    t.deleteAsDeletionVector("l_returnflag = 'A'")
    val want = lineitem.filter(col("l_quantity") <= 45 && col("l_returnflag") =!= "A").count()
    assert(t.scan.toDF.count() === want)
    // every task with a DV sees ONLY the DV (no double position-delete reads)
    val mixed = t.scan.planFiles().filter(_.deletes.exists(_.isDeletionVector))
    assert(mixed.nonEmpty)
    assert(mixed.forall(_.deletes.forall(d =>
      d.content != FileContent.PositionDeletes || d.isDeletionVector)))
  }

  test("DV manifest entries round-trip referenced file and blob range") {
    val t = catalog.loadTable("t_dv")
    val dvs = t.scan.planFiles().flatMap(_.deletes).filter(_.isDeletionVector)
      .distinctBy(f => (f.filePath, f.contentOffset))
    assert(dvs.nonEmpty)
    dvs.foreach { f =>
      assert(f.referencedDataFile.isDefined)
      assert(f.contentOffset.exists(_ >= 4L))
      assert(f.contentSizeInBytes.exists(_ > 0L))
      assert(f.recordCount > 0L)
      // the blob must be readable standalone via its manifest byte range
      val positions = DeletionVector.readPositions(
        f.filePath, f.contentOffset.get, f.contentSizeInBytes.get)
      assert(positions.length.toLong === f.recordCount)
    }
  }

  test("upsert composes with deletion vectors") {
    val t = catalog.loadTable("t_dv")
    val keyCols = Seq("l_orderkey", "l_linenumber")
    val live = t.scan.toDF.cache()
    // the synthetic lineitem keys are NOT unique: build the source from
    // keys provably absent from the live table (pure inserts) plus keys
    // that occur exactly once (clean single-row updates)
    val liveKeyCounts = live.groupBy(keyCols.map(col): _*).count().cache()
    val inserts = lineitem.filter(col("l_quantity") > 45)
      .join(liveKeyCounts, keyCols, "left_anti")
      .dropDuplicates(keyCols).limit(30)
      .withColumn("l_returnflag", lit("I"))
    val updates = live
      .join(liveKeyCounts.filter(col("count") === 1).drop("count"), keyCols, "left_semi")
      .limit(20)
      .withColumn("l_tax", lit(9.99))
    val (nUpdated, nInserted) = t.upsert(inserts.unionByName(updates), keyCols)
    assert(nInserted === 30L)
    assert(nUpdated === 20L)
    val after = t.scan.toDF
    assert(after.filter(col("l_returnflag") === "I").count() === 30L)
    assert(after.filter(col("l_tax") === 9.99).count() === 20L)
  }
}
