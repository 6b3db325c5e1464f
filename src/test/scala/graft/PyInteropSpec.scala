package graft

import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HadoopCatalog
import graft.core._

/** THE cross-client proof: tables this engine writes are read back by the
  * REFERENCE IMPLEMENTATION ITSELF — pyiceberg from /root/reference runs
  * in a python subprocess (tools/pyiceberg_read.py, with the three tiny
  * dependency shims in tools/pyshim) and its row counts / aggregates must
  * match the source data. This closes the loop the binary-fixture tests
  * (InteropSpec) open: not just "our codecs decode their bytes" but
  * "their whole read path accepts our metadata, manifests, and files".
  */
class PyInteropSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warehouse: String = Files.createTempDirectory("graft-pyint").toString
  lazy val catalog = new HadoopCatalog(warehouse, spark)

  override def afterAll(): Unit = spark.stop()

  private def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  private lazy val pythonUsable: Boolean = {
    val probe = Process(Seq("python3", "-c", "from pyiceberg.table import StaticTable"),
      None, "PYTHONPATH" -> "/root/repo/tools/pyshim:/root/reference")
    probe.!(ProcessLogger(_ => ())) == 0
  }

  private def latestMetadata(tableDir: String): String = {
    val dir = Paths.get(tableDir, "metadata")
    import scala.jdk.CollectionConverters._
    val latest = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".metadata.json"))
      .maxBy(_.stripPrefix("v").stripSuffix(".metadata.json").toInt)
    dir.resolve(latest).toString
  }

  /** (rows, sum) as the reference reads them. */
  private def pyRead(metadataPath: String, sumCol: String,
      rowFilter: Option[String] = None): (Long, Long) = {
    val cmd = Seq("python3", "/root/repo/tools/pyiceberg_read.py", metadataPath, sumCol) ++
      rowFilter.toSeq
    val out = new StringBuilder
    val err = new StringBuilder
    val rc = Process(cmd, None,
      "PYTHONPATH" -> "/root/repo/tools/pyshim:/root/reference")
      .!(ProcessLogger(o => out.append(o).append('\n'), e => err.append(e).append('\n')))
    assert(rc == 0, s"pyiceberg read failed (rc=$rc):\n$err")
    val parts = out.toString.trim.split('\t')
    (parts(0).toLong, parts(1).toDouble.toLong)
  }

  test("pyiceberg reads a graft-written unpartitioned table (appends + CoW delete)") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    val t = catalog.createTable("py_plain", Schema.fromSpark(orders.schema))
    t.append(orders.limit(800))
    t.append(orders.filter(col("o_orderkey") > 10000).limit(200))
    t.delete("o_custkey < 20")

    val expected = t.scan.toDF
      .agg(count(lit(1)), sum(col("o_orderkey"))).head
    val (rows, keySum) = pyRead(latestMetadata(s"$warehouse/py_plain"), "o_orderkey")
    assert(rows === expected.getLong(0))
    assert(keySum === expected.getLong(1))
  }

  test("pyiceberg reads and PRUNES a partitioned graft table with a row filter") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    val schema = Schema.fromSpark(orders.schema)
    val spec = graft.meta.PartitionSpec.build(schema, 0,
      ("o_orderstatus", IdentityTransform, "st"))
    val t = catalog.createTable("py_part", schema, spec)
    t.append(orders)

    val meta = latestMetadata(s"$warehouse/py_part")
    // full scan parity
    val (allRows, _) = pyRead(meta, "o_orderkey")
    assert(allRows === orders.count())
    // filtered scan: pyiceberg's manifest pruning + residual over OUR
    // partition summaries and per-file stats
    val want = orders.filter(col("o_orderstatus") === "F")
    val wantAgg = want.agg(count(lit(1)), sum(col("o_orderkey"))).head
    val (fRows, fSum) = pyRead(meta, "o_orderkey", Some("o_orderstatus == 'F'"))
    assert(fRows === wantAgg.getLong(0))
    assert(fSum === wantAgg.getLong(1))
  }

  test("pyiceberg applies graft-written v3 deletion vectors") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    val t = catalog.createTable("py_dv", Schema.fromSpark(orders.schema))
    t.upgradeFormatVersion(3)
    val rel = catalog.loadTable("py_dv")
    rel.append(orders.limit(1000))
    rel.deleteAsDeletionVector("o_orderkey <= 250")

    val expected = rel.scan.toDF.count()
    assert(expected < 1000L)
    // exercises the reference's puffin + roaring DV decode over OUR
    // executor-assembled puffin files
    val (rows, _) = pyRead(latestMetadata(s"$warehouse/py_dv"), "o_orderkey")
    assert(rows === expected,
      "the reference did not apply our deletion vectors")
  }

  test("pyiceberg reads direct-committed CoW DELETE files (staged = final)") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    // the SQL DELETE's per-task staged files are committed AS data files
    // (no second write); they must carry field ids and stats the
    // reference accepts like any library-written parquet
    val s = spark
    s.conf.set("spark.sql.catalog.gpyd", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gpyd.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gpyd.db")
    s.sql("""CREATE TABLE gpyd.db.py_direct (k BIGINT, v STRING)
      TBLPROPERTIES ('format-version'='3')""")
    s.sql("INSERT INTO gpyd.db.py_direct SELECT id, concat('v', id) FROM range(400)")
    s.sql("DELETE FROM gpyd.db.py_direct WHERE k % 3 = 0")
    val t = new HadoopCatalog(warehouse, s).loadTable("db.py_direct")
    assert(t.scan.planFiles().forall(_.file.filePath.contains("/data/cow-")),
      "precondition: the DELETE must have taken the direct-commit path")
    val expected = t.scan.toDF.count()
    val (rows, sum) = pyRead(latestMetadata(s"$warehouse/db/py_direct"), "k")
    assert(rows === expected)
    assert(sum === (0L until 400L).filter(_ % 3 != 0).sum)
  }

  test("pyiceberg reads and prunes a PARTITIONED direct-committed DELETE") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    // the routed staging writer's partition directories + harvested
    // partition tuples must read back through the reference's manifest
    // pruning exactly like fan-out-written files
    val s = spark
    s.conf.set("spark.sql.catalog.gpypd", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gpypd.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gpypd.db")
    s.sql("""CREATE TABLE gpypd.db.py_part (k BIGINT, d DATE, v STRING)
      PARTITIONED BY (days(d))
      TBLPROPERTIES ('format-version'='3')""")
    s.sql("""INSERT INTO gpypd.db.py_part
      SELECT id, date_add(DATE'2021-03-01', CAST(id % 3 AS INT)), concat('v', id)
      FROM range(300)""")
    s.sql("DELETE FROM gpypd.db.py_part WHERE k % 5 = 2")
    val t = new HadoopCatalog(warehouse, s).loadTable("db.py_part")
    assert(t.scan.planFiles().forall(_.file.filePath.contains("/data/cow-")),
      "precondition: the DELETE must have taken the partitioned direct path")
    val expected = t.scan.toDF.count()
    val (rows, sum) = pyRead(latestMetadata(s"$warehouse/db/py_part"), "k")
    assert(rows === expected)
    assert(sum === (0L until 300L).filter(_ % 5 != 2).sum)
    // row filter on the partition source column → the reference prunes
    val (prunedRows, _) = pyRead(latestMetadata(s"$warehouse/db/py_part"), "k",
      rowFilter = Some("d == '2021-03-01'"))
    assert(prunedRows === (0L until 300L).count(i => i % 3 == 0 && i % 5 != 2))
  }

  test("pyiceberg reads a graft v3 table created THROUGH the REST catalog") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    // closes the loop on the REST create path: the server must stamp v3
    // metadata (next-row-id, bounded format-version) that the REFERENCE
    // parses, and DV commits driven through REST round-trips must apply
    val rwh = Files.createTempDirectory("graft-pyint-rest").toString
    val server = new graft.catalog.RestCatalogServer(rwh).start()
    try {
      val rcat = new graft.catalog.RestCatalog(server.uri, spark)
      rcat.createNamespace("db")
      val t = rcat.createTable("db.py_rest_v3", Schema.fromSpark(orders.schema),
        properties = Map("format-version" -> "3"))
      t.append(orders.limit(500))
      t.deleteAsDeletionVector("o_orderkey <= 100")
      val rel = rcat.loadTable("db.py_rest_v3")
      assert(rel.metadata.formatVersion === 3)
      assert(rel.metadata.nextRowId.exists(_ >= 500L),
        "REST-created v3 table must track next-row-id through commits")
      val expected = rel.scan.toDF.count()
      assert(expected < 500L)
      // REST metadata files are rest-v<N>-<uuid>.metadata.json
      val metaDir = Paths.get(s"$rwh/db/py_rest_v3/metadata")
      import scala.jdk.CollectionConverters._
      val latest = Files.list(metaDir).iterator().asScala
        .map(_.toString).filter(_.endsWith(".metadata.json"))
        .maxBy(p => Files.getLastModifiedTime(Paths.get(p)).toMillis)
      val (rows, _) = pyRead(latest, "o_orderkey")
      assert(rows === expected,
        "the reference could not read the REST-created v3 table")
    } finally server.stop()
  }

  test("pyiceberg reads a graft table after v3 merge-on-read SQL UPDATE + DELETE") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    // the delta SQL path: UPDATE masks matched rows with a DV and
    // reinserts them (lineage materialized) in ONE snapshot; a later
    // DELETE merges into the same files' vectors, superseding blobs.
    // The reference must decode the merged puffins AND sum the
    // reinserted values correctly.
    spark.conf.set("spark.sql.catalog.gpy", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpy.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gpy.db")
    spark.sql("""CREATE TABLE gpy.db.py_mor3 (k BIGINT, v BIGINT)
      TBLPROPERTIES ('format-version'='3',
                     'write.update.mode'='merge-on-read',
                     'write.delete.mode'='merge-on-read')""")
    spark.sql("INSERT INTO gpy.db.py_mor3 SELECT id, id * 10 FROM range(1000)")
    spark.sql("UPDATE gpy.db.py_mor3 SET v = 1 WHERE k >= 900")
    spark.sql("DELETE FROM gpy.db.py_mor3 WHERE k < 100 OR k = 950")
    val expectRows = spark.sql("SELECT count(*) FROM gpy.db.py_mor3").head.getLong(0)
    val expectSum = spark.sql("SELECT sum(v) FROM gpy.db.py_mor3").head.getLong(0)
    assert(expectRows === 899)
    val (rows, sum) = pyRead(latestMetadata(s"$warehouse/db/py_mor3"), "v")
    assert(rows === expectRows, "the reference did not apply the merged MoR vectors")
    assert(sum === expectSum, "reinserted-row values disagree with the reference's read")
  }

  test("pyiceberg reads a PARTITIONED v3 table after direct-commit MoR UPDATE (DV merge)") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    // the freshly-plumbed combination: a partitioned delta write whose
    // reinserted rows direct-commit through the ROUTED staging path
    // (required clustering + _p_ dirs) while the masked rows become
    // deletion vectors — the reference must prune the routed partition
    // layout AND decode the DVs in one scan
    val s = spark
    s.conf.set("spark.sql.catalog.gpypm", "graft.spark.GraftCatalog")
    s.conf.set("spark.sql.catalog.gpypm.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gpypm.db")
    s.sql("""CREATE TABLE gpypm.db.py_pmor (k BIGINT, d DATE, v BIGINT)
      PARTITIONED BY (days(d))
      TBLPROPERTIES ('format-version'='3',
                     'write.update.mode'='merge-on-read',
                     'write.delete.mode'='merge-on-read')""")
    s.sql("""INSERT INTO gpypm.db.py_pmor
      SELECT id, date_add(DATE'2021-03-01', CAST(id % 3 AS INT)), id * 10
      FROM range(600)""")
    s.sql("UPDATE gpypm.db.py_pmor SET v = 1 WHERE k >= 500")
    s.sql("DELETE FROM gpypm.db.py_pmor WHERE k < 60")
    val t = new HadoopCatalog(warehouse, s).loadTable("db.py_pmor")
    val tasks = t.scan.planFiles()
    assert(tasks.exists(_.file.filePath.contains("/data/delta-")),
      "precondition: the MoR UPDATE's reinserts must take the routed direct path, got " +
        tasks.map(_.file.filePath).take(3).mkString(","))
    assert(tasks.filter(_.file.filePath.contains("/data/delta-"))
      .forall(_.file.filePath.contains("_p_d_day=")),
      "direct delta files must sit in partition dirs")
    assert(tasks.exists(_.deletes.exists(_.isDeletionVector)),
      "precondition: masked rows must be deletion vectors")
    val expectRows = s.sql("SELECT count(*) FROM gpypm.db.py_pmor").head.getLong(0)
    val expectSum = s.sql("SELECT sum(v) FROM gpypm.db.py_pmor").head.getLong(0)
    assert(expectRows === 540)
    val (rows, sum) = pyRead(latestMetadata(s"$warehouse/db/py_pmor"), "v")
    assert(rows === expectRows, "the reference did not apply the partitioned-direct DVs")
    assert(sum === expectSum)
    // partition pruning over the routed layout
    val (pruned, _) = pyRead(latestMetadata(s"$warehouse/db/py_pmor"), "v",
      rowFilter = Some("d == '2021-03-01'"))
    assert(pruned === (0L until 600L).count(i => i % 3 == 0 && i >= 60))
  }

  test("pyiceberg resolves renamed columns by field-id in graft parquet") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    val t = catalog.createTable("py_evo", Schema.fromSpark(orders.schema))
    t.append(orders.limit(500))
    t.updateSchema.renameColumn("o_orderkey", "order_id").commit()
    val rel = catalog.loadTable("py_evo")
    rel.append(orders.limit(500).withColumnRenamed("o_orderkey", "order_id"))

    val expected = rel.scan.toDF
      .agg(count(lit(1)), sum(col("order_id"))).head
    // pre-rename files carry the OLD name; the reference must project the
    // renamed column by field-id, not name
    val (rows, s2) = pyRead(latestMetadata(s"$warehouse/py_evo"), "order_id")
    assert(rows === expected.getLong(0))
    assert(s2 === expected.getLong(1))
  }

  test("pyiceberg prunes graft bucket partitions (murmur3 agreement)") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    val schema = Schema.fromSpark(orders.schema)
    val spec = graft.meta.PartitionSpec.build(schema, 0,
      ("o_custkey", BucketTransform(8), "ck_bucket"))
    val t = catalog.createTable("py_bucket", schema, spec)
    t.append(orders)

    // an equality filter prunes via bucket(o_custkey) on BOTH sides: if
    // the reference's murmur3 (mmh3) disagreed with our manifests' bucket
    // numbers it would prune the WRONG partition and return zero rows
    val want = orders.filter(col("o_custkey") === 37)
    assume(want.count() > 0)
    val (rows, _) = pyRead(latestMetadata(s"$warehouse/py_bucket"),
      "o_orderkey", Some("o_custkey == 37"))
    assert(rows === want.count(),
      "bucket pruning disagreement between the engines")
  }

  test("equality deletes: the reference refuses them (documented gap THEIRS, not ours)") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    // pyiceberg's scan raises on tables with equality deletes
    // (table/__init__.py plan_files, iceberg#6568) — our engine reads AND
    // writes them; pin that the foreign-side failure is their documented
    // refusal, not a malformed table of ours
    val t = catalog.createTable("py_eq", Schema.fromSpark(orders.schema))
    t.append(orders.limit(1000))
    t.deleteEqualityKeys(orders.limit(1000)
      .filter(col("o_custkey") < 50).select("o_custkey").distinct())
    assert(t.scan.toDF.count() < 1000L)

    val err = new StringBuilder
    val rc = Process(Seq("python3", "/root/repo/tools/pyiceberg_read.py",
      latestMetadata(s"$warehouse/py_eq"), "o_orderkey"), None,
      "PYTHONPATH" -> "/root/repo/tools/pyshim:/root/reference")
      .!(ProcessLogger(_ => (), e => err.append(e).append('\n')))
    assert(rc != 0)
    assert(err.toString.contains("does not yet support equality deletes"),
      s"expected the documented refusal, got:\n$err")
  }

  test("pyiceberg reads graft-written native ORC data files") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    val t = catalog.createTable("py_orc", Schema.fromSpark(orders.schema))
    t.setProperties("write.format.default" -> "orc")
    val rel = catalog.loadTable("py_orc")
    rel.append(orders.limit(600))

    val meta = latestMetadata(s"$warehouse/py_orc")
    val (rows, keySum) = pyRead(meta, "o_orderkey")
    assert(rows === 600L)
    val want = orders.limit(600).agg(sum(col("o_orderkey"))).head.getLong(0)
    assert(keySum === want, "ORC values mis-read by the reference")
    // timestamp semantics survive the ntz → ORC plain-timestamp encoding:
    // the same wall-clock cut must select the same rows in both engines
    val cut = "1997-06-01T00:00:00"
    val wantTs = orders.limit(600)
      .filter(col("o_orderdate") >= lit(cut).cast("timestamp_ntz")).count()
    val (tsRows, _) = pyRead(meta, "o_orderkey", Some(s"o_orderdate >= '$cut'"))
    assert(tsRows === wantTs, "timestamp wall-time disagreement through ORC")
  }

  test("graft reads a table the reference WROTE (create + append + delete)") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    // the reverse direction: pyiceberg (tools/pyiceberg_write.py — its own
    // new_table_metadata / update_table_metadata / pyarrow writer through
    // a minimal file catalog) creates, appends 500 rows, and CoW-deletes
    // o_orderkey <= 100; graft must read the foreign metadata JSON,
    // manifest list, manifests, and parquet bit-for-bit
    val wh = Files.createTempDirectory("graft-pyw").toString
    val out = new StringBuilder
    val err = new StringBuilder
    val rc = Process(Seq("python3", "/root/repo/tools/pyiceberg_write.py",
      wh, "/root/testdata/sf0.001/orders.parquet", "500"), None,
      "PYTHONPATH" -> "/root/repo/tools/pyshim:/root/reference")
      .!(ProcessLogger(o => out.append(o).append('\n'), e => err.append(e).append('\n')))
    assert(rc == 0, s"pyiceberg write failed (rc=$rc):\n$err")
    val metadataPath = out.toString.trim.linesIterator.toSeq.last

    val t = graft.catalog.StaticTable.fromMetadata(metadataPath, spark)
    val expected = orders.limit(500).filter(col("o_orderkey") > 100)
    assert(t.scan.toDF.count() === expected.count())
    assert(t.scan.count() === expected.count()) // metadata count off foreign stats
    // filtered scan prunes + filters over THEIR manifests and stats
    val sub = expected.filter(col("o_custkey") < 500)
    assert(t.scan("o_custkey < 500").toDF.count() === sub.count())
    // values round-trip, not just counts
    val gotSum = t.scan.toDF.agg(sum(col("o_orderkey"))).head.getLong(0)
    val wantSum = expected.agg(sum(col("o_orderkey"))).head.getLong(0)
    assert(gotSum === wantSum)
  }

  test("graft prunes a PARTITIONED table the reference wrote") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    val wh = Files.createTempDirectory("graft-pywp").toString
    val out = new StringBuilder
    val err = new StringBuilder
    val rc = Process(Seq("python3", "/root/repo/tools/pyiceberg_write.py",
      wh, "/root/testdata/sf0.001/orders.parquet", "0", "partitioned"), None,
      "PYTHONPATH" -> "/root/repo/tools/pyshim:/root/reference")
      .!(ProcessLogger(o => out.append(o).append('\n'), e => err.append(e).append('\n')))
    assert(rc == 0, s"pyiceberg write failed (rc=$rc):\n$err")
    val metadataPath = out.toString.trim.linesIterator.toSeq.last

    val t = graft.catalog.StaticTable.fromMetadata(metadataPath, spark)
    val expected = orders.filter(col("o_orderkey") > 100)
    assert(t.scan.toDF.count() === expected.count())
    // partition pruning over the REFERENCE'S manifest summaries and
    // partition tuples: fewer files planned, same rows
    val all = t.scan.planFiles().size
    val prunedScan = t.scan("o_orderstatus = 'F'")
    assert(prunedScan.planFiles().size < all)
    assert(prunedScan.toDF.count() ===
      expected.filter(col("o_orderstatus") === "F").count())
  }

  test("graft reads and PRUNES a DAY-partitioned table pyiceberg wrote") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    // write direction, day transform: pyiceberg's partitioned write path
    // (_determine_partitions io/pyarrow.py:3053) fans 200 rows out by
    // day(o_orderdate); graft must plan over THEIR per-partition files
    // with manifest/file pruning and read values bit-for-bit
    val wh = Files.createTempDirectory("graft-pywday").toString
    val out = new StringBuilder
    val err = new StringBuilder
    val rc = Process(Seq("python3", "/root/repo/tools/pyiceberg_write.py",
      wh, "/root/testdata/sf0.001/orders.parquet", "200", "day"), None,
      "PYTHONPATH" -> "/root/repo/tools/pyshim:/root/reference")
      .!(ProcessLogger(o => out.append(o).append('\n'), e => err.append(e).append('\n')))
    assert(rc == 0, s"pyiceberg day-partitioned write failed (rc=$rc):\n$err")
    val metadataPath = out.toString.trim.linesIterator.toSeq.last

    val t = graft.catalog.StaticTable.fromMetadata(metadataPath, spark)
    val base = orders.limit(200)
    assert(t.scan.toDF.count() === 200L)
    // a one-sided date filter prunes against the reference's partition
    // tuples + manifest summaries: strictly fewer files planned
    val cut = base.agg(max(col("o_orderdate"))).head.getAs[Any](0).toString.take(10)
    val all = t.scan.planFiles().size
    val pruned = t.scan(s"o_orderdate >= '$cut'")
    assert(pruned.planFiles().size < all,
      s"expected day pruning to plan fewer than $all files")
    assert(pruned.toDF.count() ===
      base.filter(col("o_orderdate") >= lit(cut).cast("timestamp_ntz")).count())
  }

  test("pyiceberg's own partitioned OVERWRITE reads back with value parity") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    // the day-mode writer runs pyiceberg's Table.overwrite on a day
    // boundary: whole-partition files drop metadata-only and the
    // replacement rows (o_totalprice = 0 copies) re-append through its
    // partitioned write path (_determine_partitions); graft must see
    // exactly the post-overwrite state. The filter is deliberately
    // partition-ALIGNED — the reference's PARTIAL-file rewrite phase has
    // a genuine bug on non-identity transforms (its manifest-pruning
    // predicate compares a day ordinal against the timestamp source
    // column, never matches, and leaves rewritten originals live,
    // duplicating rows — its own reader returns 204/200 then too). That
    // gap is THEIRS; the aligned flow is the correct-output path.
    val wh = Files.createTempDirectory("graft-pywow").toString
    val out = new StringBuilder
    val err = new StringBuilder
    val rc = Process(Seq("python3", "/root/repo/tools/pyiceberg_write.py",
      wh, "/root/testdata/sf0.001/orders.parquet", "200", "day"), None,
      "PYTHONPATH" -> "/root/repo/tools/pyshim:/root/reference")
      .!(ProcessLogger(o => out.append(o).append('\n'), e => err.append(e).append('\n')))
    assert(rc == 0, s"pyiceberg day-partitioned write failed (rc=$rc):\n$err")
    val lines = out.toString.trim.linesIterator.toSeq
    val metadataPath = lines.last
    val cut = lines.find(_.startsWith("CUT=")).map(_.drop(4))
      .getOrElse(fail("writer did not print its overwrite cutoff"))

    val t = graft.catalog.StaticTable.fromMetadata(metadataPath, spark)
    val got = t.scan.toDF
    val base = orders.limit(200)
    val cutCol = lit(cut).cast("timestamp_ntz")
    val hiCount = base.filter(col("o_orderdate") >= cutCol).count()
    assert(hiCount > 0, "cutoff must split the slice")
    assert(got.count() === 200L)
    assert(got.filter(col("o_orderdate") >= cutCol && col("o_totalprice") === 0.0)
      .count() === hiCount, "overwritten partitions must read back with price 0")
    // untouched partitions keep their exact values — aggregate parity
    val wantSum = base.filter(col("o_orderdate") < cutCol)
      .agg(sum(col("o_totalprice"))).head.getDouble(0)
    val gotSum = got.filter(col("o_orderdate") < cutCol)
      .agg(sum(col("o_totalprice"))).head.getDouble(0)
    assert(math.abs(gotSum - wantSum) < 1e-6)
    // key multiset parity across the whole table (overwrite preserved keys)
    assert(got.agg(sum(col("o_orderkey"))).head.getLong(0) ===
      base.agg(sum(col("o_orderkey"))).head.getLong(0))
  }

  test("v3 nanosecond timestamps read with the ns->us downcast") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    // The reference cannot WRITE v3 yet (metadata.py:578), so the foreign
    // fixture is a pyarrow-written TIMESTAMP(NANOS) parquet — the same
    // physical shape a v3 writer produces — wrapped in graft-built v3
    // metadata. Read semantics under test: the reference's ns->us downcast
    // (io/pyarrow.py:1654), including floor behavior on pre-epoch values.
    import graft.meta._
    val dir = Files.createTempDirectory("graft-ns").toString
    val py =
      s"""
         |import pyarrow as pa, pyarrow.parquet as pq
         |vals = [1700000000123456789, 1700000001999999999, -1500]
         |t = pa.table({'id': pa.array([1, 2, 3], pa.int64()),
         |              'ts': pa.array(vals, pa.timestamp('ns')),
         |              'tsz': pa.array(vals, pa.timestamp('ns', tz='UTC'))})
         |pq.write_table(t, '$dir/ns.parquet', version='2.6')
         |""".stripMargin
    val err = new StringBuilder
    val rc = Process(Seq("python3", "-c", py), None,
      "PYTHONPATH" -> "/root/repo/tools/pyshim:/root/reference")
      .!(ProcessLogger(_ => (), e => err.append(e).append('\n')))
    assert(rc == 0, s"pyarrow ns fixture write failed:\n$err")

    val schema = Schema(Seq(
      NestedField(1, "id", ILong, required = true),
      NestedField(2, "ts", ITimestampNs),
      NestedField(3, "tsz", ITimestamptzNs)), 0)
    val t0 = catalog.createTable("py_ns", schema)
    t0.upgradeFormatVersion(3)
    val t = catalog.loadTable("py_ns")
    val spec = t.metadata.specById(t.metadata.defaultSpecId)
    val metaDir = s"${t.metadata.location}/metadata"
    val entries = Seq(ManifestEntry(status = 1, snapshotId = 9L,
      dataSequenceNumber = 1L, fileSequenceNumber = 1L,
      dataFile = DataFile(content = 0, filePath = s"$dir/ns.parquet",
        fileFormat = "PARQUET", partition = Seq.empty,
        recordCount = 3L, fileSizeInBytes = 2048L)))
    val mPath = s"$metaDir/m-ns.avro"
    val len = ManifestIO.writeManifest(mPath, entries, spec, schema)
    val mf = ManifestFile(mPath, len, spec.specId, content = 0,
      sequenceNumber = 1L, minSequenceNumber = 1L, addedSnapshotId = 9L,
      addedFilesCount = 1, existingFilesCount = 0, deletedFilesCount = 0,
      addedRowsCount = 3L, existingRowsCount = 0L, deletedRowsCount = 0L,
      partitions = Nil)
    val listPath = s"$metaDir/snap-9-ns.avro"
    ManifestIO.writeManifestList(listPath, Seq(mf))
    val now = System.currentTimeMillis()
    val snap = Snapshot(9L, None, 1L, now, listPath,
      Map("operation" -> "append"), t.metadata.currentSchemaId)
    catalog.commit("py_ns", catalog.currentVersion("py_ns").get, t.metadata.copy(
      lastSequenceNumber = 1L, lastUpdatedMs = now,
      currentSnapshotId = Some(9L), snapshots = Seq(snap),
      refs = Map("main" -> SnapshotRef(9L, "branch"))))

    val df = catalog.loadTable("py_ns").scan.toDF
    // public surface is the us-downcast timestamp
    assert(df.schema("ts").dataType === org.apache.spark.sql.types.TimestampNTZType)
    assert(df.schema("tsz").dataType === org.apache.spark.sql.types.TimestampType)
    val got = df.orderBy("id").select(col("id"),
      unix_micros(col("ts").cast("timestamp")).as("ts_us"),
      unix_micros(col("tsz")).as("tsz_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // floorDiv(ns, 1000): truncation on positives, floor on the pre-epoch
    val want = Seq(
      (1L, 1700000000123456L, 1700000000123456L),
      (2L, 1700000001999999L, 1700000001999999L),
      (3L, -2L, -2L))
    assert(got === want, "ns->us downcast mismatch")

    // writes stay rejected, typed
    val wdf = spark.range(1).select(col("id"),
      lit(java.time.LocalDateTime.of(2024, 1, 1, 0, 0)).as("ts"),
      lit(java.time.Instant.ofEpochSecond(1700000000L)).as("tsz"))
    val e = intercept[UnsupportedOperationException](
      catalog.loadTable("py_ns").append(wdf))
    assert(e.getMessage.contains("read-only"))
  }

  test("pyiceberg applies graft-written MoR position deletes") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    val t = catalog.createTable("py_mor", Schema.fromSpark(orders.schema))
    t.append(orders.limit(1000))
    t.deletePositional("o_orderkey <= 300")

    val expected = t.scan.toDF.count()
    assert(expected < 1000L, "MoR delete must actually drop rows")
    val (rows, _) = pyRead(latestMetadata(s"$warehouse/py_mor"), "o_orderkey")
    assert(rows === expected,
      "the reference did not apply our position-delete files")
  }

  test("pyiceberg parses graft-written v3 unknown/geometry/geography types") {
    assume(pythonUsable, "pyiceberg not importable in this environment")
    val schema = Schema(Seq(
      NestedField(1, "id", ILong, required = true),
      NestedField(2, "mystery", IUnknown),
      NestedField(3, "shape", IGeometry("EPSG:4326")),
      NestedField(4, "region", IGeography("EPSG:4326", "planar"))))
    val t0 = catalog.createTable("py_v3tail", schema)
    t0.upgradeFormatVersion(3)

    // the reference's pydantic models must parse OUR serialized type
    // strings back to the same typed objects (types.py:71/:73 regexes)
    val script =
      """import sys
        |from pyiceberg.table import StaticTable
        |t = StaticTable.from_metadata(sys.argv[1])
        |s = t.schema()
        |print("\t".join(str(s.find_field(i).field_type) for i in (2, 3, 4)))
        |""".stripMargin
    val out = new StringBuilder
    val err = new StringBuilder
    val rc = Process(Seq("python3", "-c", script,
        latestMetadata(s"$warehouse/py_v3tail")), None,
      "PYTHONPATH" -> "/root/repo/tools/pyshim:/root/reference")
      .!(ProcessLogger(o => out.append(o).append('\n'), e => err.append(e).append('\n')))
    assert(rc == 0, s"pyiceberg schema parse failed (rc=$rc):\n$err")
    val types = out.toString.trim.split('\t')
    assert(types(0) === "unknown")
    assert(types(1) === "geometry('EPSG:4326')")
    assert(types(2) === "geography('EPSG:4326', 'planar')")
  }
}
