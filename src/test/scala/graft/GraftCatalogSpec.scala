package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HadoopCatalog

/** The Spark TableCatalog plugin: full SQL DDL/DML against a graft
  * catalog — CREATE/ALTER/DROP TABLE, INSERT INTO/OVERWRITE, DELETE FROM,
  * VERSION/TIMESTAMP AS OF, namespaces. */
class GraftCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warehouse: String = Files.createTempDirectory("gcat-wh").toString

  override def beforeAll(): Unit = {
    // catalog plugins resolve lazily per name, so runtime conf works even
    // on a shared session
    spark.conf.set("spark.sql.catalog.g", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g.warehouse", warehouse)
  }

  override def afterAll(): Unit = spark.stop()

  def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("CREATE TABLE + INSERT INTO + SELECT round-trips") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("""CREATE TABLE g.db.orders (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)
      PARTITIONED BY (o_orderstatus)""")
    orders.createOrReplaceTempView("orders_src")
    spark.sql("INSERT INTO g.db.orders SELECT * FROM orders_src")
    assert(spark.sql("SELECT * FROM g.db.orders").count() === orders.count())
    // engine-side: the table is identity-partitioned and committed
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.orders")
    assert(t.spec.fields.map(_.name) === Seq("o_orderstatus"))
    assert(t.metadata.snapshots.size === 1)
    // values round-trip through write+read
    val a = spark.sql("SELECT * FROM g.db.orders ORDER BY o_orderkey")
      .collect().map(_.toString).toSeq
    val b = orders.orderBy(col("o_orderkey")).collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("partition transforms in PARTITIONED BY map to engine transforms") {
    spark.sql("""CREATE TABLE g.db.ev (
        event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE)
      PARTITIONED BY (days(ts), bucket(8, user_id))""")
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.ev")
    assert(t.spec.fields.map(f => (f.name, f.transform)) ===
      Seq(("ts_day", graft.core.DayTransform),
        ("user_id_bucket", graft.core.BucketTransform(8))))
    spark.sql("DROP TABLE g.db.ev")
  }

  test("filtered SELECT prunes partitions through the catalog table") {
    val df = spark.sql("SELECT * FROM g.db.orders WHERE o_orderstatus = 'F'")
    val want = orders.filter(col("o_orderstatus") === "F").count()
    assert(df.count() === want)
  }

  test("DELETE FROM removes matching rows") {
    spark.sql("DELETE FROM g.db.orders WHERE o_orderstatus = 'F'")
    assert(spark.sql("SELECT * FROM g.db.orders WHERE o_orderstatus = 'F'").count() === 0L)
    val remaining = orders.filter(col("o_orderstatus") =!= "F").count()
    assert(spark.sql("SELECT * FROM g.db.orders").count() === remaining)
  }

  test("UPDATE rewrites matching groups copy-on-write") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("""CREATE TABLE g.db.o_upd (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)""")
    orders.createOrReplaceTempView("o_upd_src")
    spark.sql("INSERT INTO g.db.o_upd SELECT * FROM o_upd_src")
    spark.sql("UPDATE g.db.o_upd SET o_orderstatus = 'X', o_totalprice = 0.0 " +
      "WHERE o_orderkey % 7 = 0")
    val got = spark.sql("SELECT * FROM g.db.o_upd ORDER BY o_orderkey")
      .collect().map(_.toString).toSeq
    val want = orders
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 7 === 0, lit("X")).otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, lit(0.0)).otherwise(col("o_totalprice")))
      .orderBy(col("o_orderkey")).collect().map(_.toString).toSeq
    assert(got === want)
    // the rewrite is a single overwrite snapshot on the engine side
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.o_upd")
    assert(t.metadata.currentSnapshot.map(_.operation) === Some("overwrite"))
  }

  test("UPDATE only rewrites files containing matches (group pruning)") {
    spark.sql("""CREATE TABLE g.db.o_upd_p (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)
      PARTITIONED BY (o_orderstatus)""")
    orders.createOrReplaceTempView("o_upd_p_src")
    spark.sql("INSERT INTO g.db.o_upd_p SELECT * FROM o_upd_p_src")
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.o_upd_p")
    val before = new graft.table.IceScan(t).planFiles().map(_.file.filePath).toSet
    spark.sql("UPDATE g.db.o_upd_p SET o_totalprice = -1.0 WHERE o_orderstatus = 'F'")
    t.refresh()
    val after = new graft.table.IceScan(t).planFiles().map(_.file.filePath).toSet
    // untouched partitions keep their files byte-identical
    val fFiles = before.filterNot(after)
    assert(fFiles.nonEmpty, "the F partition must be rewritten")
    assert((before -- fFiles).subsetOf(after),
      "files of untouched partitions must survive the UPDATE")
    val got = spark.sql(
      "SELECT count(*) FROM g.db.o_upd_p WHERE o_totalprice = -1.0").head().getLong(0)
    assert(got === orders.filter(col("o_orderstatus") === "F").count())
  }

  test("UPDATE with a non-pushable predicate narrows to matched files at runtime") {
    spark.sql("""CREATE TABLE g.db.o_upd_rt (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)""")
    // two files with disjoint key ranges; the predicate only matches the
    // low range, so runtime group filtering (_file IN matched) should
    // keep the high-range file untouched even though the modulo condition
    // itself cannot prune via manifests
    orders.filter(col("o_orderkey") <= 700).createOrReplaceTempView("o_rt_lo")
    orders.filter(col("o_orderkey") > 700).createOrReplaceTempView("o_rt_hi")
    spark.sql("INSERT INTO g.db.o_upd_rt SELECT * FROM o_rt_lo")
    spark.sql("INSERT INTO g.db.o_upd_rt SELECT * FROM o_rt_hi")
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.o_upd_rt")
    val before = new graft.table.IceScan(t).planFiles().map(_.file.filePath).toSet
    spark.sql("UPDATE g.db.o_upd_rt SET o_totalprice = -5.0 " +
      "WHERE o_orderkey % 2 = 0 AND o_orderkey <= 700")
    t.refresh()
    val after = new graft.table.IceScan(t).planFiles().map(_.file.filePath).toSet
    // correctness regardless of narrowing
    assert(spark.sql("SELECT count(*) FROM g.db.o_upd_rt WHERE o_totalprice = -5.0")
      .head().getLong(0) ===
      orders.filter(col("o_orderkey") % 2 === 0 && col("o_orderkey") <= 700).count())
    assert(spark.sql("SELECT count(*) FROM g.db.o_upd_rt").head().getLong(0) ===
      orders.count())
    // the o_orderkey <= 700 conjunct IS pushable, so at minimum static
    // manifest pruning must keep the high file; runtime filtering keeps
    // it too when the whole condition defeats static pruning
    assert((before intersect after).nonEmpty,
      s"files without matches must survive the UPDATE (before=$before after=$after)")
  }

  test("MERGE INTO updates matched and inserts unmatched rows") {
    spark.sql("""CREATE TABLE g.db.o_merge (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)""")
    orders.filter(col("o_orderkey") <= 1000).createOrReplaceTempView("o_merge_base")
    spark.sql("INSERT INTO g.db.o_merge SELECT * FROM o_merge_base")
    orders.filter(col("o_orderkey") > 500)
      .withColumn("o_orderstatus", lit("M")).createOrReplaceTempView("o_merge_src")
    spark.sql("""MERGE INTO g.db.o_merge t USING o_merge_src s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val got = spark.sql("SELECT * FROM g.db.o_merge ORDER BY o_orderkey")
      .collect().map(_.toString).toSeq
    val want = orders.filter(col("o_orderkey") <= 500)
      .unionByName(orders.filter(col("o_orderkey") > 500)
        .withColumn("o_orderstatus", lit("M")))
      .orderBy(col("o_orderkey")).collect().map(_.toString).toSeq
    assert(got === want)
  }

  test("MERGE INTO WHEN NOT MATCHED BY SOURCE deletes unreferenced rows (both modes)") {
    for ((suffix, props) <- Seq(
        ("cow", ""),
        ("mor", "TBLPROPERTIES ('write.merge.mode'='merge-on-read')"))) {
      spark.sql(s"""CREATE TABLE g.db.o_nmbs_$suffix (
          o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
          o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)
        $props""")
      orders.limit(1000).createOrReplaceTempView(s"o_nmbs_base_$suffix")
      spark.sql(s"INSERT INTO g.db.o_nmbs_$suffix SELECT * FROM o_nmbs_base_$suffix")
      orders.filter(col("o_orderkey") % 2 === 0).select("o_orderkey")
        .createOrReplaceTempView(s"o_nmbs_keys_$suffix")
      // keep rows the source references; drop the rest; flag matched
      spark.sql(s"""MERGE INTO g.db.o_nmbs_$suffix t USING o_nmbs_keys_$suffix s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_orderstatus = 'K'
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      val kept = spark.sql(s"SELECT count(*) FROM g.db.o_nmbs_$suffix").head().getLong(0)
      val flagged = spark.sql(
        s"SELECT count(*) FROM g.db.o_nmbs_$suffix WHERE o_orderstatus = 'K'")
        .head().getLong(0)
      val want = orders.limit(1000).filter(col("o_orderkey") % 2 === 0).count()
      assert(kept === want, s"mode=$suffix")
      assert(flagged === want, s"mode=$suffix")
    }
  }

  test("MERGE INTO WHEN MATCHED DELETE removes matched rows") {
    spark.sql("""CREATE TABLE g.db.o_mdel (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)""")
    orders.createOrReplaceTempView("o_mdel_base")
    spark.sql("INSERT INTO g.db.o_mdel SELECT * FROM o_mdel_base")
    orders.filter(col("o_orderkey") % 3 === 0).select("o_orderkey")
      .createOrReplaceTempView("o_mdel_keys")
    spark.sql("""MERGE INTO g.db.o_mdel t USING o_mdel_keys s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED THEN DELETE""")
    assert(spark.sql("SELECT count(*) FROM g.db.o_mdel").head().getLong(0) ===
      orders.filter(col("o_orderkey") % 3 =!= 0).count())
  }

  test("merge-on-read UPDATE writes position deletes instead of rewriting files") {
    spark.sql("""CREATE TABLE g.db.o_mor (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)
      TBLPROPERTIES ('write.update.mode'='merge-on-read',
                     'write.delete.mode'='merge-on-read')""")
    orders.createOrReplaceTempView("o_mor_src")
    spark.sql("INSERT INTO g.db.o_mor SELECT * FROM o_mor_src")
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.o_mor")
    val before = new graft.table.IceScan(t).planFiles().map(_.file.filePath).toSet
    spark.sql("UPDATE g.db.o_mor SET o_totalprice = -9.0 WHERE o_orderkey % 50 = 0")
    t.refresh()
    val tasks = new graft.table.IceScan(t).planFiles()
    val after = tasks.map(_.file.filePath).toSet
    // the original data files survive — matched rows are masked by
    // POSITION DELETES, only the updated rows' replacement file is new
    assert(before.subsetOf(after), "merge-on-read UPDATE must not rewrite data files")
    assert(tasks.exists(_.deletes.nonEmpty), "position deletes must apply to old files")
    // values read back correctly through the MoR machinery (library + SQL)
    val wantUpd = orders.filter(col("o_orderkey") % 50 === 0).count()
    assert(spark.sql("SELECT count(*) FROM g.db.o_mor WHERE o_totalprice = -9.0")
      .head().getLong(0) === wantUpd)
    assert(spark.sql("SELECT count(*) FROM g.db.o_mor").head().getLong(0) === orders.count())
    assert(t.scan("o_totalprice = -9.0").toDF.count() === wantUpd)

    // merge-on-read DELETE: pure position-delete snapshot
    spark.sql("DELETE FROM g.db.o_mor WHERE o_orderkey % 70 = 0 AND o_totalprice <> -9.0")
    t.refresh()
    val wantDel = orders.filter(col("o_orderkey") % 70 === 0 &&
      !(col("o_orderkey") % 50 === 0)).count()
    assert(spark.sql("SELECT count(*) FROM g.db.o_mor").head().getLong(0) ===
      orders.count() - wantDel)
    assert(t.metadata.currentSnapshot.map(_.operation) === Some("delete"))
  }

  test("v3 merge-on-read SQL DML writes deletion vectors and keeps row lineage") {
    spark.sql("""CREATE TABLE g.db.o_mor3 (k BIGINT, v STRING)
      TBLPROPERTIES ('format-version'='3',
                     'write.update.mode'='merge-on-read',
                     'write.delete.mode'='merge-on-read',
                     'write.merge.mode'='merge-on-read')""")
    spark.sql("INSERT INTO g.db.o_mor3 SELECT id, concat('v', id) FROM range(500)")
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.o_mor3")
    val before = new graft.table.IceScan(t).planFiles().map(_.file.filePath).toSet
    def state(): Map[Long, (Long, Long, String)] =
      spark.sql("SELECT k, _row_id, _last_updated_sequence_number, v FROM g.db.o_mor3")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val s0 = state()
    assert(s0.values.map(_._1).toSeq.sorted === (0L until 500L))

    // MoR DELETE on v3 → a deletion vector, NOT a position-delete file,
    // and NOT a rewrite
    spark.sql("DELETE FROM g.db.o_mor3 WHERE k < 50") // seq 2
    t.refresh()
    val tasks = new graft.table.IceScan(t).planFiles()
    assert(before.subsetOf(tasks.map(_.file.filePath).toSet),
      "v3 MoR DELETE must not rewrite data files")
    val dels = tasks.flatMap(_.deletes)
    assert(dels.nonEmpty && dels.forall(_.isDeletionVector),
      s"v3 MoR deletes must be deletion vectors, got ${dels.map(_.fileFormat)}")
    val s1 = state()
    assert(s1.size === 450)
    s1.foreach { case (k, (id, seq, _)) =>
      assert(s0(k)._1 === id && s0(k)._2 === seq, s"survivor $k changed lineage") }

    // MoR UPDATE on v3 → DV masks the old row, the reinserted row KEEPS
    // its _row_id with the updating commit's seq; untouched rows untouched
    spark.sql("UPDATE g.db.o_mor3 SET v = 'U' WHERE k >= 480") // seq 3
    t.refresh()
    assert(before.subsetOf(new graft.table.IceScan(t).planFiles()
      .map(_.file.filePath).toSet), "v3 MoR UPDATE must not rewrite data files")
    val s2 = state()
    assert(s2.size === 450)
    s2.foreach { case (k, (id, seq, v)) =>
      assert(id === s1(k)._1, s"MoR UPDATE renumbered row $k")
      if (k >= 480) { assert(v === "U"); assert(seq === 3L, s"updated row $k seq") }
      else assert(seq === s1(k)._2, s"carried row $k seq changed")
    }

    // MoR MERGE: matched update keeps ids, inserts get fresh ids
    spark.sql("""MERGE INTO g.db.o_mor3 t USING (SELECT id AS k FROM range(495, 510)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = 'M'
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, 'I')""") // seq 4
    val s3 = state()
    assert(s3.size === 460)
    (495L until 500L).foreach { k =>
      assert(s3(k)._1 === s2(k)._1, s"MERGE renumbered row $k")
      assert(s3(k)._2 === 4L && s3(k)._3 === "M")
    }
    (500L until 510L).foreach { k =>
      assert(s3(k)._3 === "I" && s3(k)._2 === 4L)
      assert(s3(k)._1 >= 500L, "inserted rows get fresh ids")
    }
    assert(s3.values.map(_._1).toSeq.distinct.size === s3.size, "ids stay unique")
    spark.sql("DROP TABLE g.db.o_mor3")
  }

  test("v3 merge-on-read SQL DELETE writes deletion vectors over ORC data files") {
    spark.sql("""CREATE TABLE g.db.o_morc (k BIGINT, v STRING)
      TBLPROPERTIES ('format-version'='3',
                     'write.format.default'='orc',
                     'write.delete.mode'='merge-on-read')""")
    spark.sql("INSERT INTO g.db.o_morc SELECT id, concat('v', id) FROM range(300)")
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.o_morc")
    val before = new graft.table.IceScan(t).planFiles()
    assert(before.forall(_.file.fileFormat.equalsIgnoreCase("ORC")),
      "fixture must actually write ORC data files")
    spark.sql("DELETE FROM g.db.o_morc WHERE k % 5 = 2")
    t.refresh()
    val tasks = new graft.table.IceScan(t).planFiles()
    assert(before.map(_.file.filePath).toSet.subsetOf(tasks.map(_.file.filePath).toSet),
      "MoR DELETE must not rewrite the ORC files")
    val dels = tasks.flatMap(_.deletes)
    assert(dels.nonEmpty && dels.forall(_.isDeletionVector))
    assert(spark.sql("SELECT count(*) FROM g.db.o_morc").head.getLong(0) === 240)
    // lineage still serves the ORC survivors through the DV mask
    val ids = spark.sql("SELECT _row_id FROM g.db.o_morc")
      .collect().map(_.getLong(0))
    assert(ids.length === 240 && ids.distinct.length === 240)
    spark.sql("DROP TABLE g.db.o_morc")
  }

  test("merge-on-read UPDATE composes with outstanding deletes and stacks") {
    spark.sql("""CREATE TABLE g.db.o_mor_s (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)
      TBLPROPERTIES ('write.update.mode'='merge-on-read',
                     'write.delete.mode'='merge-on-read')""")
    orders.limit(1000).createOrReplaceTempView("o_mor_s_src")
    spark.sql("INSERT INTO g.db.o_mor_s SELECT * FROM o_mor_s_src")
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.o_mor_s")
    // pre-existing library-written position deletes…
    t.deletePositional("o_orderkey <= 50")
    // …then TWO stacked SQL MoR updates: the second must not resurrect
    // rows the first already masked, and neither may touch deleted rows
    spark.sql("UPDATE g.db.o_mor_s SET o_totalprice = -1.0 WHERE o_orderkey % 3 = 0")
    spark.sql("UPDATE g.db.o_mor_s SET o_totalprice = -2.0 " +
      "WHERE o_orderkey % 3 = 0 AND o_orderkey % 2 = 0")
    val base = orders.limit(1000).filter(col("o_orderkey") > 50)
    val want = base
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 6 === 0, lit(-2.0))
          .when(col("o_orderkey") % 3 === 0, lit(-1.0))
          .otherwise(col("o_totalprice")))
    assert(spark.sql("SELECT count(*) FROM g.db.o_mor_s").head().getLong(0) ===
      base.count())
    val got = spark.sql("SELECT o_orderkey, o_totalprice FROM g.db.o_mor_s " +
      "ORDER BY o_orderkey").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exp = want.select("o_orderkey", "o_totalprice").orderBy(col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === exp)
  }

  test("merge-on-read MERGE INTO deletes matched and appends inserts in one snapshot") {
    spark.sql("""CREATE TABLE g.db.o_mor_m (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)
      TBLPROPERTIES ('write.merge.mode'='merge-on-read')""")
    orders.filter(col("o_orderkey") <= 1000).createOrReplaceTempView("o_mor_m_base")
    spark.sql("INSERT INTO g.db.o_mor_m SELECT * FROM o_mor_m_base")
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.o_mor_m")
    val before = new graft.table.IceScan(t).planFiles().map(_.file.filePath).toSet
    val snapsBefore = t.metadata.snapshots.size
    orders.filter(col("o_orderkey") > 500)
      .withColumn("o_orderstatus", lit("M")).createOrReplaceTempView("o_mor_m_src")
    spark.sql("""MERGE INTO g.db.o_mor_m t USING o_mor_m_src s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    t.refresh()
    assert(t.metadata.snapshots.size === snapsBefore + 1, "one snapshot for the whole MERGE")
    assert(before.subsetOf(
      new graft.table.IceScan(t).planFiles().map(_.file.filePath).toSet))
    val got = spark.sql("SELECT * FROM g.db.o_mor_m ORDER BY o_orderkey")
      .collect().map(_.toString).toSeq
    val want = orders.filter(col("o_orderkey") <= 500)
      .unionByName(orders.filter(col("o_orderkey") > 500)
        .withColumn("o_orderstatus", lit("M")))
      .orderBy(col("o_orderkey")).collect().map(_.toString).toSeq
    assert(got === want)
  }

  test("merge-on-read DELETE WHERE: position deletes for partial files, metadata drop for whole partitions") {
    spark.sql("""CREATE TABLE g.db.o_mor_d (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)
      PARTITIONED BY (o_orderstatus)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    orders.createOrReplaceTempView("o_mor_d_src")
    spark.sql("INSERT INTO g.db.o_mor_d SELECT * FROM o_mor_d_src")
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.o_mor_d")
    val before = new graft.table.IceScan(t).planFiles().map(_.file.filePath).toSet

    // partial-file delete (pushable range predicate) → position deletes,
    // original files survive
    spark.sql("DELETE FROM g.db.o_mor_d WHERE o_orderkey <= 100")
    t.refresh()
    val afterPartial = new graft.table.IceScan(t).planFiles()
    assert(before.subsetOf(afterPartial.map(_.file.filePath).toSet),
      "merge-on-read DELETE must not rewrite partially-matched files")
    assert(afterPartial.exists(_.deletes.nonEmpty))
    assert(spark.sql("SELECT count(*) FROM g.db.o_mor_d").head().getLong(0) ===
      orders.filter(col("o_orderkey") > 100).count())

    // whole-partition delete → METADATA-ONLY file drops, no delete rows
    val delFilesBefore = t.metadata.currentSnapshot.get
    spark.sql("DELETE FROM g.db.o_mor_d WHERE o_orderstatus = 'F'")
    t.refresh()
    val afterWhole = new graft.table.IceScan(t).planFiles()
    assert(afterWhole.forall(t2 => !t2.file.filePath.contains("o_orderstatus=F")))
    assert(spark.sql("SELECT count(*) FROM g.db.o_mor_d").head().getLong(0) ===
      orders.filter(col("o_orderkey") > 100 && col("o_orderstatus") =!= "F").count())
  }

  test("_file and _pos metadata columns are selectable") {
    spark.sql("""CREATE TABLE g.db.o_meta (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)""")
    orders.limit(100).createOrReplaceTempView("o_meta_src")
    spark.sql("INSERT INTO g.db.o_meta SELECT * FROM o_meta_src")
    val rows = spark.sql(
      "SELECT o_orderkey, _file, _pos FROM g.db.o_meta ORDER BY _file, _pos").collect()
    assert(rows.length === 100)
    assert(rows.forall(_.getString(1).endsWith(".parquet")))
    // positions are the 0-based file row index, unique per file
    val byFile = rows.groupBy(_.getString(1))
    byFile.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).toSeq === (0L until rs.length).toSeq)
    }
  }

  test("_row_id/_last_updated_sequence_number metadata columns on v3 tables") {
    spark.sql("""CREATE TABLE g.db.o_lin (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)
      TBLPROPERTIES ('format-version'='3')""")
    val t0 = new HadoopCatalog(warehouse, spark).loadTable("db.o_lin")
    assert(t0.metadata.formatVersion === 3)
    assert(!t0.metadata.properties.contains("format-version"))
    orders.limit(120).repartition(1).createOrReplaceTempView("o_lin_src")
    spark.sql("INSERT INTO g.db.o_lin SELECT * FROM o_lin_src")
    val rows = spark.sql(
      """SELECT o_orderkey, _row_id, _last_updated_sequence_number
        |FROM g.db.o_lin ORDER BY _row_id""".stripMargin).collect()
    assert(rows.length === 120)
    assert(rows.map(_.getLong(1)).toSeq === (0L until 120L))
    assert(rows.forall(_.getLong(2) === 1L))
    // SQL face agrees with the library lineage scan row for row
    val lib = t0.refresh().scan.toDFWithLineage
      .select(col("o_orderkey"), col("_row_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(lib(r.getLong(0)) === r.getLong(1)))
    // ids survive a copy-on-write compaction THROUGH SQL (materialized
    // lineage columns read back via the metadata-column path)
    spark.sql("INSERT INTO g.db.o_lin SELECT * FROM o_lin_src LIMIT 7")
    val before = spark.sql("SELECT o_orderkey, _pos, _row_id FROM g.db.o_lin")
      .collect().map(r => r.getLong(2)).sorted.toSeq
    val (rew, _) = new HadoopCatalog(warehouse, spark).loadTable("db.o_lin")
      .rewriteDataFiles(1L << 30)
    assert(rew > 0)
    val after = spark.sql("SELECT _row_id FROM g.db.o_lin")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after === before, "compaction must not renumber _row_id on the SQL face")
    spark.sql("DROP TABLE g.db.o_lin")
  }

  test("lineage SQL scans keep partition pruning and filter pushdown") {
    // emitLineage forces the row-reader path (disables the all-columnar
    // fast path) — this pins that PLANNING is unaffected: a lineage SELECT
    // with a partition predicate still plans only the matching partition's
    // files and only opens its manifests' entries
    spark.sql("""CREATE TABLE g.db.o_linp (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)
      PARTITIONED BY (o_orderpriority)
      TBLPROPERTIES ('format-version'='3')""")
    orders.limit(400).createOrReplaceTempView("o_linp_src")
    spark.sql("INSERT INTO g.db.o_linp SELECT * FROM o_linp_src")
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.o_linp")
    val totalFiles = t.scan.planFiles().size
    assert(totalFiles >= 5, s"need one file per priority, got $totalFiles")
    val urgentFiles = t.scan("o_orderpriority = '1-URGENT'").planFiles().size

    graft.spark.GraftScan.lastPlannedPartitions = -1
    val rows = spark.sql(
      """SELECT o_orderkey, _row_id, _last_updated_sequence_number
        |FROM g.db.o_linp WHERE o_orderpriority = '1-URGENT'
        |ORDER BY _row_id""".stripMargin).collect()
    assert(rows.nonEmpty)
    assert(graft.spark.GraftScan.lastPlannedPartitions === urgentFiles,
      s"lineage scan planned ${graft.spark.GraftScan.lastPlannedPartitions} " +
        s"partitions; partition pruning should leave $urgentFiles of $totalFiles")
    // values agree with the engine lineage scan (absolute positions kept
    // under the filter)
    val lib = t.scan("o_orderpriority = '1-URGENT'").toDFWithLineage
      .select(col("o_orderkey"), col("_row_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length === lib.size)
    rows.foreach(r => assert(lib(r.getLong(0)) === r.getLong(1)))
    spark.sql("DROP TABLE g.db.o_linp")
  }

  test("SQL UPDATE/MERGE preserve row ids and bump only updated rows' seq (v3)") {
    spark.sql("""CREATE TABLE g.db.lin_dml (k BIGINT, v STRING)
      TBLPROPERTIES ('format-version'='3')""")
    spark.sql("INSERT INTO g.db.lin_dml SELECT id, concat('v', id) FROM range(20)")
    def state(): Map[Long, (Long, Long, String)] =
      spark.sql("SELECT k, _row_id, _last_updated_sequence_number, v FROM g.db.lin_dml")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val s0 = state()
    assert(s0.values.map(_._1).toSeq.sorted === (0L until 20L), "dense initial ids")

    spark.sql("UPDATE g.db.lin_dml SET v = 'U' WHERE k >= 15") // seq 2
    val s1 = state()
    (0L until 20L).foreach { k =>
      assert(s1(k)._1 === s0(k)._1, s"UPDATE must not renumber row k=$k")
      if (k >= 15) assert(s1(k)._2 === 2L, s"updated row k=$k must carry the new seq")
      else assert(s1(k)._2 === s0(k)._2, s"carried row k=$k must keep its seq")
    }

    spark.sql("""MERGE INTO g.db.lin_dml t USING (SELECT id AS k FROM range(18, 25)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = 'M'
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, 'I')""") // seq 3
    val s2 = state()
    (0L until 20L).foreach { k =>
      assert(s2(k)._1 === s1(k)._1, s"MERGE must not renumber row k=$k")
      if (k >= 18) assert(s2(k)._2 === 3L, s"merged row k=$k must carry the new seq")
      else assert(s2(k)._2 === s1(k)._2, s"carried row k=$k must keep its seq")
    }
    (20L until 25L).foreach { k =>
      assert(s2(k)._3 === "I")
      assert(s2(k)._2 === 3L, "inserted rows inherit the commit seq")
      assert(s2(k)._1 >= 20L, "inserted rows get fresh ids")
    }
    assert(s2.values.map(_._1).toSeq.distinct.size === s2.size, "ids stay unique")
    spark.sql("DROP TABLE g.db.lin_dml")
  }

  test("partitioned v3 SQL UPDATE: only matched partitions rewrite, lineage survives") {
    spark.sql("""CREATE TABLE g.db.lin_pdml (k BIGINT, p STRING, v STRING)
      PARTITIONED BY (p) TBLPROPERTIES ('format-version'='3')""")
    spark.sql("""INSERT INTO g.db.lin_pdml
      SELECT id, concat('p', id % 4), concat('v', id) FROM range(400)""")
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.lin_pdml")
    val before = new graft.table.IceScan(t).planFiles().map(_.file.filePath).toSet
    def state(): Map[Long, (Long, Long, String)] =
      spark.sql("SELECT k, _row_id, _last_updated_sequence_number, v FROM g.db.lin_pdml")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val s0 = state()
    assert(s0.values.map(_._1).toSeq.sorted === (0L until 400L))
    // partition-aligned predicate: the CoW groups must be ONLY p1's files
    spark.sql("UPDATE g.db.lin_pdml SET v = 'U' WHERE p = 'p1' AND k < 100") // seq 2
    t.refresh()
    val after = new graft.table.IceScan(t).planFiles().map(_.file.filePath).toSet
    val untouched = before.filterNot(_.contains("_p_p=p1"))
    assert(untouched.subsetOf(after),
      "partitions other than p1 must not be rewritten by a p1-scoped UPDATE")
    val s1 = state()
    assert(s1.size === 400)
    (0L until 400L).foreach { k =>
      assert(s1(k)._1 === s0(k)._1, s"UPDATE renumbered row $k")
      if (k % 4 == 1 && k < 100) assert(s1(k)._2 === 2L && s1(k)._3 === "U")
      else assert(s1(k)._2 === s0(k)._2, s"carried row $k seq changed")
    }
    spark.sql("DROP TABLE g.db.lin_pdml")
  }

  test("lineage metadata columns are absent on v2 tables") {
    spark.sql("CREATE TABLE g.db.o_lin2 (k BIGINT)")
    spark.sql("INSERT INTO g.db.o_lin2 VALUES (1), (2)")
    val e = intercept[Exception](
      spark.sql("SELECT _row_id FROM g.db.o_lin2").collect())
    assert(e.getMessage.toLowerCase.contains("_row_id") ||
      e.getMessage.toLowerCase.contains("cannot resolve"))
    spark.sql("DROP TABLE g.db.o_lin2")
  }

  test("DELETE with a non-pushable predicate rewrites via row-level op") {
    spark.sql("""CREATE TABLE g.db.o_rldel (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)""")
    orders.createOrReplaceTempView("o_rldel_src")
    spark.sql("INSERT INTO g.db.o_rldel SELECT * FROM o_rldel_src")
    // modulo arithmetic has no sources.Filter form → canDeleteWhere is
    // false → Spark MUST take the copy-on-write rewrite
    spark.sql("DELETE FROM g.db.o_rldel WHERE o_orderkey % 5 = 0")
    assert(spark.sql("SELECT count(*) FROM g.db.o_rldel").head().getLong(0) ===
      orders.filter(col("o_orderkey") % 5 =!= 0).count())
  }

  test("changes table + change-range options match incremental scan semantics") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("""CREATE TABLE g.db.o_chg (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)""")
    orders.limit(100).createOrReplaceTempView("o_chg_1")
    spark.sql("INSERT INTO g.db.o_chg SELECT * FROM o_chg_1")
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.o_chg")
    val s1 = t.metadata.currentSnapshotId.get
    orders.filter(col("o_orderkey") > 100).limit(50).createOrReplaceTempView("o_chg_2")
    spark.sql("INSERT INTO g.db.o_chg SELECT * FROM o_chg_2")
    // SQL face: full feed from table start
    assert(spark.sql("SELECT count(*) FROM g.db.o_chg.changes").head().getLong(0) === 150L)
    // options face: bounded range = rows appended after s1
    val ranged = spark.read.format("graft")
      .option("warehouse", warehouse).option("table", "db.o_chg")
      .option("change-range-from", s1.toString).load()
    assert(ranged.count() === 50L)
    assert(ranged.filter(col("o_orderkey") <= 100).count() === 0L)
    // from == to → empty batch (matches the streaming source's offsets)
    val empty = spark.read.format("graft")
      .option("warehouse", warehouse).option("table", "db.o_chg")
      .option("change-range-from", s1.toString)
      .option("change-range-to", s1.toString).load()
    assert(empty.count() === 0L)
  }

  test("VERSION AS OF and TIMESTAMP AS OF read older snapshots") {
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.orders")
    val snaps = t.metadata.snapshots.sortBy(_.timestampMs)
    assert(snaps.size === 2) // insert, delete
    val first = snaps.head
    assert(spark.sql(s"SELECT * FROM g.db.orders VERSION AS OF ${first.snapshotId}")
      .count() === orders.count())
    // a tag resolves as a version string too
    t.manageSnapshots.createTag("pre-delete", first.snapshotId)
    assert(spark.sql("SELECT * FROM g.db.orders VERSION AS OF 'pre-delete'")
      .count() === orders.count())
    // timestamp pin: just after the first commit
    val tsExpr = s"TIMESTAMP'${new java.sql.Timestamp(first.timestampMs)}'"
    assert(spark.sql(s"SELECT * FROM g.db.orders TIMESTAMP AS OF $tsExpr")
      .count() === orders.count())
  }

  test("INSERT OVERWRITE truncates then writes (static mode)") {
    spark.sql("""CREATE TABLE g.db.small (k BIGINT, v STRING)""")
    spark.sql("INSERT INTO g.db.small VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE g.db.small VALUES (3, 'c')")
    val rows = spark.sql("SELECT k, v FROM g.db.small").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSet === Set((3L, "c")))
  }

  test("dynamic partition overwrite replaces only touched partitions") {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("""CREATE TABLE g.db.dyn (k BIGINT, p STRING) PARTITIONED BY (p)""")
      spark.sql("INSERT INTO g.db.dyn VALUES (1, 'x'), (2, 'y')")
      spark.sql("INSERT OVERWRITE g.db.dyn VALUES (9, 'x')")
      val rows = spark.sql("SELECT k, p FROM g.db.dyn").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows === Set((9L, "x"), (2L, "y"))) // 'y' untouched
      // r12: the DSv2 dynamic overwrite direct-commits its routed staged
      // files (partition tuples from the harvest, no read-back)
      val t = new HadoopCatalog(warehouse, spark).loadTable("db.dyn")
      val xFiles = t.scan.planFiles().map(_.file)
        .filter(_.partition.headOption.contains("x"))
      assert(xFiles.nonEmpty && xFiles.forall(_.filePath.contains("/data/dyn-")),
        s"overwrite replacement must be direct-committed: ${xFiles.map(_.filePath)}")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
  }

  test("ALTER TABLE: columns and properties evolve the schema") {
    spark.sql("ALTER TABLE g.db.small ADD COLUMN note STRING")
    spark.sql("ALTER TABLE g.db.small RENAME COLUMN v TO val")
    spark.sql("ALTER TABLE g.db.small SET TBLPROPERTIES ('owner.team' = 'data')")
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.small")
    assert(t.schema.fields.map(_.name) === Seq("k", "val", "note"))
    assert(t.metadata.properties("owner.team") === "data")
    // old rows read with null-filled new column and renamed projection
    val r = spark.sql("SELECT k, val, note FROM g.db.small").collect()
    assert(r.map(_.getLong(0)).toSet === Set(3L))
    assert(r.forall(_.isNullAt(2)))
    spark.sql("ALTER TABLE g.db.small DROP COLUMN note")
    assert(new HadoopCatalog(warehouse, spark).loadTable("db.small")
      .schema.fields.map(_.name) === Seq("k", "val"))
  }

  test("CTAS creates and populates in one statement") {
    spark.sql("""CREATE TABLE g.db.ctas AS
      SELECT o_orderkey AS k, o_totalprice AS price FROM g.db.orders""")
    assert(spark.sql("SELECT * FROM g.db.ctas").count() ===
      spark.sql("SELECT * FROM g.db.orders").count())
  }

  test("SHOW TABLES / DROP TABLE / namespaces") {
    val names = spark.sql("SHOW TABLES IN g.db").collect().map(_.getString(1)).toSet
    assert(Set("orders", "small", "dyn", "ctas").subsetOf(names))
    spark.sql("DROP TABLE g.db.ctas")
    assert(!spark.sql("SHOW TABLES IN g.db").collect().map(_.getString(1))
      .contains("ctas"))
    spark.sql("CREATE NAMESPACE g.tmpns")
    assert(spark.sql("SHOW NAMESPACES IN g").collect().map(_.getString(0))
      .contains("tmpns"))
    spark.sql("DROP NAMESPACE g.tmpns")
  }

  test("writes to a time-travel pin are rejected") {
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.orders")
    val first = t.metadata.snapshots.minBy(_.timestampMs)
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO g.db.orders VERSION AS OF ${first.snapshotId} VALUES " +
        "(1, 1, 'O', 1.0, TIMESTAMP'2020-01-01', 'x')")
    }
    assert(e.getMessage != null)
  }

  test("co-bucketed tables join without a shuffle (storage-partitioned join)") {
    spark.sql("""CREATE TABLE g.db.spj_a (k BIGINT, v DOUBLE)
      PARTITIONED BY (bucket(4, k))""")
    spark.sql("""CREATE TABLE g.db.spj_b (k BIGINT, w STRING)
      PARTITIONED BY (bucket(4, k))""")
    import spark.implicits._
    (1L to 400L).map(i => (i, i * 0.5)).toDF("k", "v")
      .createOrReplaceTempView("spj_src_a")
    (1L to 400L).filter(_ % 2 == 0).map(i => (i, s"s$i")).toDF("k", "w")
      .createOrReplaceTempView("spj_src_b")
    spark.sql("INSERT INTO g.db.spj_a SELECT * FROM spj_src_a")
    spark.sql("INSERT INTO g.db.spj_b SELECT * FROM spj_src_b")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a non-broadcast join
      "spark.sql.adaptive.enabled" -> "false") // deterministic plan to inspect
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = spark.sql(
        """SELECT a.k, a.v, b.w FROM g.db.spj_a a JOIN g.db.spj_b b ON a.k = b.k""")
      assert(joined.count() === 200)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed tables must join with NO shuffle on either side:\n${plan.take(2000)}")
      // values survive the grouped read
      assert(joined.agg(sum(col("k"))).head().getLong(0) ===
        (1L to 400L).filter(_ % 2 == 0).sum)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("metadata tables readable through SQL") {
    // db.orders was created + appended by the first test
    val snaps = spark.sql("SELECT snapshot_id, operation FROM g.db.orders.snapshots")
      .collect()
    assert(snaps.nonEmpty)
    assert(snaps.map(_.getString(1)).forall(Set("append", "overwrite", "delete", "replace")))
    val files = spark.sql(
      "SELECT file_path, record_count FROM g.db.orders.files ORDER BY file_path").collect()
    assert(files.nonEmpty)
    val parts = spark.sql(
      "SELECT record_count FROM g.db.orders.partitions").collect()
    assert(parts.map(_.getLong(0)).sum === spark.sql("SELECT count(*) FROM g.db.orders")
      .head().getLong(0))
    // history joins snapshots; unknown suffixes still error cleanly
    assert(spark.sql("SELECT * FROM g.db.orders.history").count() >= 1)
    // all_data_files + all_delete_files partition all_files by content
    val allN = spark.sql("SELECT * FROM g.db.orders.all_files").count()
    assert(allN === spark.sql("SELECT * FROM g.db.orders.all_data_files").count() +
      spark.sql("SELECT * FROM g.db.orders.all_delete_files").count())
    // position_deletes decodes delete CONTENT; db.orders carries deletes
    // from the DELETE WHERE test, unless that ran copy-on-write — in
    // either case the query must answer (possibly empty)
    val pdN = spark.sql("SELECT * FROM g.db.orders.position_deletes").count()
    assert(pdN >= 0)
    // changelog: every row ever inserted appears with a change type
    val cl = spark.sql(
      "SELECT _change_type, count(*) AS n FROM g.db.orders.changelog GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cl.getOrElse("insert", 0L) > 0)
    // snapshot-aware metadata tables accept VERSION AS OF
    val t0 = new HadoopCatalog(warehouse, spark).loadTable("db.orders")
    val firstSnap = t0.metadata.snapshots.head.snapshotId
    val filesThen = spark.sql(
      s"SELECT * FROM g.db.orders.files VERSION AS OF $firstSnap").count()
    assert(filesThen >= 1)
    assert(spark.sql(
      s"SELECT * FROM g.db.orders.entries VERSION AS OF $firstSnap").count() === filesThen)
    // version-invariant tables reject it loudly
    intercept[Exception](spark.sql(
      s"SELECT * FROM g.db.orders.snapshots VERSION AS OF $firstSnap").collect())
    intercept[Exception](spark.sql("SELECT * FROM g.db.orders.nope").collect())
  }

  test("storage-partitioned join survives AQE") {
    // same co-bucketed pair as above, but with AQE ON (the production
    // default): the key-grouped plan must still carry no shuffle
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = spark.sql(
        "SELECT a.k, b.w FROM g.db.spj_a a JOIN g.db.spj_b b ON a.k = b.k")
      assert(joined.count() === 200)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"SPJ under AQE must not shuffle:\n${plan.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("catalog V2 transform functions agree with engine transforms") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier}
    import org.apache.spark.unsafe.types.UTF8String
    val fc = spark.sessionState.catalogManager.catalog("g").asInstanceOf[FunctionCatalog]
    assert(fc.functionExists(Identifier.of(Array("db"), "bucket")))

    def scalar(name: String, input: StructType) =
      fc.loadFunction(Identifier.of(Array.empty[String], name)).bind(input)
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Any]]

    // bucket over long/string matches the engine's spec murmur3
    val bLong = scalar("bucket", StructType(Seq(
      StructField("n", IntegerType), StructField("v", LongType))))
    for (v <- Seq(0L, 1L, -57L, 1234567890123L))
      assert(bLong.produceResult(InternalRow(16, v)) ===
        graft.core.BucketTransform(16).apply(v, graft.core.ILong))
    val bStr = scalar("bucket", StructType(Seq(
      StructField("n", IntegerType), StructField("v", StringType))))
    for (v <- Seq("", "iceberg", "graft-ω"))
      assert(bStr.produceResult(InternalRow(8, UTF8String.fromString(v))) ===
        graft.core.BucketTransform(8).apply(v, graft.core.IString))

    // days over a date (int ordinal) is identity; truncate over string
    val dDate = scalar("days", StructType(Seq(StructField("v", DateType))))
    assert(dDate.produceResult(InternalRow(19000)) ===
      graft.core.DayTransform.apply(19000, graft.core.IDate))
    val tStr = scalar("truncate", StructType(Seq(
      StructField("w", IntegerType), StructField("v", StringType))))
    assert(tStr.produceResult(InternalRow(3, UTF8String.fromString("abcdef"))) ===
      UTF8String.fromString("abc"))
    // nulls propagate
    assert(bLong.produceResult(InternalRow(16, null)) === null)
  }

  test("CALL cdc_apply maintains an exactly-once replica via the SQL face") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("""CREATE TABLE g.db.ca_src (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('format-version'='3')""")
    spark.sql("""CREATE TABLE g.db.ca_rep (k BIGINT, v DOUBLE, _src_row_id BIGINT)
      TBLPROPERTIES ('format-version'='3')""")
    spark.sql("INSERT INTO g.db.ca_src SELECT id, id * 1.5 FROM range(100)")
    val r1 = spark.sql(
      "CALL g.system.cdc_apply(source => 'db.ca_src', replica => 'db.ca_rep')").head()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) === ((100L, 0L, 0L)))
    spark.sql("DELETE FROM g.db.ca_src WHERE k % 10 = 0")
    spark.sql("UPDATE g.db.ca_src SET v = v + 1 WHERE k % 10 = 1")
    spark.sql("INSERT INTO g.db.ca_src SELECT id, 0.0 FROM range(100, 120)")
    val r2 = spark.sql(
      "CALL g.system.cdc_apply(source => 'db.ca_src', replica => 'db.ca_rep')").head()
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) === ((20L, 10L, 10L)))
    // replica ≡ source, and the returned cursor is the source head
    assert(spark.sql("SELECT k, v FROM g.db.ca_rep EXCEPT ALL " +
      "SELECT k, v FROM g.db.ca_src").count() === 0L)
    assert(spark.table("g.db.ca_rep").count() === spark.table("g.db.ca_src").count())
    val srcHead = new HadoopCatalog(warehouse, spark).loadTable("db.ca_src")
      .metadata.currentSnapshotId.get
    assert(r2.getString(3) === srcHead.toString)
    // idle call: all zeros, no new replica snapshot
    val rep = new HadoopCatalog(warehouse, spark).loadTable("db.ca_rep")
    val snaps = rep.metadata.snapshots.size
    val r3 = spark.sql(
      "CALL g.system.cdc_apply(source => 'db.ca_src', replica => 'db.ca_rep')").head()
    assert((r3.getLong(0), r3.getLong(1), r3.getLong(2)) === ((0L, 0L, 0L)))
    assert(rep.refresh().metadata.snapshots.size === snaps)
  }

  test("CALL mv_create + mv_refresh keep a self-describing materialized " +
      "view fresh through the SQL face") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("""CREATE TABLE g.db.mv_src (g STRING, v BIGINT)
      TBLPROPERTIES ('format-version'='2')""")
    spark.sql("INSERT INTO g.db.mv_src VALUES " +
      "('a', 10), ('a', 30), ('a', 20), ('b', 5), ('b', 7)")
    val c = spark.sql("CALL g.system.mv_create(source => 'db.mv_src', " +
      "mv => 'db.mv_stats', keys => 'g', sums => 'v', mins => 'v', " +
      "maxs => 'v')").head()
    assert(c.getLong(0) === 2L) // two groups materialized
    def stats() = spark.sql(
      "SELECT g, cnt, s_v, mn_v, mx_v FROM g.db.mv_stats ORDER BY g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(stats() === Seq(("a", 3L, 60L, 10L, 30L), ("b", 2L, 12L, 5L, 7L)))
    // churn: a's max retires (hole), b gains a row
    spark.sql("DELETE FROM g.db.mv_src WHERE v = 30")
    spark.sql("INSERT INTO g.db.mv_src VALUES ('b', 1)")
    val r = spark.sql("CALL g.system.mv_refresh(source => 'db.mv_src', " +
      "mv => 'db.mv_stats')").head()
    assert((r.getLong(0), r.getLong(1)) === ((2L, 0L)))
    assert(stats() === Seq(("a", 2L, 30L, 10L, 20L), ("b", 3L, 13L, 1L, 7L)))
    // replay: no-op, cursor unchanged, no new MV snapshot
    val mv = new HadoopCatalog(warehouse, spark).loadTable("db.mv_stats")
    val snaps = mv.metadata.snapshots.size
    val r2 = spark.sql("CALL g.system.mv_refresh(source => 'db.mv_src', " +
      "mv => 'db.mv_stats')").head()
    assert((r2.getLong(0), r2.getLong(1)) === ((0L, 0L)))
    assert(mv.refresh().metadata.snapshots.size === snaps)
    assert(r2.getString(2) === new HadoopCatalog(warehouse, spark)
      .loadTable("db.mv_src").metadata.currentSnapshotId.get.toString)
  }

  test("CALL mv_refresh_all refreshes N MVs over one source, one row per " +
      "MV, exactly-once cursors") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("""CREATE TABLE g.db.mva_src (g STRING, v BIGINT)
      TBLPROPERTIES ('format-version'='2')""")
    spark.sql("INSERT INTO g.db.mva_src VALUES ('a', 10), ('a', 30), ('b', 5)")
    spark.sql("CALL g.system.mv_create(source => 'db.mva_src', " +
      "mv => 'db.mva_1', keys => 'g', sums => 'v')")
    spark.sql("CALL g.system.mv_create(source => 'db.mva_src', " +
      "mv => 'db.mva_2', keys => 'g', mins => 'v', maxs => 'v')")
    spark.sql("DELETE FROM g.db.mva_src WHERE v = 30")
    spark.sql("INSERT INTO g.db.mva_src VALUES ('b', 7)")
    val rows = spark.sql("CALL g.system.mv_refresh_all(" +
      "source => 'db.mva_src', mvs => 'db.mva_1,db.mva_2')")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq(("db.mva_1", 2L, 0L), ("db.mva_2", 2L, 0L)))
    assert(spark.sql("SELECT g, cnt, s_v FROM g.db.mva_1 ORDER BY g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq(("a", 1L, 10L), ("b", 2L, 12L)))
    assert(spark.sql("SELECT g, mn_v, mx_v FROM g.db.mva_2 ORDER BY g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq(("a", 10L, 10L), ("b", 5L, 7L)))
    // replay: all no-op
    val rows2 = spark.sql("CALL g.system.mv_refresh_all(" +
      "source => 'db.mva_src', mvs => 'db.mva_1,db.mva_2')")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows2.toSeq === Seq((0L, 0L), (0L, 0L)))
  }

  test("CALL mv_join_create + mv_join_refresh keep a two-cursor join MV " +
      "fresh through the SQL face") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("""CREATE TABLE g.db.mvj_fact (id BIGINT, fk BIGINT, v BIGINT)
      TBLPROPERTIES ('format-version'='2')""")
    spark.sql("""CREATE TABLE g.db.mvj_dim (pk BIGINT, seg STRING)
      TBLPROPERTIES ('format-version'='2')""")
    spark.sql("INSERT INTO g.db.mvj_fact VALUES (1, 1, 10), (2, 1, 30), (3, 2, 5)")
    spark.sql("INSERT INTO g.db.mvj_dim VALUES (1, 'a'), (2, 'b')")
    val c = spark.sql("CALL g.system.mv_join_create(fact => 'db.mvj_fact', " +
      "dim => 'db.mvj_dim', mv => 'db.mvj_stats', fact_keys => 'fk', " +
      "dim_keys => 'pk', keys => 'seg', sums => 'v', mins => 'v', " +
      "maxs => 'v')").head()
    assert(c.getLong(0) === 2L)
    def stats() = spark.sql(
      "SELECT seg, cnt, s_v, mn_v, mx_v FROM g.db.mvj_stats ORDER BY seg")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(stats() === Seq(("a", 2L, 40L, 10L, 30L), ("b", 1L, 5L, 5L, 5L)))
    // churn BOTH sides: a's max retires; pk 2 moves b→a
    spark.sql("DELETE FROM g.db.mvj_fact WHERE id = 2")
    spark.sql("UPDATE g.db.mvj_dim SET seg = 'a' WHERE pk = 2")
    val r = spark.sql("CALL g.system.mv_join_refresh(fact => 'db.mvj_fact', " +
      "dim => 'db.mvj_dim', mv => 'db.mvj_stats')").head()
    assert((r.getLong(0), r.getLong(1)) === ((1L, 1L)))
    assert(stats() === Seq(("a", 2L, 15L, 5L, 10L)))
    // replay: no-op, both cursors at the source heads, no new MV snapshot
    val mv = new HadoopCatalog(warehouse, spark).loadTable("db.mvj_stats")
    val snaps = mv.metadata.snapshots.size
    val r2 = spark.sql("CALL g.system.mv_join_refresh(fact => 'db.mvj_fact', " +
      "dim => 'db.mvj_dim', mv => 'db.mvj_stats')").head()
    assert((r2.getLong(0), r2.getLong(1)) === ((0L, 0L)))
    assert(mv.refresh().metadata.snapshots.size === snaps)
    val hc = new HadoopCatalog(warehouse, spark)
    assert(r2.getString(2) ===
      hc.loadTable("db.mvj_fact").metadata.currentSnapshotId.get.toString)
    assert(r2.getString(3) ===
      hc.loadTable("db.mvj_dim").metadata.currentSnapshotId.get.toString)
  }

  test("CALL mv_topk_create + mv_topk_refresh keep a top-k rank MV fresh " +
      "through the SQL face") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("""CREATE TABLE g.db.mvt_src (g STRING, id BIGINT, score BIGINT)
      TBLPROPERTIES ('format-version'='2')""")
    spark.sql("INSERT INTO g.db.mvt_src VALUES " +
      "('a', 1, 50), ('a', 2, 40), ('a', 3, 30), ('b', 4, 5)")
    val c = spark.sql("CALL g.system.mv_topk_create(source => 'db.mvt_src', " +
      "mv => 'db.mvt_top', keys => 'g', ord => 'score', id => 'id', " +
      "k => 2)").head()
    assert(c.getLong(0) === 3L) // 2 rows of a + 1 of b
    def top() = spark.sql(
      "SELECT g, id, score FROM g.db.mvt_top ORDER BY g, id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(top() === Seq(("a", 1L, 50L), ("a", 2L, 40L), ("b", 4L, 5L)))
    // kill a's top row: the unseen id 3 promotes from the base
    spark.sql("DELETE FROM g.db.mvt_src WHERE id = 1")
    val r = spark.sql("CALL g.system.mv_topk_refresh(" +
      "source => 'db.mvt_src', mv => 'db.mvt_top')").head()
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert(top() === Seq(("a", 2L, 40L), ("a", 3L, 30L), ("b", 4L, 5L)))
    // replay: no-op, cursor at the source head
    val r2 = spark.sql("CALL g.system.mv_topk_refresh(" +
      "source => 'db.mvt_src', mv => 'db.mvt_top')").head()
    assert((r2.getLong(0), r2.getLong(1)) === ((0L, 0L)))
    assert(r2.getString(2) === new HadoopCatalog(warehouse, spark)
      .loadTable("db.mvt_src").metadata.currentSnapshotId.get.toString)
  }

  test("CALL procedures: rewrite_data_files, expire_snapshots, rollback, orphan GC") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("""CREATE TABLE g.db.o_proc (
        o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
        o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING)""")
    orders.limit(200).createOrReplaceTempView("o_proc_src")
    // several small appends → compactable small files + expirable history
    (1 to 3).foreach(_ =>
      spark.sql("INSERT INTO g.db.o_proc SELECT * FROM o_proc_src"))
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.o_proc")
    val s1 = t.metadata.currentSnapshotId.get

    val rw = spark.sql("CALL g.system.rewrite_data_files(table => 'db.o_proc')").collect()
    assert(rw.length === 1 && rw.head.getInt(0) >= 2,
      "small files must compact")
    t.refresh()
    assert(t.scan.toDF.count() === 600)

    // rollback to the pre-compaction snapshot and forward again via its id
    val rb = spark.sql(
      s"CALL g.system.rollback_to_snapshot(table => 'db.o_proc', snapshot_id => $s1)")
      .collect()
    assert(rb.head.getLong(1) === s1)
    t.refresh()
    assert(t.metadata.currentSnapshotId === Some(s1))
    assert(spark.sql("SELECT count(*) FROM g.db.o_proc").head().getLong(0) === 600)

    // expire everything but the newest; clean_files reclaims storage
    val exp = spark.sql(
      "CALL g.system.expire_snapshots(table => 'db.o_proc')").collect()
    assert(exp.nonEmpty, "older snapshots must expire")
    t.refresh()
    assert(t.scan.toDF.count() === 600)

    // orphan GC: plant a stray file, horizon in the future catches it
    val stray = new java.io.File(s"${t.location}/data/stray-proc.parquet")
    java.nio.file.Files.write(stray.toPath, Array[Byte](1, 2, 3))
    val removed = spark.sql(
      s"""CALL g.system.remove_orphan_files(table => 'db.o_proc',
         |older_than_ms => ${System.currentTimeMillis() + 60000})""".stripMargin)
      .collect().map(_.getString(0))
    assert(removed.exists(_.endsWith("stray-proc.parquet")))
    assert(!stray.exists())
    assert(spark.sql("SELECT count(*) FROM g.db.o_proc").head().getLong(0) === 600)

    // manifest compaction: the three INSERT manifests (pre-expiry history
    // notwithstanding, the current snapshot's list carries one manifest per
    // surviving commit) re-bin into target-size units
    (1 to 3).foreach(_ =>
      spark.sql("INSERT INTO g.db.o_proc SELECT * FROM o_proc_src"))
    t.refresh()
    val listBefore = graft.meta.ManifestIO
      .readManifestList(t.metadata.currentSnapshot.get.manifestList)
      .count(_.content == 0)
    assert(listBefore >= 3)
    val rm = spark.sql("CALL g.system.rewrite_manifests(table => 'db.o_proc')").collect()
    assert(rm.length === 1 && rm.head.getInt(0) >= 3 && rm.head.getInt(1) === 1)
    t.refresh()
    assert(graft.meta.ManifestIO
      .readManifestList(t.metadata.currentSnapshot.get.manifestList)
      .count(_.content == 0) === 1)
    assert(spark.sql("SELECT count(*) FROM g.db.o_proc").head().getLong(0) === 1200)

    // z-order via CALL: the zorder_by argument routes to
    // rewriteDataFilesZOrder (clustering quality is covered by ZOrderSpec)
    val zw = spark.sql(
      """CALL g.system.rewrite_data_files(table => 'db.o_proc',
        |zorder_by => 'o_orderkey,o_custkey')""".stripMargin).collect()
    assert(zw.length === 1 && zw.head.getInt(0) >= 1 && zw.head.getInt(1) >= 1)
    t.refresh()
    assert(spark.sql("SELECT count(*) FROM g.db.o_proc").head().getLong(0) === 1200)

    // rewrite_position_deletes binds and no-ops on a delete-free table
    // (the merge/dangling semantics are covered by TableSpec)
    val rpd = spark.sql(
      "CALL g.system.rewrite_position_deletes(table => 'db.o_proc')").collect()
    assert(rpd.length === 1 && rpd.head.getInt(0) === 0 && rpd.head.getInt(1) === 0)

    // compute_partition_stats writes + registers a partition-stats file
    // (needs a partitioned table — the unpartitioned o_proc is rejected)
    intercept[Exception](spark.sql(
      "CALL g.system.compute_partition_stats(table => 'db.o_proc')").collect())
    spark.sql("""CREATE TABLE g.db.o_proc_part PARTITIONED BY (o_orderstatus)
        AS SELECT * FROM o_proc_src""")
    val cps = spark.sql(
      "CALL g.system.compute_partition_stats(table => 'db.o_proc_part')").collect()
    assert(cps.length === 1 && cps.head.getLong(1) > 0)
    val tp = new HadoopCatalog(warehouse, spark).loadTable("db.o_proc_part")
    assert(tp.metadata.partitionStatistics.map(_.statisticsPath) ===
      Seq(cps.head.getString(0)))
    assert(spark.read.parquet(cps.head.getString(0))
      .agg(org.apache.spark.sql.functions.sum("data_record_count"))
      .head().getLong(0) === 200)

    // history.expire.* table properties drive the no-arg expire defaults:
    // retention window covers everything → nothing expires
    spark.sql("""ALTER TABLE g.db.o_proc SET TBLPROPERTIES (
        'history.expire.max-snapshot-age-ms' = '86400000',
        'history.expire.min-snapshots-to-keep' = '2')""")
    val exp2 = spark.sql(
      "CALL g.system.expire_snapshots(table => 'db.o_proc')").collect()
    assert(exp2.isEmpty, "fresh snapshots inside the retention window must survive")
  }

  test("SqlCatalog routing via uri option") {
    val dbDir = Files.createTempDirectory("gcat-jdbc").toString
    val wh2 = Files.createTempDirectory("gcat-wh2").toString
    spark.conf.set("spark.sql.catalog.gj", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gj.warehouse", wh2)
    spark.conf.set("spark.sql.catalog.gj.uri", s"jdbc:derby:$dbDir/meta;create=true")
    spark.sql("CREATE TABLE gj.t1 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gj.t1 VALUES (7, 'z')")
    assert(spark.sql("SELECT k FROM gj.t1").collect().map(_.getLong(0)).toSeq === Seq(7L))
    // the entry lives in the JDBC metastore, not a version-hint file
    val sql = new graft.catalog.SqlCatalog(s"jdbc:derby:$dbDir/meta", wh2, spark)
    assert(sql.tableExists("t1"))
  }

  test("branch tables bind the CURRENT schema after post-fork evolution") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.wap_ev (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.wap_ev VALUES (1, 'a')")
    val eng = new HadoopCatalog(warehouse, spark).loadTable("db.wap_ev")
    eng.manageSnapshots.createBranch("audit", eng.metadata.currentSnapshotId.get)
    // main's schema evolves AFTER the fork; branches share the table
    // schema (Iceberg semantics), so the branch face must follow
    spark.sql("ALTER TABLE g.db.wap_ev ADD COLUMN z DOUBLE")
    spark.sql("INSERT INTO g.db.wap_ev.branch_audit VALUES (2, 'b', 2.5)")
    val rows = spark.sql(
      "SELECT k, v, z FROM g.db.wap_ev.branch_audit ORDER BY k").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) === 2.5)
    // main still has only its own row, with the evolved schema
    assert(spark.sql("SELECT * FROM g.db.wap_ev").columns.length === 3)
    assert(spark.sql("SELECT * FROM g.db.wap_ev").count() === 1)
  }

  test("branch_/tag_ table names: SQL write-audit-publish") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.wap (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.wap VALUES (1, 'a'), (2, 'b')")
    val eng = new HadoopCatalog(warehouse, spark).loadTable("db.wap")
    val mainHead = eng.metadata.currentSnapshotId.get
    eng.manageSnapshots.createBranch("audit", mainHead)
    eng.manageSnapshots.createTag("rel", mainHead)

    // write lands on the branch, main stays put
    spark.sql("INSERT INTO g.db.wap.branch_audit VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM g.db.wap.branch_audit").count() === 3)
    assert(spark.sql("SELECT * FROM g.db.wap").count() === 2)
    // DELETE on the branch (CoW path)
    spark.sql("DELETE FROM g.db.wap.branch_audit WHERE k = 1")
    assert(spark.sql("SELECT k FROM g.db.wap.branch_audit ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 3L))
    assert(spark.sql("SELECT * FROM g.db.wap").count() === 2)

    // tag table reads the pinned state and rejects writes
    assert(spark.sql("SELECT * FROM g.db.wap.tag_rel").count() === 2)
    val e = intercept[Exception](
      spark.sql("INSERT INTO g.db.wap.tag_rel VALUES (9, 'x')"))
    assert(e.getMessage.contains("time-travel") || e.getMessage.contains("not found")
      || e.getMessage.toLowerCase.contains("tag"))

    // UPDATE and MERGE rewrite copy-on-write ON THE BRANCH
    spark.sql("UPDATE g.db.wap.branch_audit SET v = 'updated' WHERE k = 2")
    assert(spark.sql("SELECT v FROM g.db.wap.branch_audit WHERE k = 2")
      .collect().map(_.getString(0)).toSeq === Seq("updated"))
    spark.sql("""MERGE INTO g.db.wap.branch_audit t
      USING (SELECT 3L AS k, 'merged' AS v UNION ALL SELECT 4L, 'new') s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT k, v FROM g.db.wap.branch_audit ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((2L, "updated"), (3L, "merged"), (4L, "new")))
    // main STILL untouched by any of it
    assert(spark.sql("SELECT * FROM g.db.wap").count() === 2)

    // publish: fast-forward main to the audited branch
    eng.refresh()
    eng.manageSnapshots.fastForward("main", "audit")
    assert(spark.sql("SELECT k FROM g.db.wap ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 3L, 4L))
    // an unknown ref name still resolves to "no such table"
    val miss = intercept[Exception](spark.sql("SELECT * FROM g.db.wap.branch_nope"))
    assert(miss.getMessage.toUpperCase.contains("TABLE"))
  }

  test("CALL procedures: snapshot management, refs, register_table, add_files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    spark.sql("CREATE TABLE g.db.sm_proc (k BIGINT, v STRING)")
    spark.sql("INSERT INTO g.db.sm_proc VALUES (1, 'a'), (2, 'b')")
    Thread.sleep(5) // distinct snapshot timestamps for rollback_to_timestamp
    spark.sql("INSERT INTO g.db.sm_proc VALUES (3, 'c')")
    val t = new HadoopCatalog(warehouse, spark).loadTable("db.sm_proc")
    val snaps = t.metadata.snapshots
    val (s1, s2) = (snaps.head.snapshotId, snaps.last.snapshotId)

    // tags + branches become SQL-reachable through the procedure face
    val tag = spark.sql(
      s"CALL g.system.create_tag(table => 'db.sm_proc', tag => 'v1', snapshot_id => $s1)")
      .collect()
    assert(tag.head.getString(0) === "v1" && tag.head.getLong(1) === s1)
    spark.sql("CALL g.system.create_branch(table => 'db.sm_proc', branch => 'audit')")
    t.refresh()
    assert(t.metadata.refs("v1").refType === "tag")
    assert(t.metadata.refs("audit").snapshotId === s2)
    assert(spark.sql("SELECT count(*) FROM g.db.sm_proc VERSION AS OF 'v1'")
      .head.getLong(0) === 2)

    // set_current_snapshot back, then publish forward via fast_forward
    val sc = spark.sql(
      s"CALL g.system.set_current_snapshot(table => 'db.sm_proc', snapshot_id => $s1)")
      .collect()
    assert(sc.head.getLong(0) === s2 && sc.head.getLong(1) === s1)
    assert(spark.sql("SELECT count(*) FROM g.db.sm_proc").head.getLong(0) === 2)
    val ff = spark.sql(
      "CALL g.system.fast_forward(table => 'db.sm_proc', branch => 'main', to => 'audit')")
      .collect()
    assert(ff.head.getString(0) === "main" && ff.head.getLong(2) === s2)
    assert(spark.sql("SELECT count(*) FROM g.db.sm_proc").head.getLong(0) === 3)

    // rollback_to_timestamp: as-of the first snapshot's commit time
    spark.sql(s"CALL g.system.rollback_to_timestamp(table => 'db.sm_proc', " +
      s"timestamp_ms => ${snaps.head.timestampMs})")
    assert(spark.sql("SELECT count(*) FROM g.db.sm_proc").head.getLong(0) === 2)

    // remove_ref works for tags and refuses main
    spark.sql("CALL g.system.remove_ref(table => 'db.sm_proc', ref => 'v1')")
    t.refresh()
    assert(!t.metadata.refs.contains("v1"))
    intercept[Exception](spark.sql(
      "CALL g.system.remove_ref(table => 'db.sm_proc', ref => 'main')").collect())

    // add_files: register a foreign parquet file (twice must fail the dup check)
    val ext = Files.createTempDirectory("sm-ext").toString
    spark.range(3).selectExpr("id + 100 AS k", "CAST(id AS STRING) AS v")
      .coalesce(1).write.mode("overwrite").parquet(ext)
    val part = new java.io.File(ext).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get.getAbsolutePath
    val before = spark.sql("SELECT count(*) FROM g.db.sm_proc").head.getLong(0)
    val af = spark.sql(
      s"CALL g.system.add_files(table => 'db.sm_proc', files => '$part')").collect()
    assert(af.head.getLong(0) === 1)
    assert(spark.sql("SELECT count(*) FROM g.db.sm_proc").head.getLong(0) === before + 3)
    intercept[Exception](spark.sql(
      s"CALL g.system.add_files(table => 'db.sm_proc', files => '$part')").collect())

    // register_table: same metadata file under a new identifier
    val metaDir = new java.io.File(s"$warehouse/db/sm_proc/metadata")
    // numeric max, not lexicographic — v10 sorts before v9 as a string
    val metaFile = metaDir.listFiles().filter(_.getName.endsWith(".metadata.json"))
      .maxBy(_.getName.stripPrefix("v").takeWhile(_.isDigit).toInt).getAbsolutePath
    val reg = spark.sql("CALL g.system.register_table(table => 'db.sm_copy', " +
      s"metadata_file => '$metaFile')").collect()
    assert(!reg.head.isNullAt(0), "registered table has a current snapshot")
    assert(spark.sql("SELECT count(*) FROM g.db.sm_copy").head.getLong(0) === before + 3)
  }
}
