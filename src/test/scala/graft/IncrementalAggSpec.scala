package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IncrementalAgg
import graft.ops.IncrementalAgg.AggView

/** Generic incremental view maintenance: deterministic pins for every
  * maintenance shape (delta-exact count/sum, insert-side extremum
  * tighten, hole re-election, group death/birth, duplicate extrema,
  * null keys/values, re-elect invoked ONLY for hole groups) plus a
  * seeded differential fuzz against the from-scratch aggregate. */
class IncrementalAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val view = AggView(keys = Seq("g"), sums = Seq("v"),
    mins = Seq("v"), maxs = Seq("v"))

  private def df(rows: Seq[(String, java.lang.Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("g", "v")
  }

  private def batch(rows: Seq[(String, java.lang.Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("g", "v", "_change_type")
  }

  /** reElect over an explicit current base, recording the asked keys. */
  private def electorOver(base: DataFrame,
      asked: scala.collection.mutable.Set[String]): DataFrame => DataFrame =
    keys => {
      asked ++= keys.collect().map(r => String.valueOf(r.get(0)))
      base.join(keys, Seq("g"), "left_semi")
    }

  // Any-typed agg reads: a null sum/min/max must compare as NULL, not
  // unbox to 0 — the exact distinction the nn_<c> guard exists for
  private def stateMap(st: DataFrame): Map[String, (Long, Any, Any, Any)] =
    st.collect().map { r =>
      String.valueOf(r.getAs[Any]("g")) ->
        ((r.getAs[Long]("cnt"), r.getAs[Any]("s_v"),
          r.getAs[Any]("mn_v"), r.getAs[Any]("mx_v")))
    }.toMap

  test("count/sum are delta-exact and min/max tighten without re-election " +
      "when no retired value touches an extremum") {
    val base0 = df(Seq(("a", 10L), ("a", 20L), ("a", 30L)))
    val st0 = IncrementalAgg.init(base0, view)
    // delete a MIDDLE value (20), insert 40: min survives, max tightens
    val b = batch(Seq(("a", 20L, "delete"), ("a", 40L, "insert")))
    val asked = scala.collection.mutable.Set[String]()
    val base1 = df(Seq(("a", 10L), ("a", 30L), ("a", 40L)))
    val st1 = IncrementalAgg.applyChangelog(st0, b, view,
      electorOver(base1, asked))
    assert(stateMap(st1) === Map("a" -> ((3L, 80L, 10L, 40L))))
    assert(asked.isEmpty, "no hole group may trigger a re-election scan")
  }

  test("retiring the extremum holder re-elects from the current base — " +
      "and ONLY the hole group is asked") {
    val base0 = df(Seq(("a", 10L), ("a", 30L), ("b", 5L), ("b", 7L)))
    val st0 = IncrementalAgg.init(base0, view)
    val b = batch(Seq(
      ("a", 30L, "delete"), ("a", 15L, "insert"), // max holder retired
      ("b", 9L, "insert"))) // b untouched on the delete side
    val asked = scala.collection.mutable.Set[String]()
    val base1 = df(Seq(("a", 10L), ("a", 15L), ("b", 5L), ("b", 7L), ("b", 9L)))
    val st1 = IncrementalAgg.applyChangelog(st0, b, view,
      electorOver(base1, asked))
    assert(stateMap(st1) === Map(
      "a" -> ((2L, 25L, 10L, 15L)), "b" -> ((3L, 21L, 5L, 9L))))
    assert(asked === Set("a"))
  }

  test("duplicate extremum: retiring ONE of two equal minima re-elects " +
      "and finds the same value") {
    val base0 = df(Seq(("a", 10L), ("a", 10L), ("a", 20L)))
    val st0 = IncrementalAgg.init(base0, view)
    val b = batch(Seq(("a", 10L, "delete")))
    val asked = scala.collection.mutable.Set[String]()
    val base1 = df(Seq(("a", 10L), ("a", 20L)))
    val st1 = IncrementalAgg.applyChangelog(st0, b, view,
      electorOver(base1, asked))
    assert(stateMap(st1) === Map("a" -> ((2L, 30L, 10L, 20L))))
    assert(asked === Set("a"), "equal-value retire cannot skip re-election")
  }

  test("group death and birth: a fully-retired group leaves the state, " +
      "a first-seen group is born from its own deltas") {
    val base0 = df(Seq(("a", 1L), ("a", 2L)))
    val st0 = IncrementalAgg.init(base0, view)
    val b = batch(Seq(
      ("a", 1L, "delete"), ("a", 2L, "delete"),
      ("c", 100L, "insert"), ("c", 50L, "insert")))
    val asked = scala.collection.mutable.Set[String]()
    val base1 = df(Seq(("c", 100L), ("c", 50L)))
    val st1 = IncrementalAgg.applyChangelog(st0, b, view,
      electorOver(base1, asked))
    assert(stateMap(st1) === Map("c" -> ((2L, 150L, 50L, 100L))))
  }

  test("update pair within one batch nets exactly (delete pre-image + " +
      "insert post-image)") {
    val base0 = df(Seq(("a", 10L), ("a", 99L)))
    val st0 = IncrementalAgg.init(base0, view)
    val b = batch(Seq(("a", 99L, "delete"), ("a", 7L, "insert")))
    val base1 = df(Seq(("a", 10L), ("a", 7L)))
    val st1 = IncrementalAgg.applyChangelog(st0, b, view,
      electorOver(base1, scala.collection.mutable.Set[String]()))
    assert(stateMap(st1) === Map("a" -> ((2L, 17L, 7L, 10L))))
  }

  test("null agg values contribute nothing and retract nothing; null keys " +
      "form their own maintained group") {
    val nl: java.lang.Long = null
    val base0 = df(Seq(("a", java.lang.Long.valueOf(10L)), ("a", nl),
      (null, java.lang.Long.valueOf(3L))))
    val st0 = IncrementalAgg.init(base0, view)
    val b = batch(Seq(
      ("a", nl, "delete"), // retiring a null value: no hole
      (null, java.lang.Long.valueOf(4L), "insert")))
    val asked = scala.collection.mutable.Set[String]()
    val base1 = df(Seq(("a", java.lang.Long.valueOf(10L)),
      (null, java.lang.Long.valueOf(3L)), (null, java.lang.Long.valueOf(4L))))
    val st1 = IncrementalAgg.applyChangelog(st0, b, view,
      electorOver(base1, asked))
    assert(asked.isEmpty)
    val m = st1.collect().map { r =>
      (if (r.isNullAt(0)) "<null>" else r.getString(0)) ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("s_v")))
    }.toMap
    assert(m === Map("a" -> ((1L, 10L)), "<null>" -> ((2L, 7L))))
  }

  test("retracting a group's LAST non-null sum value while null rows keep " +
      "it alive nulls the sum (SQL semantics), and a later non-null " +
      "insert revives it") {
    val nl: java.lang.Long = null
    val base0 = df(Seq(("a", java.lang.Long.valueOf(10L)), ("a", nl), ("a", nl)))
    val st0 = IncrementalAgg.init(base0, view)
    val b1 = batch(Seq(("a", java.lang.Long.valueOf(10L), "delete")))
    val base1 = df(Seq(("a", nl), ("a", nl)))
    val st1 = IncrementalAgg.applyChangelog(st0, b1, view,
      electorOver(base1, scala.collection.mutable.Set[String]()))
    // SQL: sum over the two remaining all-null rows is NULL, not 0
    assert(stateMap(st1) === Map("a" -> ((2L, null, null, null))))
    assert(stateMap(st1) === stateMap(IncrementalAgg.init(base1, view)))
    val b2 = batch(Seq(("a", java.lang.Long.valueOf(7L), "insert")))
    val base2 = df(Seq(("a", nl), ("a", nl), ("a", java.lang.Long.valueOf(7L))))
    val st2 = IncrementalAgg.applyChangelog(st1, b2, view,
      electorOver(base2, scala.collection.mutable.Set[String]()))
    assert(stateMap(st2) === Map("a" -> ((3L, 7L, 7L, 7L))))
  }

  test("differential fuzz: 20 seeded random churn batches (incl. null " +
      "values) equal the from-scratch aggregate") {
    val rnd = new scala.util.Random(20260816L)
    // ~1 in 6 values NULL: nulls must contribute nothing, retract
    // nothing, and null the sum when a group's last non-null retires
    def gen(): java.lang.Long =
      if (rnd.nextInt(6) == 0) null else java.lang.Long.valueOf(rnd.nextInt(21) - 10)
    for (round <- 1 to 20) {
      val groups = (0 until (2 + rnd.nextInt(6))).map(i => s"g$i")
      var rows = (0 until (5 + rnd.nextInt(40))).map { i =>
        (groups(rnd.nextInt(groups.size)), gen())
      }
      val st0 = IncrementalAgg.init(df(rows), view)
      // churn: delete a random subset, update a subset, insert fresh rows
      val (dead, kept) = rows.partition(_ => rnd.nextInt(4) == 0)
      val (upd, same) = kept.partition(_ => rnd.nextInt(4) == 0)
      val upd2 = upd.map { case (g, v) => (g, gen()) }
      val fresh = (0 until rnd.nextInt(10)).map { _ =>
        (groups(rnd.nextInt(groups.size)), gen()) }
      val b = batch(
        dead.map { case (g, v) => (g, v, "delete") } ++
        upd.map { case (g, v) => (g, v, "delete") } ++
        upd2.map { case (g, v) => (g, v, "insert") } ++
        fresh.map { case (g, v) => (g, v, "insert") })
      rows = same ++ upd2 ++ fresh
      val st1 = IncrementalAgg.applyChangelog(st0, b, view,
        electorOver(df(rows), scala.collection.mutable.Set[String]()))
      val expect = IncrementalAgg.init(df(rows), view)
      val got = stateMap(st1)
      val want = stateMap(expect)
      assert(got === want, s"fuzz round $round diverged")
    }
  }

  test("re-election over a source-partitioned Iceberg table reads ONLY the " +
      "hole group's partition (In pushdown through the scan)") {
    import graft.catalog.HadoopCatalog
    import graft.core.{Schema, IdentityTransform, In}
    import graft.meta.{PartitionSpec => Spec}
    import graft.streaming.TableChanges
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_ivmpin").toString
    val rows = Seq(
      ("A", 1L, 10L), ("A", 2L, 30L), ("A", 3L, 20L),
      ("B", 4L, 5L), ("B", 5L, 7L)).toDF("source", "doc_id", "v")
    val schema = Schema.fromSpark(rows.schema)
    val tab = new HadoopCatalog(wh, spark).createTable("ivm", schema,
      Spec.build(schema, 0, ("source", IdentityTransform, "src")),
      properties = Map("format-version" -> "2"))
    tab.append(rows)
    val c0 = tab.refresh().metadata.currentSnapshotId
    // retire A's max holder (doc_id=2, v=30): hole in A only
    tab.delete("doc_id = 2")
    val rel = tab.refresh()
    val v = AggView(keys = Seq("source"), sums = Seq("v"),
      mins = Seq("v"), maxs = Seq("v"))
    val st0 = IncrementalAgg.init(rel.scan.useSnapshot(c0.get).toDF, v)
    val b = TableChanges.changelog(rel, c0)
    var electorRead: Set[String] = Set.empty
    val st1 = IncrementalAgg.applyChangelog(st0, b, v, { keys =>
      val srcs = keys.select(col("source")).distinct()
        .collect().map(_.getString(0)).toSeq
      val base = rel.scan.filter(In("source", srcs)).toDF
      electorRead = base.inputFiles.toSet
      base.select(col("source"), col("v"))
        .join(keys, Seq("source"), "left_semi")
    })
    assert(electorRead.nonEmpty && electorRead.forall(_.contains("src=A")),
      s"re-election must open only A's partition, read: $electorRead")
    val got = st1.orderBy("source").collect()
      .map(r => (r.getString(0), r.getAs[Long]("cnt"), r.getAs[Long]("s_v"),
        r.getAs[Long]("mn_v"), r.getAs[Long]("mx_v")))
    assert(got.toSeq === Seq(("A", 2L, 30L, 10L, 20L), ("B", 2L, 12L, 5L, 7L)))
  }

  test("chained differential fuzz: state carried across 6 consecutive " +
      "batches equals the from-scratch aggregate at every step") {
    val rnd = new scala.util.Random(20260817L)
    def gen(): java.lang.Long =
      if (rnd.nextInt(6) == 0) null else java.lang.Long.valueOf(rnd.nextInt(21) - 10)
    for (scenario <- 1 to 4) {
      val groups = (0 until (2 + rnd.nextInt(5))).map(i => s"g$i")
      var rows = (0 until (10 + rnd.nextInt(30))).map { _ =>
        (groups(rnd.nextInt(groups.size)), gen())
      }
      var st = IncrementalAgg.init(df(rows), view)
      for (step <- 1 to 6) {
        val (dead, kept) = rows.partition(_ => rnd.nextInt(4) == 0)
        val (upd, same) = kept.partition(_ => rnd.nextInt(4) == 0)
        val upd2 = upd.map { case (g, v) => (g, gen()) }
        val fresh = (0 until rnd.nextInt(8)).map { _ =>
          (groups(rnd.nextInt(groups.size)), gen()) }
        val b = batch(
          dead.map { case (g, v) => (g, v, "delete") } ++
          upd.map { case (g, v) => (g, v, "delete") } ++
          upd2.map { case (g, v) => (g, v, "insert") } ++
          fresh.map { case (g, v) => (g, v, "insert") })
        rows = same ++ upd2 ++ fresh
        st = IncrementalAgg.applyChangelog(st, b, view,
          electorOver(df(rows), scala.collection.mutable.Set[String]()))
        assert(stateMap(st) === stateMap(IncrementalAgg.init(df(rows), view)),
          s"scenario $scenario diverged at step $step")
      }
    }
  }

  test("MaterializedAgg table: bootstrap + exactly-once incremental refresh; " +
      "untouched MV partitions survive; cursor rides the data commit") {
    import graft.catalog.HadoopCatalog
    import graft.core.{Schema, IdentityTransform}
    import graft.meta.{PartitionSpec => Spec}
    import graft.streaming.MaterializedAgg
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_mvtab").toString
    val cat = new HadoopCatalog(wh, spark)
    val rows = Seq(
      ("A", 1L, 10L), ("A", 2L, 30L), ("A", 3L, 20L),
      ("B", 4L, 5L), ("B", 5L, 7L), ("C", 6L, 9L)).toDF("g", "doc_id", "v")
    val src = cat.createTable("src", Schema.fromSpark(rows.schema),
      properties = Map("format-version" -> "2"))
    src.append(rows)
    val v = AggView(keys = Seq("g"), sums = Seq("v"),
      mins = Seq("v"), maxs = Seq("v"))
    val mvSchema = MaterializedAgg.schemaFor(v, src)
    val mv = cat.createTable("mv", mvSchema,
      Spec.build(mvSchema, 0, ("g", IdentityTransform, "g")),
      properties = Map("format-version" -> "2"))
    val c0 = MaterializedAgg.bootstrap(src, mv, v)
    assert(c0 === src.metadata.currentSnapshotId)
    def mvMap(): Map[String, (Long, Long, Long, Long)] =
      mv.refresh().scan.toDF.collect().map(r =>
        r.getAs[String]("g") -> ((r.getAs[Long]("cnt"), r.getAs[Long]("s_v"),
          r.getAs[Long]("mn_v"), r.getAs[Long]("mx_v")))).toMap
    assert(mvMap() === Map("A" -> ((3L, 60L, 10L, 30L)),
      "B" -> ((2L, 12L, 5L, 7L)), "C" -> ((1L, 9L, 9L, 9L))))
    val bBefore = mv.refresh().scan.toDF.inputFiles.filter(_.contains("g=B")).toSet
    assert(bBefore.nonEmpty)
    // churn: A's max holder retires (hole + re-elect), C dies entirely
    src.delete("doc_id = 2")
    src.delete("g = 'C'")
    val (r1, d1) = MaterializedAgg.refreshOnce(src, mv, v)
    assert(r1 === 1L && d1 === 1L)
    assert(mvMap() === Map("A" -> ((2L, 30L, 10L, 20L)),
      "B" -> ((2L, 12L, 5L, 7L))))
    assert(mv.refresh().scan.toDF.inputFiles.filter(_.contains("g=B")).toSet
      === bBefore, "an untouched group's MV partition must not rewrite")
    // replay: source unmoved → detected no-op, no new MV commit
    val snaps = mv.metadata.snapshots.size
    assert(MaterializedAgg.refreshOnce(src, mv, v) === ((0L, 0L)))
    assert(mv.refresh().metadata.snapshots.size === snaps)
    // compaction-only source range: cursor advances METADATA-ONLY
    val (rew, _) = src.rewriteDataFiles(1L << 30)
    assert(rew > 0)
    val mvHead = mv.refresh().metadata.currentSnapshotId
    assert(MaterializedAgg.refreshOnce(src, mv, v) === ((0L, 0L)))
    assert(mv.refresh().metadata.currentSnapshotId === mvHead,
      "a no-net-change refresh must not commit a data snapshot")
    assert(mv.metadata.properties(MaterializedAgg.CursorProp).toLong ===
      src.metadata.currentSnapshotId.get)
    // second round: a birth (D) and a min-holder retire in B
    src.append(Seq(("D", 7L, 100L)).toDF("g", "doc_id", "v"))
    src.delete("doc_id = 4")
    val (r2, d2) = MaterializedAgg.refreshOnce(src, mv, v)
    assert(r2 === 2L && d2 === 0L)
    assert(mvMap() === Map("A" -> ((2L, 30L, 10L, 20L)),
      "B" -> ((1L, 7L, 7L, 7L)), "D" -> ((1L, 100L, 100L, 100L))))
    // bootstrap refuses a table that is already an MV
    intercept[IllegalArgumentException](MaterializedAgg.bootstrap(src, mv, v))
  }

  test("filtered MV: the aggregate of SELECT * WHERE p — updates moving " +
      "rows across p retract and insert correctly") {
    import graft.catalog.HadoopCatalog
    import graft.core.Schema
    import graft.streaming.MaterializedAgg
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_mvfilt").toString
    val cat = new HadoopCatalog(wh, spark)
    val rows = Seq(
      ("a", 1L, 50L), ("a", 2L, 30L), ("a", 3L, 5L),
      ("b", 4L, 40L), ("b", 5L, 8L)).toDF("g", "id", "v")
    val src = cat.createTable("srcf", Schema.fromSpark(rows.schema),
      properties = Map("format-version" -> "2"))
    src.append(rows)
    val v = AggView(keys = Seq("g"), sums = Seq("v"),
      mins = Seq("v"), maxs = Seq("v"))
    val mvSchema = MaterializedAgg.schemaFor(v, src)
    val mv = cat.createTable("mvf", mvSchema,
      properties = Map("format-version" -> "2"))
    MaterializedAgg.bootstrap(src, mv, v, identity, Some("v >= 10"))
    def mvMap(): Map[String, (Long, Long, Long, Long)] =
      mv.refresh().scan.toDF.collect().map(r =>
        r.getAs[String]("g") -> ((r.getAs[Long]("cnt"), r.getAs[Long]("s_v"),
          r.getAs[Long]("mn_v"), r.getAs[Long]("mx_v")))).toMap
    // only v >= 10 rows aggregate: a has 50+30, b has 40
    assert(mvMap() === Map("a" -> ((2L, 80L, 30L, 50L)),
      "b" -> ((1L, 40L, 40L, 40L))))
    // move OUT of p (a's max 50 → 3: retract + hole), move INTO p
    // (b's 8 → 25: insert), and churn fully below p (a's 5 → 7: silent)
    val eng = new HadoopCatalog(wh, spark).loadTable("srcf")
    eng.upsert(Seq(("a", 1L, 3L), ("b", 5L, 25L), ("a", 3L, 7L))
      .toDF("g", "id", "v"), Seq("id"))
    val (r1, d1) = MaterializedAgg.refreshOnce(src, mv, v)
    assert(mvMap() === Map("a" -> ((1L, 30L, 30L, 30L)),
      "b" -> ((2L, 65L, 25L, 40L))))
    assert(r1 === 2L && d1 === 0L)
    // a group leaving p entirely dies in the view
    eng.upsert(Seq(("a", 2L, 9L)).toDF("g", "id", "v"), Seq("id"))
    MaterializedAgg.refreshOnce(src, mv, v)
    assert(mvMap() === Map("b" -> ((2L, 65L, 25L, 40L))))
  }

  test("null-keyed group: MV refresh retires and rewrites it like any " +
      "other group (null-safe targeting joins)") {
    import graft.catalog.HadoopCatalog
    import graft.core.Schema
    import graft.streaming.MaterializedAgg
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_mvnullk").toString
    val cat = new HadoopCatalog(wh, spark)
    val rows = Seq((null, 1L, 10L), (null, 2L, 30L), ("b", 3L, 5L))
      .toDF("g", "id", "v")
    val src = cat.createTable("srcn", Schema.fromSpark(rows.schema),
      properties = Map("format-version" -> "2"))
    src.append(rows)
    val v = AggView(keys = Seq("g"), sums = Seq("v"),
      mins = Seq("v"), maxs = Seq("v"))
    val mv = cat.createTable("mvn", MaterializedAgg.schemaFor(v, src),
      properties = Map("format-version" -> "2"))
    MaterializedAgg.bootstrap(src, mv, v)
    def mvMap(): Map[String, (Long, Any)] =
      mv.refresh().scan.toDF.collect().map(r =>
        String.valueOf(r.getAs[Any]("g")) ->
          ((r.getAs[Long]("cnt"), r.getAs[Any]("s_v")))).toMap
    assert(mvMap() === Map("null" -> ((2L, 40L)), "b" -> ((1L, 5L))))
    // churn the NULL group: retire its max holder — a using-column
    // retire join would leave the stale (2, 40) row in place forever
    src.delete("id = 2")
    val (r1, _) = MaterializedAgg.refreshOnce(src, mv, v)
    assert(r1 === 1L)
    assert(mvMap() === Map("null" -> ((1L, 10L)), "b" -> ((1L, 5L))))
    // and a full retire: the null-keyed group must LEAVE the MV
    src.delete("id = 1")
    MaterializedAgg.refreshOnce(src, mv, v)
    assert(mvMap() === Map("b" -> ((1L, 5L))))
  }

  test("net-zero churn commits CURSOR-ONLY: a delete+reinsert of identical " +
      "rows advances the cursor without a data snapshot; unchanged touched " +
      "groups never rewrite") {
    import graft.catalog.HadoopCatalog
    import graft.core.Schema
    import graft.streaming.MaterializedAgg
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_mvzero").toString
    val cat = new HadoopCatalog(wh, spark)
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 30L), ("b", 3L, 5L))
      .toDF("g", "id", "v")
    val src = cat.createTable("srcz", Schema.fromSpark(rows.schema),
      properties = Map("format-version" -> "2"))
    src.append(rows)
    val v = AggView(keys = Seq("g"), sums = Seq("v"),
      mins = Seq("v"), maxs = Seq("v"))
    val mv = cat.createTable("mvz", MaterializedAgg.schemaFor(v, src),
      properties = Map("format-version" -> "2"))
    MaterializedAgg.bootstrap(src, mv, v)
    // retire a's max holder, then re-append an identical row: the hole
    // re-elects to the SAME extremum, count/sum land back exactly —
    // zero net aggregate change across the two commits
    src.delete("id = 2")
    src.append(Seq(("a", 2L, 30L)).toDF("g", "id", "v"))
    val snaps = mv.refresh().metadata.snapshots.size
    val files = mv.scan.toDF.inputFiles.toSet
    assert(MaterializedAgg.refreshOnce(src, mv, v) === ((0L, 0L)))
    assert(mv.refresh().metadata.snapshots.size === snaps,
      "a net-zero refresh must not commit a data snapshot")
    assert(mv.scan.toDF.inputFiles.toSet === files,
      "a net-zero refresh must not rewrite any MV file")
    assert(mv.metadata.properties(MaterializedAgg.CursorProp).toLong ===
      src.refresh().metadata.currentSnapshotId.get,
      "the cursor must still advance, metadata-only")
    // and a mixed batch: b churns for real while a nets zero — only b's
    // group rewrites (a is touched but lands on its current row)
    src.delete("id = 1")
    src.append(Seq(("a", 1L, 10L), ("b", 4L, 50L)).toDF("g", "id", "v"))
    val (r2, d2) = MaterializedAgg.refreshOnce(src, mv, v)
    assert(r2 === 1L && d2 === 0L, s"only b changed, got ($r2, $d2)")
    val got = mv.refresh().scan.toDF.orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("cnt"), r.getAs[Long]("s_v"),
        r.getAs[Long]("mn_v"), r.getAs[Long]("mx_v"))).toSeq
    assert(got === Seq(("a", 2L, 40L, 10L, 30L), ("b", 2L, 55L, 5L, 50L)))
  }

  test("refreshAll: three same-cursor MVs (one filtered) share ONE " +
      "changelog materialization, each with its own exactly-once cursor") {
    import graft.catalog.HadoopCatalog
    import graft.core.Schema
    import graft.streaming.{MaterializedAgg, TableChanges}
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_mvall").toString
    val cat = new HadoopCatalog(wh, spark)
    val rows = Seq(
      ("a", 1L, 50L), ("a", 2L, 30L), ("a", 3L, 5L),
      ("b", 4L, 40L), ("b", 5L, 8L)).toDF("g", "id", "v")
    val src = cat.createTable("srca", Schema.fromSpark(rows.schema),
      properties = Map("format-version" -> "2"))
    src.append(rows)
    val v = AggView(keys = Seq("g"), sums = Seq("v"),
      mins = Seq("v"), maxs = Seq("v"))
    val mvs = Seq("mva1", "mva2", "mva3").map(n =>
      cat.createTable(n, MaterializedAgg.schemaFor(v, src),
        properties = Map("format-version" -> "2")))
    MaterializedAgg.bootstrap(src, mvs(0), v)
    MaterializedAgg.bootstrap(src, mvs(1), v)
    MaterializedAgg.bootstrap(src, mvs(2), v, identity, Some("v >= 10"))
    // churn: a's max retires (hole), b gains a row, a row moves across
    // the filtered MV's predicate (b's 8 → 25)
    val eng = new HadoopCatalog(wh, spark).loadTable("srca")
    eng.upsert(Seq(("b", 5L, 25L), ("a", 1L, 3L)).toDF("g", "id", "v"), Seq("id"))
    var calls = 0
    val rs = MaterializedAgg.refreshAll(src, mvs, identity,
      (t, from, to) => { calls += 1; TableChanges.changelog(t, from, to) })
    assert(calls === 1,
      s"three same-cursor MVs must share one changelog read, got $calls")
    assert(rs.forall { case (r, d) => r + d > 0 })
    def mvMap(i: Int): Map[String, (Long, Long)] =
      mvs(i).refresh().scan.toDF.collect().map(r =>
        r.getAs[String]("g") -> ((r.getAs[Long]("cnt"), r.getAs[Long]("s_v")))).toMap
    // unfiltered MVs agree with the from-scratch aggregate
    val want = IncrementalAgg.init(src.refresh().scan.toDF, v).collect()
      .map(r => r.getAs[String]("g") -> ((r.getAs[Long]("cnt"), r.getAs[Long]("s_v")))).toMap
    assert(mvMap(0) === want && mvMap(1) === want)
    // the filtered MV sees only v >= 10 (a: 30; b: 40+25)
    assert(mvMap(2) === Map("a" -> ((1L, 30L)), "b" -> ((2L, 65L))))
    val head = src.metadata.currentSnapshotId.get
    mvs.foreach(mv => assert(
      mv.metadata.properties(MaterializedAgg.CursorProp).toLong === head))
    // replay: nothing moved — no feed read at all, all no-ops
    val rs2 = MaterializedAgg.refreshAll(src, mvs, identity,
      (t, from, to) => { calls += 1; TableChanges.changelog(t, from, to) })
    assert(rs2 === Seq((0L, 0L), (0L, 0L), (0L, 0L)) && calls === 1)
  }

  test("concurrent MV refreshers never double-count: winners advance the " +
      "cursor atomically, losers fail on the guard or no-op") {
    import graft.catalog.HadoopCatalog
    import graft.core.Schema
    import graft.streaming.MaterializedAgg
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_mvrace").toString
    val rows = (1L to 200L).map(i => (s"g${i % 8}", i, i % 37)).toDF("g", "id", "v")
    val cat = new HadoopCatalog(wh, spark)
    val src0 = cat.createTable("srcr", Schema.fromSpark(rows.schema),
      properties = Map("format-version" -> "2"))
    src0.append(rows)
    val v = AggView(keys = Seq("g"), sums = Seq("v"),
      mins = Seq("v"), maxs = Seq("v"))
    val mv0 = cat.createTable("mvr", MaterializedAgg.schemaFor(v, src0),
      properties = Map("format-version" -> "2"))
    MaterializedAgg.bootstrap(src0, mv0, v)
    src0.delete("id <= 40")
    new HadoopCatalog(wh, spark).loadTable("srcr")
      .upsert((201L to 220L).map(i => (s"g${i % 8}", i, i % 41))
        .toDF("g", "id", "v"), Seq("id"))
    // four racers, each with its OWN table handles (separate processes in
    // miniature — IceTable instances are not shared across threads)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val outcomes = Await.result(Future.sequence((1 to 4).map { _ =>
      Future(scala.util.Try {
        val c = new HadoopCatalog(wh, spark)
        MaterializedAgg.refreshOnce(c.loadTable("srcr"), c.loadTable("mvr"), v)
      })
    }), 120.seconds)
    pool.shutdown()
    val applied = outcomes.collect { case scala.util.Success((r, d)) if r + d > 0 => 1 }.sum
    val failures = outcomes.collect { case scala.util.Failure(e) => e }
    failures.foreach(e => assert(
      e.isInstanceOf[graft.table.ValidationException] ||
        e.getMessage.contains("cursor"),
      s"unexpected failure shape: $e"))
    assert(applied >= 1, s"someone must win: $outcomes")
    // the view is EXACT regardless of interleaving — no double-count
    val check = new HadoopCatalog(wh, spark)
    val srcF = check.loadTable("srcr"); val mvF = check.loadTable("mvr")
    val got = mvF.scan.toDF.orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("cnt"), r.getAs[Long]("s_v"))).toSeq
    val want = IncrementalAgg.init(srcF.scan.toDF, v).orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("cnt"), r.getAs[Long]("s_v"))).toSeq
    assert(got === want)
    assert(mvF.metadata.properties(MaterializedAgg.CursorProp).toLong ===
      srcF.metadata.currentSnapshotId.get)
  }

  test("MV refresh across source schema evolution: an added column leaves " +
      "the view exact; a renamed view column keeps refreshing BY FIELD ID " +
      "(the MV's own column follows); a stale explicit view fails fast") {
    import graft.catalog.HadoopCatalog
    import graft.core.{Schema, ILong}
    import graft.streaming.MaterializedAgg
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_mvevo").toString
    val cat = new HadoopCatalog(wh, spark)
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 30L), ("b", 3L, 5L))
      .toDF("g", "id", "v")
    val src = cat.createTable("srce", Schema.fromSpark(rows.schema),
      properties = Map("format-version" -> "2"))
    src.append(rows)
    val v = AggView(keys = Seq("g"), sums = Seq("v"),
      mins = Seq("v"), maxs = Seq("v"))
    val mv = cat.createTable("mve", MaterializedAgg.schemaFor(v, src),
      properties = Map("format-version" -> "2"))
    MaterializedAgg.bootstrap(src, mv, v)
    // source grows a column the view doesn't reference; churn follows
    src.updateSchema.addColumn("extra", ILong).commit()
    val src2 = new HadoopCatalog(wh, spark).loadTable("srce")
    src2.append(Seq(("b", 4L, 9L, 77L)).toDF("g", "id", "v", "extra"))
    src2.delete("id = 2") // a's max retires through the evolved schema
    val (r1, d1) = MaterializedAgg.refreshOnce(src2, mv, v)
    assert(r1 === 2L && d1 === 0L)
    val got = mv.refresh().scan.toDF.orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("cnt"), r.getAs[Long]("s_v"),
        r.getAs[Long]("mn_v"), r.getAs[Long]("mx_v"))).toSeq
    assert(got === Seq(("a", 1L, 10L, 10L, 10L), ("b", 2L, 14L, 5L, 9L)))
    // the view definition is canonical BY FIELD ID: an upstream rename of
    // a referenced column must not break the refresh — but an EXPLICITLY
    // passed stale view must still fail fast, never fold wrong
    src2.updateSchema.renameColumn("v", "val").commit()
    val src3 = new HadoopCatalog(wh, spark).loadTable("srce")
    src3.delete("id = 1") // group a dies entirely through the rename
    intercept[Exception](MaterializedAgg.refreshOnce(src3, mv, v))
    // no partial fold: the failed attempt must not have advanced the cursor
    assert(mv.refresh().metadata.properties(MaterializedAgg.CursorProp).toLong
      !== src3.metadata.currentSnapshotId.get)
    val (r2, d2) = MaterializedAgg.refreshOnce(src3, mv)
    assert(r2 === 0L && d2 === 1L)
    val cols = mv.refresh().schema.fields.map(_.name)
    assert(cols.contains("s_val") && !cols.contains("s_v"),
      s"MV state columns must follow the source rename, got $cols")
    val got2 = mv.scan.toDF.orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("cnt"), r.getAs[Long]("s_val"),
        r.getAs[Long]("mn_val"), r.getAs[Long]("mx_val"))).toSeq
    assert(got2 === Seq(("b", 2L, 14L, 5L, 9L)))
    // replays through the renamed world still no-op
    assert(MaterializedAgg.refreshOnce(src3, mv) === ((0L, 0L)))
  }

  test("multi-column view: independent holes re-elect each column from " +
      "the same single scan") {
    val v2 = AggView(keys = Seq("g"), sums = Seq("x", "y"),
      mins = Seq("x"), maxs = Seq("y"))
    import spark.implicits._
    val base0 = Seq(("a", 1L, 100L), ("a", 5L, 300L), ("a", 9L, 200L))
      .toDF("g", "x", "y")
    val st0 = IncrementalAgg.init(base0, v2)
    // one delete vacates min(x)=1 AND max(y)=300 across two rows
    val b = Seq(("a", 1L, 100L, "delete"), ("a", 5L, 300L, "delete"),
      ("a", 2L, 150L, "insert")).toDF("g", "x", "y", "_change_type")
    val base1 = Seq(("a", 9L, 200L), ("a", 2L, 150L)).toDF("g", "x", "y")
    val st1 = IncrementalAgg.applyChangelog(st0, b, v2,
      keys => base1.join(keys, Seq("g"), "left_semi"))
    val r = st1.collect().head
    assert(r.getAs[Long]("cnt") === 2L)
    assert(r.getAs[Long]("s_x") === 11L && r.getAs[Long]("s_y") === 350L)
    assert(r.getAs[Long]("mn_x") === 2L && r.getAs[Long]("mx_y") === 200L)
  }
}
