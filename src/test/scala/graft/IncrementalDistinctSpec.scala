package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IncrementalAgg, IncrementalDistinct}
import graft.ops.IncrementalAgg.AggView
import graft.ops.IncrementalDistinct.DistinctView

/** Exact COUNT(DISTINCT) maintenance via the two-level support table:
  * duplicate-value retractions, null-value SQL semantics, group death
  * and birth, a chained differential fuzz, and the persisted face
  * (the support IS a MaterializedAgg view — exactly-once for free). */
class IncrementalDistinctSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dv = DistinctView(keys = Seq("g"), col = "c")
  private val gv = AggView(keys = Seq("g"))

  private def base(rows: Seq[(String, java.lang.Long)]): DataFrame = {
    import spark.implicits._
    rows.map { case (g, c) => (g, Option(c).map(_.longValue)) }.toDF("g", "c")
  }
  private def batch(rows: Seq[(String, java.lang.Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (g, c, t) => (g, Option(c).map(_.longValue), t) }
      .toDF("g", "c", "_change_type")
  }

  /** group → (cnt, count-distinct) from the composed view. */
  private def viewMap(state: DataFrame, support: DataFrame): Map[String, (Long, Long)] =
    IncrementalDistinct.withDistinct(state, support, dv).collect().map { r =>
      String.valueOf(r.getAs[Any]("g")) ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("cd_c")))
    }.toMap

  private def L(x: Long): java.lang.Long = java.lang.Long.valueOf(x)

  test("duplicated values retract exactly: deleting one copy keeps the " +
      "distinct count, deleting the last copy drops it; nulls never count") {
    val b0 = base(Seq(("a", L(1)), ("a", L(1)), ("a", L(2)), ("a", null),
      ("b", null), ("b", null)))
    var st = IncrementalAgg.init(b0, gv)
    var sup = IncrementalDistinct.initSupport(b0, dv)
    // b has rows but only null values → cd 0 (not absent)
    assert(viewMap(st, sup) === Map("a" -> ((4L, 2L)), "b" -> ((2L, 0L))))
    // delete ONE copy of the duplicated value 1 → cd stays 2
    val fb1 = batch(Seq(("a", L(1), "delete")))
    st = IncrementalAgg.applyChangelog(st, fb1, gv, _ => fail("no re-elect"))
    sup = IncrementalDistinct.applySupport(sup, fb1, dv)
    assert(viewMap(st, sup) === Map("a" -> ((3L, 2L)), "b" -> ((2L, 0L))))
    // delete the LAST copy → cd drops to 1; a null value arriving
    // changes nothing; value 2 moving to group b births its support
    val fb2 = batch(Seq(("a", L(1), "delete"), ("a", null, "insert"),
      ("b", L(2), "insert")))
    st = IncrementalAgg.applyChangelog(st, fb2, gv, _ => fail("no re-elect"))
    sup = IncrementalDistinct.applySupport(sup, fb2, dv)
    assert(viewMap(st, sup) === Map("a" -> ((3L, 1L)), "b" -> ((3L, 1L))))
  }

  test("chained differential fuzz: distinct counts equal the from-scratch " +
      "COUNT(DISTINCT) after every churn round, null values included") {
    val rnd = new scala.util.Random(20260816L)
    val groups = Vector("g0", "g1", "g2")
    for (scenario <- 1 to 3) {
      var rows: Seq[(String, java.lang.Long)] = (0 until 30 + rnd.nextInt(30))
        .map { _ =>
          (groups(rnd.nextInt(groups.size)),
            if (rnd.nextInt(6) == 0) null
            else L(rnd.nextInt(8).toLong)) // few values → many duplicates
        }
      var st = IncrementalAgg.init(base(rows), gv)
      var sup = IncrementalDistinct.initSupport(base(rows), dv)
      for (step <- 1 to 5) {
        val (dead, kept) = rows.partition(_ => rnd.nextInt(3) == 0)
        val fresh = (0 until rnd.nextInt(10)).map { _ =>
          (groups(rnd.nextInt(groups.size)),
            if (rnd.nextInt(6) == 0) null.asInstanceOf[java.lang.Long]
            else L(rnd.nextInt(8).toLong))
        }
        val fb = batch(dead.map { case (g, c) => (g, c, "delete") } ++
          fresh.map { case (g, c) => (g, c, "insert") })
        st = IncrementalAgg.applyChangelog(st, fb, gv, _ => fail("no re-elect"))
        sup = IncrementalDistinct.applySupport(sup, fb, dv)
        rows = kept ++ fresh
        val want = base(rows).groupBy("g")
          .agg(count(lit(1)).as("cnt"), count_distinct(col("c")).as("cd_c"))
          .collect().map(r => (r.getString(0),
            (r.getAs[Long]("cnt"), r.getAs[Long]("cd_c")))).toMap
        assert(viewMap(st, sup) === want,
          s"scenario $scenario diverged at step $step")
      }
    }
  }

  test("composes with join-view IVM: a joinDelta changelog feeds the " +
      "support, maintaining COUNT(DISTINCT) over fact ⋈ dim — a dim " +
      "group move drags its facts' values across groups exactly") {
    import graft.ops.IncrementalJoinAgg
    import graft.ops.IncrementalJoinAgg.JoinView
    import spark.implicits._
    // view: SELECT seg, COUNT(DISTINCT v) FROM fact JOIN dim GROUP BY seg
    val jv = JoinView(Seq("fk"), Seq("pk"), AggView(keys = Seq("seg")))
    val jdv = DistinctView(keys = Seq("seg"), col = "v")
    // v=10 appears under BOTH pks mapped to seg 'a': cd(a)=2, not 3
    val fact0 = Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("fk", "v")
    val dim0 = Seq((1L, "a"), (2L, "a")).toDF("pk", "seg")
    def joined(f: DataFrame, d: DataFrame) =
      f.join(d, f("fk") === d("pk")).select(d("seg"), f("v"))
    var sup = IncrementalDistinct.initSupport(joined(fact0, dim0), jdv)
    def cds(): Map[String, Long] =
      IncrementalDistinct.distinctCounts(sup, jdv).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("cd_v")).toMap
    assert(cds() === Map("a" -> 2L))
    // dim pk 2 moves a→b: its fact's copy of v=10 retracts from a's
    // support, but ANOTHER copy survives via pk 1 — cd(a) must stay 2
    // (the duplicate-retraction property through the join) — while
    // cd(b) births at 1
    val db = Seq((2L, "a", "delete"), (2L, "b", "insert"))
      .toDF("pk", "seg", "_change_type")
    val fact1 = fact0
    val dim1 = Seq((1L, "a"), (2L, "b")).toDF("pk", "seg")
    val delta = IncrementalJoinAgg.joinDelta(None, Some(db),
      JoinView(Seq("fk"), Seq("pk"), AggView(keys = Seq("seg", "v"))),
      dimAtCursor = keys => dim0.join(keys, Seq("pk"), "left_semi"),
      factAtHead = keys => fact1.join(keys, Seq("fk"), "left_semi")).get
    sup = IncrementalDistinct.applySupport(sup, delta, jdv)
    assert(cds() === Map("a" -> 2L, "b" -> 1L))
    // from-scratch cross-check
    val want = joined(fact1, dim1).groupBy("seg")
      .agg(count_distinct(col("v")).as("cd")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("cd")).toMap
    assert(cds() === want)
  }

  test("persisted face: the support IS a MaterializedAgg view (keys = " +
      "group + value) — exactly-once refresh maintains COUNT(DISTINCT) " +
      "through Iceberg churn") {
    import graft.catalog.HadoopCatalog
    import graft.core.Schema
    import graft.streaming.MaterializedAgg
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_mvdist").toString
    val cat = new HadoopCatalog(wh, spark)
    val src0 = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 30L)).toDF("id", "g", "c")
    val src = cat.createTable("srcd", Schema.fromSpark(src0.schema),
      properties = Map("format-version" -> "2"))
    src.append(src0)
    // the support view: GROUP BY (g, c) COUNT(*) — plain MaterializedAgg
    val supView = AggView(keys = Seq("g", "c"))
    val mv = cat.createTable("mvd", MaterializedAgg.schemaFor(supView, src),
      properties = Map("format-version" -> "2"))
    MaterializedAgg.bootstrap(src, mv, supView)
    def cd(): Map[String, Long] =
      IncrementalDistinct.distinctCounts(mv.refresh().scan.toDF, dv)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("cd_c")).toMap
    assert(cd() === Map("a" -> 2L, "b" -> 1L))
    // retire one copy of the duplicated value (cd unchanged), move a
    // value across groups, birth a value
    src.delete("id = 1")
    src.upsert(Seq((3L, "b", 20L), (5L, "a", 40L)).toDF("id", "g", "c"),
      Seq("id"))
    MaterializedAgg.refreshOnce(src.refresh(), mv)
    assert(cd() === Map("a" -> 2L, "b" -> 2L))
    // replay no-ops (the cursor rides the MV commit)
    assert(MaterializedAgg.refreshOnce(src, mv) === ((0L, 0L)))
    val want = src.scan.toDF.groupBy("g")
      .agg(count_distinct(col("c")).as("cd")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("cd")).toMap
    assert(cd() === want)
  }
}
