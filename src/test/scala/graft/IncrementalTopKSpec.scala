package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IncrementalTopK
import graft.ops.IncrementalTopK.TopKView

/** Top-k-per-group IVM: boundary-exact insert/delete pins (re-election
  * ONLY when a full group loses a top-k member), null keys and null
  * ordering values, and a chained differential fuzz against the
  * from-scratch window ranking. */
class IncrementalTopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val v = TopKView(keys = Seq("g"), ord = "score", id = "id", k = 2)

  private def rows(rs: Seq[(String, Long, Long)]): DataFrame = {
    import spark.implicits._
    rs.toDF("g", "id", "score")
  }
  private def batch(rs: Seq[(String, Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rs.toDF("g", "id", "score", "_change_type")
  }
  private def asSet(df: DataFrame): Set[(String, Long, Long)] =
    df.collect().map(r => (String.valueOf(r.getAs[Any]("g")),
      r.getAs[Long]("id"), r.getAs[Long]("score"))).toSet
  private def noElect(keys: DataFrame): DataFrame =
    fail("re-election must not run on the exact path")

  test("inserts merge exactly: below a full group's boundary falls out, " +
      "above evicts the boundary row; new groups are born") {
    val st0 = IncrementalTopK.init(
      rows(Seq(("a", 1L, 50L), ("a", 2L, 40L), ("a", 3L, 30L))), v)
    assert(asSet(st0) === Set(("a", 1L, 50L), ("a", 2L, 40L)))
    val st1 = IncrementalTopK.applyChangelog(st0, batch(Seq(
      ("a", 4L, 35L, "insert"),  // below boundary 40 → falls out
      ("a", 5L, 60L, "insert"),  // above → evicts id 2
      ("b", 6L, 1L, "insert"))), // births group b
      v, noElect)
    assert(asSet(st1) === Set(("a", 5L, 60L), ("a", 1L, 50L), ("b", 6L, 1L)))
  }

  test("deletes: below-boundary is a no-op without re-election; a non-full " +
      "group removes exactly; only a FULL group losing a top-k member " +
      "re-elects — and promotes the unseen (k+1)-th from the base") {
    val base0 = rows(Seq(
      ("a", 1L, 50L), ("a", 2L, 40L), ("a", 3L, 30L), ("b", 4L, 5L)))
    val st0 = IncrementalTopK.init(base0, v)
    // delete id 3 (below a's boundary) + nothing else: exact, no elector
    val st1 = IncrementalTopK.applyChangelog(st0,
      batch(Seq(("a", 3L, 30L, "delete"))), v, noElect)
    assert(asSet(st1) === asSet(st0))
    // delete b's only row: non-full group, exact removal, no elector
    val st2 = IncrementalTopK.applyChangelog(st1,
      batch(Seq(("b", 4L, 5L, "delete"))), v, noElect)
    assert(asSet(st2) === Set(("a", 1L, 50L), ("a", 2L, 40L)))
    // delete a's top row: FULL group → re-elect from base at head,
    // promoting id 3 the state never kept
    val base2 = rows(Seq(("a", 2L, 40L), ("a", 3L, 30L)))
    var elected = 0
    val st3 = IncrementalTopK.applyChangelog(st2,
      batch(Seq(("a", 1L, 50L, "delete"))), v,
      keys => { elected += 1
        graft.ops.Joins.nullSafeSemi(base2, keys, Seq("g")) })
    assert(elected === 1)
    assert(asSet(st3) === Set(("a", 2L, 40L), ("a", 3L, 30L)))
  }

  test("an update pair (delete+insert, same id) re-ranks in place; a " +
      "same-batch insert rides the hole group's re-election") {
    val base0 = rows(Seq(("a", 1L, 50L), ("a", 2L, 40L), ("a", 3L, 30L)))
    val st0 = IncrementalTopK.init(base0, v)
    // id 1's score drops to 25: the group is full and loses a member →
    // hole; id 9 arrives in the same batch — the elector (base at head)
    // already sees both
    val base1 = rows(Seq(("a", 1L, 25L), ("a", 2L, 40L), ("a", 3L, 30L),
      ("a", 9L, 45L)))
    val st1 = IncrementalTopK.applyChangelog(st0, batch(Seq(
      ("a", 1L, 50L, "delete"), ("a", 1L, 25L, "insert"),
      ("a", 9L, 45L, "insert"))), v,
      keys => graft.ops.Joins.nullSafeSemi(base1, keys, Seq("g")))
    assert(asSet(st1) === Set(("a", 9L, 45L), ("a", 2L, 40L)))
  }

  test("null group keys form their own group; ties break by id (total " +
      "order, deterministic)") {
    import spark.implicits._
    val base0 = Seq((Option("a"), 1L, 10L), (None, 2L, 9L), (None, 3L, 9L),
      (None, 4L, 9L)).toDF("g", "id", "score")
    val st0 = IncrementalTopK.init(base0, v)
    assert(asSet(st0) === Set(("a", 1L, 10L), ("null", 2L, 9L), ("null", 3L, 9L)))
    // delete the null group's tie-winner: full group → re-elect
    val base1 = Seq((Option("a"), 1L, 10L), (None, 3L, 9L), (None, 4L, 9L))
      .toDF("g", "id", "score")
    val fb = Seq((Option.empty[String], 2L, 9L, "delete"))
      .toDF("g", "id", "score", "_change_type")
    val st1 = IncrementalTopK.applyChangelog(st0, fb, v,
      keys => graft.ops.Joins.nullSafeSemi(base1, keys, Seq("g")))
    assert(asSet(st1) === Set(("a", 1L, 10L), ("null", 3L, 9L), ("null", 4L, 9L)))
  }

  test("persisted top-k MV (MaterializedTopK): view definition rides the " +
      "table, exactly-once refresh through Iceberg churn, replays no-op, " +
      "a net-zero range commits cursor-only, group images land whole") {
    import graft.catalog.HadoopCatalog
    import graft.core.Schema
    import graft.streaming.{MaterializedAgg, MaterializedTopK}
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_mvtopk").toString
    val cat = new HadoopCatalog(wh, spark)
    val src0 = Seq(("a", 1L, 50L), ("a", 2L, 40L), ("a", 3L, 30L),
      ("b", 4L, 5L)).toDF("g", "id", "score")
    val src = cat.createTable("srctk", Schema.fromSpark(src0.schema),
      properties = Map("format-version" -> "2"))
    src.append(src0)
    val mv = cat.createTable("mvtk", MaterializedTopK.schemaFor(src),
      properties = Map("format-version" -> "2"))
    MaterializedTopK.bootstrap(src, mv, v)
    assert(MaterializedTopK.viewOf(mv.refresh()) === Some(v))
    def mvSet(): Set[(String, Long, Long)] = asSet(mv.refresh().scan.toDF)
    assert(mvSet() === Set(("a", 1L, 50L), ("a", 2L, 40L), ("b", 4L, 5L)))
    // kill a's top row (hole: id 3 promotes), boost b with a new row
    src.delete("id = 1")
    src.append(Seq(("b", 5L, 9L)).toDF("g", "id", "score"))
    val (g1, r1) = MaterializedTopK.refreshOnce(src.refresh(), mv)
    assert(g1 === 2L && r1 === 4L) // both groups' images rewrote
    assert(mvSet() === Set(("a", 2L, 40L), ("a", 3L, 30L),
      ("b", 4L, 5L), ("b", 5L, 9L)))
    // replay no-ops (cursor rode the commit)
    assert(MaterializedTopK.refreshOnce(src, mv) === ((0L, 0L)))
    // net-zero churn: delete + re-insert the SAME row → cursor-only,
    // zero data snapshots on the MV
    val snaps0 = mv.refresh().metadata.snapshots.size
    src.delete("id = 4")
    src.append(Seq(("b", 4L, 5L)).toDF("g", "id", "score"))
    assert(MaterializedTopK.refreshOnce(src.refresh(), mv) === ((0L, 0L)))
    assert(mv.refresh().metadata.snapshots.size === snaps0,
      "a net-zero refresh must not add data snapshots")
    // an aggregate-MV refresh pointed at a top-k MV fails loudly
    val e = intercept[IllegalArgumentException](
      MaterializedAgg.refreshOnce(src, mv))
    assert(e.getMessage.contains("materialized-view") ||
      e.getMessage.contains("view"), e.getMessage)
    // below-boundary churn on a full group: touched but image-identical
    // → cursor-only again
    src.append(Seq(("a", 9L, 1L)).toDF("g", "id", "score"))
    assert(MaterializedTopK.refreshOnce(src.refresh(), mv) === ((0L, 0L)))
    assert(mvSet() === Set(("a", 2L, 40L), ("a", 3L, 30L),
      ("b", 4L, 5L), ("b", 5L, 9L)))
    val want = asSet(IncrementalTopK.init(src.scan.toDF, v))
    assert(mvSet() === want)
  }

  test("FILTERED top-k MV: the top-k of SELECT * WHERE p — churn below p " +
      "is silent, an update out of p retracts from the ranking, the " +
      "elector re-ranks only p's survivors") {
    import graft.catalog.HadoopCatalog
    import graft.core.Schema
    import graft.streaming.MaterializedTopK
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_mvtopkf").toString
    val cat = new HadoopCatalog(wh, spark)
    // tier rides the row; the view ranks only gold rows
    val src0 = Seq(("a", 1L, 50L, "gold"), ("a", 2L, 40L, "gold"),
      ("a", 3L, 30L, "gold"), ("a", 4L, 99L, "basic"))
      .toDF("g", "id", "score", "tier")
    val src = cat.createTable("srctkf", Schema.fromSpark(src0.schema),
      properties = Map("format-version" -> "2"))
    src.append(src0)
    val mv = cat.createTable("mvtkf", MaterializedTopK.schemaFor(src),
      properties = Map("format-version" -> "2"))
    MaterializedTopK.bootstrap(src, mv, v, filter = Some("tier = 'gold'"))
    def ids(): Set[Long] = mv.refresh().scan.toDF.collect()
      .map(_.getAs[Long]("id")).toSet
    assert(ids() === Set(1L, 2L)) // id 4's 99 is basic — never ranked
    // churn below p: a new basic row, even a huge one, is silent
    src.append(Seq(("a", 5L, 200L, "basic")).toDF("g", "id", "score", "tier"))
    assert(MaterializedTopK.refreshOnce(src.refresh(), mv) === ((0L, 0L)))
    assert(ids() === Set(1L, 2L))
    // id 1 demotes OUT of p: retracts from the ranking (hole) — id 3,
    // gold all along, promotes; id 4 promotes INTO p and outranks all
    src.upsert(Seq(("a", 1L, 50L, "basic"), ("a", 4L, 99L, "gold"))
      .toDF("g", "id", "score", "tier"), Seq("id"))
    MaterializedTopK.refreshOnce(src.refresh(), mv)
    assert(ids() === Set(4L, 2L))
    val want = asSet(IncrementalTopK.init(
      src.scan.toDF.filter(col("tier") === "gold"), v))
    assert(asSet(mv.refresh().scan.toDF) === want)
  }

  test("chained differential fuzz: churn across 6 rounds equals the " +
      "from-scratch top-k at every step") {
    val rnd = new scala.util.Random(20260817L)
    val groups = Vector("g0", "g1", "g2", "g3")
    for (scenario <- 1 to 3) {
      var nextId = 1000L
      var live: Seq[(String, Long, Long)] = (0 until 20 + rnd.nextInt(20))
        .map { i => (groups(rnd.nextInt(groups.size)), i.toLong,
          rnd.nextInt(100).toLong) }
      var st = IncrementalTopK.init(rows(live), v)
      for (step <- 1 to 6) {
        val (dead, kept) = live.partition(_ => rnd.nextInt(3) == 0)
        val fresh = (0 until rnd.nextInt(8)).map { _ =>
          nextId += 1
          (groups(rnd.nextInt(groups.size)), nextId, rnd.nextInt(100).toLong)
        }
        val fb = batch(dead.map { case (g, i, s) => (g, i, s, "delete") } ++
          fresh.map { case (g, i, s) => (g, i, s, "insert") })
        live = kept ++ fresh
        val baseNow = rows(live)
        st = IncrementalTopK.applyChangelog(st, fb, v,
          keys => graft.ops.Joins.nullSafeSemi(baseNow, keys, Seq("g")))
        assert(asSet(st) === asSet(IncrementalTopK.init(baseNow, v)),
          s"scenario $scenario diverged at step $step")
      }
    }
  }
}
