package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IncrementalAgg.AggView
import graft.ops.IncrementalJoinAgg
import graft.ops.IncrementalJoinAgg.JoinView

/** Join-view IVM (delta-join maintenance): deterministic pins for every
  * delta shape — fact churn against the dim-at-cursor, dim churn
  * re-enriching only referencing facts, group moves via dim updates,
  * dim deletes dropping facts, same-round churn on BOTH sides — plus a
  * chained differential fuzz against the from-scratch join+aggregate,
  * and an Iceberg pin that the dim-side read PRUNES to the fact delta's
  * join keys (pushed-In through the scan). */
class IncrementalJoinAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // fact(fk, v) ⋈ dim(pk, seg) → GROUP BY seg: cnt, sum(v), min(v), max(v)
  private val jv = JoinView(
    factKeys = Seq("fk"), dimKeys = Seq("pk"),
    agg = AggView(keys = Seq("seg"), sums = Seq("v"),
      mins = Seq("v"), maxs = Seq("v")))

  private def fact(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("fk", "v")
  }
  private def dim(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "seg")
  }
  private def factBatch(rows: Seq[(Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("fk", "v", "_change_type")
  }
  private def dimBatch(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("pk", "seg", "_change_type")
  }

  private def apply1(state: DataFrame, fb: Option[DataFrame],
      db: Option[DataFrame], dimOld: DataFrame, factNew: DataFrame,
      dimNew: DataFrame): DataFrame =
    IncrementalJoinAgg.applyChangelog(state, fb, db, jv,
      dimAtCursor = keys => dimOld.join(keys, Seq("pk"), "left_semi"),
      factAtHead = keys => factNew.join(keys, Seq("fk"), "left_semi"),
      reElect = keys => IncrementalJoinAgg.joinRows(factNew, dimNew, jv)
        .join(keys, Seq("seg"), "left_semi"))

  private def stateMap(st: DataFrame): Map[String, (Long, Any, Any, Any)] =
    st.collect().map { r =>
      String.valueOf(r.getAs[Any]("seg")) ->
        ((r.getAs[Long]("cnt"), r.getAs[Any]("s_v"),
          r.getAs[Any]("mn_v"), r.getAs[Any]("mx_v")))
    }.toMap

  test("fact churn enriches against the dim at cursor: deletes retract " +
      "with their group's enrichment, inserts land, extrema re-elect") {
    val d0 = dim(Seq((1L, "a"), (2L, "b")))
    val f0 = fact(Seq((1L, 10L), (1L, 30L), (2L, 5L)))
    val st0 = IncrementalJoinAgg.init(f0, d0, jv)
    assert(stateMap(st0) === Map(
      "a" -> ((2L, 40L, 10L, 30L)), "b" -> ((1L, 5L, 5L, 5L))))
    // retire a's max holder, insert a new a-fact and a dangling fk
    val fb = factBatch(Seq(
      (1L, 30L, "delete"), (1L, 15L, "insert"), (99L, 7L, "insert")))
    val f1 = fact(Seq((1L, 10L), (1L, 15L), (2L, 5L), (99L, 7L)))
    val st1 = apply1(st0, Some(fb), None, d0, f1, d0)
    assert(stateMap(st1) === Map(
      "a" -> ((2L, 25L, 10L, 15L)), "b" -> ((1L, 5L, 5L, 5L))),
      "a dangling foreign key must not reach the view")
  }

  test("dim update moves ALL referencing facts across groups; dim delete " +
      "drops them from the view") {
    val d0 = dim(Seq((1L, "a"), (2L, "a"), (3L, "c")))
    val f0 = fact(Seq((1L, 10L), (1L, 20L), (2L, 7L), (3L, 3L)))
    val st0 = IncrementalJoinAgg.init(f0, d0, jv)
    // pk 1 moves a→b (update = delete pre-image + insert post-image);
    // pk 3 leaves entirely
    val db = dimBatch(Seq(
      (1L, "a", "delete"), (1L, "b", "insert"), (3L, "c", "delete")))
    val d1 = dim(Seq((1L, "b"), (2L, "a")))
    val st1 = apply1(st0, None, Some(db), d0, f0, d1)
    assert(stateMap(st1) === Map(
      "a" -> ((1L, 7L, 7L, 7L)), "b" -> ((2L, 30L, 10L, 20L))))
  }

  test("both sides churn in one round: the cross term is exact (ΔF joins " +
      "dim-at-cursor, F-at-head joins ΔD)") {
    val d0 = dim(Seq((1L, "a"), (2L, "b")))
    val f0 = fact(Seq((1L, 10L), (2L, 5L)))
    val st0 = IncrementalJoinAgg.init(f0, d0, jv)
    // same round: a NEW fact references pk 1 while pk 1 moves a→b
    val fb = factBatch(Seq((1L, 40L, "insert")))
    val db = dimBatch(Seq((1L, "a", "delete"), (1L, "b", "insert")))
    val f1 = fact(Seq((1L, 10L), (1L, 40L), (2L, 5L)))
    val d1 = dim(Seq((1L, "b"), (2L, "b")))
    val st1 = apply1(st0, Some(fb), Some(db), d0, f1, d1)
    // from scratch: pk1 facts (10, 40) in b, pk2 fact (5) in b
    assert(stateMap(st1) === stateMap(IncrementalJoinAgg.init(f1, d1, jv)))
    assert(stateMap(st1) === Map("b" -> ((3L, 55L, 5L, 40L))))
  }

  test("chained differential fuzz: fact+dim churn across 6 rounds equals " +
      "the from-scratch join+aggregate at every step") {
    val rnd = new scala.util.Random(20260818L)
    val segs = Vector("s0", "s1", "s2", "s3")
    for (scenario <- 1 to 4) {
      var dimRows = (0L until (3 + rnd.nextInt(5)).toLong)
        .map(pk => (pk, segs(rnd.nextInt(segs.size))))
      var factRows = (0 until (10 + rnd.nextInt(30))).map { _ =>
        // fks range past the dim keys: some dangle (inner join drops)
        (rnd.nextInt(12).toLong, (rnd.nextInt(21) - 10).toLong)
      }
      var st = IncrementalJoinAgg.init(fact(factRows), dim(dimRows), jv)
      for (step <- 1 to 6) {
        // fact churn
        val (fDead, fKept) = factRows.partition(_ => rnd.nextInt(4) == 0)
        val fFresh = (0 until rnd.nextInt(8)).map { _ =>
          (rnd.nextInt(12).toLong, (rnd.nextInt(21) - 10).toLong) }
        val fb = factBatch(fDead.map { case (k, v) => (k, v, "delete") } ++
          fFresh.map { case (k, v) => (k, v, "insert") })
        val factNew = fKept ++ fFresh
        // dim churn: moves, deaths, births (pk stays unique throughout)
        val (dDead, dKept) = dimRows.partition(_ => rnd.nextInt(6) == 0)
        val (dMove, dSame) = dKept.partition(_ => rnd.nextInt(4) == 0)
        val dMoved = dMove.map { case (pk, _) => (pk, segs(rnd.nextInt(segs.size))) }
        val usedPks = dimRows.map(_._1).toSet
        val dBorn = (0 until rnd.nextInt(3)).map(_ => rnd.nextInt(12).toLong)
          .distinct.filterNot(usedPks).map(pk => (pk, segs(rnd.nextInt(segs.size))))
        val db = dimBatch(
          dDead.map { case (pk, s) => (pk, s, "delete") } ++
          dMove.map { case (pk, s) => (pk, s, "delete") } ++
          dMoved.map { case (pk, s) => (pk, s, "insert") } ++
          dBorn.map { case (pk, s) => (pk, s, "insert") })
        val dimOld = dimRows
        val dimNew = dSame ++ dMoved ++ dBorn
        st = apply1(st,
          Some(fb).filter(_ => fDead.nonEmpty || fFresh.nonEmpty),
          Some(db).filter(_ =>
            dDead.nonEmpty || dMove.nonEmpty || dBorn.nonEmpty),
          dim(dimOld), fact(factNew), dim(dimNew))
        factRows = factNew
        dimRows = dimNew
        val want = IncrementalJoinAgg.init(fact(factRows), dim(dimRows), jv)
        assert(stateMap(st) === stateMap(want),
          s"scenario $scenario diverged at step $step")
      }
    }
  }

  test("snowflake composition: a TWO-dim join view maintains by CHAINING " +
      "joinDelta — the delta of (F ⋈ D1) is itself a changelog that feeds " +
      "the second join level, all three tables churning in one round") {
    import spark.implicits._
    // F(fk1, fk2, v) ⋈ D1(pk1, a) ⋈ D2(pk2, b) → GROUP BY (a, b), sum(v)
    def f(rows: Seq[(Long, Long, Long)]) = rows.toDF("fk1", "fk2", "v")
    def d1(rows: Seq[(Long, String)]) = rows.toDF("pk1", "a")
    def d2(rows: Seq[(Long, String)]) = rows.toDF("pk2", "b")
    def join3(fx: DataFrame, d1x: DataFrame, d2x: DataFrame): DataFrame = {
      val j1 = fx.join(d1x, fx("fk1") === d1x("pk1"))
        .select(fx("fk2"), fx("v"), d1x("a"))
      j1.join(d2x, j1("fk2") === d2x("pk2"))
        .select(j1("a"), d2x("b"), j1("v"))
    }
    // level 1 CARRIES (fk2, v, a) — a pass-through view whose "keys" are
    // just the columns level 2 consumes
    val jv1 = JoinView(Seq("fk1"), Seq("pk1"),
      AggView(keys = Seq("fk2", "v", "a")))
    val jv2 = JoinView(Seq("fk2"), Seq("pk2"),
      AggView(keys = Seq("a", "b"), sums = Seq("v")))
    val f0 = Seq((1L, 10L, 5L), (1L, 11L, 7L), (2L, 10L, 3L))
    val d10 = Seq((1L, "a0"), (2L, "a1"))
    val d20 = Seq((10L, "b0"), (11L, "b1"))
    val st0 = graft.ops.IncrementalAgg.init(
      join3(f(f0), d1(d10), d2(d20)), jv2.agg)
    // one round churning ALL THREE: a fact retire + insert, a D1 group
    // move, a D2 death + birth
    val fb = Seq((1L, 10L, 5L, "delete"), (2L, 11L, 9L, "insert"))
      .toDF("fk1", "fk2", "v", "_change_type")
    val d1b = Seq((2L, "a1", "delete"), (2L, "a0", "insert"))
      .toDF("pk1", "a", "_change_type")
    val d2b = Seq((11L, "b1", "delete"), (12L, "b2", "insert"),
      (11L, "b9", "insert")).toDF("pk2", "b", "_change_type")
    val f1 = f(Seq((1L, 11L, 7L), (2L, 10L, 3L), (2L, 11L, 9L)))
    val d1old = d1(d10); val d1new = d1(Seq((1L, "a0"), (2L, "a0")))
    val d2old = d2(d20)
    val d2new = d2(Seq((10L, "b0"), (11L, "b9"), (12L, "b2")))
    // Δ(F ⋈ D1): the standard two-sided delta, carrying (fk2, v, a)
    val delta1 = IncrementalJoinAgg.joinDelta(Some(fb), Some(d1b), jv1,
      dimAtCursor = keys => d1old.join(keys, Seq("pk1"), "left_semi"),
      factAtHead = keys => f1.join(keys, Seq("fk1"), "left_semi"))
    // Δ((F ⋈ D1) ⋈ D2): level 1's delta IS the fact changelog of level 2;
    // the fact-at-head closure is the CURRENT level-1 join
    val j1new = f1.join(d1new, f1("fk1") === d1new("pk1"))
      .select(f1("fk2"), f1("v"), d1new("a"))
    val delta2 = IncrementalJoinAgg.joinDelta(delta1, Some(d2b), jv2,
      dimAtCursor = keys => d2old.join(keys, Seq("pk2"), "left_semi"),
      factAtHead = keys => j1new.join(keys, Seq("fk2"), "left_semi"))
    val st1 = graft.ops.IncrementalAgg.applyChangelog(st0, delta2.get,
      jv2.agg, keys => join3(f1, d1new, d2new).join(keys, Seq("a", "b"), "left_semi"))
    val got = st1.orderBy("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("cnt"),
        r.getAs[Long]("s_v"))).toSeq
    val want = graft.ops.IncrementalAgg.init(
        join3(f1, d1new, d2new), jv2.agg).orderBy("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("cnt"),
        r.getAs[Long]("s_v"))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("MaterializedJoinAgg: bootstrap + exactly-once two-cursor refresh; " +
      "fact-only and dim-only rounds; replay no-ops; net-zero is " +
      "cursor-only; stale explicit view fails fast") {
    import graft.catalog.HadoopCatalog
    import graft.core.Schema
    import graft.streaming.MaterializedJoinAgg
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_mvjoin").toString
    val cat = new HadoopCatalog(wh, spark)
    val factRows = Seq((1L, 1L, 10L), (2L, 1L, 30L), (3L, 2L, 5L))
      .toDF("id", "fk", "v")
    val dimRows = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("pk", "seg")
    val fact = cat.createTable("factj", Schema.fromSpark(factRows.schema),
      properties = Map("format-version" -> "2"))
    val dim = cat.createTable("dimj", Schema.fromSpark(dimRows.schema),
      properties = Map("format-version" -> "2"))
    fact.append(factRows); dim.append(dimRows)
    val mv = cat.createTable("mvj",
      MaterializedJoinAgg.schemaFor(jv, fact, dim),
      properties = Map("format-version" -> "2"))
    val (cf0, cd0) = MaterializedJoinAgg.bootstrap(fact, dim, mv, jv)
    assert(cf0 === fact.metadata.currentSnapshotId &&
      cd0 === dim.metadata.currentSnapshotId)
    def mvMap(): Map[String, (Long, Long, Long, Long)] =
      mv.refresh().scan.toDF.collect().map(r =>
        r.getAs[String]("seg") -> ((r.getAs[Long]("cnt"), r.getAs[Long]("s_v"),
          r.getAs[Long]("mn_v"), r.getAs[Long]("mx_v")))).toMap
    assert(mvMap() === Map("a" -> ((2L, 40L, 10L, 30L)),
      "b" -> ((1L, 5L, 5L, 5L))))
    // fact-only round: a's max holder retires (hole through the join)
    fact.delete("id = 2")
    val (r1, d1) = MaterializedJoinAgg.refreshOnce(fact, dim, mv)
    assert(r1 === 1L && d1 === 0L)
    assert(mvMap() === Map("a" -> ((1L, 10L, 10L, 10L)),
      "b" -> ((1L, 5L, 5L, 5L))))
    // replay: neither source moved → detected no-op, no new MV commit
    val snaps = mv.refresh().metadata.snapshots.size
    assert(MaterializedJoinAgg.refreshOnce(fact, dim, mv) === ((0L, 0L)))
    assert(mv.refresh().metadata.snapshots.size === snaps)
    // dim-only round: pk 1 moves a→b (every referencing fact follows),
    // pk 2 dies (its fact leaves the view)
    dim.upsert(Seq((1L, "b")).toDF("pk", "seg"), Seq("pk"))
    dim.delete("pk = 2")
    val (r2, d2) = MaterializedJoinAgg.refreshOnce(fact, dim, mv)
    assert(r2 === 1L && d2 === 1L, s"got ($r2, $d2)")
    assert(mvMap() === Map("b" -> ((1L, 10L, 10L, 10L))))
    // net-zero churn on the fact: delete + reinsert an identical row —
    // cursor-only commit, zero data snapshots, files untouched
    fact.delete("id = 1")
    fact.append(Seq((1L, 1L, 10L)).toDF("id", "fk", "v"))
    val snaps2 = mv.refresh().metadata.snapshots.size
    val files2 = mv.scan.toDF.inputFiles.toSet
    assert(MaterializedJoinAgg.refreshOnce(fact, dim, mv) === ((0L, 0L)))
    assert(mv.refresh().metadata.snapshots.size === snaps2)
    assert(mv.scan.toDF.inputFiles.toSet === files2)
    assert(mv.metadata.properties(
      MaterializedJoinAgg.FactCursorProp).toLong ===
      fact.refresh().metadata.currentSnapshotId.get)
    assert(mv.metadata.properties(
      MaterializedJoinAgg.DimCursorProp).toLong ===
      dim.refresh().metadata.currentSnapshotId.get)
    // a different explicitly-passed view fails fast
    val stale = jv.copy(agg = jv.agg.copy(sums = Nil))
    intercept[IllegalArgumentException](
      MaterializedJoinAgg.refreshOnce(fact, dim, mv, stale))
    // bootstrap refuses a table that is already an MV
    intercept[IllegalArgumentException](
      MaterializedJoinAgg.bootstrap(fact, dim, mv, jv))
  }

  test("FILTERED join MV: a predicate over the JOINED row (a non-view dim " +
      "column) retracts/inserts exactly as dim churn moves facts across p") {
    import graft.catalog.HadoopCatalog
    import graft.core.Schema
    import graft.streaming.MaterializedJoinAgg
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_mvjfilt").toString
    val cat = new HadoopCatalog(wh, spark)
    // dim carries a TIER column the aggregates never consume — the
    // filter references it through the join
    val factRows = Seq((1L, 1L, 10L), (2L, 1L, 30L), (3L, 2L, 5L), (4L, 3L, 7L))
      .toDF("id", "fk", "v")
    val dimRows = Seq((1L, "a", "gold"), (2L, "a", "basic"), (3L, "b", "gold"))
      .toDF("pk", "seg", "tier")
    val fact = cat.createTable("factg", Schema.fromSpark(factRows.schema),
      properties = Map("format-version" -> "2"))
    val dim = cat.createTable("dimg", Schema.fromSpark(dimRows.schema),
      properties = Map("format-version" -> "2"))
    fact.append(factRows); dim.append(dimRows)
    val mv = cat.createTable("mvg",
      MaterializedJoinAgg.schemaFor(jv, fact, dim),
      properties = Map("format-version" -> "2"))
    MaterializedJoinAgg.bootstrap(fact, dim, mv, jv,
      filter = Some("tier = 'gold'"))
    def mvMap(): Map[String, (Long, Long)] =
      mv.refresh().scan.toDF.collect().map(r =>
        r.getAs[String]("seg") -> ((r.getAs[Long]("cnt"),
          r.getAs[Long]("s_v")))).toMap
    // only gold-tier customers aggregate: pk1 (a: 10+30), pk3 (b: 7)
    assert(mvMap() === Map("a" -> ((2L, 40L)), "b" -> ((1L, 7L))))
    // dim churn across p: pk2 basic→gold (its fact ENTERS the view),
    // pk1 gold→basic (its two facts LEAVE — group a survives via pk2)
    dim.upsert(Seq((2L, "a", "gold"), (1L, "a", "basic"))
      .toDF("pk", "seg", "tier"), Seq("pk"))
    val (r1, d1) = MaterializedJoinAgg.refreshOnce(fact, dim, mv)
    assert(mvMap() === Map("a" -> ((1L, 5L)), "b" -> ((1L, 7L))))
    assert(r1 === 1L && d1 === 0L)
    // fact churn below p stays silent; above p folds
    fact.upsert(Seq((5L, 1L, 99L), (6L, 3L, 2L)).toDF("id", "fk", "v"), Seq("id"))
    MaterializedJoinAgg.refreshOnce(fact, dim, mv)
    // fk1 is basic now (silent); fk3 is gold → b gains 2
    assert(mvMap() === Map("a" -> ((1L, 5L)), "b" -> ((2L, 9L))))
  }

  test("persisted join-MV differential fuzz: 3 random churn rounds on BOTH " +
      "Iceberg tables, each folded by refreshOnce, equal from-scratch at " +
      "every step") {
    import graft.catalog.HadoopCatalog
    import graft.core.Schema
    import graft.streaming.MaterializedJoinAgg
    import spark.implicits._
    val rnd = new scala.util.Random(20260819L)
    val segs = Vector("s0", "s1", "s2")
    val wh = java.nio.file.Files.createTempDirectory("graft_mvjfuzz").toString
    val cat = new HadoopCatalog(wh, spark)
    var factRows = (1L to 60L).map(id =>
      (id, rnd.nextInt(10).toLong, (rnd.nextInt(41) - 20).toLong))
    var dimRows = (0L until 8L).map(pk => (pk, segs(rnd.nextInt(segs.size))))
    val fact = cat.createTable("factf",
      Schema.fromSpark(factRows.toDF("id", "fk", "v").schema),
      properties = Map("format-version" -> "2"))
    val dim = cat.createTable("dimf",
      Schema.fromSpark(dimRows.toDF("pk", "seg").schema),
      properties = Map("format-version" -> "2"))
    fact.append(factRows.toDF("id", "fk", "v"))
    dim.append(dimRows.toDF("pk", "seg"))
    val mv = cat.createTable("mvf2",
      MaterializedJoinAgg.schemaFor(jv, fact, dim),
      properties = Map("format-version" -> "2"))
    MaterializedJoinAgg.bootstrap(fact, dim, mv, jv)
    var nextId = 1000L
    for (round <- 1 to 3) {
      // fact churn: delete a subset, upsert (move/update) a subset, births
      val dead = factRows.filter(_ => rnd.nextInt(4) == 0)
      if (dead.nonEmpty)
        fact.delete(dead.map(_._1).mkString("id in (", ",", ")"))
      val ups = factRows.filterNot(dead.contains).filter(_ => rnd.nextInt(4) == 0)
        .map { case (id, _, _) =>
          (id, rnd.nextInt(10).toLong, (rnd.nextInt(41) - 20).toLong) }
      val born = (0 until rnd.nextInt(5)).map { _ =>
        nextId += 1; (nextId, rnd.nextInt(10).toLong, (rnd.nextInt(41) - 20).toLong) }
      if ((ups ++ born).nonEmpty)
        fact.upsert((ups ++ born).toDF("id", "fk", "v"), Seq("id"))
      factRows = factRows.filterNot(dead.contains)
        .filterNot(r => ups.exists(_._1 == r._1)) ++ ups ++ born
      // dim churn: group moves and a possible death
      val moves = dimRows.filter(_ => rnd.nextInt(3) == 0)
        .map { case (pk, _) => (pk, segs(rnd.nextInt(segs.size))) }
      if (moves.nonEmpty) dim.upsert(moves.toDF("pk", "seg"), Seq("pk"))
      dimRows = dimRows.map(r => moves.find(_._1 == r._1).getOrElse(r))
      if (rnd.nextInt(3) == 0 && dimRows.size > 2) {
        val gone = dimRows(rnd.nextInt(dimRows.size))._1
        dim.delete(s"pk = $gone")
        dimRows = dimRows.filterNot(_._1 == gone)
      }
      MaterializedJoinAgg.refreshOnce(fact.refresh(), dim.refresh(), mv)
      val got = stateMap(mv.refresh().scan.toDF)
      val want = stateMap(IncrementalJoinAgg.init(
        factRows.toDF("id", "fk", "v"), dimRows.toDF("pk", "seg"), jv))
      assert(got === want, s"persisted fuzz diverged at round $round")
    }
  }

  test("persisted LEFT OUTER MV: the join type rides the table's " +
      "properties; dim births unpad and deaths repad through the " +
      "changelog feed, exactly-once") {
    import graft.catalog.HadoopCatalog
    import graft.core.Schema
    import graft.streaming.MaterializedJoinAgg
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_mvjleft").toString
    val cat = new HadoopCatalog(wh, spark)
    val jvLeft = jv.copy(joinType = "left")
    // fks 1,2,9 — pk 9 has no dim row: pads under the NULL group
    val factRows = Seq((1L, 1L, 10L), (2L, 2L, 30L), (3L, 9L, 5L), (4L, 9L, 8L))
      .toDF("id", "fk", "v")
    val dimRows = Seq((1L, "a"), (2L, "b")).toDF("pk", "seg")
    val fact = cat.createTable("factl", Schema.fromSpark(factRows.schema),
      properties = Map("format-version" -> "2"))
    val dim = cat.createTable("diml", Schema.fromSpark(dimRows.schema),
      properties = Map("format-version" -> "2"))
    fact.append(factRows); dim.append(dimRows)
    val mv = cat.createTable("mvl",
      MaterializedJoinAgg.schemaFor(jvLeft, fact, dim),
      properties = Map("format-version" -> "2"))
    MaterializedJoinAgg.bootstrap(fact, dim, mv, jvLeft)
    assert(MaterializedJoinAgg.viewOf(mv.refresh()) === Some(jvLeft),
      "the join type must ride the MV's properties")
    def mvMap(): Map[String, (Long, Long)] =
      mv.refresh().scan.toDF.collect().map(r =>
        String.valueOf(r.getAs[Any]("seg")) ->
          ((r.getAs[Long]("cnt"), r.getAs[Long]("s_v")))).toMap
    assert(mvMap() === Map(
      "a" -> ((1L, 10L)), "b" -> ((1L, 30L)), "null" -> ((2L, 13L))))
    // dim BIRTH pk=9: the two pads retract into the new group — and dim
    // DEATH pk=1 repads its fact, one refresh folding both
    dim.append(Seq((9L, "c")).toDF("pk", "seg"))
    dim.delete("pk = 1")
    MaterializedJoinAgg.refreshOnce(fact.refresh(), dim.refresh(), mv)
    assert(mvMap() === Map(
      "b" -> ((1L, 30L)), "c" -> ((2L, 13L)), "null" -> ((1L, 10L))))
    // replay no-ops (exactly-once)
    assert(MaterializedJoinAgg.refreshOnce(fact, dim, mv) === ((0L, 0L)))
    // fact churn against the padded group: retire one pad... (fk=1 still
    // dangles — pk 1 died), matching the from-scratch left join
    fact.delete("id = 1")
    MaterializedJoinAgg.refreshOnce(fact.refresh(), dim, mv)
    assert(mvMap() === Map("b" -> ((1L, 30L)), "c" -> ((2L, 13L))))
    val want = stateMap(IncrementalJoinAgg.init(
      fact.scan.toDF.select(col("fk"), col("v")),
      dim.scan.toDF, jvLeft))
    assert(stateMap(mv.refresh().scan.toDF) === want)
  }

  test("dim-side read prunes to the fact delta's join keys: pushed-In " +
      "through an Iceberg scan opens only bound-overlapping dim files") {
    import graft.catalog.HadoopCatalog
    import graft.core.{Schema, In}
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_jivm").toString
    val cat = new HadoopCatalog(wh, spark)
    // dim files with DISJOINT pk ranges (3 single-file appends)
    def dimSlice(lo: Long, hi: Long, seg: String) =
      (lo until hi).map(pk => (pk, seg)).toDF("pk", "seg").repartition(1)
    val dimTab = cat.createTable("dimp", Schema.fromSpark(
      dimSlice(0, 1, "x").schema), properties = Map("format-version" -> "2"))
    dimTab.append(dimSlice(0L, 100L, "a"))
    val dimFilesA = dimTab.refresh().scan.toDF.inputFiles.toSet
    dimTab.append(dimSlice(100L, 200L, "b"))
    dimTab.append(dimSlice(200L, 300L, "c"))
    val d0 = dimTab.refresh().metadata.currentSnapshotId.get
    val f0 = fact(Seq((5L, 10L), (7L, 20L), (300L, 9L)))
    val st0 = IncrementalJoinAgg.init(
      f0, dimTab.scan.toDF.withColumnRenamed("pk", "pk"), jv)
    // the fact delta touches fks 5 and 7 only — both in file A's range
    val fb = factBatch(Seq((5L, 10L, "delete"), (7L, 25L, "insert")))
    val f1 = fact(Seq((7L, 20L), (7L, 25L), (300L, 9L)))
    var dimRead: Set[String] = Set.empty
    val st1 = IncrementalJoinAgg.applyChangelog(st0, Some(fb), None, jv,
      dimAtCursor = keys => {
        // the gate-shaped elector: collect the churn-sized key set and
        // push it into the scan — metrics pruning keeps only files whose
        // pk bounds overlap (the MV-engine hole-election machinery)
        val pks = keys.select(col("pk")).distinct()
          .collect().map(_.getLong(0)).toSeq
        val base = dimTab.scan.useSnapshot(d0).filter(In("pk", pks)).toDF
        dimRead = base.inputFiles.toSet
        base.join(keys, Seq("pk"), "left_semi")
      },
      factAtHead = keys => f1.join(keys, Seq("fk"), "left_semi"),
      reElect = keys => IncrementalJoinAgg.joinRows(
        f1, dimTab.scan.useSnapshot(d0).toDF, jv)
        .join(keys, Seq("seg"), "left_semi"))
    assert(dimRead.nonEmpty && dimRead.subsetOf(dimFilesA),
      s"dim read must open only file A, read: ${dimRead -- dimFilesA}")
    assert(stateMap(st1) === Map("a" -> ((2L, 45L, 20L, 25L))))
  }

  // ---- LEFT OUTER join views (r15): pads + presence-transition repads ----

  private val jvL = jv.copy(joinType = "left")

  private def apply1L(state: DataFrame, fb: Option[DataFrame],
      db: Option[DataFrame], dimOld: DataFrame, factNew: DataFrame,
      dimNew: DataFrame): DataFrame =
    IncrementalJoinAgg.applyChangelog(state, fb, db, jvL,
      dimAtCursor = keys => dimOld.join(keys, Seq("pk"), "left_semi"),
      factAtHead = keys => factNew.join(keys, Seq("fk"), "left_semi"),
      // the NULL group (pads) can hole too — its key tuple is (null),
      // so the elector's semi-join must be null-safe
      reElect = keys => graft.ops.Joins.nullSafeSemi(
        IncrementalJoinAgg.joinRows(factNew, dimNew, jvL), keys, Seq("seg")))

  test("LEFT OUTER view: dangling facts pad under the NULL group; a dim " +
      "birth retracts its facts' pads; a dim death repads survivors; an " +
      "update (net 0) moves groups without touching pads; retiring a " +
      "pad re-elects the NULL group's extremum null-safely") {
    val d0 = dim(Seq((1L, "a")))
    val f0 = fact(Seq((1L, 10L), (2L, 7L), (2L, 3L))) // fk=2 dangles
    val st0 = IncrementalJoinAgg.init(f0, d0, jvL)
    assert(stateMap(st0) === Map(
      "a" -> ((1L, 10L, 10L, 10L)), "null" -> ((2L, 10L, 3L, 7L))))
    // dim birth pk=2: its facts' pads retract, matched rows land
    val db1 = dimBatch(Seq((2L, "b", "insert")))
    val d1 = dim(Seq((1L, "a"), (2L, "b")))
    val st1 = apply1L(st0, None, Some(db1), d0, f0, d1)
    assert(stateMap(st1) === Map(
      "a" -> ((1L, 10L, 10L, 10L)), "b" -> ((2L, 10L, 3L, 7L))))
    // dim death pk=1: its fact repads into the NULL group
    val db2 = dimBatch(Seq((1L, "a", "delete")))
    val d2 = dim(Seq((2L, "b")))
    val st2 = apply1L(st1, None, Some(db2), d1, f0, d2)
    assert(stateMap(st2) === Map(
      "null" -> ((1L, 10L, 10L, 10L)), "b" -> ((2L, 10L, 3L, 7L))))
    // dim UPDATE (delete+insert, net 0): group moves, pads untouched
    val db3 = dimBatch(Seq((2L, "b", "delete"), (2L, "c", "insert")))
    val d3 = dim(Seq((2L, "c")))
    val st3 = apply1L(st2, None, Some(db3), d2, f0, d3)
    assert(stateMap(st3) === Map(
      "null" -> ((1L, 10L, 10L, 10L)), "c" -> ((2L, 10L, 3L, 7L))))
    // fact churn on the padded side: retire the NULL group's extremum
    // holder (fk=1 dangles now) — hole re-election under the null key
    val fb = factBatch(Seq((1L, 10L, "delete"), (1L, 4L, "insert")))
    val f1 = fact(Seq((1L, 4L), (2L, 7L), (2L, 3L)))
    val st4 = apply1L(st3, Some(fb), None, d3, f1, d3)
    assert(stateMap(st4) === Map(
      "null" -> ((1L, 4L, 4L, 4L)), "c" -> ((2L, 10L, 3L, 7L))))
  }

  test("LEFT OUTER cross terms are exact: a fact and its dim row born in " +
      "one round cancel pads; a fact dying with its dim row nets clean") {
    val d0 = dim(Seq((1L, "a")))
    val f0 = fact(Seq((1L, 10L)))
    val st0 = IncrementalJoinAgg.init(f0, d0, jvL)
    // same round: fact fk=2 AND dim pk=2 born; fact (1,10) dies WITH pk 1
    val fb = factBatch(Seq((2L, 5L, "insert"), (1L, 10L, "delete")))
    val db = dimBatch(Seq((2L, "b", "insert"), (1L, "a", "delete")))
    val f1 = fact(Seq((2L, 5L)))
    val d1 = dim(Seq((2L, "b")))
    val st1 = apply1L(st0, Some(fb), Some(db), d0, f1, d1)
    assert(stateMap(st1) === stateMap(IncrementalJoinAgg.init(f1, d1, jvL)))
    assert(stateMap(st1) === Map("b" -> ((1L, 5L, 5L, 5L))))
  }

  test("LEFT OUTER chained differential fuzz: fact+dim churn across 6 " +
      "rounds equals the from-scratch left join+aggregate at every step") {
    val rnd = new scala.util.Random(20260816L)
    val segs = Vector("s0", "s1", "s2", "s3")
    for (scenario <- 1 to 4) {
      var dimRows = (0L until (3 + rnd.nextInt(5)).toLong)
        .map(pk => (pk, segs(rnd.nextInt(segs.size))))
      var factRows = (0 until (10 + rnd.nextInt(30))).map { _ =>
        // fks range past the dim keys: some dangle (left join PADS)
        (rnd.nextInt(12).toLong, (rnd.nextInt(21) - 10).toLong)
      }
      var st = IncrementalJoinAgg.init(fact(factRows), dim(dimRows), jvL)
      for (step <- 1 to 6) {
        val (fDead, fKept) = factRows.partition(_ => rnd.nextInt(4) == 0)
        val fFresh = (0 until rnd.nextInt(8)).map { _ =>
          (rnd.nextInt(12).toLong, (rnd.nextInt(21) - 10).toLong) }
        val fb = factBatch(fDead.map { case (k, v) => (k, v, "delete") } ++
          fFresh.map { case (k, v) => (k, v, "insert") })
        val factNew = fKept ++ fFresh
        // dim churn: moves (net 0), deaths (repads), births (unpads)
        val (dDead, dKept) = dimRows.partition(_ => rnd.nextInt(6) == 0)
        val (dMove, dSame) = dKept.partition(_ => rnd.nextInt(4) == 0)
        val dMoved = dMove.map { case (pk, _) => (pk, segs(rnd.nextInt(segs.size))) }
        val usedPks = dimRows.map(_._1).toSet
        val dBorn = (0 until rnd.nextInt(3)).map(_ => rnd.nextInt(12).toLong)
          .distinct.filterNot(usedPks).map(pk => (pk, segs(rnd.nextInt(segs.size))))
        val db = dimBatch(
          dDead.map { case (pk, s) => (pk, s, "delete") } ++
          dMove.map { case (pk, s) => (pk, s, "delete") } ++
          dMoved.map { case (pk, s) => (pk, s, "insert") } ++
          dBorn.map { case (pk, s) => (pk, s, "insert") })
        val dimOld = dimRows
        val dimNew = dSame ++ dMoved ++ dBorn
        st = apply1L(st,
          Some(fb).filter(_ => fDead.nonEmpty || fFresh.nonEmpty),
          Some(db).filter(_ =>
            dDead.nonEmpty || dMove.nonEmpty || dBorn.nonEmpty),
          dim(dimOld), fact(factNew), dim(dimNew))
        factRows = factNew
        dimRows = dimNew
        val want = IncrementalJoinAgg.init(fact(factRows), dim(dimRows), jvL)
        assert(stateMap(st) === stateMap(want),
          s"left-outer scenario $scenario diverged at step $step")
      }
    }
  }
}
