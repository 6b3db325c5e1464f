package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinBin

/** The bin-amplified range-join rule: semantics preserved exactly, the
  * nested-loop plan replaced by an equi-join shuffle. */
class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("range-join-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def frames = {
    import spark.implicits._
    // points 0..9999; intervals of span ~50 at varied offsets, some negative
    val points = spark.range(0, 10000).select((col("id") * 7 % 10000 - 2000).as("p"),
      col("id").as("pid"))
    val intervals = spark.range(0, 500)
      .select(col("id").as("iid"),
        (col("id") * 31 % 9000 - 2200).as("lo"))
      .withColumn("hi", col("lo") + (col("iid") % 97))
    (points, intervals)
  }

  private def joined = {
    val (points, intervals) = frames
    points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .groupBy("iid").agg(count(lit(1)).as("n"))
      .orderBy("iid")
  }

  test("rule inert without bin-size conf: plan is the nested loop") {
    RangeJoinBin.install(spark)
    spark.conf.unset(RangeJoinBin.BinSizeConf)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected the default nested loop, got:\n$plan")
  }

  test("binned rewrite: identical rows, no nested loop, negative domains bin right") {
    RangeJoinBin.install(spark)
    spark.conf.unset(RangeJoinBin.BinSizeConf)
    val expected = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    spark.conf.set(RangeJoinBin.BinSizeConf, "64")
    try {
      val q = joined
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rewrite did not fire:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
        plan.contains("BroadcastHashJoin"), s"no equi join in:\n$plan")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == expected, "binned range join changed the result")
    } finally spark.conf.unset(RangeJoinBin.BinSizeConf)
  }

  test("the range_join_binned gate runs the rewrite, not the nested loop") {
    val df = graft.queries.Advanced.rangeJoinBinned(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"gate did not rewrite:\n$plan")
    assert(df.count() > 0)
    // the caller's session stays untouched (clone carries the conf)
    assert(spark.conf.getOption(RangeJoinBin.BinSizeConf).isEmpty)
  }

  test("interval-overlap joins rewrite too, exactly — including inverted intervals") {
    import spark.implicits._
    RangeJoinBin.install(spark)
    spark.conf.unset(RangeJoinBin.BinSizeConf)
    // deliberately include EMPTY/INVERTED intervals (start > end) on both
    // sides: the raw inequalities can still match through them, and the
    // min/max-envelope binning must not lose those pairs
    val a = spark.range(0, 3000).select(col("id").as("aid"),
      (col("id") * 13 % 5000 - 500).as("a_lo"))
      .withColumn("a_hi", col("a_lo") + (col("aid") % 211) - 40) // ~20% inverted
    val b = spark.range(0, 2000).select(col("id").as("bid"),
      (col("id") * 29 % 5000 - 700).as("b_lo"))
      .withColumn("b_hi", col("b_lo") + (col("bid") % 157) - 30)
    def q = a.join(b, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .groupBy("aid").agg(count(lit(1)).as("n"), sum(col("bid")).as("sb"))
      .orderBy("aid")
    val expected = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    spark.conf.set(RangeJoinBin.BinSizeConf, "128")
    try {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"overlap rewrite did not fire:\n$plan")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected,
        s"overlap rewrite changed the result: ${got.size} vs ${expected.size} groups")
    } finally spark.conf.unset(RangeJoinBin.BinSizeConf)
  }

  test("property sweep: rewrite == nested loop across bin widths and shapes") {
    import spark.implicits._
    RangeJoinBin.install(spark)
    // W = 1 (max amplification), W near span, W >> span (few giant bins):
    // all must be exact; only the cost differs
    for (seed <- Seq(7, 23); w <- Seq(1L, 50L, 1000000L)) {
      val a = spark.range(0, 400).select(col("id").as("aid"),
        ((col("id") * (13 + seed)) % 900 - 111).as("lo"))
        .withColumn("hi", col("lo") + (col("aid") * seed % 77) - 8)
      val b = spark.range(0, 300).select(col("id").as("bid"),
        ((col("id") * (29 + seed)) % 900 - 222).as("p"))
      def q = b.join(a, col("p") >= col("lo") && col("p") <= col("hi"))
        .groupBy("bid").agg(count(lit(1)).as("n")).orderBy("bid")
      spark.conf.unset(RangeJoinBin.BinSizeConf)
      val expected = q.collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
      spark.conf.set(RangeJoinBin.BinSizeConf, w.toString)
      try {
        val got = q.collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
        assert(got == expected, s"seed=$seed W=$w diverged")
      } finally spark.conf.unset(RangeJoinBin.BinSizeConf)
    }
  }

  test("a row exploding past max-bins-per-row fails typed, not with an " +
      "opaque array error") {
    RangeJoinBin.install(spark)
    spark.conf.set(RangeJoinBin.BinSizeConf, "1")
    spark.conf.set(RangeJoinBin.MaxBinsConf, "100")
    try {
      import spark.implicits._
      // one outlier interval spans 10,000 bins of width 1 — ceiling is 100
      val pts = Seq(5L).toDF("p")
      val iv = Seq((0L, 10000L)).toDF("lo", "hi")
      val q = pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
      val e = intercept[Exception](q.collect())
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("bin explosion")),
        s"expected the typed bin-explosion error, got: ${messages(e).mkString(" | ")}")
      // within the ceiling the same query runs (fresh Dataset — the plan,
      // and with it the baked-in ceiling, is cached per Dataset)
      spark.conf.set(RangeJoinBin.MaxBinsConf, "100000")
      val q2 = pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
      assert(q2.collect().length === 1)
    } finally {
      spark.conf.unset(RangeJoinBin.BinSizeConf)
      spark.conf.unset(RangeJoinBin.MaxBinsConf)
    }
  }

  test("rewrite declines joins that already have an equi key") {
    RangeJoinBin.install(spark)
    spark.conf.set(RangeJoinBin.BinSizeConf, "64")
    try {
      val (points, intervals) = frames
      val withKey = points.withColumn("k", col("pid") % 5)
        .join(intervals.withColumn("k", col("iid") % 5), Seq("k"))
        .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      // equi-join on k already: plan must not contain the bin columns
      val plan = withKey.queryExecution.optimizedPlan.toString
      assert(!plan.contains("_graft_bin"), s"rule fired on an equi join:\n$plan")
      assert(withKey.count() > 0)
    } finally spark.conf.unset(RangeJoinBin.BinSizeConf)
  }
}
