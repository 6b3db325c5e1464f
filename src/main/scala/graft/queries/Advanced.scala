package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Additional relational surface exercised through the engine: multi-level
  * aggregation (ROLLUP), set operations, event sessionization (windowed
  * gap detection), and a salted two-phase aggregation — the skew-
  * mitigation pattern from SCALING.md with an exact oracle (salting must
  * not change the answer).
  */
object Advanced {
  import Tables._

  /** ROLLUP aggregation with exact decimal sums. */
  def rollup(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(Money)).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }
  val rollupSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Set operations: INTERSECT and EXCEPT through the scan. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val building = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    building.intersect(urgent)
      .unionByName(building.exceptAll(building.intersect(urgent)).distinct()
        .withColumn("c_custkey", -col("c_custkey")))
      .orderBy(col("c_custkey"))
  }
  val setOpsSql =
    """SELECT c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  INTERSECT
      |  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |  UNION
      |  SELECT -c_custkey FROM (
      |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |    EXCEPT
      |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |) ORDER BY c_custkey""".stripMargin

  /** Event sessionization: a session break is a ≥30-minute silence per
    * user; emit per-user session counts. `events.ts` is parquet
    * timestamp[us] (TIMESTAMP_NTZ to Spark); with the session timezone
    * pinned to UTC the NTZ→instant cast is identity, so `unix_micros`
    * yields exact epoch-micros for the gap arithmetic. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev.withColumn("prev", lag(col("ts_us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull || col("ts_us") - col("prev") > 1800000000L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }
  val sessionizeSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |flagged AS (
      |  SELECT user_id,
      |    CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
      |           OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
      |              > 1800000000 THEN 1 ELSE 0 END AS new_session
      |  FROM ev)
      |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
      |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Salted two-phase aggregation: partial sums on (key, salt) then final
    * on key — the skew-mitigation shape; the oracle is the plain GROUP BY,
    * proving salting preserves the answer (decimal-exact sums). */
  def skewSaltedAgg(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy(col("event_type"), col("salt"))
      .agg(sum(col("value").cast(Money)).as("part_sum"), count(lit(1)).as("part_n"))
      .groupBy(col("event_type"))
      .agg(sum(col("part_sum")).cast("double").as("total_value"),
        sum(col("part_n")).as("n"))
      .orderBy(col("event_type"))
  }
  val skewSaltedAggSql =
    """SELECT event_type,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** AS-OF join: match every event to the latest "checkpoint" event
    * (event_id % 10 = 0) of the same user at or before its timestamp.
    * Spark lacks a native as-of join — composed as union + ordered window
    * `last(ignoreNulls)` (preference (a) of the custom-operator ladder:
    * compose built-ins before writing a SparkPlan). One shuffle on
    * user_id; no range cross join. Oracle: DuckDB's native ASOF JOIN. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
    val left = ev.select(col("user_id"), col("ts_us"), col("event_id"),
      lit(null).cast("long").as("cp_id"), lit(0).as("is_right"))
    val right = ev.filter(col("event_id") % 10 === 0)
      .select(col("user_id"), col("ts_us"), lit(null).cast("long").as("event_id"),
        col("event_id").as("cp_id"), lit(1).as("is_right"))
    // right rows sort before left rows at equal ts so `>=` matches
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("is_right").desc, col("cp_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("asof_cp", last(col("cp_id"), ignoreNulls = true).over(w))
      .filter(col("is_right") === 0)
      .select(col("event_id"), col("user_id"), col("asof_cp"))
      .orderBy(col("event_id"))
  }
  val asofJoinSql =
    """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |cp AS (SELECT user_id, event_id AS cp_id, ts_us FROM ev WHERE event_id % 10 = 0)
      |SELECT ev.event_id, ev.user_id, cp.cp_id AS asof_cp
      |FROM ev ASOF LEFT JOIN cp
      |  ON ev.user_id = cp.user_id AND ev.ts_us >= cp.ts_us
      |ORDER BY ev.event_id""".stripMargin

  /** CUBE aggregation — all 2² grouping combinations in one pass (Spark
    * expands grouping sets before the shuffle; one Exchange total). */
  def cube2(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(col("o_totalprice").cast(Money)).cast("double").as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }
  val cube2Sql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  count(*) AS n
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** PIVOT — orders count + exact price sum per status, one column group
    * per priority class. Spark's pivot is conditional aggregation after
    * a single shuffle on the row key; the oracle spells the same thing
    * as FILTER'd aggregates. The pivot values are enumerated literals,
    * so the plan never needs a distinct-values pre-pass (the
    * two-argument pivot avoids an extra job at scale). */
  def pivotAgg(s: SparkSession, dir: String): DataFrame = {
    val pr = Seq("1-URGENT", "2-HIGH", "3-MEDIUM")
    t(s, dir, "orders")
      .filter(col("o_orderpriority").isin(pr: _*))
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", pr)
      .agg(sum(col("o_totalprice").cast(Money)).cast("double"))
      .select(col("o_orderstatus").as("status"),
        col("1-URGENT").as("urgent_price"),
        col("2-HIGH").as("high_price"),
        col("3-MEDIUM").as("medium_price"))
      .orderBy(col("status"))
  }
  val pivotAggSql =
    """SELECT o_orderstatus AS status,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_price,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderpriority = '2-HIGH') AS DOUBLE) AS high_price,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderpriority = '3-MEDIUM') AS DOUBLE) AS medium_price
      |FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  /** RANGE JOIN through the bin rule (plans/RangeJoin.scala, tier (c) of
    * the custom-operator ladder): every event point joined to the
    * 10-minute checkpoint windows containing it, written as the RAW
    * BETWEEN condition — no manual binning in the query. Without the
    * rule Spark nested-loops |events|×|windows| (1.8e10 pair evals at
    * sf0.1); with `spark.graft.range-join.bin-size` set near the window
    * span the optimizer rewrites to an explode + equi-join shuffle and
    * the ORIGINAL predicate stays as the residual, so results are
    * provably identical (this oracle gate + RangeJoinSpec's
    * equal-rows assert). */
  def rangeJoinBinned(s: SparkSession, dir: String): DataFrame = {
    // cloned session: the rule reads the bin-size conf at OPTIMIZATION
    // time (the caller materializes this frame lazily), so a scoped-conf
    // window around construction would have reset by then — the clone
    // carries the conf for the frame's whole life without mutating the
    // caller's session (same pattern as the per-operation parquet confs)
    val s2 = org.apache.spark.sql.GraftBridge.cloneSession(s)
    s2.conf.set(graft.plans.RangeJoinBin.BinSizeConf, "600000000")
    graft.plans.RangeJoinBin.install(s2)
    val ev = t(s2, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
    val points = ev.select(col("event_id"), col("ts_us").as("p"))
    val windows = ev.filter(col("event_id") % 20 === 0)
      .select(col("event_id").as("iid"), col("ts_us").as("lo"),
        (col("ts_us") + 600000000L).as("hi"))
    points.join(windows, col("p") >= col("lo") && col("p") <= col("hi"))
      .groupBy(col("iid"))
      .agg(count(lit(1)).as("n_points"))
      .orderBy(col("iid"))
  }
  val rangeJoinBinnedSql =
    """WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events),
      |win AS (SELECT event_id AS iid, ts_us AS lo, ts_us + 600000000 AS hi
      |        FROM ev WHERE event_id % 20 = 0)
      |SELECT iid, count(*) AS n_points
      |FROM ev JOIN win ON ev.ts_us >= win.lo AND ev.ts_us <= win.hi
      |GROUP BY iid ORDER BY iid""".stripMargin

  /** INTERVAL-OVERLAP JOIN through the same bin rule: per-user activity
    * bursts ([ts, ts+5min] around each click) overlapped against
    * maintenance windows ([ts, ts+15min] around each % 50 event), raw
    * `a.lo <= b.hi AND b.lo <= a.hi` — the rule's envelope/canonical-bin
    * generalization fires (RangeJoinSpec proves exactness incl.
    * inverted intervals; this gate hash-checks against DuckDB's
    * IEJoin). */
  def intervalOverlapJoin(s: SparkSession, dir: String): DataFrame = {
    val s2 = org.apache.spark.sql.GraftBridge.cloneSession(s)
    s2.conf.set(graft.plans.RangeJoinBin.BinSizeConf, "900000000")
    graft.plans.RangeJoinBin.install(s2)
    val ev = t(s2, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
    val bursts = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("burst_id"), col("ts_us").as("a_lo"),
        (col("ts_us") + 300000000L).as("a_hi"))
    val windows = ev.filter(col("event_id") % 50 === 0)
      .select(col("event_id").as("win_id"), col("ts_us").as("b_lo"),
        (col("ts_us") + 900000000L).as("b_hi"))
    bursts.join(windows, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .groupBy(col("win_id"))
      .agg(count(lit(1)).as("n_bursts"), min(col("burst_id")).as("first_burst"))
      .orderBy(col("win_id"))
  }
  val intervalOverlapJoinSql =
    """WITH ev AS (SELECT event_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |bursts AS (SELECT event_id AS burst_id, ts_us AS a_lo, ts_us + 300000000 AS a_hi
      |           FROM ev WHERE event_type = 'click'),
      |win AS (SELECT event_id AS win_id, ts_us AS b_lo, ts_us + 900000000 AS b_hi
      |        FROM ev WHERE event_id % 50 = 0)
      |SELECT win_id, count(*) AS n_bursts, min(burst_id) AS first_burst
      |FROM bursts JOIN win ON a_lo <= b_hi AND b_lo <= a_hi
      |GROUP BY win_id ORDER BY win_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "interval_overlap_join" -> (intervalOverlapJoin _),
    "range_join_binned" -> (rangeJoinBinned _),
    "cube_agg" -> (cube2 _),
    "pivot_agg" -> (pivotAgg _),
    "asof_join" -> (asofJoin _),
    "rollup_agg" -> (rollup _),
    "set_ops" -> (setOps _),
    "ev_sessionize" -> (sessionize _),
    "skew_salted_agg" -> (skewSaltedAgg _),
  )

  val oracles: Map[String, String] = Map(
    "asof_join" -> asofJoinSql,
    "rollup_agg" -> rollupSql,
    "range_join_binned" -> rangeJoinBinnedSql,
    "interval_overlap_join" -> intervalOverlapJoinSql,
    "cube_agg" -> cube2Sql,
    "pivot_agg" -> pivotAggSql,
    "set_ops" -> setOpsSql,
    "ev_sessionize" -> sessionizeSql,
    "skew_salted_agg" -> skewSaltedAggSql,
  )
}
