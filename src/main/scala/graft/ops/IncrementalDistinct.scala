package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import IncrementalAgg.AggView

/** Exact incremental COUNT(DISTINCT c) maintenance — the classic
  * two-level SUPPORT-TABLE design on top of [[IncrementalAgg]]:
  *
  *  - level 1 (the support) maintains
  *    {{{ SELECT keys, c, count(*) AS cnt GROUP BY keys, c }}}
  *    — an ordinary aggregate view with the VALUE column as an extra
  *    group key. Because it is count-only it retracts exactly from ±
  *    deltas (no extremum, so re-election is unreachable): a value row
  *    is born when its first copy arrives and dies when `cnt` hits 0.
  *  - level 2 derives `COUNT(DISTINCT c)` per group as the number of
  *    SURVIVING support rows with a non-null value — support-sized
  *    (one row per live (group, value) pair), never corpus-sized.
  *
  * This is what a plain per-group counter cannot do: distinct counts
  * are not ±retractable (deleting one copy of a duplicated value must
  * NOT decrement), but the support's multiplicities decide exactly.
  * SQL semantics throughout: `COUNT(DISTINCT c)` ignores NULL values
  * (a support row with a null value never counts), null GROUP keys form
  * their own group (the fold's joins are null-safe).
  *
  * At 100 TB the support is a maintained table bucketed by the group
  * keys (it IS a valid [[graft.streaming.MaterializedAgg]] view —
  * `keys = groupKeys :+ valueCol` — so the persisted face gets
  * exactly-once refresh for free); a churn batch touches only its own
  * (group, value) pairs, and the derive step shuffles support rows,
  * not base rows. The reference has no IVM at all.
  */
object IncrementalDistinct {

  /** One distinct-count column over a grouped view: maintain a support
    * per `col` (multi-distinct views compose by keeping one support per
    * counted column). */
  final case class DistinctView(keys: Seq[String], col: String) {
    require(!keys.contains(col), s"distinct column '$col' cannot be a key")
    /** The support IS an aggregate view: group keys + the value. */
    def supportView: AggView = AggView(keys :+ col)
  }

  private def unreachable(keys: DataFrame): DataFrame =
    sys.error("count-only support view never re-elects")

  /** Build the support from scratch over the base relation (bootstrap
    * at the feed cursor; also the differential oracle in tests). */
  def initSupport(base: DataFrame, dv: DistinctView): DataFrame =
    IncrementalAgg.init(
      base.select((dv.keys :+ dv.col).map(col): _*), dv.supportView)

  /** Fold ONE changelog batch (the `_change_type` insert/delete
    * contract) into the support — churn-sized, exact. */
  def applySupport(support: DataFrame, batch: DataFrame,
      dv: DistinctView): DataFrame =
    IncrementalAgg.applyChangelog(support, batch, dv.supportView,
      unreachable)

  /** `COUNT(DISTINCT col)` per group from the support: the number of
    * surviving non-null-value rows. Groups whose only values are null
    * (or that hold no support rows) are absent here — [[withDistinct]]
    * serves them as 0. */
  def distinctCounts(support: DataFrame, dv: DistinctView): DataFrame =
    support.filter(col(dv.col).isNotNull)
      .groupBy(dv.keys.map(col): _*)
      .agg(count(lit(1)).as(s"cd_${dv.col}"))

  /** Attach `cd_<col>` to a maintained per-group state (an
    * [[IncrementalAgg]] view over the SAME keys): null-safe left join,
    * absent support → 0 (SQL's COUNT(DISTINCT) over all-null values). */
  def withDistinct(state: DataFrame, support: DataFrame,
      dv: DistinctView): DataFrame = {
    val st = state.alias("st")
    val cd = distinctCounts(support, dv).alias("cd")
    val cond = dv.keys.map(k => st.col(k) <=> cd.col(k)).reduce(_ && _)
    st.join(cd, cond, "left_outer")
      .select(state.columns.map(c => st.col(c)).toSeq :+
        coalesce(cd.col(s"cd_${dv.col}"), lit(0L)).as(s"cd_${dv.col}"): _*)
  }
}
