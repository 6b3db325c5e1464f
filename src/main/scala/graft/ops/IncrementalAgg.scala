package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic INCREMENTAL AGGREGATE-VIEW MAINTENANCE (IVM) from a changelog
  * feed — the unifying engine behind the per-use-case incremental
  * operators (curation argmax, TF-IDF df-stats, ANN postings): a
  * declarative `GROUP BY keys` view with count / sum / avg / min / max
  * aggregates, maintained from one CDC batch without re-scanning the
  * corpus.
  *
  * The feed contract is the v2-compatible changelog face
  * (`TableChanges.changelog` / the `graft-changelog` source): every
  * change surfaces as `_change_type` 'insert' (post-image) or 'delete'
  * (pre-image), an update being a delete+insert pair. Because the
  * pre-image rides the feed, DISTRIBUTIVE aggregates retract exactly:
  *
  *  - `cnt` (count(*)) and `s_<c>` (sum(c)) absorb the batch as ±deltas
  *    in one churn-sized groupBy + one key-join against the state —
  *    never a corpus read; `avg` serves as `s_<c> / cnt`.
  *  - `mn_<c>` / `mx_<c>` (min/max) are NOT retractable: an extremum can
  *    only grow tighter from inserts (`least/greatest` with the batch's
  *    per-group insert extrema), but a retired row that may have HELD
  *    the extremum leaves a HOLE — those groups (and only those) are
  *    re-elected by the caller-supplied `reElect` scan over the current
  *    base, exactly the survivorship shape of the curation winner
  *    election generalized from argmax to any min/max column.
  *
  * At 100 TB the state is a maintained Iceberg table bucketed by the
  * group keys: a batch shuffles churn-sized deltas, the state join is
  * MERGE-INTO shaped, and the re-election scan is bounded by the hole
  * groups' keys — when the keys align with the base table's partitioning
  * the caller's `reElect` prunes to those partitions' files (the
  * `ds_mv_incremental` gate passes a capped IN-predicate scan). Groups
  * whose count reaches zero leave the state; groups first seen in the
  * batch are born from their own deltas.
  *
  * Null semantics match SQL: sum/min/max ignore null values, and SQL's
  * `sum` over a group whose remaining values are ALL null is NULL, not
  * 0 — so each sum carries a companion non-null count `nn_<c>` in the
  * state, and `s_<c>` nulls out exactly when `nn_<c>` reaches 0 (the
  * case a plain ±delta gets wrong: retracting a group's last non-null
  * value leaves `s0 + d0 = 0` where SQL says NULL). `cnt` is count(*).
  * Null KEY values form their own group — the state join is null-safe
  * (`<=>`).
  */
object IncrementalAgg {

  /** The view definition: group keys plus aggregate column lists. State
    * column layout: `keys* , cnt, s_<c>*, nn_<c>*, mn_<c>*, mx_<c>*`
    * (`nn_<c>` = non-null count feeding `s_<c>`, the SQL-null guard). */
  final case class AggView(
      keys: Seq[String],
      sums: Seq[String] = Nil,
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil) {
    def stateCols: Seq[String] =
      keys ++ ("cnt" +: (sums.map("s_" + _) ++ sums.map("nn_" + _) ++
        mins.map("mn_" + _) ++ maxs.map("mx_" + _)))
  }

  /** Build the state from scratch over the base relation (the bootstrap
    * at the CDC cursor; also the differential oracle in tests). */
  def init(base: DataFrame, v: AggView): DataFrame = {
    val aggs =
      (count(lit(1)).as("cnt") +:
        (v.sums.map(c => sum(col(c)).as(s"s_$c")) ++
          v.sums.map(c => count(col(c)).as(s"nn_$c")) ++
          v.mins.map(c => min(col(c)).as(s"mn_$c")) ++
          v.maxs.map(c => max(col(c)).as(s"mx_$c"))))
    base.groupBy(v.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Apply ONE changelog batch to the state.
    *
    * @param state   the maintained view as of the batch's start cursor
    * @param batch   changelog rows: the view's key+agg columns plus
    *                `_change_type` ('insert' | 'delete'; update pairs
    *                already split). Other feed columns are ignored.
    * @param reElect given a DataFrame of hole-group key tuples (columns
    *                = `v.keys`, churn-bounded), return the CURRENT base
    *                rows of those groups (at minimum the key + min/max
    *                columns). Callers prune this scan: a semi-join for
    *                arbitrary keys, an IN-predicate pushed to the table
    *                scan when key cardinality is capped. Never invoked
    *                when no group needs re-election.
    * @return the maintained view as of the batch's end cursor
    *
    * Internally materializes the merged state (view-sized, one row per
    * group) as an eager local checkpoint — three branches reference it
    * (hole scan, clean groups, re-elected groups), and without it each
    * branch would re-read the changelog and re-evaluate the state side.
    * Checkpoint blocks release when the returned frame is
    * garbage-collected, so repeated applies leak nothing.
    */
  def applyChangelog(
      state: DataFrame,
      batch: DataFrame,
      v: AggView,
      reElect: DataFrame => DataFrame): DataFrame =
    applyChangelogTouched(state, batch, v, reElect)._1

  /** [[applyChangelog]] plus the batch's TOUCHED group keys — derived
    * from the (checkpointed) merge itself rather than a second pass +
    * distinct exchange over the batch (the MV landing consumed exactly
    * that: `batch.select(keys).distinct()` re-read the feed and shuffled
    * it once more per refresh). A group is touched ⟺ its delta side is
    * present in the full-outer merge (`d_cnt` is a ±1-sum over the
    * filtered batch — never null for a present group, 0 at worst), and
    * the merge keeps died-touched groups through the checkpoint so the
    * landing can retire them; they are filtered from the returned STATE
    * exactly as before. */
  private[graft] def applyChangelogTouched(
      state: DataFrame,
      batch: DataFrame,
      v: AggView,
      reElect: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    // ---- churn-sized per-group deltas (one groupBy over the batch) ----
    val w = when(col("_change_type") === "insert", 1L)
      .when(col("_change_type") === "delete", -1L)
    val deltaAggs =
      sum(w).as("d_cnt") +:
        (v.sums.map(c => sum(w * col(c)).as(s"d_$c")) ++
          v.sums.map(c =>
            sum(w * when(col(c).isNotNull, 1L).otherwise(0L)).as(s"dn_$c")) ++
          v.mins.flatMap(c => Seq(
            min(when(col("_change_type") === "insert", col(c))).as(s"in_mn_$c"),
            min(when(col("_change_type") === "delete", col(c))).as(s"del_mn_$c"))) ++
          v.maxs.flatMap(c => Seq(
            max(when(col("_change_type") === "insert", col(c))).as(s"in_mx_$c"),
            max(when(col("_change_type") === "delete", col(c))).as(s"del_mx_$c"))))
    val delta = batch
      .filter(col("_change_type").isin("insert", "delete"))
      .groupBy(v.keys.map(col): _*).agg(deltaAggs.head, deltaAggs.tail: _*)

    // ---- merge: null-safe full-outer on the keys ----
    val st = state.alias("st")
    val dl = delta.alias("dl")
    val joinCond = v.keys
      .map(k => st.col(k) <=> dl.col(k))
      .reduce(_ && _)
    val merged0 = st.join(dl, joinCond, "full_outer")
    val keyed = v.keys.map(k => coalesce(st.col(k), dl.col(k)).as(k))
    val stateMissing = st.col("cnt").isNull
    val cnt1 = (coalesce(st.col("cnt"), lit(0L)) +
      coalesce(dl.col("d_cnt"), lit(0L))).as("cnt")
    def nn1(c: String) = coalesce(st.col(s"nn_$c"), lit(0L)) +
      coalesce(dl.col(s"dn_$c"), lit(0L))
    val sums1 = v.sums.map { c =>
      // sum over an all-null group is null both in state and delta;
      // coalesce to the other side so a null never zeroes a real sum —
      // and when the batch retires a group's LAST non-null value while
      // null rows keep it alive, the ±delta lands on 0 where SQL says
      // NULL: the maintained non-null count decides, exactly
      val s0 = st.col(s"s_$c"); val d0 = dl.col(s"d_$c")
      when(nn1(c) <= 0L, lit(null))
        .otherwise(when(s0.isNull, d0).when(d0.isNull, s0).otherwise(s0 + d0))
        .as(s"s_$c")
    }
    val nns1 = v.sums.map(c => nn1(c).as(s"nn_$c"))
    // a HOLE: a retired value that could have held the extremum, or a
    // delete hitting a group the state never saw (anomalous feed —
    // re-elect rather than trust either side)
    def hole(pfx: String, c: String, cmp: (Column, Column) => Column): Column = {
      val cur = st.col(s"$pfx$c"); val del = dl.col(s"del_$pfx$c")
      del.isNotNull && (cur.isNull || cmp(del, cur)) ||
        (stateMissing && del.isNotNull)
    }
    val holeMin = v.mins.map(c => c -> hole("mn_", c, _ <= _)).toMap
    val holeMax = v.maxs.map(c => c -> hole("mx_", c, _ >= _)).toMap
    val anyHole = (holeMin.values ++ holeMax.values)
      .foldLeft(lit(false))(_ || _).as("__hole")
    val mins1 = v.mins.map(c =>
      least(st.col(s"mn_$c"), dl.col(s"in_mn_$c")).as(s"mn_$c"))
    val maxs1 = v.maxs.map(c =>
      greatest(st.col(s"mx_$c"), dl.col(s"in_mx_$c")).as(s"mx_$c"))
    // view-sized (one row per surviving group) and referenced by the
    // hole scan, the clean branch, and the re-elected branch — an EAGER
    // local checkpoint materializes it once (one job: the changelog
    // groupBy + the state join, which is often an uncached scan of the
    // view's base), so no branch re-reads the feed, and unlike persist()
    // the blocks release through the ContextCleaner when the frame is
    // garbage-collected — repeated applies leak nothing. (On a cluster
    // with dynamic allocation, executor loss cannot recompute a local
    // checkpoint; a maintained-view pipeline consumes the result into a
    // write immediately, which is the supported shape.)
    val touchedFlag = dl.col("d_cnt").isNotNull.as("__touched")
    val merged = merged0
      .select((keyed :+ cnt1) ++ sums1 ++ nns1 ++ mins1 ++ maxs1 :+
        anyHole :+ touchedFlag: _*)
      // died-touched groups (cnt 0, no hole) survive to the checkpoint —
      // the caller's landing retires them; the returned STATE drops them
      .filter(col("cnt") > 0 || col("__hole") || col("__touched"))
      .localCheckpoint(true)
    // touched is later JOINED against the state derived from the same
    // checkpoint leaf: the fresh aliases give it new expression ids and
    // the LAZY local checkpoint its own leaf (zero upfront cost — it
    // materializes from the merged checkpoint's cached blocks inside the
    // first consuming job); sharing ids or the leaf would make
    // DeduplicateRelations remap one join side and break the caller's
    // df.col references (ambiguous-self-join analysis error)
    val touched = merged.filter(col("__touched"))
      .select(v.keys.map(k => col(k).as(k)): _*).localCheckpoint(false)
    val live = col("cnt") > 0 || col("__hole")

    if (v.mins.isEmpty && v.maxs.isEmpty)
      return (merged.filter(live).drop("__hole", "__touched"), touched)

    // ---- re-elect extrema for hole groups only ----
    // (cnt/sum stay delta-exact; only the non-retractable aggregates
    // re-derive, and only where a retirement could have held them)
    val holes = merged.filter(col("__hole")).select(v.keys.map(col): _*)
    val clean = merged.filter(live && !col("__hole"))
      .drop("__hole", "__touched")
    if (holes.isEmpty) return (clean, touched)
    val reAggs =
      (v.mins.map(c => min(col(c)).as(s"re_mn_$c")) ++
        v.maxs.map(c => max(col(c)).as(s"re_mx_$c")))
    val re = reElect(holes)
      .groupBy(v.keys.map(col): _*).agg(reAggs.head, reAggs.tail: _*)
    val hm = merged.filter(col("__hole")).alias("hm")
    val ra = re.alias("ra")
    val fixCond = v.keys.map(k => hm.col(k) <=> ra.col(k)).reduce(_ && _)
    val fixed = hm.join(ra, fixCond, "left_outer")
      .select((v.keys.map(k => hm.col(k).as(k)) :+ hm.col("cnt").as("cnt")) ++
        v.sums.map(c => hm.col(s"s_$c").as(s"s_$c")) ++
        v.sums.map(c => hm.col(s"nn_$c").as(s"nn_$c")) ++
        v.mins.map(c => ra.col(s"re_mn_$c").as(s"mn_$c")) ++
        v.maxs.map(c => ra.col(s"re_mx_$c").as(s"mx_$c")): _*)
      // a hole group with no surviving base rows died with the batch
      .filter(col("cnt") > 0)
    (clean.unionByName(fixed), touched)
  }
}
