package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import IncrementalAgg.AggView

/** JOIN-VIEW incremental maintenance — the delta-join tier on top of
  * [[IncrementalAgg]]: a declarative
  *
  * {{{ SELECT keys, aggs FROM fact F JOIN dim D ON F.fk = D.pk GROUP BY keys }}}
  *
  * view (equi-join; the dim side unique on `pk` — the star-schema shape
  * real MV workloads run) maintained from the two sides' CHANGELOG
  * batches without re-joining the corpora. The classic delta rule, in
  * weighted (insert = +1, delete = −1) multiset algebra:
  *
  * {{{ Δ(F ⋈ D)  =  ΔF ⋈ D_old  ∪  F_new ⋈ ΔD }}}
  *
  * (expand `F_new = F_old + ΔF`: the cross term `ΔF ⋈ ΔD` is absorbed
  * by the second part, so the two parts are EXACT together — both sides
  * may churn in the same refresh). Each part's joined rows keep the
  * changelog side's `_change_type`, producing a changelog OF THE JOIN
  * that [[IncrementalAgg.applyChangelog]] folds like any single-table
  * feed: count/sum/avg absorb ± deltas, min/max re-elect hole groups
  * only.
  *
  * The non-delta side of each part is never read whole — the caller
  * closures receive the delta's distinct JOIN-KEY tuples and return only
  * those keys' rows, the same pushed-In / semi-join hole-election
  * machinery the single-table engine uses:
  *
  *  - `dimAtCursor(pkKeys)`: dim rows AT THE DIM BATCH'S START CURSOR
  *    for the given pk tuples (ΔF enriches against the dim state its
  *    aggregate last saw — using current dim here would double-apply
  *    dim churn the ΔD part already folds);
  *  - `factAtHead(fkKeys)`: fact rows AT THE FACT BATCH'S END CURSOR
  *    for the given fk tuples (ΔD re-enriches exactly the facts that
  *    reference churned dim keys).
  *
  * At 100 TB: a fact churn batch joins against a broadcast-sized pruned
  * dim read; a dim churn batch re-reads only the fact partitions holding
  * the churned foreign keys (fk-clustered fact layouts prune to files);
  * the fold itself is churn-sized. Rows whose fk matches no dim row (or
  * null fks) drop from the view on both the insert and retract path —
  * inner-join SQL semantics, symmetric and exact.
  *
  * Column contract: every view column (group keys and aggregates) must
  * live on exactly one side; when a name exists on both frames the FACT
  * side wins (document disjoint names for clarity). The reference has no
  * IVM at all — this extends the engine the way `ice_mv_table` extended
  * `ds_mv_incremental`. */
object IncrementalJoinAgg {

  /** The join-view definition: fk columns on the fact side, matching pk
    * columns on the (unique-keyed) dim side, and the aggregate view over
    * the joined relation. `joinType` is "inner" (default) or "left" —
    * LEFT OUTER keeps unmatched facts as NULL-padded rows (dim columns
    * null), maintained by the pad-delta rule (see [[joinDelta]]):
    * count(*) counts pads, sums/extrema over dim columns ignore them,
    * and a dim-side group key collects pads under the NULL group (the
    * fold's key joins are null-safe already). */
  final case class JoinView(
      factKeys: Seq[String],
      dimKeys: Seq[String],
      agg: AggView,
      joinType: String = "inner") {
    require(factKeys.nonEmpty && factKeys.size == dimKeys.size,
      s"join keys must pair up: fact=$factKeys dim=$dimKeys")
    require(joinType == "inner" || joinType == "left",
      s"joinType must be 'inner' or 'left', got '$joinType'")
    def leftOuter: Boolean = joinType == "left"
  }

  /** Columns of the joined relation the view consumes. */
  private def viewCols(v: AggView): Seq[String] =
    (v.keys ++ v.sums ++ v.mins ++ v.maxs).distinct

  /** fact ⋈ dim (inner equi-join on fk=pk) projected to the view's
    * columns — the from-scratch shape ([[init]]'s input, the caller's
    * `reElect` base, and the differential oracle in tests). `rowFilter`
    * (a predicate over the JOINED row — either side's columns) makes it
    * a FILTERED join view: applied before projection, so the predicate
    * may reference columns the aggregates don't. */
  def joinRows(fact: DataFrame, dim: DataFrame, jv: JoinView,
      rowFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val fa = fact.alias("__jf")
    val da = dim.alias("__jd")
    val cond = jv.factKeys.zip(jv.dimKeys)
      .map { case (fk, pk) => fa.col(fk) === da.col(pk) }.reduce(_ && _)
    val fCols = fact.columns.toSet
    val joined0 = fa.join(da,
      cond, if (jv.leftOuter) "left_outer" else "inner")
    rowFilter.map(joined0.filter).getOrElse(joined0)
      .select(viewCols(jv.agg).map(c =>
        (if (fCols(c)) fa.col(c) else da.col(c)).as(c)): _*)
  }

  /** Build the state from scratch over the two base relations. */
  def init(fact: DataFrame, dim: DataFrame, jv: JoinView,
      rowFilter: Option[org.apache.spark.sql.Column] = None): DataFrame =
    IncrementalAgg.init(joinRows(fact, dim, jv, rowFilter), jv.agg)

  /** One delta part: the changelog side (carrying `_change_type`) joined
    * to the pruned non-delta side, projected to the view's columns plus
    * the change type — each joined row inherits the changed row's ±.
    *
    * A `rowFilter` over the joined row is replica-correct by
    * construction on BOTH parts: a delete pre-image (fact or dim side)
    * re-joins with its OLD counterpart content and filters by the OLD
    * joined row — so a row that matched p retracts, one that didn't
    * stays silent; an insert post-image filters by the NEW joined row.
    * A dim update moving its facts across p therefore retracts and
    * inserts exactly (the move-out's delete pre-image matches p, the
    * move-in's insert does). */
  private def deltaPart(changed: DataFrame, other: DataFrame,
      changedIsFact: Boolean, jv: JoinView,
      rowFilter: Option[org.apache.spark.sql.Column]): DataFrame = {
    val ca = changed.alias("__jc")
    val oa = other.alias("__jo")
    val (fSide, dSide) = if (changedIsFact) (ca, oa) else (oa, ca)
    val cond = jv.factKeys.zip(jv.dimKeys)
      .map { case (fk, pk) => fSide.col(fk) === dSide.col(pk) }.reduce(_ && _)
    val factCols =
      (if (changedIsFact) changed.columns else other.columns).toSet
    val joined0 = ca.join(oa, cond, "inner")
    rowFilter.map(joined0.filter).getOrElse(joined0)
      .select(viewCols(jv.agg).map(c =>
        (if (factCols(c)) fSide.col(c) else dSide.col(c)).as(c)) :+
        ca.col("_change_type").as("_change_type"): _*)
  }

  /** NULL-padded view rows for unmatched facts (the LEFT OUTER pad
    * side): `factRows` carries the fact columns plus `_change_type`;
    * every dim-side view column becomes a typed NULL. `rowFilter` (over
    * the padded joined row — SQL's WHERE after a left join sees the
    * pads) applies before projection. */
  private def padRows(factRows: DataFrame,
      dimSchema: org.apache.spark.sql.types.StructType, jv: JoinView,
      rowFilter: Option[org.apache.spark.sql.Column]): DataFrame = {
    val fCols = factRows.columns.filter(_ != "_change_type")
    val fSet = fCols.toSet
    val padded = factRows.select(
      (fCols.map(col).toSeq ++
        dimSchema.fields.toSeq.filterNot(f => fSet(f.name))
          .map(f => lit(null).cast(f.dataType).as(f.name))) :+
        col("_change_type"): _*)
    rowFilter.map(padded.filter).getOrElse(padded)
      .select(viewCols(jv.agg).map(col) :+ col("_change_type"): _*)
  }

  /** The changes of (fact ⋈ dim) implied by one fact changelog batch
    * and/or one dim changelog batch — a changelog of the JOIN, directly
    * consumable by [[IncrementalAgg.applyChangelog]]. Either side may be
    * None (only the other churned).
    *
    * LEFT OUTER views add the PAD-DELTA rule on top of the inner parts:
    *
    *  - ΔF rows whose fk has NO dim match at the dim cursor produce
    *    ±NULL-padded rows directly (anti-join against the already-pruned
    *    dim read — no second scan);
    *  - ΔD presence TRANSITIONS repad the referencing facts at head: a
    *    pk whose batch net (+inserts −deletes) is +1 went absent→present
    *    (its facts' pads RETRACT — their matched rows arrive via the
    *    inner ΔD part), net −1 went present→absent (pads INSERT); net 0
    *    (an update, or insert+delete of a transient pk) changes no pads.
    *    With the dim unique on pk the net fully determines the
    *    transition, so one churn-sized groupBy decides — never a dim
    *    read. The cross terms stay exact: a fact and its dim row both
    *    born (or both dying) in one round cancel pads between the ΔF
    *    anti-join (judged at the dim CURSOR) and the ΔD repad (facts at
    *    HEAD).
    *
    * COMPOSES for snowflake schemas: the result is itself a changelog,
    * so `F ⋈ D1 ⋈ D2` maintains by chaining — level 1 carries the
    * columns level 2 consumes (`AggView(keys = carriedCols)`), its
    * joinDelta output becomes level 2's fact batch, and level 2's
    * `factAtHead` closure is the CURRENT level-1 join (spec-pinned: all
    * three tables churning in one round equals from-scratch). */
  def joinDelta(
      factBatch: Option[DataFrame],
      dimBatch: Option[DataFrame],
      jv: JoinView,
      dimAtCursor: DataFrame => DataFrame,
      factAtHead: DataFrame => DataFrame,
      rowFilter: Option[org.apache.spark.sql.Column] = None): Option[DataFrame] = {
    val parts = Seq.newBuilder[DataFrame]
    // each batch is referenced 2–3 times below (join-key distinct, the
    // delta part, the left-outer pad path) — a LAZY local checkpoint
    // materializes the changelog read ONCE and truncates lineage for the
    // other references (blocks release via the ContextCleaner on GC)
    factBatch.foreach { fb0 =>
      val fb = fb0.filter(col("_change_type").isin("insert", "delete"))
        .localCheckpoint(false)
      // the delta's distinct join keys, renamed to the DIM side's names:
      // the closure prunes its scan to exactly these
      val keys = fb.select(jv.factKeys.map(col): _*).distinct()
        .toDF(jv.dimKeys: _*)
      val dimC = dimAtCursor(keys)
      parts += deltaPart(fb, dimC, changedIsFact = true, jv, rowFilter)
      if (jv.leftOuter) {
        // churned facts with no dim match at the cursor: ±pad rows
        val fa = fb.alias("__jc"); val da = dimC.alias("__jo")
        val cond = jv.factKeys.zip(jv.dimKeys)
          .map { case (fk, pk) => fa.col(fk) === da.col(pk) }.reduce(_ && _)
        parts += padRows(fa.join(da, cond, "left_anti"), dimC.schema, jv,
          rowFilter)
      }
    }
    dimBatch.foreach { db0 =>
      val db = db0.filter(col("_change_type").isin("insert", "delete"))
        .localCheckpoint(false)
      val keys = db.select(jv.dimKeys.map(col): _*).distinct()
        .toDF(jv.factKeys: _*)
      val factsH = factAtHead(keys)
      parts += deltaPart(db, factsH, changedIsFact = false, jv, rowFilter)
      if (jv.leftOuter) {
        // per-pk presence transition from the batch's net weight (dim
        // unique on pk): +1 → absent→present → pads retract; −1 →
        // present→absent → pads insert; 0 → no pad change
        val w = when(col("_change_type") === "insert", 1L).otherwise(-1L)
        val trans = db.groupBy(jv.dimKeys.map(col): _*)
          .agg(sum(w).as("__net")).filter(col("__net") =!= 0L)
          .withColumn("_change_type",
            when(col("__net") > 0L, "delete").otherwise("insert"))
        val fa = factsH.alias("__jf"); val ta = trans.alias("__jt")
        val cond = jv.factKeys.zip(jv.dimKeys)
          .map { case (fk, pk) => fa.col(fk) === ta.col(pk) }.reduce(_ && _)
        val repad = fa.join(ta, cond, "inner")
          .select(factsH.columns.map(c => fa.col(c)).toSeq :+
            ta.col("_change_type").as("_change_type"): _*)
        parts += padRows(repad, db.drop("_change_type").schema, jv, rowFilter)
      }
    }
    parts.result().reduceOption(_ unionByName _)
  }

  /** Apply one refresh round — fold both sides' changelog batches into
    * the maintained join-view state, exactly (see the delta rule above).
    *
    * @param state       the maintained view as of both batches' start
    * @param factBatch   fact changelog rows over (fact cursor, fact head]
    * @param dimBatch    dim changelog rows over (dim cursor, dim head]
    * @param dimAtCursor pk-keyed pruned dim read AT THE DIM CURSOR
    * @param factAtHead  fk-keyed pruned fact read AT THE FACT HEAD
    * @param reElect     hole-group re-election over the CURRENT joined
    *                    base (fact head ⋈ dim head), pruned to the given
    *                    group-key tuples — [[IncrementalAgg]]'s contract
    */
  def applyChangelog(
      state: DataFrame,
      factBatch: Option[DataFrame],
      dimBatch: Option[DataFrame],
      jv: JoinView,
      dimAtCursor: DataFrame => DataFrame,
      factAtHead: DataFrame => DataFrame,
      reElect: DataFrame => DataFrame,
      rowFilter: Option[org.apache.spark.sql.Column] = None): DataFrame =
    joinDelta(factBatch, dimBatch, jv, dimAtCursor, factAtHead,
      rowFilter) match {
      case Some(delta) =>
        IncrementalAgg.applyChangelog(state, delta, jv.agg, reElect)
      case None => state
    }
}
