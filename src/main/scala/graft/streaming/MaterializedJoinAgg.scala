package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{IncrementalAgg, IncrementalJoinAgg, Joins}
import graft.ops.IncrementalAgg.AggView
import graft.ops.IncrementalJoinAgg.JoinView
import graft.table.IceTable

/** INCREMENTALLY-REFRESHED JOIN-VIEW MATERIALIZED VIEWS — the persisted,
  * exactly-once face of [[graft.ops.IncrementalJoinAgg]], extending
  * [[MaterializedAgg]]'s contract to `fact ⋈ dim → GROUP BY` views:
  *
  * {{{
  * val mv = cat.createTable("db.seg_stats", MaterializedJoinAgg.schemaFor(jv, fact, dim))
  * MaterializedJoinAgg.bootstrap(fact, dim, mv, jv)   // full join+agg + cursors, one commit
  * MaterializedJoinAgg.refreshOnce(fact, dim, mv)     // ∝ both sides' churn, exactly-once
  * }}}
  *
  * The MV table carries TWO refresh cursors (`graft.mv.fact-cursor`,
  * `graft.mv.dim-cursor` — the last folded snapshot of each source),
  * both riding the SAME atomic commit as the refreshed rows, each
  * guard-validated on commit retries: the MV is its own checkpoint for
  * BOTH feeds (a crash between data and either cursor cannot happen; a
  * replayed refresh no-ops; racing refreshers conflict on the swap).
  *
  * Each refresh reads each side's changelog for its (cursor, head]
  * range, builds the JOIN's delta by the weighted delta rule (ΔF ⋈
  * dim-at-dim-cursor ∪ fact-at-fact-head ⋈ ΔD, each non-delta side
  * pruned to the delta's join keys), folds it with IncrementalAgg, and
  * lands through [[MaterializedAgg]]'s shared stage: only groups whose
  * MV row actually changed retire/rewrite, a net-zero range commits
  * cursor-only. A fact-only churn refresh never reads the dim beyond
  * the delta's keys and vice versa.
  *
  * The join-view definition rides the MV's properties (fact/dim key
  * columns + the agg view) — NAME-bound across BOTH sides (two
  * independent field-id spaces make per-side ids ambiguous for
  * agg columns); renaming a referenced column on either source fails
  * the refresh loudly, like a filtered MV's predicate. */
object MaterializedJoinAgg {

  val FactCursorProp = "graft.mv.fact-cursor"
  val DimCursorProp = "graft.mv.dim-cursor"
  val FactKeysProp = "graft.mv.join-fact-keys"
  val DimKeysProp = "graft.mv.join-dim-keys"
  val JoinTypeProp = "graft.mv.join-type" // "inner" (absent = inner) | "left"

  /** A FILTERED join MV aggregates `SELECT * FROM F ⋈ D WHERE p` — the
    * predicate (DSL string, over the JOINED row: either side's columns,
    * including columns the aggregates don't consume) rides the MV's
    * properties under [[MaterializedAgg.FilterProp]]. Replica-correct by
    * construction on both delta parts: pre-images filter by their OLD
    * joined row (retractions), post-images by the NEW one — a dim update
    * moving its facts across p retracts and inserts exactly. */
  private def filterColumn(fact: IceTable, dim: IceTable,
      mv: IceTable): Option[org.apache.spark.sql.Column] =
    mv.metadata.properties.get(MaterializedAgg.FilterProp).map { dsl =>
      compileJoinedFilter(fact, dim, dsl)
    }

  private def compileJoinedFilter(fact: IceTable, dim: IceTable,
      dsl: String): org.apache.spark.sql.Column = {
    // bind against the JOINED shape with fresh positional ids (the two
    // sides' id spaces are independent; names must be disjoint — the
    // JoinView column contract)
    val joined = graft.core.Schema.fromSpark(
      org.apache.spark.sql.types.StructType(
        (fact.schema.toSpark.fields ++ dim.schema.toSpark.fields)
          .map(_.copy(metadata = org.apache.spark.sql.types.Metadata.empty))))
    graft.core.ToColumn.compile(graft.core.Exprs.rewriteNot(
      graft.core.Binder.bind(joined, graft.core.ExprParser.parse(dsl))))
  }

  private def viewProps(jv: JoinView): Map[String, String] = {
    val v = jv.agg
    val all = jv.factKeys ++ jv.dimKeys ++ v.keys ++ v.sums ++ v.mins ++ v.maxs
    require(all.forall(!_.contains(",")),
      "view column names must not contain ','")
    Map(FactKeysProp -> jv.factKeys.mkString(","),
      DimKeysProp -> jv.dimKeys.mkString(","),
      JoinTypeProp -> jv.joinType,
      MaterializedAgg.KeysProp -> v.keys.mkString(","),
      MaterializedAgg.SumsProp -> v.sums.mkString(","),
      MaterializedAgg.MinsProp -> v.mins.mkString(","),
      MaterializedAgg.MaxsProp -> v.maxs.mkString(","))
  }

  /** The join-view definition the MV table carries (stamped by
    * [[bootstrap]]); None when the table is not a join MV. */
  def viewOf(mv: IceTable): Option[JoinView] =
    for {
      fk <- mv.metadata.properties.get(FactKeysProp)
      dk <- mv.metadata.properties.get(DimKeysProp)
      agg <- MaterializedAgg.viewOf(mv)
    } yield JoinView(fk.split(",").toSeq.filter(_.nonEmpty),
      dk.split(",").toSeq.filter(_.nonEmpty), agg,
      mv.metadata.properties.getOrElse(JoinTypeProp, "inner"))

  /** The MV table's schema for `jv` over the two sources (fresh ids —
    * same rationale as [[MaterializedAgg.schemaFor]]). */
  def schemaFor(jv: JoinView, fact: IceTable, dim: IceTable): graft.core.Schema = {
    val st = IncrementalJoinAgg.init(
      fact.scan.toDF.limit(0), dim.scan.toDF.limit(0), jv).schema
    graft.core.Schema.fromSpark(org.apache.spark.sql.types.StructType(
      st.fields.map(_.copy(metadata = org.apache.spark.sql.types.Metadata.empty))))
  }

  /** Full build: join+aggregate both sources' CURRENT state into the
    * (empty) MV table and stamp BOTH cursors — one atomic commit.
    * Returns (fact cursor, dim cursor). */
  def bootstrap(fact: IceTable, dim: IceTable, mv: IceTable,
      jv: JoinView, filter: Option[String] = None): (Option[Long], Option[Long]) = {
    fact.refresh(); dim.refresh(); mv.refresh()
    require(mv.metadata.properties.get(FactCursorProp).isEmpty &&
      mv.metadata.properties.get(MaterializedAgg.CursorProp).isEmpty,
      s"table ${mv.name} is already a materialized view (cursor present) — " +
        "use refreshOnce")
    val hf = fact.metadata.currentSnapshotId
    val hd = dim.metadata.currentSnapshotId
    if (hf.isEmpty || hd.isEmpty) return (None, None)
    val f = filter.map(compileJoinedFilter(fact, dim, _)) // validates the DSL
    val full = IncrementalJoinAgg.init(
      fact.scan.useSnapshot(hf.get).toDF,
      dim.scan.useSnapshot(hd.get).toDF, jv, f)
    val guardF = IceTable.guardedCursorStamp(
      mv.name, None, hf.get.toString, FactCursorProp)
    val guardD = IceTable.guardedCursorStamp(
      mv.name, None, hd.get.toString, DimCursorProp)
    mv.applyKeyed(None, jv.agg.keys, Some(full),
      m => {
        val g = guardD(guardF(m))
        g.copy(properties = g.properties ++ viewProps(jv) ++
          filter.map(MaterializedAgg.FilterProp -> _))
      },
      mv.metadata.currentSnapshotId)
    (hf, hd)
  }

  /** [[refreshOnce]] with the join view the MV table itself carries. */
  def refreshOnce(fact: IceTable, dim: IceTable, mv: IceTable): (Long, Long) = {
    mv.refresh()
    val jv = viewOf(mv).getOrElse(throw new IllegalArgumentException(
      s"table ${mv.name} carries no join-materialized-view definition — " +
        "bootstrap it first"))
    refreshOnce(fact, dim, mv, jv)
  }

  /** Fold every fact and dim commit since the MV's two cursors into the
    * MV, exactly-once. Returns (groups changed, groups retired); (0, 0)
    * when neither source moved or the ranges netted nothing (cursors
    * still advance, metadata-only). */
  def refreshOnce(fact: IceTable, dim: IceTable, mv: IceTable,
      jv: JoinView): (Long, Long) = {
    fact.refresh(); dim.refresh(); mv.refresh()
    viewOf(mv).foreach(carried => require(carried == jv,
      s"view mismatch for ${mv.name}: the table carries $carried, the " +
        s"refresh was given $jv — folding with a different view would " +
        "silently corrupt the aggregate"))
    val cf = mv.metadata.properties.get(FactCursorProp).map(_.toLong)
    val cd = mv.metadata.properties.get(DimCursorProp).map(_.toLong)
    require(cf.nonEmpty && cd.nonEmpty,
      s"table ${mv.name} has no join-MV cursors — bootstrap it first")
    val hf = fact.metadata.currentSnapshotId.getOrElse(return (0L, 0L))
    val hd = dim.metadata.currentSnapshotId.getOrElse(return (0L, 0L))
    if (cf.contains(hf) && cd.contains(hd)) return (0L, 0L) // replay/no-op
    val stamp = (m: graft.meta.TableMetadata) =>
      IceTable.guardedCursorStamp(mv.name, cd.map(_.toString),
        hd.toString, DimCursorProp)(
        IceTable.guardedCursorStamp(mv.name, cf.map(_.toString),
          hf.toString, FactCursorProp)(m))
    val f = filterColumn(fact, dim, mv)
    val fb = Option.when(!cf.contains(hf))(
      TableChanges.changelog(fact, cf, Some(hf)))
    val db = Option.when(!cd.contains(hd))(
      TableChanges.changelog(dim, cd, Some(hd)))
    val delta = IncrementalJoinAgg.joinDelta(fb, db, jv,
      // ΔF enriches against the dim AT ITS CURSOR (current dim would
      // double-apply churn ΔD already folds). The enrich join's own key
      // equality restricts the dim to the delta's keys — a semi-join
      // prefilter here was redundant for exactness (inner enrich, and the
      // left-outer anti/pad paths are unchanged by a superset dim) and
      // cost an extra distinct exchange + join per side per refresh; at
      // scale AQE broadcasts the churn-sized delta, so the non-delta side
      // is scanned once either way. Callers with partition-aligned
      // layouts still push file pruning through their own closures.
      dimAtCursor = _ => dim.scan.useSnapshot(cd.get).toDF,
      // ΔD re-enriches only the facts referencing churned dim rows (the
      // repad/enrich joins' key equality), read at the fact head this
      // refresh folds to
      factAtHead = _ => fact.scan.useSnapshot(hf).toDF,
      rowFilter = f) match {
      case Some(d) =>
        // EAGER local checkpoint: one job materializes the two-sided
        // delta (both feed reads + the pruned enrich joins) and truncates
        // its lineage — the empty probe, the fold's merge and the landing
        // stop re-submitting that DAG's (AQE) stages per action
        // (job-anatomy: 27 isEmpty jobs / 15 task-s per gate before).
        // Blocks release via the ContextCleaner when the frame is GC'd.
        d.localCheckpoint(true)
      case None =>
        mv.commitMetadata(stamp) // e.g. compaction-only on both sides
        return (0L, 0L)
    }
    if (delta.isEmpty) {
      mv.commitMetadata(stamp)
      return (0L, 0L)
    }
    val state = mv.scan.toDF
    // the fold also yields the TOUCHED group keys from its own merge —
    // no second pass + distinct exchange over the delta
    val (st1, touched) = IncrementalAgg.applyChangelogTouched(
      state, delta, jv.agg,
      // hole re-election over the CURRENT joined base, both sides
      // pinned to the heads this refresh folds to
      keys => Joins.nullSafeSemi(
        IncrementalJoinAgg.joinRows(
          fact.scan.useSnapshot(hf).toDF,
          dim.scan.useSnapshot(hd).toDF, jv, f),
        keys, jv.agg.keys))
    MaterializedAgg.landChanged(mv, jv.agg.keys, state, touched, st1, stamp)
  }
}
