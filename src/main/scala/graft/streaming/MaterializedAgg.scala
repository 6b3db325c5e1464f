package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.IncrementalAgg
import graft.ops.IncrementalAgg.AggView
import graft.table.IceTable

/** INCREMENTALLY-REFRESHED MATERIALIZED VIEWS as Iceberg tables — the
  * persisted, exactly-once face of [[graft.ops.IncrementalAgg]]:
  *
  * {{{
  * val mv = catalog.createTable("db.daily_stats", MaterializedAgg.schemaFor(view, source))
  * MaterializedAgg.bootstrap(source, mv, view)     // full build + cursor, one commit
  * // then, on any cadence (a cron of one call is a live MV):
  * MaterializedAgg.refreshOnce(source, mv, view)   // ∝ churn, exactly-once
  * }}}
  *
  * The MV table holds one row per group (`keys*, cnt, s_<c>*, mn_<c>*,
  * mx_<c>*`) and its OWN refresh cursor (`graft.mv.source-cursor` = last
  * source snapshot folded in) as a table property that rides the SAME
  * atomic commit as the refreshed rows — the MV is its own checkpoint,
  * exactly the replica contract of `applyCdc`: a crash between data and
  * cursor cannot happen, a replayed refresh (cursor already at the
  * source head) is a detected no-op, and concurrent refreshers conflict
  * on the metadata swap, not on each other's data.
  *
  * Each refresh reads the source CHANGELOG for (cursor, head] — the
  * v2-compatible feed whose delete rows carry pre-images — so the
  * incremental fold is IncrementalAgg's: count/sum/avg absorb exact
  * deltas, min/max re-elect only hole groups via a semi-join-pruned
  * source scan. The MV table write then touches ONLY the churned
  * groups: retire/re-insert target files through the same key-bounds +
  * `__file` semi-join machinery as upsert, so a refresh rewrites the
  * affected groups' MV files, never the view (partition the MV by a
  * group key and untouched partitions' files survive byte-identical —
  * spec-pinned). Groups whose count reaches zero leave the MV.
  *
  * At 100 TB: refresh cost = changelog churn + hole-group re-election +
  * affected-MV-file rewrite; a steady trickle of source commits folds
  * in at trickle cost while a from-scratch rebuild would re-aggregate
  * the corpus every refresh. */
object MaterializedAgg {

  val CursorProp = "graft.mv.source-cursor"
  // the view DEFINITION rides the MV table too (stamped by bootstrap, in
  // the same commit as the data): the MV self-describes, so a refresh —
  // the SQL `CALL cat.system.mv_refresh(source, mv)` face especially —
  // never restates the view and cannot silently fold with the wrong one
  val KeysProp = "graft.mv.keys"
  val SumsProp = "graft.mv.sums"
  val MinsProp = "graft.mv.mins"
  val MaxsProp = "graft.mv.maxs"
  // a FILTERED MV aggregates `SELECT * WHERE p` — stored as the predicate
  // DSL string so the MV self-describes it like the view; the changelog's
  // filtered face is replica-correct for it (an update moving a row OUT
  // of p is a pre-image delete = a retraction from the view, one moving
  // IN is an insert)
  val FilterProp = "graft.mv.filter"

  private def viewProps(v: AggView): Map[String, String] = {
    val all = v.keys ++ v.sums ++ v.mins ++ v.maxs
    require(all.forall(!_.contains(",")),
      "view column names must not contain ','")
    Map(KeysProp -> v.keys.mkString(","), SumsProp -> v.sums.mkString(","),
      MinsProp -> v.mins.mkString(","), MaxsProp -> v.maxs.mkString(","))
  }

  /** The view definition the MV table carries (stamped by [[bootstrap]]). */
  def viewOf(mv: IceTable): Option[AggView] =
    mv.metadata.properties.get(KeysProp).map { ks =>
      def list(p: String) = mv.metadata.properties.getOrElse(p, "")
        .split(",").toSeq.filter(_.nonEmpty)
      AggView(ks.split(",").toSeq.filter(_.nonEmpty),
        list(SumsProp), list(MinsProp), list(MaxsProp))
    }

  /** The MV table's schema for `view` over `source` (group keys typed
    * from the source schema after `prepare`, partials typed as Spark
    * derives them). Field-id metadata riding the source scan is
    * stripped first: the MV is its own table with its own fresh ids —
    * keeping the source's ids on pass-through key columns while the
    * aggregate columns take positional ids would collide. */
  def schemaFor(view: AggView, source: IceTable,
      prepare: DataFrame => DataFrame = identity): graft.core.Schema = {
    val st = IncrementalAgg.init(prepare(source.scan.toDF.limit(0)), view).schema
    graft.core.Schema.fromSpark(org.apache.spark.sql.types.StructType(
      st.fields.map(_.copy(metadata = org.apache.spark.sql.types.Metadata.empty))))
  }

  /** The filter predicate the MV table carries, parsed. */
  def filterOf(mv: IceTable): Option[graft.core.Expr] =
    mv.metadata.properties.get(FilterProp).map(graft.core.ExprParser.parse)

  /** Full build: aggregate the source's CURRENT state into the (empty)
    * MV table and stamp the cursor at the source head — one atomic
    * commit. `filter` (predicate DSL) makes it a FILTERED MV: the
    * aggregate of `SELECT * WHERE filter`, maintained from the filtered
    * changelog. Returns the cursor. */
  def bootstrap(source: IceTable, mv: IceTable, view: AggView,
      prepare: DataFrame => DataFrame = identity,
      filter: Option[String] = None): Option[Long] = {
    source.refresh(); mv.refresh()
    require(mv.metadata.properties.get(CursorProp).isEmpty,
      s"table ${mv.name} is already a materialized view (cursor present) — " +
        "use refreshOnce")
    val head = source.metadata.currentSnapshotId.getOrElse(return None)
    val f = filter.map(graft.core.ExprParser.parse) // validates the DSL
    val sc = source.scan.useSnapshot(head)
    val full = IncrementalAgg.init(
      prepare(f.map(sc.filter).getOrElse(sc).toDF), view)
    val guard = graft.table.IceTable.guardedCursorStamp(
      mv.name, None, head.toString, CursorProp)
    mv.applyKeyed(None, view.keys, Some(full),
      m => { // a concurrent bootstrap loses on the guard, not by doubling
        val g = guard(m)
        g.copy(properties = g.properties ++ viewProps(view) ++
          filter.map(FilterProp -> _))
      },
      mv.metadata.currentSnapshotId)
    Some(head)
  }

  /** [[refreshOnce]] with the view the MV table itself carries. */
  def refreshOnce(source: IceTable, mv: IceTable): (Long, Long) = {
    mv.refresh()
    val v = viewOf(mv).getOrElse(throw new IllegalArgumentException(
      s"table ${mv.name} carries no materialized-view definition — " +
        "bootstrap it first"))
    refreshOnce(source, mv, v)
  }

  /** Fold every source commit since the MV's cursor into the MV,
    * exactly-once — call on any cadence. Returns (groups refreshed,
    * groups retired); (0, 0) when the source hasn't moved or the range
    * carried no net change (cursor still advances, metadata-only). */
  def refreshOnce(source: IceTable, mv: IceTable, view: AggView,
      prepare: DataFrame => DataFrame = identity): (Long, Long) = {
    source.refresh(); mv.refresh()
    val head = source.metadata.currentSnapshotId.getOrElse(return (0L, 0L))
    val stored = mv.metadata.properties.get(CursorProp).map(_.toLong)
    require(stored.nonEmpty,
      s"table ${mv.name} has no MV cursor — bootstrap it first")
    viewOf(mv).foreach(carried => require(carried == view,
      s"view mismatch for ${mv.name}: the table carries $carried, the " +
        s"refresh was given $view — folding with a different view would " +
        "silently corrupt the aggregate"))
    if (stored.contains(head)) return (0L, 0L) // nothing new (or a replay)
    // re-validated on every (retried) commit: a concurrent refresher that
    // already advanced the cursor must fail this apply, never be
    // overwritten backwards (a regressed cursor re-folds an applied
    // range — double-counted aggregates)
    val stamp = graft.table.IceTable.guardedCursorStamp(
      mv.name, stored.map(_.toString), head.toString, CursorProp)
    val f = filterOf(mv) // filtered MV: the filtered changelog retracts
    val batch = prepare(TableChanges.changelog(source, stored, Some(head), f))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the churned groups — the ONLY rows of the MV this refresh touches
    val touched = batch.select(view.keys.map(col): _*).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nTouched = touched.count()
      if (nTouched == 0) { // e.g. a compaction-only range: cursor-only
        mv.commitMetadata(stamp)
        return (0L, 0L)
      }
      val state = mv.scan.toDF
      // the elector's base scan pins to the fold's END cursor (`head`):
      // an unpinned scan under a concurrent source writer would elect
      // min/max from commits beyond the stamped cursor — a transiently
      // inconsistent MV-at-cursor. Key joins are null-safe (<=>): a
      // null-valued group key is its own group throughout IncrementalAgg,
      // and a using-column join here would silently never refresh it.
      val st1 = IncrementalAgg.applyChangelog(state, batch, view,
        keys => {
          val sc = source.scan.useSnapshot(head)
          graft.ops.Joins.nullSafeSemi(
            prepare(f.map(sc.filter).getOrElse(sc).toDF), keys, view.keys)
        })
      val images = graft.ops.Joins.nullSafeSemi(st1, touched, view.keys)
      val nSurvived = images.count()
      mv.applyKeyed(Some(touched), view.keys,
        if (nSurvived > 0) Some(images) else None,
        stamp, mv.metadata.currentSnapshotId)
      (nSurvived, nTouched - nSurvived)
    } finally { touched.unpersist(); batch.unpersist() }
  }
}
