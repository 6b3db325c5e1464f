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
  // the CANONICAL view identity: SOURCE FIELD IDS (stamped alongside the
  // names when every view column maps to a top-level source field) — id
  // resolution is this engine's core invariant, so an upstream RENAME of
  // a referenced column keeps the MV refreshing ([[resolveView]] follows
  // the rename, migrating the MV's own state columns); only a DROP of a
  // referenced field fails the refresh, loudly. Name props remain for
  // display and for views over `prepare`-synthesized columns, which have
  // no source ids and stay name-bound (rename fails fast, as before).
  val KeyIdsProp = "graft.mv.key-ids"
  val SumIdsProp = "graft.mv.sum-ids"
  val MinIdsProp = "graft.mv.min-ids"
  val MaxIdsProp = "graft.mv.max-ids"
  // a FILTERED MV aggregates `SELECT * WHERE p` — stored as the predicate
  // DSL string so the MV self-describes it like the view; the changelog's
  // filtered face is replica-correct for it (an update moving a row OUT
  // of p is a pre-image delete = a retraction from the view, one moving
  // IN is an insert)
  val FilterProp = "graft.mv.filter"

  private def nameProps(v: AggView): Map[String, String] = {
    val all = v.keys ++ v.sums ++ v.mins ++ v.maxs
    require(all.forall(!_.contains(",")),
      "view column names must not contain ','")
    Map(KeysProp -> v.keys.mkString(","), SumsProp -> v.sums.mkString(","),
      MinsProp -> v.mins.mkString(","), MaxsProp -> v.maxs.mkString(","))
  }

  private def viewProps(v: AggView, source: IceTable): Map[String, String] = {
    val byName = source.schema.fields.map(f => f.name -> f.id).toMap
    def ids(cols: Seq[String]): Option[String] = {
      val resolved = cols.map(byName.get)
      if (resolved.forall(_.isDefined)) Some(resolved.flatten.mkString(","))
      else None // a prepare-synthesized column: the view stays name-bound
    }
    val idProps = for {
      k <- ids(v.keys); s <- ids(v.sums); mn <- ids(v.mins); mx <- ids(v.maxs)
    } yield Map(KeyIdsProp -> k, SumIdsProp -> s,
      MinIdsProp -> mn, MaxIdsProp -> mx)
    nameProps(v) ++ idProps.getOrElse(Map.empty)
  }

  /** The MV's view resolved BY FIELD ID against the source's CURRENT
    * schema. When the source renamed a referenced column, the resolved
    * names differ from the stamped ones: the MV's own state columns are
    * renamed to follow (schema evolution — ids stay, data files stay
    * valid) and the name props re-stamped, so the refresh keeps folding
    * and the MV's output column tracks the source's new name. A DROPPED
    * referenced field fails with a named error. Id-less (legacy or
    * prepare-synthesized) views resolve by name, as before. A FILTERED
    * MV's predicate stays name-bound (DSL string): renaming a filtered
    * column still fails the refresh loudly at bind time. */
  def resolveView(source: IceTable, mv: IceTable): AggView = {
    val props = mv.metadata.properties
    val named = viewOf(mv).getOrElse(throw new IllegalArgumentException(
      s"table ${mv.name} carries no materialized-view definition — " +
        "bootstrap it first"))
    props.get(KeyIdsProp) match {
      case None => named
      case Some(_) =>
        val byId = source.schema.byId
        def names(p: String, kind: String): Seq[String] =
          props.getOrElse(p, "").split(",").toSeq.filter(_.nonEmpty)
            .map(_.toInt).map(id => byId.getOrElse(id,
              throw new IllegalArgumentException(
                s"materialized view ${mv.name} references source field id " +
                  s"$id ($kind column) that no longer exists in " +
                  s"${source.name} — the column was dropped, the view " +
                  "cannot refresh")).name)
        val resolved = AggView(names(KeyIdsProp, "key"),
          names(SumIdsProp, "sum"), names(MinIdsProp, "min"),
          names(MaxIdsProp, "max"))
        if (resolved != named) migrateNames(mv, named, resolved)
        resolved
    }
  }

  /** Follow a source rename: rename the MV's state columns (key columns
    * and the `s_/nn_/mn_/mx_` partials) and re-stamp the name props.
    * Idempotent — a crash between the two metadata commits re-detects
    * the remaining renames on the next refresh. */
  private def migrateNames(mv: IceTable, old: AggView, nu: AggView): Unit = {
    val pairs = (old.keys.zip(nu.keys) ++
      old.sums.zip(nu.sums).flatMap { case (o, n) =>
        Seq(s"s_$o" -> s"s_$n", s"nn_$o" -> s"nn_$n") } ++
      old.mins.zip(nu.mins).map { case (o, n) => s"mn_$o" -> s"mn_$n" } ++
      old.maxs.zip(nu.maxs).map { case (o, n) => s"mx_$o" -> s"mx_$n" })
      .filter { case (o, n) => o != n }.distinct
    if (pairs.nonEmpty) {
      val have = mv.schema.fields.map(_.name).toSet
      val up = mv.updateSchema
      pairs.foreach { case (o, n) => if (have(o)) up.renameColumn(o, n) }
      up.commit()
    }
    mv.setProperties(nameProps(nu).toSeq: _*)
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
        g.copy(properties = g.properties ++ viewProps(view, source) ++
          filter.map(FilterProp -> _))
      },
      mv.metadata.currentSnapshotId)
    Some(head)
  }

  /** [[refreshOnce]] with the view the MV table itself carries — resolved
    * BY FIELD ID against the source's current schema, so an upstream
    * rename of a referenced column keeps the MV refreshing (the MV's own
    * output column follows the rename). */
  def refreshOnce(source: IceTable, mv: IceTable): (Long, Long) = {
    mv.refresh(); source.refresh()
    refreshOnce(source, mv, resolveView(source, mv))
  }

  /** Fold every source commit since the MV's cursor into the MV,
    * exactly-once — call on any cadence. Returns (groups whose MV row
    * CHANGED — rewritten, incl. births — , groups retired); (0, 0) when
    * the source hasn't moved or the range carried no net change (cursor
    * still advances, metadata-only: a churn batch that nets zero
    * aggregate change — or a compaction-only range — never rewrites an
    * MV file). */
  def refreshOnce(source: IceTable, mv: IceTable, view: AggView,
      prepare: DataFrame => DataFrame = identity): (Long, Long) = {
    source.refresh(); mv.refresh()
    val head = source.metadata.currentSnapshotId.getOrElse(return (0L, 0L))
    require(!mv.metadata.properties.contains(MaterializedJoinAgg.FactCursorProp),
      s"table ${mv.name} is a JOIN materialized view (two cursors) — " +
        "refresh it with MaterializedJoinAgg.refreshOnce(fact, dim, mv)")
    val stored = mv.metadata.properties.get(CursorProp).map(_.toLong)
    require(stored.nonEmpty,
      s"table ${mv.name} has no MV cursor — bootstrap it first")
    viewOf(mv).foreach(carried => require(carried == view,
      s"view mismatch for ${mv.name}: the table carries $carried, the " +
        s"refresh was given $view — folding with a different view would " +
        "silently corrupt the aggregate"))
    if (stored.contains(head)) return (0L, 0L) // nothing new (or a replay)
    val f = filterOf(mv) // filtered MV: the filtered changelog retracts
    // EAGER local checkpoint, not persist: one job materializes the feed
    // read and TRUNCATES its lineage, so the fold's merge and the landing
    // never re-submit the feed DAG's (AQE) stages — with persist the
    // limit-1 empty probe materialized the exchanges, then every later
    // action re-planned them (job-anatomy: 9 isEmpty jobs per gate).
    // Blocks release via the ContextCleaner when the frame is GC'd.
    val batch = prepare(TableChanges.changelog(source, stored, Some(head), f))
      .localCheckpoint(true)
    foldBatch(source, mv, view, prepare, f, batch, stored, head)
  }

  /** Refresh N MVs over ONE source with a SHARED feed read: MVs whose
    * cursors coincide (the steady state of a same-cadence fleet) share
    * one materialized changelog range — one feed read, N folds — while
    * each MV keeps its own exactly-once cursor commit. Filtered MVs
    * row-filter the shared (unfiltered) feed: file pruning is an
    * optimization of the solo path, row filtering is the semantics, so
    * the fold is identical. Returns per-MV (changed, retired) in input
    * order. `changelogFn` is a seam (tests count materializations);
    * production callers leave the default. */
  def refreshAll(source: IceTable, mvs: Seq[IceTable],
      prepare: DataFrame => DataFrame = identity,
      changelogFn: (IceTable, Option[Long], Option[Long]) => DataFrame =
        (t, from, to) => TableChanges.changelog(t, from, to)): Seq[(Long, Long)] = {
    source.refresh()
    val headOpt = source.metadata.currentSnapshotId
    if (headOpt.isEmpty) return mvs.map(_ => (0L, 0L))
    val head = headOpt.get
    val views = mvs.map { mv => mv.refresh(); resolveView(source, mv) }
    val cursors = mvs.map { mv =>
      val c = mv.metadata.properties.get(CursorProp).map(_.toLong)
      require(c.nonEmpty, s"table ${mv.name} has no MV cursor — bootstrap it first")
      c
    }
    val results = Array.fill(mvs.size)((0L, 0L))
    cursors.zipWithIndex.groupBy(_._1).foreach { case (stored, entries) =>
      val idxs = entries.map(_._2)
      if (!stored.contains(head)) {
        // eager checkpoint (not persist): same rationale as refreshOnce —
        // N folds over the shared feed read truncated lineage, one job
        val shared = prepare(changelogFn(source, stored, Some(head)))
          .localCheckpoint(true)
        idxs.foreach { i =>
          val mv = mvs(i)
          val f = filterOf(mv)
          val batch = f.map { e =>
            shared.filter(graft.core.ToColumn.compile(
              graft.core.Exprs.rewriteNot(
                graft.core.Binder.bind(source.schema, e))))
          }.getOrElse(shared)
          results(i) = foldBatch(source, mv, views(i), prepare, f, batch,
            stored, head)
        }
      }
    }
    results.toSeq
  }

  /** The shared fold: apply one already-planned changelog batch to one
    * MV and stamp its cursor, exactly-once. Only groups whose MV row
    * actually CHANGED (or died) retire and rewrite — a touched group
    * whose aggregate landed back on its current row is skipped, and a
    * batch with zero net change commits CURSOR-ONLY (metadata swap, no
    * file writes, no count barrier on the full image set). */
  private def foldBatch(source: IceTable, mv: IceTable, view: AggView,
      prepare: DataFrame => DataFrame, f: Option[graft.core.Expr],
      batch: DataFrame, stored: Option[Long], head: Long): (Long, Long) = {
    // re-validated on every (retried) commit: a concurrent refresher that
    // already advanced the cursor must fail this apply, never be
    // overwritten backwards (a regressed cursor re-folds an applied
    // range — double-counted aggregates)
    val stamp = graft.table.IceTable.guardedCursorStamp(
      mv.name, stored.map(_.toString), head.toString, CursorProp)
    // a state-layout guard before any work: an MV built by an engine
    // version without the nn_<c> sum guards (or with a different view)
    // must fail NAMED, not as an unresolved-column analysis error
    // mid-fold — the fix is a re-bootstrap, and the error should say so
    locally {
      val have = mv.schema.fields.map(_.name).toSet
      val missing = view.stateCols.filterNot(have)
      require(missing.isEmpty,
        s"MV ${mv.name} lacks state column(s) ${missing.mkString(", ")} " +
          "for its declared view — built by an older engine version or " +
          "with a different view; re-bootstrap the MV")
    }
    // the empty test runs on the PERSISTED batch (one cached limit-1 scan)
    // rather than on touched — `touched` would force the distinct's
    // exchange first, and batch empty ⟺ touched empty
    if (batch.isEmpty) { // e.g. a compaction-only range: cursor-only
      mv.commitMetadata(stamp)
      return (0L, 0L)
    }
    locally {
      val state = mv.scan.toDF
      // the elector's base scan pins to the fold's END cursor (`head`):
      // an unpinned scan under a concurrent source writer would elect
      // min/max from commits beyond the stamped cursor — a transiently
      // inconsistent MV-at-cursor. Key joins are null-safe (<=>): a
      // null-valued group key is its own group throughout IncrementalAgg,
      // and a using-column join here would silently never refresh it.
      // The fold also yields the TOUCHED group keys (from its own
      // checkpointed merge) — no second pass + distinct over the batch.
      val (st1, touched) = IncrementalAgg.applyChangelogTouched(
        state, batch, view,
        keys => {
          val sc = source.scan.useSnapshot(head)
          graft.ops.Joins.nullSafeSemi(
            prepare(f.map(sc.filter).getOrElse(sc).toDF), keys, view.keys)
        })
      landChanged(mv, view.keys, state, touched, st1, stamp)
    }
  }

  /** The shared LANDING stage (also the join-MV face's): diff the folded
    * state against the current MV rows of the touched groups, retire and
    * rewrite ONLY the groups whose row changed or died, stamp the
    * cursor(s) — or commit cursor-only when the batch netted nothing.
    *
    * ONE 3-way null-safe join (touched → folded st1 → current MV rows),
    * persisted once, serves the diff, both counts, the retire set and the
    * write frame. Both st1 and the MV hold at most ONE row per group (the
    * engine invariant), so the per-group row comparison is exactly the
    * former `images EXCEPT ALL cur` multiset diff — but the whole landing
    * now evaluates st1's lineage (which includes the hole-election scan)
    * once and runs ONE counting action where the previous shape ran three
    * (images persist, changed count, died count) plus an EXCEPT ALL's
    * aggregate-based set op. Job-anatomy measured (sf0.1 ice_mv_table):
    * the landing was ~38 of the gate's 109 Spark jobs; the fused join
    * roughly halves that. */
  private[streaming] def landChanged(mv: IceTable, keys: Seq[String],
      state: DataFrame, touched: DataFrame, st1: DataFrame,
      stamp: graft.meta.TableMetadata => graft.meta.TableMetadata): (Long, Long) = {
    val stCols = state.columns.toSeq
    val aggCols = stCols.filterNot(keys.contains)
    val t = touched.alias("__lt")
    val n = st1.alias("__ln") // the folded (new) state
    val o = state.alias("__lo") // the current MV rows
    val jnCond = keys.map(k => t.col(k) <=> n.col(k)).reduce(_ && _)
    val joCond = keys.map(k => t.col(k) <=> o.col(k)).reduce(_ && _)
    val j = t.join(n, jnCond, "left_outer").join(o, joCond, "left_outer")
      .select(keys.map(k => t.col(k).as(k)) ++
        stCols.map(c => n.col(c).as(s"__n_$c")) ++
        aggCols.map(c => o.col(c).as(s"__o_$c")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // cnt > 0 on every st1 and MV row, so a null cnt marks a missing side
      val nPresent = col("__n_cnt").isNotNull
      val oPresent = col("__o_cnt").isNotNull
      // per-column null-safe row comparison — exactly EXCEPT ALL's
      // semantics for one-row-per-group sides (keys equal by the join)
      val differs = aggCols.map(c => !(col(s"__n_$c") <=> col(s"__o_$c")))
        .reduce(_ || _)
      val changedCond = nPresent && (!oPresent || differs)
      val diedCond = !nPresent
      val row = j.agg(
        sum(when(changedCond, 1L).otherwise(0L)),
        sum(when(diedCond, 1L).otherwise(0L))).head()
      val nChanged = if (row.isNullAt(0)) 0L else row.getLong(0)
      val nDied = if (row.isNullAt(1)) 0L else row.getLong(1)
      if (nChanged == 0 && nDied == 0) {
        mv.commitMetadata(stamp) // net-zero churn: cursor-only
        return (0L, 0L)
      }
      val retire = j.filter(changedCond || diedCond).select(keys.map(col): _*)
      val changed = j.filter(changedCond)
        .select(stCols.map(c => col(s"__n_$c").as(c)): _*)
      mv.applyKeyed(Some(retire), keys,
        if (nChanged > 0) Some(changed) else None,
        stamp, mv.metadata.currentSnapshotId)
      (nChanged, nDied)
    } finally j.unpersist()
  }
}
