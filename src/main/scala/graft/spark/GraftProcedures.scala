package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.{Catalog => GCatalog}

/** The SQL `CALL` face of the maintenance API (Spark 4's native
  * ProcedureCatalog): `CALL cat.system.expire_snapshots(table => 'db.t')`,
  * `rewrite_data_files`, `remove_orphan_files`, `rollback_to_snapshot` —
  * the reference exposes these as Table methods (table/maintenance.py);
  * the procedure names match the iceberg-java Spark procedures so a user
  * switching engines keeps their maintenance jobs. Each procedure returns
  * a small summary relation (GraftAggScan rows). */
object GraftProcedures {

  private def utf8(s: String) = UTF8String.fromString(s)

  /** One self-binding procedure: parameter coercion is declared through
    * `parameters()`; Spark fills defaults and passes one input row. */
  private final class Proc(
      name0: String,
      params: Seq[ProcedureParameter],
      outSchema: StructType,
      body: InternalRow => Seq[Array[Any]])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = name0
    override def description(): String = s"graft maintenance procedure $name0"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      java.util.Collections.singletonList[Scan](
        new ResultScan(outSchema, body(input))).iterator()
  }

  /** Spark requires LOCAL scans as procedure output (the result is
    * driver-materialized summary rows — paths, counts, ids). */
  private final class ResultScan(schema: StructType, rs: Seq[Array[Any]])
      extends org.apache.spark.sql.connector.read.LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] =
      rs.map(a => new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        a.clone()): InternalRow).toArray
  }

  private def in(name: String, t: DataType) = ProcedureParameter.in(name, t).build()
  private def inDefault(name: String, t: DataType, sql: String) =
    ProcedureParameter.in(name, t).defaultValue(sql).build()

  def names: Seq[String] =
    Seq("expire_snapshots", "remove_orphan_files", "rewrite_data_files",
      "rewrite_manifests", "rewrite_position_deletes", "rollback_to_snapshot",
      "compute_partition_stats", "rollback_to_timestamp", "set_current_snapshot",
      "fast_forward", "register_table", "add_files", "create_tag",
      "create_branch", "remove_ref", "cdc_apply", "mv_create", "mv_refresh",
      "mv_refresh_all", "mv_join_create", "mv_join_refresh",
      "mv_topk_create", "mv_topk_refresh")

  def byName(catalog: GCatalog): Map[String, UnboundProcedure] = Map(
    "expire_snapshots" -> new Proc("expire_snapshots",
      Seq(in("table", StringType),
        inDefault("older_than_ms", LongType, "NULL"),
        inDefault("retain_last", IntegerType, "NULL"),
        inDefault("clean_files", BooleanType, "true")),
      StructType(Seq(StructField("expired_snapshot_id", LongType))),
      { input =>
        val t = catalog.loadTable(input.getUTF8String(0).toString)
        val props = t.metadata.properties
        // arg > table property (history.expire.*, the reference's
        // TableProperties, table/__init__.py:209-213) > expire-all
        val horizon = if (!input.isNullAt(1)) input.getLong(1)
          else props.get("history.expire.max-snapshot-age-ms").map(_.toLong)
            .map(System.currentTimeMillis() - _)
            .getOrElse(System.currentTimeMillis() + 1L)
        val retain = if (!input.isNullAt(2)) input.getInt(2)
          else props.get("history.expire.min-snapshots-to-keep").map(_.toInt).getOrElse(1)
        val clean = !input.isNullAt(3) && input.getBoolean(3)
        val expired = t.expireSnapshots().olderThan(horizon).retainLast(retain)
          .cleanExpiredFiles(clean).commit()
        expired.map(id => Array[Any](id))
      }),

    "remove_orphan_files" -> new Proc("remove_orphan_files",
      Seq(in("table", StringType),
        inDefault("older_than_ms", LongType, "NULL")),
      StructType(Seq(StructField("orphan_file_location", StringType))),
      { input =>
        val t = catalog.loadTable(input.getUTF8String(0).toString)
        // default horizon: 3 days, like the iceberg-java procedure — young
        // files may belong to a write racing this call
        val horizon = if (input.isNullAt(1))
          System.currentTimeMillis() - 3L * 24 * 60 * 60 * 1000
        else input.getLong(1)
        t.removeOrphanFiles(horizon).map(p => Array[Any](utf8(p)))
      }),

    "rewrite_data_files" -> new Proc("rewrite_data_files",
      Seq(in("table", StringType),
        inDefault("small_file_bytes", LongType, "NULL"),
        inDefault("zorder_by", StringType, "NULL")),
      StructType(Seq(
        StructField("rewritten_data_files_count", IntegerType),
        StructField("added_data_files_count", IntegerType))),
      { input =>
        val t = catalog.loadTable(input.getUTF8String(0).toString)
        val (rewritten, added) =
          if (!input.isNullAt(2)) {
            val cols = input.getUTF8String(2).toString.split(',').map(_.trim).toSeq
            // small_file_bytes doubles as the z-order target file size so
            // the caller's sizing is never silently discarded
            if (input.isNullAt(1)) t.rewriteDataFilesZOrder(cols)
            else t.rewriteDataFilesZOrder(cols, targetFileBytes = input.getLong(1))
          }
          else if (input.isNullAt(1)) t.rewriteDataFiles()
          else t.rewriteDataFiles(input.getLong(1))
        Seq(Array[Any](rewritten, added))
      }),

    "rewrite_manifests" -> new Proc("rewrite_manifests",
      Seq(in("table", StringType),
        inDefault("target_size_bytes", LongType, "NULL")),
      StructType(Seq(
        StructField("rewritten_manifests_count", IntegerType),
        StructField("added_manifests_count", IntegerType))),
      { input =>
        val t = catalog.loadTable(input.getUTF8String(0).toString)
        val target = if (input.isNullAt(1)) None else Some(input.getLong(1))
        val (rewritten, added) = t.rewriteManifests(target)
        Seq(Array[Any](rewritten, added))
      }),

    "rewrite_position_deletes" -> new Proc("rewrite_position_deletes",
      Seq(in("table", StringType)),
      StructType(Seq(
        StructField("rewritten_delete_files_count", IntegerType),
        StructField("added_delete_files_count", IntegerType))),
      { input =>
        val t = catalog.loadTable(input.getUTF8String(0).toString)
        val (rewritten, added) = t.rewritePositionDeletes()
        Seq(Array[Any](rewritten, added))
      }),

    "compute_partition_stats" -> new Proc("compute_partition_stats",
      Seq(in("table", StringType)),
      StructType(Seq(
        StructField("statistics_path", StringType),
        StructField("file_size_in_bytes", LongType))),
      { input =>
        val t = catalog.loadTable(input.getUTF8String(0).toString)
        val ps = t.computePartitionStatistics()
        Seq(Array[Any](utf8(ps.statisticsPath), ps.fileSizeInBytes))
      }),

    "rollback_to_snapshot" -> new Proc("rollback_to_snapshot",
      Seq(in("table", StringType), in("snapshot_id", LongType)),
      StructType(Seq(
        StructField("previous_snapshot_id", LongType),
        StructField("current_snapshot_id", LongType))),
      { input =>
        val t = catalog.loadTable(input.getUTF8String(0).toString)
        val prev = t.metadata.currentSnapshotId
        val target = input.getLong(1)
        t.manageSnapshots.rollbackToSnapshot(target)
        Seq(Array[Any](prev.map(Long.box).orNull, target))
      }),

    // ---- snapshot management / registration (same names as the
    // iceberg-java Spark procedures where one exists, so migrated
    // maintenance jobs keep running) --------------------------------

    "rollback_to_timestamp" -> new Proc("rollback_to_timestamp",
      Seq(in("table", StringType), in("timestamp_ms", LongType)),
      StructType(Seq(
        StructField("previous_snapshot_id", LongType),
        StructField("current_snapshot_id", LongType))),
      { input =>
        val t = catalog.loadTable(input.getUTF8String(0).toString)
        val prev = t.metadata.currentSnapshotId
        t.manageSnapshots.rollbackToTimestamp(input.getLong(1))
        Seq(Array[Any](prev.map(Long.box).orNull,
          t.metadata.currentSnapshotId.map(Long.box).orNull))
      }),

    "set_current_snapshot" -> new Proc("set_current_snapshot",
      Seq(in("table", StringType), in("snapshot_id", LongType)),
      StructType(Seq(
        StructField("previous_snapshot_id", LongType),
        StructField("current_snapshot_id", LongType))),
      { input =>
        val t = catalog.loadTable(input.getUTF8String(0).toString)
        val prev = t.metadata.currentSnapshotId
        val target = input.getLong(1)
        t.manageSnapshots.setCurrentSnapshot(target)
        Seq(Array[Any](prev.map(Long.box).orNull, target))
      }),

    "fast_forward" -> new Proc("fast_forward",
      Seq(in("table", StringType), in("branch", StringType), in("to", StringType)),
      StructType(Seq(
        StructField("branch_updated", StringType),
        StructField("previous_ref", LongType),
        StructField("updated_ref", LongType))),
      { input =>
        val t = catalog.loadTable(input.getUTF8String(0).toString)
        val branch = input.getUTF8String(1).toString
        val prev = t.metadata.refs.get(branch).map(_.snapshotId)
        t.manageSnapshots.fastForward(branch, input.getUTF8String(2).toString)
        Seq(Array[Any](utf8(branch), prev.map(Long.box).orNull,
          t.metadata.refs(branch).snapshotId))
      }),

    "register_table" -> new Proc("register_table",
      Seq(in("table", StringType), in("metadata_file", StringType)),
      StructType(Seq(
        StructField("current_snapshot_id", LongType),
        StructField("total_records_count", LongType),
        StructField("total_data_files_count", LongType))),
      { input =>
        val t = catalog.registerTable(input.getUTF8String(0).toString,
          input.getUTF8String(1).toString)
        val snap = t.metadata.currentSnapshot
        def tot(k: String): Any = snap.flatMap(_.summary.get(k))
          .map(v => Long.box(v.toLong)).orNull
        Seq(Array[Any](snap.map(s => Long.box(s.snapshotId)).orNull,
          tot("total-records"), tot("total-data-files")))
      }),

    "add_files" -> new Proc("add_files",
      Seq(in("table", StringType), in("files", StringType),
        inDefault("check_duplicate_files", BooleanType, "true")),
      StructType(Seq(StructField("added_files_count", LongType))),
      { input =>
        val t = catalog.loadTable(input.getUTF8String(0).toString)
        val paths = input.getUTF8String(1).toString.split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq
        val check = input.isNullAt(2) || input.getBoolean(2)
        t.addFiles(paths, checkDuplicates = check)
        Seq(Array[Any](paths.length.toLong))
      }),

    // tags/branches have no native Spark SQL syntax (iceberg-java adds
    // parser extensions); the procedure face keeps refs SQL-reachable
    "create_tag" -> new Proc("create_tag",
      Seq(in("table", StringType), in("tag", StringType),
        inDefault("snapshot_id", LongType, "NULL")),
      StructType(Seq(StructField("tag", StringType), StructField("snapshot_id", LongType))),
      { input =>
        val t = catalog.loadTable(input.getUTF8String(0).toString)
        val name = input.getUTF8String(1).toString
        val snap = if (!input.isNullAt(2)) input.getLong(2)
          else t.metadata.currentSnapshotId.getOrElse(
            throw new IllegalArgumentException("table has no current snapshot"))
        t.manageSnapshots.createTag(name, snap)
        Seq(Array[Any](utf8(name), snap))
      }),

    "create_branch" -> new Proc("create_branch",
      Seq(in("table", StringType), in("branch", StringType),
        inDefault("snapshot_id", LongType, "NULL")),
      StructType(Seq(StructField("branch", StringType), StructField("snapshot_id", LongType))),
      { input =>
        val t = catalog.loadTable(input.getUTF8String(0).toString)
        val name = input.getUTF8String(1).toString
        val snap = if (!input.isNullAt(2)) input.getLong(2)
          else t.metadata.currentSnapshotId.getOrElse(
            throw new IllegalArgumentException("table has no current snapshot"))
        t.manageSnapshots.createBranch(name, snap)
        Seq(Array[Any](utf8(name), snap))
      }),

    "remove_ref" -> new Proc("remove_ref",
      Seq(in("table", StringType), in("ref", StringType)),
      StructType(Seq(StructField("removed_ref", StringType))),
      { input =>
        val t = catalog.loadTable(input.getUTF8String(0).toString)
        val name = input.getUTF8String(1).toString
        require(name != "main", "cannot remove the main branch")
        require(t.metadata.refs.contains(name), s"No ref $name")
        t.manageSnapshots.removeTag(name)
        Seq(Array[Any](utf8(name)))
      }),

    // graft extension (no iceberg-java counterpart): one exactly-once
    // replication step of the row-identity CDC feed into a replica —
    // `CALL cat.system.cdc_apply(source => 'db.src', replica => 'db.rep'
    //  [, filter => '<predicate DSL>'])`; the replica's own cursor
    // property picks the range, so a cron of this call IS a mirror
    "cdc_apply" -> new Proc("cdc_apply",
      Seq(in("source", StringType), in("replica", StringType),
        inDefault("filter", StringType, "NULL")),
      StructType(Seq(
        StructField("inserted", LongType), StructField("updated", LongType),
        StructField("deleted", LongType), StructField("cursor", StringType))),
      { input =>
        val src = catalog.loadTable(input.getUTF8String(0).toString)
        val rep = catalog.loadTable(input.getUTF8String(1).toString)
        val f = if (input.isNullAt(2)) None
          else Some(graft.core.ExprParser.parse(input.getUTF8String(2).toString))
        val (i, u, d) = graft.streaming.TableChanges.replicateOnce(src, rep, f)
        Seq(Array[Any](i, u, d, rep.appliedCdcCursor.map(utf8).orNull))
      }),

    // graft extension: incrementally-refreshed MATERIALIZED VIEWS.
    // `CALL cat.system.mv_create(source => 'db.t', mv => 'db.t_stats',
    //  keys => 'a,b' [, sums => 'x'] [, mins => 'x'] [, maxs => 'x'])`
    // creates the MV table (schema derived from the view over the
    // source) and full-builds it, stamping the cursor AND the view
    // definition in the same commit — the MV self-describes, so
    // `CALL cat.system.mv_refresh(source => 'db.t', mv => 'db.t_stats')`
    // on any cadence keeps it fresh, exactly-once (replays no-op).
    "mv_create" -> new Proc("mv_create",
      Seq(in("source", StringType), in("mv", StringType),
        in("keys", StringType), inDefault("sums", StringType, "''"),
        inDefault("mins", StringType, "''"), inDefault("maxs", StringType, "''"),
        inDefault("filter", StringType, "NULL")),
      StructType(Seq(
        StructField("groups", LongType), StructField("cursor", StringType))),
      { input =>
        import graft.streaming.MaterializedAgg
        val src = catalog.loadTable(input.getUTF8String(0).toString)
        def list(i: Int) = input.getUTF8String(i).toString
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val view = graft.ops.IncrementalAgg.AggView(
          list(2), list(3), list(4), list(5))
        require(view.keys.nonEmpty, "mv_create needs at least one key column")
        val filter =
          if (input.isNullAt(6)) None else Some(input.getUTF8String(6).toString)
        // the source's format version comes from its METADATA, not its
        // properties — applyFormatVersion strips the property at creation,
        // so a properties lookup would pin every MV to v2
        val mv = catalog.createTable(input.getUTF8String(1).toString,
          MaterializedAgg.schemaFor(view, src),
          properties = Map("format-version" ->
            src.metadata.formatVersion.toString))
        MaterializedAgg.bootstrap(src, mv, view, identity, filter)
        Seq(Array[Any](mv.refresh().scan.toDF.count(),
          mv.metadata.properties.get(MaterializedAgg.CursorProp)
            .map(utf8).orNull))
      }),

    "mv_refresh" -> new Proc("mv_refresh",
      Seq(in("source", StringType), in("mv", StringType)),
      StructType(Seq(
        StructField("refreshed_groups", LongType),
        StructField("retired_groups", LongType),
        StructField("cursor", StringType))),
      { input =>
        import graft.streaming.MaterializedAgg
        val src = catalog.loadTable(input.getUTF8String(0).toString)
        val mv = catalog.loadTable(input.getUTF8String(1).toString)
        val (r, d) = MaterializedAgg.refreshOnce(src, mv)
        Seq(Array[Any](r, d,
          mv.refresh().metadata.properties.get(MaterializedAgg.CursorProp)
            .map(utf8).orNull))
      }),

    // graft extension: SHARED-FEED refresh — `CALL cat.system.
    // mv_refresh_all(source => 'db.t', mvs => 'db.mv1,db.mv2,db.mv3')`
    // refreshes N MVs over one source with ONE materialized changelog
    // per distinct cursor range (the steady state of a same-cadence
    // fleet shares a single feed read), per-MV exactly-once cursors
    // preserved; returns one row per MV.
    "mv_refresh_all" -> new Proc("mv_refresh_all",
      Seq(in("source", StringType), in("mvs", StringType)),
      StructType(Seq(
        StructField("mv", StringType),
        StructField("refreshed_groups", LongType),
        StructField("retired_groups", LongType),
        StructField("cursor", StringType))),
      { input =>
        import graft.streaming.MaterializedAgg
        val src = catalog.loadTable(input.getUTF8String(0).toString)
        val names = input.getUTF8String(1).toString
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        require(names.nonEmpty, "mv_refresh_all needs at least one MV")
        val mvs = names.map(catalog.loadTable)
        val rs = MaterializedAgg.refreshAll(src, mvs)
        names.zip(mvs).zip(rs).map { case ((n, mv), (r, d)) =>
          Array[Any](utf8(n), r, d,
            mv.refresh().metadata.properties
              .get(MaterializedAgg.CursorProp).map(utf8).orNull)
        }
      }),

    // graft extension: JOIN-VIEW materialized views — the SQL face of
    // MaterializedJoinAgg. `CALL cat.system.mv_join_create(fact =>
    // 'db.orders', dim => 'db.customer', mv => 'db.seg_stats',
    // fact_keys => 'o_custkey', dim_keys => 'c_custkey',
    // keys => 'c_mktsegment' [, sums/mins/maxs => …])` creates +
    // full-builds, stamping BOTH cursors and the join-view definition in
    // one commit; `mv_join_refresh(fact, dim, mv)` folds both sides'
    // changelogs exactly-once on any cadence. `join_type => 'left'`
    // makes it a LEFT OUTER view (unmatched facts kept, dim columns
    // NULL-padded, maintained by the pad-delta rule).
    "mv_join_create" -> new Proc("mv_join_create",
      Seq(in("fact", StringType), in("dim", StringType), in("mv", StringType),
        in("fact_keys", StringType), in("dim_keys", StringType),
        in("keys", StringType), inDefault("sums", StringType, "''"),
        inDefault("mins", StringType, "''"), inDefault("maxs", StringType, "''"),
        inDefault("filter", StringType, "NULL"),
        inDefault("join_type", StringType, "'inner'")),
      StructType(Seq(
        StructField("groups", LongType),
        StructField("fact_cursor", StringType),
        StructField("dim_cursor", StringType))),
      { input =>
        import graft.streaming.MaterializedJoinAgg
        val fact = catalog.loadTable(input.getUTF8String(0).toString)
        val dim = catalog.loadTable(input.getUTF8String(1).toString)
        def list(i: Int) = input.getUTF8String(i).toString
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val jv = graft.ops.IncrementalJoinAgg.JoinView(list(3), list(4),
          graft.ops.IncrementalAgg.AggView(list(5), list(6), list(7), list(8)),
          input.getUTF8String(10).toString)
        require(jv.agg.keys.nonEmpty, "mv_join_create needs at least one key column")
        val filter =
          if (input.isNullAt(9)) None else Some(input.getUTF8String(9).toString)
        val mv = catalog.createTable(input.getUTF8String(2).toString,
          MaterializedJoinAgg.schemaFor(jv, fact, dim),
          properties = Map("format-version" ->
            fact.metadata.formatVersion.toString))
        MaterializedJoinAgg.bootstrap(fact, dim, mv, jv, filter)
        val props = mv.refresh().metadata.properties
        Seq(Array[Any](mv.scan.toDF.count(),
          props.get(MaterializedJoinAgg.FactCursorProp).map(utf8).orNull,
          props.get(MaterializedJoinAgg.DimCursorProp).map(utf8).orNull))
      }),

    // graft extension: TOP-K materialized views — the SQL face of
    // MaterializedTopK. `CALL cat.system.mv_topk_create(source =>
    // 'db.orders', mv => 'db.top_orders', keys => 'o_orderpriority',
    // ord => 'o_totalprice', id => 'o_orderkey', k => 3)` creates +
    // full-builds (view definition + cursor in one commit);
    // `mv_topk_refresh(source, mv)` folds the changelog exactly-once —
    // changed groups retire whole and land their full k-row image.
    "mv_topk_create" -> new Proc("mv_topk_create",
      Seq(in("source", StringType), in("mv", StringType),
        in("keys", StringType), in("ord", StringType), in("id", StringType),
        in("k", IntegerType), inDefault("filter", StringType, "NULL")),
      StructType(Seq(
        StructField("rows", LongType),
        StructField("cursor", StringType))),
      { input =>
        import graft.streaming.{MaterializedAgg, MaterializedTopK}
        val src = catalog.loadTable(input.getUTF8String(0).toString)
        val v = graft.ops.IncrementalTopK.TopKView(
          input.getUTF8String(2).toString
            .split(",").toSeq.map(_.trim).filter(_.nonEmpty),
          input.getUTF8String(3).toString,
          input.getUTF8String(4).toString, input.getInt(5))
        val filter =
          if (input.isNullAt(6)) None else Some(input.getUTF8String(6).toString)
        val mv = catalog.createTable(input.getUTF8String(1).toString,
          MaterializedTopK.schemaFor(src),
          properties = Map("format-version" ->
            src.metadata.formatVersion.toString))
        MaterializedTopK.bootstrap(src, mv, v, filter)
        val props = mv.refresh().metadata.properties
        Seq(Array[Any](mv.scan.toDF.count(),
          props.get(MaterializedAgg.CursorProp).map(utf8).orNull))
      }),

    "mv_topk_refresh" -> new Proc("mv_topk_refresh",
      Seq(in("source", StringType), in("mv", StringType)),
      StructType(Seq(
        StructField("refreshed_groups", LongType),
        StructField("rows_written", LongType),
        StructField("cursor", StringType))),
      { input =>
        import graft.streaming.{MaterializedAgg, MaterializedTopK}
        val src = catalog.loadTable(input.getUTF8String(0).toString)
        val mv = catalog.loadTable(input.getUTF8String(1).toString)
        val (g, r) = MaterializedTopK.refreshOnce(src, mv)
        val props = mv.refresh().metadata.properties
        Seq(Array[Any](g, r,
          props.get(MaterializedAgg.CursorProp).map(utf8).orNull))
      }),

    "mv_join_refresh" -> new Proc("mv_join_refresh",
      Seq(in("fact", StringType), in("dim", StringType), in("mv", StringType)),
      StructType(Seq(
        StructField("refreshed_groups", LongType),
        StructField("retired_groups", LongType),
        StructField("fact_cursor", StringType),
        StructField("dim_cursor", StringType))),
      { input =>
        import graft.streaming.MaterializedJoinAgg
        val fact = catalog.loadTable(input.getUTF8String(0).toString)
        val dim = catalog.loadTable(input.getUTF8String(1).toString)
        val mv = catalog.loadTable(input.getUTF8String(2).toString)
        val (r, d) = MaterializedJoinAgg.refreshOnce(fact, dim, mv)
        val props = mv.refresh().metadata.properties
        Seq(Array[Any](r, d,
          props.get(MaterializedJoinAgg.FactCursorProp).map(utf8).orNull,
          props.get(MaterializedJoinAgg.DimCursorProp).map(utf8).orNull))
      }))
}
