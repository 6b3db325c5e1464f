package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame

import graft.table.IceTable

/** Change-data capture over committed appends (SURVEY §2.J).
  *
  * Pull model: `poll` returns the rows appended since a snapshot cursor
  * plus the new cursor — each call is one micro-batch, equivalent to the
  * reference's IncrementalAppendScan (table/__init__.py:2372) driven as a
  * stream. `follow` wraps it in a background poller for push-style
  * consumption. A DSv2 MicroBatchStream over the same offsets (snapshot
  * ids) is the natural next surface on top of this.
  */
object TableChanges {

  /** Rows appended after snapshot `cursor` (None = from table start).
    * Returns (batch, newCursor); batch is empty when nothing changed. */
  def poll(table: IceTable, cursor: Option[Long]): (DataFrame, Option[Long]) = {
    table.refresh()
    val current = table.metadata.currentSnapshotId
    (cursor, current) match {
      case (_, None) => (emptyDf(table), cursor)
      case (Some(c), Some(cur)) if c == cur => (emptyDf(table), cursor)
      case (Some(c), Some(cur)) => (table.incrementalAppendScan(c, cur), current)
      case (None, Some(cur)) =>
        // from the beginning: ancestors chain bottom = full incremental
        val root = table.metadata.ancestorsOf(cur).last.snapshotId
        val first = table.scan.useSnapshot(root).toDF
        val rest = if (root == cur) None else Some(table.incrementalAppendScan(root, cur))
        (rest.map(first.unionByName(_)).getOrElse(first), current)
    }
  }

  private def emptyDf(table: IceTable): DataFrame =
    table.spark.createDataFrame(
      table.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      table.schema.toSpark)

  /** Row-level CHANGELOG between snapshots (CDC; an extension over the
    * reference's incremental append scan — column shape follows the
    * Iceberg spec's changelog metadata columns). Each row of the result
    * is a table row plus `_change_type` ('insert' | 'delete'),
    * `_change_ordinal` (0-based position of the commit in the range) and
    * `_commit_snapshot_id`. Per ancestor snapshot in (from, to]:
    *
    *  - data files ADDED by the commit → their rows as inserts;
    *  - data files REMOVED by the commit (copy-on-write delete/
    *    overwrite/upsert) → their rows as deletes;
    *  - carry-overs cancelled: a CoW rewrite re-writes surviving rows
    *    into new files, so per-commit `delete ∩ insert` multiset overlap
    *    is removed (exceptAll both ways) leaving only true changes;
    *  - position-delete files / DVs ADDED by the commit → the referenced
    *    data rows (joined back by (file, row-position) through the
    *    `_metadata` columns) as deletes;
    *  - equality-delete files ADDED → parent-visible rows matching the
    *    key set as deletes;
    *  - 'replace' commits (compaction, manifest rewrite) → no logical
    *    change, skipped.
    *
    * All reads use the range-end snapshot's schema (same policy as
    * incrementalAppendScan). Scale: per-commit frames are Spark scans
    * unioned lazily; only file DESCRIPTORS touch the driver, and the
    * per-commit live-set diff is path-string-sized. Positions written
    * over already-masked rows (impossible through this library's
    * writers, which plan deletes against visible rows) would be
    * re-reported; foreign writers stacking deletes on dead positions are
    * out of scope. */
  def changelog(table: IceTable, fromIdExclusive: Option[Long] = None,
      toIdInclusive: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.core.PathUtil
    import graft.meta.{EntryStatus, FileContent, ManifestIO, Io, DeletionVector}
    table.refresh()
    val m = table.metadata
    val spark = table.spark
    val toId = toIdInclusive.orElse(m.currentSnapshotId)
    val schemaAt = toId.map(id => m.schemaById(
      m.snapshotById(id).map(_.schemaId).getOrElse(m.currentSchemaId)))
      .getOrElse(table.schema)
    def withMeta(df: DataFrame, tpe: String, ordinal: Int, snapId: Long): DataFrame =
      df.withColumn("_change_type", lit(tpe))
        .withColumn("_change_ordinal", lit(ordinal))
        .withColumn("_commit_snapshot_id", lit(snapId))
    val emptyOut = withMeta(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schemaAt.toSpark), "insert", 0, 0L).limit(0)
    if (toId.isEmpty) return emptyOut
    val chain = m.ancestorsOf(toId.get).reverse // oldest first
    val range = fromIdExclusive match {
      case Some(f) =>
        require(chain.exists(_.snapshotId == f),
          s"Snapshot $f is not an ancestor of ${toId.get}")
        chain.dropWhile(_.snapshotId != f).drop(1)
      case None => chain
    }
    if (range.isEmpty) return emptyOut

    // cloned session: field-id projection confs stay scoped to these scans
    val rs = org.apache.spark.sql.GraftBridge.cloneSession(spark)
    rs.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    rs.conf.set("spark.sql.parquet.fieldId.read.ignoreMissing", "true")
    // data files can be ORC (add_files-registered) as well as parquet:
    // route each format through its reader and union — the reference
    // applies change reads irrespective of data format (io/pyarrow.py:1629)
    val mapping = table.nameMappingNested
    // formats accumulate across the walked range so readData can route
    // any path this changelog touches
    var fmtOf: Map[String, String] = Map.empty
    def orcFrame(paths: Seq[String], keepFilePos: Boolean): DataFrame =
      graft.table.OrcScanBridge.frame(rs, mapping, schemaAt, graft.core.Schema(Nil),
        paths.map(p => (p,
          Array.empty[graft.spark.DeleteFileRef], Array.empty[graft.spark.EqDeleteRef])),
        keepFile = keepFilePos, keepPos = keepFilePos)
    def readData(paths: Seq[String]): DataFrame = {
      val (orc, parq) = paths.partition(p => fmtOf.get(p).exists(_.equalsIgnoreCase("ORC")))
      val parts = Seq.newBuilder[DataFrame]
      if (parq.nonEmpty) parts += rs.read.schema(schemaAt.toSpark).parquet(parq: _*)
      if (orc.nonEmpty) parts += orcFrame(orc, keepFilePos = false)
      parts.result().reduce(_ unionByName _)
    }

    /** canon path → file format of LIVE data files at snapshot s. */
    def liveDataFmt(s: graft.meta.Snapshot): Map[String, String] =
      ManifestIO.readManifestList(s.manifestList).filter(_.content == 0)
        .flatMap { mf =>
          ManifestIO.readManifest(mf.manifestPath, m.specById(mf.partitionSpecId), m.schema)
            .filter(_.status != EntryStatus.Deleted)
            .map(e => PathUtil.canon(e.dataFile.filePath) -> e.dataFile.fileFormat)
        }.toMap
    def liveData(s: graft.meta.Snapshot): Set[String] = {
      val fm = liveDataFmt(s)
      fmtOf ++= fm
      fm.keySet
    }

    /** delete files first ADDED by snapshot s (descriptors only). */
    def addedDeleteFiles(s: graft.meta.Snapshot): Seq[graft.meta.DataFile] =
      ManifestIO.readManifestList(s.manifestList)
        .filter(mf => mf.content == 1 && mf.addedSnapshotId == s.snapshotId)
        .flatMap { mf =>
          ManifestIO.readManifest(mf.manifestPath, m.specById(mf.partitionSpecId), m.schema)
            .filter(e => e.status == EntryStatus.Added && e.snapshotId == s.snapshotId)
            .map(_.dataFile)
        }

    val frames = Seq.newBuilder[DataFrame]
    var parentLive: Option[Set[String]] = None
    range.zipWithIndex.foreach { case (s, ordinal) =>
      lazy val live = liveData(s)
      val op = s.operation
      if (op == "replace") { parentLive = Some(live) }
      else {
        val pLive = parentLive.getOrElse(
          s.parentSnapshotId.flatMap(m.snapshotById).map(liveData).getOrElse(Set.empty))
        val addedPaths = (live -- pLive).toSeq.sorted
        val removedPaths = (pLive -- live).toSeq.sorted
        val inserts = if (addedPaths.isEmpty) None else Some(readData(addedPaths))
        val cowDeletes = if (removedPaths.isEmpty) None else Some(readData(removedPaths))
        // cancel carry-overs only when a commit both removed and added
        // (CoW rewrite); append-only and pure-MoR commits skip the shuffle
        val (netInserts, netCowDeletes) = (inserts, cowDeletes) match {
          case (Some(i), Some(d)) => (Some(i.exceptAll(d)), Some(d.exceptAll(i)))
          case other => other
        }
        netInserts.foreach(f => frames += withMeta(f, "insert", ordinal, s.snapshotId))
        netCowDeletes.foreach(f => frames += withMeta(f, "delete", ordinal, s.snapshotId))

        // merge-on-read deletes added by this commit
        val dels = addedDeleteFiles(s)
        val (posDels, eqDels) = dels.partition(_.content == FileContent.PositionDeletes)
        val (dvs, posParquet) = posDels.partition(_.isDeletionVector)
        val positions: Option[DataFrame] = {
          val parts = Seq.newBuilder[DataFrame]
          if (posParquet.nonEmpty)
            parts += rs.read.parquet(posParquet.map(_.filePath): _*)
              .select(PathUtil.canonCol(col("file_path")).as("__path"),
                col("pos").as("__pos"))
          if (dvs.nonEmpty) {
            val ioEntries = Io.confEntries(spark)
            val descs = dvs.map(f => (f.filePath, f.contentOffset.getOrElse(0L),
              f.contentSizeInBytes.getOrElse(f.fileSizeInBytes),
              PathUtil.canon(f.referencedDataFile.getOrElse(""))))
            val sc = spark.sparkContext
            val rdd = sc.parallelize(descs, math.min(descs.size, sc.defaultParallelism))
              .flatMap { case (pp, off, len, ref) =>
                DeletionVector.readPositions(pp, off, len, Io.confFrom(ioEntries))
                  .map(pos => (ref, pos))
              }
            parts += rs.createDataFrame(rdd).toDF("__path", "__pos")
          }
          parts.result().reduceOption(_ unionByName _)
        }
        positions.foreach { posDf =>
          // deleted-row content: join positions back to the referenced
          // data files through the scan's (file, row-position) metadata
          val refPaths = posDf.select("__path").distinct()
            .collect().map(_.getString(0)).toSeq.sorted
          if (refPaths.nonEmpty) {
            // (file, position) metadata: parquet via _metadata columns;
            // ORC via the bridge reader's own __file/__pos tracking
            val (orcRefs, parqRefs) = refPaths.partition(p =>
              fmtOf.get(p).exists(_.equalsIgnoreCase("ORC")))
            val withPosParts = Seq.newBuilder[DataFrame]
            if (parqRefs.nonEmpty)
              withPosParts += rs.read.schema(schemaAt.toSpark).parquet(parqRefs: _*)
                .withColumn("__path", PathUtil.metaPathCol(col("_metadata.file_path")))
                .withColumn("__pos", col("_metadata.row_index"))
            if (orcRefs.nonEmpty)
              withPosParts += orcFrame(orcRefs, keepFilePos = true)
                .withColumnRenamed("__file", "__path")
            val rows = withPosParts.result().reduce(_ unionByName _)
              .join(posDf, Seq("__path", "__pos"))
              .drop("__path", "__pos")
            frames += withMeta(rows, "delete", ordinal, s.snapshotId)
          }
        }
        eqDels.foreach { ef =>
          val keyCols = ef.equalityIds.flatMap(id => m.schema.byId.get(id)).map(_.name)
          if (keyCols.nonEmpty) {
            val keys = rs.read.parquet(ef.filePath).select(keyCols.map(col): _*).distinct()
            val parentRows = s.parentSnapshotId.map(pid =>
              table.scan.useSnapshot(pid).toDF).getOrElse(emptyDf(table))
            frames += withMeta(parentRows.join(keys, keyCols, "left_semi"),
              "delete", ordinal, s.snapshotId)
          }
        }
        parentLive = Some(live)
      }
    }
    frames.result().reduceOption(_ unionByName _).getOrElse(emptyOut)
  }

  /** Row-identity CDC driven as micro-batches (v3 row lineage; the
    * incremental face of the batch lineage diff): each poll classifies
    * every row whose identity changed since the `cursor` snapshot as
    * `insert` / `update` / `delete` and returns the new cursor. Robust
    * to compaction between polls — rewritten rows keep `_row_id` AND
    * `_last_updated_sequence_number`, so file moves produce zero phantom
    * changes (a position- or path-based diff gets this wrong). This is
    * what lets incremental dedup / decontamination re-runs touch only
    * changed rows instead of re-reading the corpus.
    *
    * Scale shape — work is proportional to the CHURN, never the corpus.
    * Both snapshots are planned metadata-only (manifest reads), then
    * pruned at the FILE level before any data file opens:
    *
    *  - change set (inserts+updates): a task's `dataSequenceNumber` is a
    *    provable upper bound on every row's
    *    `_last_updated_sequence_number` in that file (inherited seq IS
    *    the file's data seq; materialized values predate the rewrite
    *    that carried them) — so only tasks with `dataSequenceNumber >
    *    seq(cursor)` are scanned, and the row-level seq filter inside
    *    them drops compaction survivors;
    *  - deletes: a row live at the cursor can only have disappeared if
    *    its file was REMOVED since the cursor (CoW) or its file's
    *    applicable-delete set CHANGED (a new DV / position / equality
    *    delete now masks it) — the cursor-side scan reads only that
    *    candidate set, and the anti-join's right side reads only the id
    *    columns of files ADDED or newly-delete-targeted since the
    *    cursor (a rewritten survivor can only live in an added file; a
    *    masked file's survivors only in itself).
    *
    * A poll over a table whose commits only appended opens exactly the
    * appended files; the delete branch never materializes. A row
    * inserted AND deleted between the two polls appears in neither
    * snapshot and is (by net-changes semantics) not reported.
    *
    * Output: the table's data columns + `_row_id` + `_change_type`;
    * deleted rows carry their content as of the cursor snapshot. */
  def pollLineageCdc(table: IceTable, cursor: Option[Long])
      : (DataFrame, Option[Long]) = {
    table.refresh()
    val current = table.metadata.currentSnapshotId
    (cursor, current) match {
      case (_, None) => (emptyLineageDiff(table), cursor)
      case (Some(c), Some(cur)) if c == cur => (emptyLineageDiff(table), cursor)
      case (_, Some(cur)) => (lineageDiff(table, cursor, cur), current)
    }
  }

  private def emptyLineageDiff(table: IceTable): DataFrame = {
    import org.apache.spark.sql.functions._
    val idName = graft.core.RowLineage.RowIdName
    val dataCols = table.schema.fields.map(f => col(f.name))
    table.spark.createDataFrame(
      table.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(table.schema.toSpark.fields ++
        graft.core.RowLineage.fields.map(f => org.apache.spark.sql.types
          .StructField(f.name, org.apache.spark.sql.types.LongType))))
      .select(dataCols :+ col(idName) :+ lit("insert").as("_change_type"): _*)
  }

  /** The pruned row-identity diff between two committed snapshots of one
    * lineage, as a lazy DataFrame (data columns + `_row_id` +
    * `_change_type`) — the shared engine under [[pollLineageCdc]] and the
    * `graft-cdc` streaming source. `from = None` (or a 0 sentinel) means
    * table start: the whole `to` snapshot as inserts. */
  def lineageDiff(table: IceTable, from: Option[Long], to: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    require(table.metadata.formatVersion >= 3,
      "row-identity CDC requires a v3 table (row lineage)")
    val idName = graft.core.RowLineage.RowIdName
    val seqName = graft.core.RowLineage.LastUpdatedName
    val dataCols = table.schema.fields.map(f => col(f.name))
    def out(df: DataFrame, tpe: org.apache.spark.sql.Column): DataFrame =
      df.select(dataCols :+ col(idName) :+ tpe.as("_change_type"): _*)
    val emptyOut = emptyLineageDiff(table)
    from.filter(_ != 0L) match {
      case None =>
        // current-schema pin for the same reason as the diff scans: the
        // output shape is the table's current schema even when `to` is
        // behind the head
        out(new graft.table.IceScan(table).useSnapshot(to).withCurrentSchema
          .toDFWithLineage, lit("insert"))
      case Some(c) if c == to => emptyOut
      case Some(c) =>
        val cur = to
        val chain = table.metadata.ancestorsOf(cur) // newest first
        require(chain.exists(_.snapshotId == c),
          s"Cursor snapshot $c is not an ancestor of the current snapshot $cur")
        val cursorSeq = table.metadata.snapshotById(c).get.sequenceNumber
        // next-row-id as of the cursor commit: row ids are assigned in
        // commit order along one lineage and never reused, so a row
        // present NOW with id below this boundary was necessarily
        // present at the cursor (deleted ids cannot reappear; the
        // ancestor requirement above excludes cross-lineage merges) —
        // insert-vs-update classification becomes a pure FILTER, no join
        val boundary: Option[Long] = chain.dropWhile(_.snapshotId != c).iterator
          .flatMap(s => for { f <- s.firstRowId; a <- s.addedRows } yield f + a)
          .nextOption()
        val (changedTasks, beforeCand, curCand, beforeTasks) =
          prunedDiffTasks(table, c, cur, cursorSeq)
        val upserts: Option[DataFrame] =
          if (changedTasks.isEmpty) None
          else {
            // row-level seq filter inside the pruned files drops
            // compaction survivors (materialized seq ≤ cursorSeq rides
            // in a post-cursor file)
            val changed = table.lineageScanForTasksAt(cur, changedTasks)
              .filter(col(seqName) > cursorSeq)
            Some(boundary match {
              case Some(b) => out(changed,
                when(col(idName) >= b, "insert").otherwise("update"))
              case None => // cursor predates the v3 upgrade: id-set join
                // (full cursor ID scan — 8 bytes/row, column-pruned; only
                // reachable when the cursor commit lacks first-row-id)
                val beforeIds = table.lineageScanForTasksAt(c, beforeTasks)
                  .select(col(idName))
                out(changed.join(beforeIds, Seq(idName), "left_anti")
                    .withColumn("__ct", lit("insert"))
                    .unionByName(changed.join(beforeIds, Seq(idName), "left_semi")
                      .withColumn("__ct", lit("update"))),
                  col("__ct"))
            })
          }
        // deleted rows with cursor-time content: candidate cursor files
        // anti-join the id columns of the candidate current files
        val deletes: Option[DataFrame] =
          if (beforeCand.isEmpty) None
          else Some(out(
            table.lineageScanForTasksAt(c, beforeCand).join(
              table.lineageScanForTasksAt(cur, curCand).select(col(idName)),
              Seq(idName), "left_anti"),
            lit("delete")))
        (upserts, deletes) match {
          case (Some(u), Some(d)) => u.unionByName(d)
          case (Some(u), None) => u
          case (None, Some(d)) => d
          case (None, None) => emptyOut
        }
    }
  }

  /** File-level pruning for the lineage CDC diff between two snapshots
    * (both plans are metadata-only). Returns:
    *  - changedTasks: current-snapshot tasks that can hold changed rows
    *    (`dataSequenceNumber > cursorSeq`);
    *  - beforeCand: cursor-snapshot tasks whose rows can have been
    *    deleted (file removed since the cursor, or applicable-delete set
    *    changed — a rewritten/compacted DV changes the signature too,
    *    which over-includes but never misses);
    *  - curCand: current-snapshot tasks that can hold a cursor row's
    *    survivor (file added since the cursor, or delete set changed);
    *  - beforeTasks: the full cursor plan (legacy pre-v3-cursor path). */
  private[graft] def prunedDiffTasks(table: IceTable, cursorId: Long,
      currentId: Long, cursorSeq: Long)
      : (Seq[graft.table.FileScanTask], Seq[graft.table.FileScanTask],
         Seq[graft.table.FileScanTask], Seq[graft.table.FileScanTask]) = {
    import graft.core.PathUtil
    val curTasks = table.planTasksAt(currentId)
    val beforeTasks = table.planTasksAt(cursorId)
    val changedTasks = curTasks.filter(_.dataSequenceNumber > cursorSeq)
    def key(t: graft.table.FileScanTask): String = PathUtil.canon(t.file.filePath)
    // delete applicability signature: identity of the delete refs the
    // planner attached (path + DV blob offset)
    def delSig(t: graft.table.FileScanTask): Set[(String, Long)] =
      t.deletes.map(f =>
        (PathUtil.canon(f.filePath), f.contentOffset.getOrElse(-1L))).toSet
    val curByPath = curTasks.map(t => key(t) -> t).toMap
    val beforeByPath = beforeTasks.map(t => key(t) -> t).toMap
    val beforeCand = beforeTasks.filter { t =>
      curByPath.get(key(t)) match {
        case None => true // removed: CoW delete/overwrite or compaction
        case Some(ct) => delSig(ct) != delSig(t) // newly delete-targeted
      }
    }
    val curCand = curTasks.filter { t =>
      beforeByPath.get(key(t)) match {
        case None => true // added since the cursor
        case Some(bt) => delSig(t) != delSig(bt)
      }
    }
    (changedTasks, beforeCand, curCand, beforeTasks)
  }

  /** Data files first ADDED by snapshot `s`, canonical-path-sorted —
    * descriptors only (manifest reads, cache-served). The deterministic
    * file order under the streaming sources' intra-snapshot
    * (file-granular) admission: slicing [k1, k2) of this sequence across
    * triggers partitions one bulk append into bounded batches. */
  def addedDataFiles(table: IceTable, snapshotId: Long): Seq[graft.meta.DataFile] = {
    import graft.meta.{EntryStatus, FileContent, ManifestIO}
    val m = table.metadata
    val s = m.snapshotById(snapshotId).getOrElse(throw new IllegalArgumentException(
      s"Snapshot $snapshotId not found in table ${table.name}"))
    ManifestIO.readManifestList(s.manifestList)
      .filter(mf => mf.content == 0 && mf.addedSnapshotId == snapshotId)
      .flatMap { mf =>
        ManifestIO.readManifest(mf, m.specById(mf.partitionSpecId), m.schema, null)
          .filter(e => e.status == EntryStatus.Added &&
            e.snapshotId == snapshotId &&
            e.dataFile.content == FileContent.Data)
          .map(_.dataFile)
      }
      .sortBy(f => graft.core.PathUtil.canon(f.filePath))
  }

  /** Tasks of [[addedDataFiles]]' [fromIdx, toIdx) slice, resolved
    * against the snapshot's plan (delete refs stay snapshot-scoped —
    * vacuous for a pure append, whose new files carry none). */
  private def appendSliceTasks(table: IceTable, snapshotId: Long,
      fromIdx: Long, toIdx: Option[Long]): Seq[graft.table.FileScanTask] = {
    import graft.core.PathUtil
    val paths = addedDataFiles(table, snapshotId).map(f => PathUtil.canon(f.filePath))
    val want = paths.slice(fromIdx.toInt,
      toIdx.map(_.toInt).getOrElse(paths.size)).toSet
    table.planTasksAt(snapshotId)
      .filter(t => want.contains(PathUtil.canon(t.file.filePath)))
  }

  /** A file slice of one append snapshot as CDC inserts (data columns +
    * `_row_id` + `_change_type`) — the intra-snapshot face of
    * [[lineageDiff]] behind the `graft-cdc` source's
    * `max-files-per-trigger` admission. */
  def cdcAppendSlice(table: IceTable, snapshotId: Long, fromIdx: Long,
      toIdx: Option[Long]): DataFrame = {
    import org.apache.spark.sql.functions._
    val tasks = appendSliceTasks(table, snapshotId, fromIdx, toIdx)
    if (tasks.isEmpty) return emptyLineageDiff(table)
    val dataCols = table.schema.fields.map(f => col(f.name))
    table.lineageScanForTasksAt(snapshotId, tasks)
      .select(dataCols :+ col(graft.core.RowLineage.RowIdName) :+
        lit("insert").as("_change_type"): _*)
  }

  /** The same slice in the changelog's shape (`_change_type` /
    * `_change_ordinal` / `_commit_snapshot_id`) for the v2-compatible
    * `graft-changelog` source. The slice is always ordinal 0: it carries
    * exactly one commit's (partial) inserts. */
  def changelogAppendSlice(table: IceTable, snapshotId: Long, fromIdx: Long,
      toIdx: Option[Long]): DataFrame = {
    import org.apache.spark.sql.functions._
    val tasks = appendSliceTasks(table, snapshotId, fromIdx, toIdx)
    val base =
      if (tasks.isEmpty)
        table.spark.createDataFrame(
          table.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          table.schema.toSpark)
      else table.scanForTasksAt(snapshotId, tasks)
    base.withColumn("_change_type", lit("insert"))
      .withColumn("_change_ordinal", lit(0))
      .withColumn("_commit_snapshot_id", lit(snapshotId))
  }

  final class Handle(flag: AtomicBoolean, thread: Thread) {
    def stop(): Unit = { flag.set(false); thread.join(10000) }
  }

  /** Background poller: invokes `fn(batch, snapshotId)` for every new
    * append batch until stopped. */
  def follow(table: IceTable, pollMs: Long = 500L)(fn: (DataFrame, Long) => Unit): Handle = {
    val running = new AtomicBoolean(true)
    val thread = new Thread(() => {
      var cursor: Option[Long] = table.metadata.currentSnapshotId
      while (running.get()) {
        val (batch, next) = poll(table, cursor)
        if (next != cursor) {
          fn(batch, next.get)
          cursor = next
        }
        Thread.sleep(pollMs)
      }
    }, s"graft-follow-${table.name}")
    thread.setDaemon(true)
    thread.start()
    new Handle(running, thread)
  }
}
