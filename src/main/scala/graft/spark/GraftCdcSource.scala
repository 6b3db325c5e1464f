package graft.spark

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.IceTable

/** Row-identity CDC as a Structured Streaming SOURCE over a v3 table:
  *
  * {{{
  * spark.readStream.format("graft-cdc")
  *   .option("warehouse", wh).option("table", "db.t").load()
  * }}}
  *
  * Each micro-batch carries the table's data columns + `_row_id` +
  * `_change_type` ('insert' | 'update' | 'delete') for the snapshot
  * range (previousOffset, currentOffset] — the streaming face of
  * [[graft.streaming.TableChanges.lineageDiff]], so every batch is the
  * FILE-PRUNED diff: work per batch is proportional to the churn the
  * range committed, never the corpus, and compaction between offsets
  * contributes zero phantom changes (rows keep `_row_id` and
  * `_last_updated_sequence_number` through rewrites).
  *
  * Offsets are snapshot ids (same scheme as the append
  * [[GraftMicroBatchStream]]), so checkpoints survive restarts: a
  * recovered offset replays exactly the uncommitted snapshot range.
  * The first batch (no prior offset) is the whole table as inserts.
  *
  * The batch plan involves per-range joins (delete anti-join,
  * insert/update split), so this source serves each batch through the
  * V1 `Source.getBatch` seam — the DataFrame-per-batch contract that
  * file sources use — rather than the partition-level DSv2 one; the
  * diff itself is planned lazily and executes distributed like any
  * batch read of the same range. */
class GraftCdcSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  private def load(parameters: Map[String, String]): IceTable = {
    import scala.jdk.CollectionConverters._
    // `branch` is OURS (a moving ref the stream follows — the WAP-audit
    // feed), not a static pin for the batch loader; everything that
    // cannot move (snapshot-id / as-of-timestamp / tag) stays rejected
    val (table, pinned) = new GraftSource().load(new CaseInsensitiveStringMap(
      parameters.filterNot(_._1.equalsIgnoreCase("branch")).asJava))
    require(pinned.isEmpty,
      "the CDC stream follows a moving ref — snapshot-id/as-of-timestamp/" +
        "tag pins are not streamable (a BRANCH is: option(\"branch\", …))")
    require(table.metadata.formatVersion >= 3,
      "row-identity CDC requires a v3 table (row lineage)")
    table
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), GraftCdcSource.cdcSchema(load(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    // start-snapshot-id (exclusive): begin the stream AT a known cursor
    // instead of backfilling the whole table as inserts — the readStream
    // face of pollLineageCdc's cursor argument
    def opt(name: String): Option[String] = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v
    }
    new GraftCdcStreamingSource(load(parameters),
      opt("start-snapshot-id").map(_.toLong),
      opt("max-snapshots-per-trigger").map(_.toInt),
      opt("max-files-per-trigger").map(_.toInt),
      metadataPath,
      // option("filter", "<predicate DSL>"): the FILTERED feed — replica
      // semantics (moved-out rows surface as deletes), every batch plan
      // pruned to matching files before any data read
      opt("filter").map(graft.core.ExprParser.parse),
      // option("branch", "audit"): follow that branch's head instead of
      // main — the WAP-audit feed (see TableChanges.refHead)
      opt("branch"),
      // option("max-bytes-per-trigger", …): byte-budget admission — file
      // counts are a poor proxy for batch size under skewed file sizes
      opt("max-bytes-per-trigger").map(_.toLong))
  }
}

object GraftCdcSource {
  def cdcSchema(table: IceTable): StructType =
    StructType(table.schema.toSpark.fields ++ Seq(
      StructField(graft.core.RowLineage.RowIdName, LongType),
      StructField("_change_type", StringType)))
}

/** Snapshot-position offset of the CDC/changelog streams. Two shapes:
  * a bare snapshot id (`"123"`) = the snapshot fully consumed, or
  * `"123#40"` = the first 40 path-sorted data files ADDED by (pure
  * append) snapshot 123 consumed, everything through its parent fully
  * consumed — the intra-snapshot position file-granular admission emits
  * so one bulk append becomes several bounded batches. 0 = table start. */
final case class CdcSnapshotOffset(snapshotId: Long,
    filesConsumed: Option[Long] = None) extends V1Offset {
  override def json(): String =
    filesConsumed.fold(snapshotId.toString)(k => s"$snapshotId#$k")
}

object CdcSnapshotOffset {
  def parse(json: String, context: => String): (Long, Option[Long]) =
    try json.split('#') match {
      case Array(id) => (id.toLong, None)
      case Array(id, k) => (id.toLong, Some(k.toLong))
      case _ => throw new NumberFormatException(json)
    } catch {
      case e: NumberFormatException => throw new IllegalStateException(
        s"unparseable snapshot offset '$json' $context", e)
    }
}

/** Shared V1 snapshot-range source machinery: offsets are snapshot ids
  * (optionally with an intra-snapshot file position); subclasses provide
  * the per-range batch plan and the append-slice plan. */
abstract class SnapshotRangeSource(table: IceTable,
    startSnapshotId: Option[Long],
    maxSnapshotsPerTrigger: Option[Int],
    maxFilesPerTrigger: Option[Int] = None,
    metadataPath: String = "",
    branch: Option[String] = None,
    maxBytesPerTrigger: Option[Long] = None) extends Source {

  /** The (exclusive-from, inclusive-to] batch plan; from = None means
    * table start. from == to must yield an EMPTY frame of the source's
    * schema (the fallback shape for degenerate partial ranges). */
  protected def rangeBatch(from: Option[Long], to: Long): DataFrame

  /** The [fromIdx, toIdx) slice of the path-sorted data files ADDED by
    * (pure append) snapshot `s`, as this source's insert rows; toIdx =
    * None means through the last file. */
  protected def appendSlice(s: Long, fromIdx: Long, toIdx: Option[Long]): DataFrame

  /** The floor for admission control: the end offset of the last batch
    * this source planned (getBatch updates it and PERSISTS it under the
    * stream's metadataPath — a clean checkpointed restart would otherwise
    * see None here, fall back to start-snapshot-id, and with
    * max-snapshots-per-trigger emit a capped offset BEHIND the committed
    * one, wedging the stream on the ancestor check; on a crash restart
    * the engine's recovery getBatch re-seeds it too). */
  @volatile private var planned: Option[(Long, Option[Long])] = None

  private def plannedFile: Option[String] =
    Option(metadataPath).filter(_.nonEmpty).map(_ + "/graft-last-planned-offset")

  private def persistPlanned(id: Long, files: Option[Long]): Unit =
    plannedFile.foreach { p =>
      // atomic (write-tmp + rename): a crash mid-write must not leave a
      // truncated floor file that poisons the next clean restart's parse
      graft.meta.Io.writeBytesAtomic(p, CdcSnapshotOffset(id, files).json()
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

  private def recoverPlanned(): Option[(Long, Option[Long])] =
    plannedFile.filter(graft.meta.Io.exists).map { p =>
      val json = new String(graft.meta.Io.readBytes(p),
        java.nio.charset.StandardCharsets.UTF_8).trim
      CdcSnapshotOffset.parse(json,
        s"persisted under $p for table ${table.name}")
    }

  /** Count of data files first added by snapshot `s` — summary fast path,
    * manifest walk (cache-served) otherwise. */
  private def addedFileCount(s: graft.meta.Snapshot): Long =
    s.summary.get("added-data-files").map(_.toLong).getOrElse(
      graft.streaming.TableChanges.addedDataFiles(table, s.snapshotId).size.toLong)

  /** Bytes of the files first added by snapshot `s` — summary fast path
    * (`added-files-size`), manifest walk (cache-served) otherwise. */
  private def addedByteSize(s: graft.meta.Snapshot): Long =
    s.summary.get("added-files-size").map(_.toLong).getOrElse(
      graft.streaming.TableChanges.addedDataFiles(table, s.snapshotId)
        .map(_.fileSizeInBytes).sum)

  /** How many of `s`'s path-sorted added files to admit starting at
    * index `fromIdx`, honoring BOTH budgets: at most
    * `max-files-per-trigger` files and (cumulatively) at most
    * `max-bytes-per-trigger` bytes — file COUNT alone is a poor proxy
    * (10 files can be 10 KB or 10 GB; the spec-mandated
    * `file_size_in_bytes` rides every manifest entry, so the byte
    * budget is metadata-only too). Always ≥ 1 so the stream advances
    * even past a single over-budget file. */
  private def sliceLen(snapshotId: Long, fromIdx: Long): Long = {
    val files = graft.streaming.TableChanges.addedDataFiles(table, snapshotId)
      .drop(fromIdx.toInt)
    val byCount = maxFilesPerTrigger.map(_.toLong).getOrElse(Long.MaxValue)
    val byBytes = maxBytesPerTrigger.getOrElse(Long.MaxValue)
    var n = 0L
    var bytes = 0L
    val it = files.iterator
    while (it.hasNext && n < byCount) {
      val f = it.next()
      if (n > 0 && bytes + f.fileSizeInBytes > byBytes) return n
      bytes += f.fileSizeInBytes
      n += 1
      if (bytes >= byBytes) return n
    }
    math.max(1L, n)
  }

  /** Admission control: a backfill over 10k committed snapshots becomes
    * bounded micro-batches instead of one giant batch — the offset
    * advances at most `max-snapshots-per-trigger` snapshots along the
    * current ancestry per trigger, and with `max-files-per-trigger` /
    * `max-bytes-per-trigger` a single bulk APPEND snapshot is further
    * split into intra-snapshot file slices (delete/update-bearing
    * commits stay atomic: only pure appends get partial offsets).
    * Always advances so the stream makes progress. */
  override def getOffset: Option[V1Offset] = {
    table.refresh()
    // main's head, or the named branch's (WAP-audit feed); a branch not
    // yet created = no data yet, so the stream idles instead of failing
    val cur = graft.streaming.TableChanges.refHead(table, branch)
      .getOrElse(return None)
    val (floorId, floorFiles) = planned.orElse(recoverPlanned())
      .getOrElse((startSnapshotId.getOrElse(0L), None))
    if (cur == floorId && floorFiles.isEmpty) return Some(CdcSnapshotOffset(cur))
    // mid-snapshot floor: keep slicing the same append snapshot
    floorFiles.foreach { k =>
      val s = table.metadata.snapshotById(floorId).getOrElse(
        throw new IllegalStateException(s"snapshot $floorId (the stream's " +
          s"partial floor) no longer exists in table ${table.name}"))
      val total = addedFileCount(s)
      val next = k + sliceLen(floorId, k)
      return Some(if (next >= total) CdcSnapshotOffset(floorId)
        else CdcSnapshotOffset(floorId, Some(next)))
    }
    val chain = table.metadata.ancestorsOf(cur) // newest first
    // a floor that fell out of the ancestry (expired snapshot, branch
    // rewrite) must fail HERE with a named diagnosis — takeWhile would
    // silently consume the whole chain and re-emit offsets near table
    // start, surfacing later as an opaque ancestor error inside getBatch
    if (floorId != 0L && !chain.exists(_.snapshotId == floorId))
      throw new IllegalStateException(
        s"snapshot $floorId (the stream's resume floor) is not an ancestor " +
          s"of the current snapshot $cur of table ${table.name} — it was " +
          "expired or the branch was rewritten; restart the stream with a " +
          "fresh checkpoint or a valid start-snapshot-id")
    val pending = chain.takeWhile(_.snapshotId != floorId).reverse // oldest first
    if (pending.isEmpty) return Some(CdcSnapshotOffset(cur))
    val bySnap = maxSnapshotsPerTrigger
      .map(n => pending.take(math.max(1, n))).getOrElse(pending)
    if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty)
      return Some(CdcSnapshotOffset(bySnap.last.snapshotId))
    val head = bySnap.head
    val headFiles = addedFileCount(head)
    // one giant append becomes its first slice; non-append commits
    // (deletes/updates ride them) stay atomic per snapshot
    if (head.operation == "append" &&
        (maxFilesPerTrigger.exists(headFiles > _) ||
          maxBytesPerTrigger.exists(addedByteSize(head) > _))) {
      val n = sliceLen(head.snapshotId, 0L)
      return Some(if (n >= headFiles) CdcSnapshotOffset(head.snapshotId)
        else CdcSnapshotOffset(head.snapshotId, Some(n)))
    }
    // otherwise admit whole snapshots under both budgets (≥ 1 snapshot)
    var fileBudget =
      maxFilesPerTrigger.map(_.toLong).getOrElse(Long.MaxValue) - headFiles
    var byteBudget =
      maxBytesPerTrigger.getOrElse(Long.MaxValue) - addedByteSize(head)
    val admitted = head +: bySnap.tail.takeWhile { s =>
      val f = addedFileCount(s)
      val b = addedByteSize(s)
      val ok = f <= fileBudget && b <= byteBudget
      if (ok) { fileBudget -= f; byteBudget -= b }
      ok
    }
    Some(CdcSnapshotOffset(admitted.last.snapshotId))
  }

  /** A recovered offset arrives as SerializedOffset — parse through the
    * json face rather than the case class. Diagnosable on corruption:
    * name the payload and table instead of a bare NumberFormatException. */
  private def posOf(o: V1Offset): (Long, Option[Long]) =
    CdcSnapshotOffset.parse(o.json(),
      s"(${o.getClass.getSimpleName}) for table ${table.name}")

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    table.refresh()
    val (endId, endFiles) = posOf(end)
    planned = Some((endId, endFiles))
    persistPlanned(endId, endFiles)
    // a fresh query's first batch starts from the configured cursor when
    // one was given; a checkpointed restart always carries its own
    // committed start offset
    val (startIdOpt, startFiles) = start.map(posOf)
      .map { case (i, f) => (Option(i), f) }
      .getOrElse((startSnapshotId, None))
    val parts = Seq.newBuilder[DataFrame]
    if (startIdOpt.contains(endId)) {
      // intra-snapshot advance: only a file slice of one append snapshot.
      // Equal FULL positions are an empty batch — a fresh query whose
      // configured start-snapshot-id IS the current head must not replay
      // that snapshot's files as a backfill
      if (startFiles.isDefined || endFiles.isDefined)
        parts += appendSlice(endId, startFiles.getOrElse(0L), endFiles)
    } else {
      // finish the partially-consumed start snapshot first
      startFiles.foreach(k => parts += appendSlice(startIdOpt.get, k, None))
      // full-snapshot diff up to the end (or its parent when the end is
      // itself a partial position)
      val diffTo =
        if (endFiles.isEmpty) Some(endId)
        else table.metadata.snapshotById(endId).flatMap(_.parentSnapshotId)
      diffTo.filterNot(startIdOpt.contains).foreach(t =>
        parts += rangeBatch(startIdOpt, t))
      // the end's own partial slice
      endFiles.foreach(k => parts += appendSlice(endId, 0L, Some(k)))
    }
    val df = parts.result().reduceOption(_ unionByName _)
      .getOrElse(rangeBatch(Some(endId), endId)) // degenerate: empty shape
    // V1 contract: the returned frame must carry isStreaming=true
    org.apache.spark.sql.GraftBridge.streamingBatchFrame(table.spark, df)
  }

  override def stop(): Unit = ()
}

class GraftCdcStreamingSource(table: IceTable,
    startSnapshotId: Option[Long] = None,
    maxSnapshotsPerTrigger: Option[Int] = None,
    maxFilesPerTrigger: Option[Int] = None,
    metadataPath: String = "",
    filter: Option[graft.core.Expr] = None,
    branch: Option[String] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends SnapshotRangeSource(table, startSnapshotId, maxSnapshotsPerTrigger,
      maxFilesPerTrigger, metadataPath, branch, maxBytesPerTrigger) {

  override val schema: StructType = GraftCdcSource.cdcSchema(table)

  override protected def rangeBatch(from: Option[Long], to: Long): DataFrame =
    graft.streaming.TableChanges.lineageDiff(table, from, to, filter)

  override protected def appendSlice(s: Long, fromIdx: Long,
      toIdx: Option[Long]): DataFrame =
    graft.streaming.TableChanges.cdcAppendSlice(table, s, fromIdx, toIdx, filter)
}

/** Snapshot-diff CHANGELOG as a streaming source — the v2-compatible
  * companion of `graft-cdc` (no row lineage required): each micro-batch
  * carries the table's columns + `_change_type` ('insert' | 'delete') +
  * `_change_ordinal` (commit position WITHIN the batch's range) +
  * `_commit_snapshot_id`, computed by [[graft.streaming.TableChanges
  * .changelog]]'s per-commit manifest diff (CoW carry-overs cancelled,
  * MoR deletes resolved, 'replace' commits silent). Offsets and options
  * (`start-snapshot-id`, `max-snapshots-per-trigger`) are shared with
  * the CDC source. Updates surface as delete+insert pairs — row
  * identity needs v3 and the `graft-cdc` source. */
class GraftChangelogSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changelog"

  private def load(parameters: Map[String, String]): IceTable = {
    import scala.jdk.CollectionConverters._
    val (table, pinned) = new GraftSource().load(new CaseInsensitiveStringMap(
      parameters.filterNot(_._1.equalsIgnoreCase("branch")).asJava))
    require(pinned.isEmpty,
      "the changelog stream follows a moving ref — snapshot-id/as-of-" +
        "timestamp/tag pins are not streamable (a BRANCH is: " +
        "option(\"branch\", …))")
    table
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), GraftChangelogSource.changeSchema(load(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    def opt(name: String): Option[String] = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v
    }
    new GraftChangelogStreamingSource(load(parameters),
      opt("start-snapshot-id").map(_.toLong),
      opt("max-snapshots-per-trigger").map(_.toInt),
      opt("max-files-per-trigger").map(_.toInt),
      metadataPath,
      opt("filter").map(graft.core.ExprParser.parse),
      opt("branch"),
      opt("max-bytes-per-trigger").map(_.toLong))
  }
}

object GraftChangelogSource {
  def changeSchema(table: IceTable): StructType =
    StructType(table.schema.toSpark.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_change_ordinal", org.apache.spark.sql.types.IntegerType),
      StructField("_commit_snapshot_id", LongType)))
}

class GraftChangelogStreamingSource(table: IceTable,
    startSnapshotId: Option[Long] = None,
    maxSnapshotsPerTrigger: Option[Int] = None,
    maxFilesPerTrigger: Option[Int] = None,
    metadataPath: String = "",
    filter: Option[graft.core.Expr] = None,
    branch: Option[String] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends SnapshotRangeSource(table, startSnapshotId, maxSnapshotsPerTrigger,
      maxFilesPerTrigger, metadataPath, branch, maxBytesPerTrigger) {

  override val schema: StructType = GraftChangelogSource.changeSchema(table)

  override protected def rangeBatch(from: Option[Long], to: Long): DataFrame =
    graft.streaming.TableChanges.changelog(
      table, from.filter(_ != 0L), Some(to), filter)

  override protected def appendSlice(s: Long, fromIdx: Long,
      toIdx: Option[Long]): DataFrame =
    graft.streaming.TableChanges.changelogAppendSlice(table, s, fromIdx, toIdx, filter)
}
