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
    val (table, pinned) = new GraftSource().load(
      new CaseInsensitiveStringMap(parameters.asJava))
    require(pinned.isEmpty,
      "the CDC stream follows main — time-travel/branch/tag pins are not streamable")
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
      opt("max-snapshots-per-trigger").map(_.toInt))
  }
}

object GraftCdcSource {
  def cdcSchema(table: IceTable): StructType =
    StructType(table.schema.toSpark.fields ++ Seq(
      StructField(graft.core.RowLineage.RowIdName, LongType),
      StructField("_change_type", StringType)))
}

/** Snapshot-id offset of the CDC stream (0 = table start). */
final case class CdcSnapshotOffset(snapshotId: Long) extends V1Offset {
  override def json(): String = snapshotId.toString
}

/** Shared V1 snapshot-range source machinery: offsets are snapshot ids;
  * subclasses provide the per-range batch plan. */
abstract class SnapshotRangeSource(table: IceTable,
    startSnapshotId: Option[Long],
    maxSnapshotsPerTrigger: Option[Int]) extends Source {

  /** The (exclusive-from, inclusive-to] batch plan; from = None means
    * table start. */
  protected def rangeBatch(from: Option[Long], to: Long): DataFrame

  /** The floor for admission control: the end offset of the last batch
    * this source planned (getBatch updates it — on a checkpointed
    * restart the engine's recovery getBatch seeds it), else the
    * configured start, else table start. */
  @volatile private var planned: Option[Long] = None

  /** Admission control: a backfill over 10k committed snapshots becomes
    * bounded micro-batches instead of one giant batch — the offset
    * advances at most `max-snapshots-per-trigger` snapshots along the
    * current ancestry per trigger (mirrors the append stream's
    * admission; always at least one so the stream advances). */
  override def getOffset: Option[V1Offset] = {
    table.refresh()
    val cur = table.metadata.currentSnapshotId.getOrElse(return None)
    val floor = planned.orElse(startSnapshotId).getOrElse(0L)
    if (cur == floor) return Some(CdcSnapshotOffset(cur))
    val capped = maxSnapshotsPerTrigger match {
      case None => cur
      case Some(n) =>
        val pending = table.metadata.ancestorsOf(cur) // newest first
          .takeWhile(_.snapshotId != floor).reverse // oldest first
        pending.take(math.max(1, n)).lastOption.map(_.snapshotId).getOrElse(cur)
    }
    Some(CdcSnapshotOffset(capped))
  }

  /** A recovered offset arrives as SerializedOffset — parse through the
    * json face rather than the case class. Diagnosable on corruption:
    * name the payload and table instead of a bare NumberFormatException. */
  private def idOf(o: V1Offset): Long = {
    val j = o.json()
    try j.toLong catch {
      case e: NumberFormatException => throw new IllegalStateException(
        s"unparseable snapshot offset '$j' (${o.getClass.getSimpleName}) " +
          s"for table ${table.name}", e)
    }
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    table.refresh()
    planned = Some(idOf(end))
    // a fresh query's first batch starts from the configured cursor when
    // one was given; a checkpointed restart always carries its own
    // committed start offset
    val df = rangeBatch(start.map(idOf).orElse(startSnapshotId), idOf(end))
    // V1 contract: the returned frame must carry isStreaming=true
    org.apache.spark.sql.GraftBridge.streamingBatchFrame(table.spark, df)
  }

  override def stop(): Unit = ()
}

class GraftCdcStreamingSource(table: IceTable,
    startSnapshotId: Option[Long] = None,
    maxSnapshotsPerTrigger: Option[Int] = None)
    extends SnapshotRangeSource(table, startSnapshotId, maxSnapshotsPerTrigger) {

  override val schema: StructType = GraftCdcSource.cdcSchema(table)

  override protected def rangeBatch(from: Option[Long], to: Long): DataFrame =
    graft.streaming.TableChanges.lineageDiff(table, from, to)
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
    val (table, pinned) = new GraftSource().load(
      new CaseInsensitiveStringMap(parameters.asJava))
    require(pinned.isEmpty,
      "the changelog stream follows main — time-travel/branch/tag pins are not streamable")
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
      opt("max-snapshots-per-trigger").map(_.toInt))
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
    maxSnapshotsPerTrigger: Option[Int] = None)
    extends SnapshotRangeSource(table, startSnapshotId, maxSnapshotsPerTrigger) {

  override val schema: StructType = GraftChangelogSource.changeSchema(table)

  override protected def rangeBatch(from: Option[Long], to: Long): DataFrame =
    graft.streaming.TableChanges.changelog(
      table, from.filter(_ != 0L), Some(to))
}
