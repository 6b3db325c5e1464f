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
