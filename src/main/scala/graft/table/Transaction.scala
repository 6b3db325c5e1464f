package graft.table

import java.util.UUID

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.core._
import graft.meta._

class ValidationException(msg: String) extends RuntimeException(msg)

/** Multi-operation atomic commit (ref: Transaction table/__init__.py:216).
  *
  * Operations stage their file additions/removals (data files are written
  * eagerly — they are invisible until the metadata commit) plus metadata
  * changes; `commit()` produces ONE snapshot and one metadata swap, so
  * either everything becomes visible or nothing does. Staged operations
  * see the pre-transaction table state (the reference applies updates to
  * an uncommitted metadata copy; the difference is observable only when a
  * transaction deletes rows it appended itself, which we reject).
  */
final class Transaction(table: IceTable) {
  private var added: Seq[DataFile] = Nil
  private var removed: Set[String] = Set.empty
  private var metaChanges: List[TableMetadata => TableMetadata] = Nil
  private var ops: List[String] = Nil
  private var committed = false

  private def stageWrite(df: DataFrame): Seq[DataFile] =
    WriteFiles.write(table.spark, table.location, table.schema, table.spec, df,
      UUID.randomUUID().toString,
      table.metadata.sortOrders.find(_.orderId == table.metadata.defaultSortOrderId),
      table.metadata.properties)

  def append(df: DataFrame): Transaction = {
    added = added ++ stageWrite(df)
    ops = "append" :: ops
    this
  }

  def delete(filter: String): Transaction = delete(ExprParser.parse(filter))

  def delete(filter: Expr): Transaction = {
    val bound = Exprs.rewriteNot(Binder.bind(table.schema, filter))
    if (bound == BFalse) return this
    // staged appends are invisible to planFiles (it reads committed
    // manifests), so test the predicate against the staged files' harvested
    // stats instead — conservative: a staged file that MIGHT contain
    // matching rows rejects the transaction (documented semantics: a
    // transaction cannot delete rows it appended)
    val stagedHit = added.filter(f => f.content == FileContent.Data &&
      Evaluators.rowsMightMatch(bound, f))
    if (stagedHit.nonEmpty)
      throw new ValidationException(
        "Transaction cannot delete rows it appended (staged file may match: " +
          stagedHit.head.filePath + ")")
    val tasks = new IceScan(table).filter(filter).planFiles()
    val (whole, rewrites) = tasks.partition(t =>
      Evaluators.rowsMustMatch(bound, t.file))
    if (rewrites.nonEmpty) {
      // MoR-aware read: apply outstanding position/equality deletes so the
      // rewrite cannot resurrect previously deleted rows
      val survivors = new IceScan(table)
        .toDFForTasks(rewrites, applyResidualOnlyWhereNeeded = true)
        .filter(ToColumn.complementary(bound))
      added = added ++ stageWrite(survivors)
    }
    removed = removed ++ (whole ++ rewrites).map(_.file.filePath)
    ops = "delete" :: ops
    this
  }

  def setProperties(props: (String, String)*): Transaction = {
    metaChanges = ((m: TableMetadata) => m.copy(properties = m.properties ++ props)) :: metaChanges
    ops = "set-properties" :: ops
    this
  }

  /** One atomic snapshot for everything staged. */
  def commit(): Unit = {
    require(!committed, "Transaction already committed")
    committed = true
    val extra = metaChanges.reverse.foldLeft(identity[TableMetadata] _)((f, g) => f.andThen(g))
    if (added.isEmpty && removed.isEmpty) {
      if (metaChanges.nonEmpty) table.commitMetadata(extra)
    } else {
      val op = if (removed.nonEmpty) "overwrite" else "append"
      table.commitSnapshot(op, added, removed, extra)
    }
  }
}
