package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, MergeRows, Project, ReplaceData}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.write.RowLevelOperation.Command

/** Captures which data columns a SQL `UPDATE` / `MERGE` actually assigns,
  * so the copy-on-write lineage diff in [[GraftReplaceDataWrite.commit]]
  * can re-read and compare ONLY those columns instead of every column of
  * the rewritten groups (on a wide table the all-column diff doubles the
  * widest read of every CoW UPDATE).
  *
  * UPDATE: the analyzer rewrites `UpdateTable` into `ReplaceData` whose
  * query is a `Project` over the matched groups — an UNASSIGNED column
  * passes through as a bare attribute, an ASSIGNED one is an `Alias` of
  * the `If(cond, new, old)` update expression. That distinction survives
  * the optimizer: projection collapse keeps bare attributes bare, and
  * the only way an assigned column folds back to a bare self-attribute
  * is a no-op `SET c = c`, where skipping the compare is still correct
  * (the content cannot have changed). Over-capturing (an
  * aliased-but-equal rename) merely widens the diff — never wrong.
  *
  * MERGE: the query is a `MergeRows` node whose `Keep` instructions are
  * context-tagged (Copy / Update / Insert). A column is assigned iff
  * some UPDATE-context instruction emits, at that column's position,
  * an expression other than the pass-through target attribute (taken
  * from a Copy-context instruction at the same position). Insert
  * instructions are irrelevant to the diff — inserted rows carry no
  * prior metadata and keep their (null → fresh) lineage either way.
  *
  * Side-effect-only rule: it stamps the column list onto the operation
  * instance the `ReplaceData` node already carries and returns the plan
  * unchanged, so fixed-point re-application is idempotent. Any
  * unrecognized plan shape leaves the field `None` and the write falls
  * back to the full-width diff. */
case class AssignedColumnsRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case r: ReplaceData =>
        r.operation match {
          case op: GraftRowLevelOperation
              if op.cmd == Command.UPDATE || op.cmd == Command.MERGE =>
            op.assignedDataColumns = r.query match {
              // guard: a bare attribute only means "unchanged" when no
              // MergeRows hides the change below the projection
              case p: Project if !p.child.exists(_.isInstanceOf[MergeRows]) =>
                Some(p.projectList.collect { case a: Alias => a.name })
              case m: MergeRows => mergeAssigned(m)
              case _ => None
            }
            AssignedColumnsRule.lastCaptured = op.assignedDataColumns
          case _ => ()
        }
      case _ => ()
    }
    plan
  }

  private def mergeAssigned(m: MergeRows): Option[Seq[String]] = {
    val insts = (m.matchedInstructions ++ m.notMatchedBySourceInstructions)
      .collect { case k: MergeRows.Keep => k }
    val updates = insts.filter(_.context == MergeRows.Update).map(_.output)
    val copies = insts.filter(_.context == MergeRows.Copy).map(_.output)
    val n = m.output.size
    if (updates.isEmpty) return Some(Nil) // delete/insert-only MERGE
    if ((updates ++ copies).exists(_.size != n)) return None
    // pass-through reference per position: the Copy instruction's target
    // attribute, else (no carried rows) a bare attribute named like the
    // output column
    def passThrough(i: Int, e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Boolean = copies.headOption match {
      case Some(c) => c(i).isInstanceOf[Attribute] && e.semanticEquals(c(i))
      case None => e match {
        case a: Attribute => a.name == m.output(i).name
        case _ => false
      }
    }
    Some((0 until n).collect {
      case i if updates.exists(u => !passThrough(i, u(i))) => m.output(i).name
    })
  }
}

object AssignedColumnsRule {
  /** Last capture, for tests/diagnostics only (local mode). */
  @volatile private[graft] var lastCaptured: Option[Seq[String]] = None

  /** Attach to a live session (idempotent) — called from
    * [[GraftCatalog.initialize]] so every session that can issue SQL DML
    * against a graft catalog carries the rule automatically. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[AssignedColumnsRule]))
      spark.experimental.extraOptimizations = cur :+ AssignedColumnsRule(spark)
  }
}
