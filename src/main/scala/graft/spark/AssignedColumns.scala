package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, ReplaceData}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.write.RowLevelOperation.Command

/** Captures which data columns a SQL `UPDATE` actually assigns, so the
  * copy-on-write lineage diff in [[GraftReplaceDataWrite.commit]] can
  * re-read and compare ONLY those columns instead of every column of the
  * rewritten groups (on a wide table the all-column diff doubles the
  * widest read of every CoW UPDATE).
  *
  * Spark's analyzer rewrites `UpdateTable` into `ReplaceData` whose query
  * is a `Project` over the matched groups: an UNASSIGNED column passes
  * through as a bare attribute, an ASSIGNED one is an `Alias` of the
  * `If(cond, new, old)` update expression. That distinction survives the
  * optimizer — projection collapse keeps bare attributes bare, and the
  * only way an assigned column folds back to a bare self-attribute is a
  * no-op `SET c = c`, where skipping the compare is still correct (the
  * content cannot have changed). Over-capturing (an aliased-but-equal
  * rename) merely widens the diff back toward all columns — never wrong.
  *
  * Side-effect-only rule: it stamps the column list onto the operation
  * instance the `ReplaceData` node already carries and returns the plan
  * unchanged, so fixed-point re-application is idempotent. MERGE plans
  * (a `MergeRows` query, not a `Project`) leave the field `None` and the
  * write falls back to the full-width diff. */
case class AssignedColumnsRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case r: ReplaceData =>
        r.operation match {
          case op: GraftRowLevelOperation if op.cmd == Command.UPDATE =>
            op.assignedDataColumns = r.query match {
              case p: Project =>
                Some(p.projectList.collect { case a: Alias => a.name })
              case _ => None
            }
            AssignedColumnsRule.lastCaptured = op.assignedDataColumns
          case _ => ()
        }
      case _ => ()
    }
    plan
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
