package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualNullSafe, Expression, If, Literal, Not, Or}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, MergeRows, Project, ReplaceData}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.LongType

/** Row-level-DML plan instrumentation for v3 row lineage, two jobs:
  *
  * 1. CAPTURE which data columns a SQL `UPDATE` / `MERGE` actually
  *    assigns, so the copy-on-write lineage diff in
  *    [[GraftReplaceDataWrite.commit]] can re-read and compare ONLY those
  *    columns when it has to fall back to the read-back diff.
  *
  * 2. STAMP the `_last_updated_sequence_number` update INTO the plan:
  *    the spec's rewrite rule (an updated row keeps `_row_id`, its seq
  *    becomes the new commit's) needs "did this row's content change?",
  *    which is a ROW-LOCAL comparison of each assigned expression
  *    against the original attribute — both already in scope. Stamping
  *    `seq := if(any assigned value differs, null, seq)` at write time
  *    makes the staged files FINAL (null inherits the commit's sequence
  *    number), so the commit skips the read-back diff entirely and the
  *    staged files qualify for direct commit — one write instead of
  *    stage + re-read + join + rewrite.
  *
  * UPDATE: the analyzer rewrites `UpdateTable` into `ReplaceData` whose
  * query is a `Project` over the matched groups — an UNASSIGNED column
  * passes through as a bare attribute, an ASSIGNED one is an `Alias` of
  * the `If(cond, new, old)` update expression. That distinction survives
  * the optimizer: projection collapse keeps bare attributes bare, and
  * the only way an assigned column folds back to a bare self-attribute
  * is a no-op `SET c = c`, where skipping the compare is still correct
  * (the content cannot have changed). The stamped seq entry keeps the
  * original attribute's exprId (and metadata), so the analysis-time
  * data/metadata projections over the query output stay valid.
  *
  * MERGE: the query is a `MergeRows` node whose `Keep` instructions are
  * context-tagged (Copy / Update / Insert). A column is assigned iff
  * some UPDATE-context instruction emits, at that column's position,
  * an expression other than the pass-through target attribute (taken
  * from a Copy-context instruction at the same position — semantic
  * equality pins the exprId, so `SET a = src.a` with a source attribute
  * NAMED like the target column still counts as assigned). The stamp
  * rewrites each Update-context instruction's seq output in place;
  * `m.output` is untouched, so no reference above the node can break.
  * Insert instructions already emit null lineage and Copy instructions
  * pass the original seq through — both correct as-is.
  *
  * Content-identical updates (SET to the existing value) keep their old
  * seq under both the stamp and the fallback diff — the documented
  * CDC-style semantics of the group-based rewrite.
  *
  * Idempotent under fixed-point re-application: a stamped Project's seq
  * entry is an Alias (no longer a bare attribute) and a stamped Update
  * instruction's seq output is no longer an Attribute — both re-visits
  * detect this and leave the plan unchanged. Any unrecognized plan
  * shape is left untouched: the capture stays `None` (full-width diff)
  * and the stamp stays off (read-back diff runs) — always safe. */
case class AssignedColumnsRule(spark: SparkSession) extends Rule[LogicalPlan] {
  private val seqName = graft.core.RowLineage.LastUpdatedName

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: ReplaceData =>
      r.operation match {
        case op: GraftRowLevelOperation
            if op.cmd == Command.UPDATE || op.cmd == Command.MERGE =>
          op.assignedDataColumns = r.query match {
            // guard: a bare attribute only means "unchanged" when no
            // MergeRows hides the change below the projection
            case p: Project if !p.child.exists(_.isInstanceOf[MergeRows]) =>
              Some(p.projectList.collect {
                case a: Alias if a.name != seqName => a.name
              })
            case m: MergeRows => mergeAssigned(m)
            case _ => None
          }
          AssignedColumnsRule.lastCaptured = op.assignedDataColumns
          val stamped: Option[LogicalPlan] = r.query match {
            case p: Project if !p.child.exists(_.isInstanceOf[MergeRows]) =>
              stampProject(p)
            case m: MergeRows => stampMerge(m)
            case _ => None
          }
          stamped match {
            case Some(q) =>
              op.lineageStampedInPlan = true
              r.copy(query = q)
            case None => r
          }
        case _ => r
      }
  }

  /** UPDATE shape: replace the bare pass-through seq attribute with
    * `if(any assigned column's value differs from the original, null,
    * seq)`, keeping the attribute's exprId. None when the shape doesn't
    * match (already stamped, v2 table, no assignment, or a plan this
    * rule doesn't recognize). */
  private def stampProject(p: Project): Option[Project] = {
    val childByName = p.child.output.map(a => a.name -> a).toMap
    val seqIdx = p.projectList.indexWhere {
      case a: Attribute => a.name == seqName
      case _ => false
    }
    if (seqIdx < 0) return None // v2 (no seq metadata) or already stamped
    val seqAttr = p.projectList(seqIdx).asInstanceOf[Attribute]
    // each assigned column that shadows an original attribute of the
    // same name contributes a null-safe runtime compare; an alias with
    // no original counterpart (__row_operation) is not a data column
    val assigned = p.projectList.collect {
      case a: Alias if a.name != seqName && childByName.contains(a.name) => a
    }
    if (assigned.isEmpty) return None // assignment-free: nothing to stamp
    // the compare DUPLICATES each assigned expression: a nondeterministic
    // assignment (SET c = rand()) would evaluate twice and the stamp could
    // disagree with the projected value — leave the plan unstamped so the
    // read-back diff runs (expensive but correct)
    if (assigned.exists(a => !a.child.deterministic)) return None
    val comparisons: Seq[Expression] = assigned.map(a =>
      Not(EqualNullSafe(a.child, childByName(a.name))))
    val stampedSeq = Alias(
      If(comparisons.reduce(Or), Literal(null, LongType), seqAttr), seqName)(
      exprId = seqAttr.exprId, qualifier = seqAttr.qualifier,
      explicitMetadata = Some(seqAttr.metadata))
    Some(p.copy(projectList = p.projectList.updated(seqIdx, stampedSeq)))
  }

  /** MERGE shape: rewrite each Update-context Keep instruction's seq
    * output to `if(any data position differs from the Copy pass-through,
    * null, seq)`. None when there is no Copy anchor, the instruction
    * shapes are unexpected, or the seq output is already rewritten. */
  private def stampMerge(m: MergeRows): Option[MergeRows] = {
    val keeps = (m.matchedInstructions ++ m.notMatchedBySourceInstructions)
      .collect { case k: MergeRows.Keep => k }
    val updates = keeps.filter(_.context == MergeRows.Update)
    val copies = keeps.filter(_.context == MergeRows.Copy)
    if (updates.isEmpty || copies.isEmpty) return None
    val n = m.output.size
    if (keeps.exists(_.output.size != n)) return None
    val seqIdx = m.output.indexWhere(_.name == seqName)
    if (seqIdx < 0) return None // v2: no lineage metadata rides the merge
    if (updates.exists(u => !u.output(seqIdx).isInstanceOf[Attribute]))
      return None // already stamped (idempotency)
    val copy = copies.head
    // same determinism guard as stampProject: the cmp duplicates each
    // assigned output expression, so a nondeterministic assignment in ANY
    // update instruction vetoes the stamp (all-or-nothing — a partially
    // stamped plan would wrongly claim lineageStampedInPlan)
    if (updates.exists(u => u.output.exists(e => !e.deterministic))) return None
    val reserved = Set(seqName, graft.core.RowLineage.RowIdName,
      GraftSparkTable.FileColumn)
    // data positions: every output column except the metadata trio —
    // internal columns like __row_operation carry row-independent
    // literals whose compare folds away statically
    val dataIdx = (0 until n).filter(i => !reserved.contains(m.output(i).name))
    def rewrite(inst: MergeRows.Instruction): MergeRows.Instruction = inst match {
      case k: MergeRows.Keep if k.context == MergeRows.Update =>
        val cmp = dataIdx.flatMap { i =>
          val u = k.output(i)
          if (u.semanticEquals(copy.output(i))) None // pass-through position
          else Some(Not(EqualNullSafe(u, copy.output(i))))
        }
        if (cmp.isEmpty) k
        else k.copy(output = k.output.updated(seqIdx,
          If(cmp.reduce(Or), Literal(null, LongType), k.output(seqIdx))))
      case other => other
    }
    Some(m.copy(
      matchedInstructions = m.matchedInstructions.map(rewrite),
      notMatchedBySourceInstructions = m.notMatchedBySourceInstructions.map(rewrite)))
  }

  private def mergeAssigned(m: MergeRows): Option[Seq[String]] = {
    val insts = (m.matchedInstructions ++ m.notMatchedBySourceInstructions)
      .collect { case k: MergeRows.Keep => k }
    val updates = insts.filter(_.context == MergeRows.Update).map(_.output)
    val copies = insts.filter(_.context == MergeRows.Copy).map(_.output)
    val n = m.output.size
    if (updates.isEmpty) return Some(Nil) // delete/insert-only MERGE
    // no Copy instruction to anchor pass-through detection: a NAME-only
    // match could mistake `SET a = src.a` (a SOURCE attribute named like
    // the target column — genuinely assigned) for an unassigned carry,
    // silently dropping its _last_updated_sequence_number bump. Full
    // width is the only safe answer without an exprId anchor.
    if (copies.isEmpty) return None
    if ((updates ++ copies).exists(_.size != n)) return None
    // pass-through reference per position: the Copy instruction's target
    // attribute (carried rows emit the TARGET-side attrs, so semantic
    // equality pins the exprId, not just the name)
    def passThrough(i: Int, e: Expression): Boolean = {
      val c = copies.head
      c(i).isInstanceOf[Attribute] && e.semanticEquals(c(i))
    }
    Some((0 until n).collect {
      // the stamp may already have wrapped the seq output in an If —
      // never report the reserved lineage column as "assigned"
      case i if m.output(i).name != seqName &&
          updates.exists(u => !passThrough(i, u(i))) => m.output(i).name
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
