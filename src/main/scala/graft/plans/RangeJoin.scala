package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Bin-amplified RANGE JOIN — a `Rule[LogicalPlan]` (tier (c) of the
  * custom-operator ladder: whole-operator semantics the built-in
  * planner genuinely mis-executes).
  *
  * Spark plans `points JOIN intervals ON p BETWEEN lo AND hi` with NO
  * equi key as BroadcastNestedLoopJoin — O(|points|·|intervals|) pair
  * evaluations, the classic 100-TB cliff. This rule rewrites the
  * logical join into an equi-join on overlap BINS: each interval
  * explodes to the bins [⌊lo/W⌋..⌊hi/W⌋] it touches, each point maps to
  * its one bin ⌊p/W⌋, the join keys on bin equality (hash/sort-merge —
  * shuffle instead of cross product) and the ORIGINAL predicates stay
  * as the residual, so the rewrite is semantics-preserving by
  * construction: every qualifying pair shares the point's bin
  * (⌊lo/W⌋ ≤ ⌊p/W⌋ ≤ ⌊hi/W⌋), and the residual removes same-bin
  * non-matches. Work amplification is interval_span/W per interval —
  * W is chosen by the user near the typical span via
  * `spark.graft.range-join.bin-size` (0 = rule inert).
  *
  * Registration uses public seams only: `GraftExtensions` for
  * builder-time `spark.sql.extensions`, or
  * `spark.experimental.extraOptimizations` on a live session (how the
  * `range_join_binned` gate attaches it).
  *
  * Floor division is spelled `(a - pmod(a, W)) / W` so negative
  * domains bin correctly (IntegralDivide truncates toward zero). Both
  * bounds and the point must be integral; everything is widened to
  * LongType.
  */
case class RangeJoinBinRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import RangeJoinBin._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // thread-local SQLConf: the conf of the session EXECUTING this query,
    // not the one the rule object was constructed against — rule instances
    // survive session clones (ExperimentalMethods.clone copies the list),
    // so a captured session would read a stale conf
    val bin = Option(SQLConf.get.getConfString(BinSizeConf, "0")).map(_.toLong).getOrElse(0L)
    if (bin <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && rewriteOf(j, cond, bin).isDefined =>
        rewriteOf(j, cond, bin).get
    }
  }

  /** A conjunct pair (p >= lo, p <= hi) where p is computed from one side
    * and lo/hi from the other, with no existing equi conjunct (an
    * equi-join already avoids the nested loop). */
  private def rewriteOf(j: Join, cond: Expression, bin: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => straddles(j, a, b)
      case EqualNullSafe(a, b) => straddles(j, a, b)
      case _ => false
    }
    if (hasEqui) return None

    // collect candidate lower/upper bounds keyed by the point expression
    def integral(e: Expression): Boolean =
      e.dataType == LongType || e.dataType == IntegerType
    def fromLeft(e: Expression) = e.references.subsetOf(j.left.outputSet) &&
      e.references.nonEmpty
    def fromRight(e: Expression) = e.references.subsetOf(j.right.outputSet) &&
      e.references.nonEmpty

    // normalize to (point-from-left, bound-from-right, isLower)
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(p, b) if fromLeft(p) && fromRight(b) => Some((p, b, true))
      case LessThanOrEqual(b, p) if fromLeft(p) && fromRight(b) => Some((p, b, true))
      case LessThanOrEqual(p, b) if fromLeft(p) && fromRight(b) => Some((p, b, false))
      case GreaterThanOrEqual(b, p) if fromLeft(p) && fromRight(b) => Some((p, b, false))
      case _ => None
    }.filter { case (p, b, _) => integral(p) && integral(b) }

    val pair = bounds.collectFirst {
      case (p, lo, true) if bounds.exists { case (p2, _, isLo) =>
        !isLo && p2.semanticEquals(p) } =>
        val hi = bounds.collectFirst {
          case (p2, h, false) if p2.semanticEquals(p) => h }.get
        (p, lo, hi)
    }
    pair.map { case (point, lo, hi) =>
      val w = Literal(bin, LongType)
      def floorDiv(e: Expression): Expression = {
        val el = Cast(e, LongType)
        IntegralDivide(Subtract(el, Pmod(el, w)), w)
      }
      // left: one bin per point row
      val leftBin = Alias(floorDiv(point), "_graft_bin_p")()
      val leftProj = Project(j.left.output :+ leftBin, j.left)
      // right: explode the touched-bin range
      // Sequence is TimeZoneAware: resolved only with a zone set, and the
      // analyzer's ResolveTimeZone has already run by optimization time
      val binsSeq = new Sequence(floorDiv(lo), floorDiv(hi), Some(Literal(1L, LongType)))
        .withTimeZone(SQLConf.get.sessionLocalTimeZone)
      val binsAlias = Alias(binsSeq, "_graft_bins")()
      val rightProj = Project(j.right.output :+ binsAlias, j.right)
      val binAttr = AttributeReference("_graft_bin_i", LongType, nullable = true)()
      val rightGen = Generate(Explode(binsAlias.toAttribute), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(binAttr), child = rightProj)
      val newCond = And(EqualTo(leftBin.toAttribute, binAttr), cond)
      val joined = Join(leftProj, rightGen, Inner, Some(newCond), j.hint)
      Project(j.output, joined)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def straddles(j: Join, a: Expression, b: Expression): Boolean =
    (a.references.subsetOf(j.left.outputSet) && b.references.subsetOf(j.right.outputSet)) ||
      (a.references.subsetOf(j.right.outputSet) && b.references.subsetOf(j.left.outputSet))
}

object RangeJoinBin {
  /** Bin width (in the point column's units). 0/unset = rule inert. */
  val BinSizeConf = "spark.graft.range-join.bin-size"

  /** Attach the rule to a LIVE session (idempotent). The builder-time
    * alternative is `spark.sql.extensions=graft.spark.GraftExtensions`. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[RangeJoinBinRule]))
      spark.experimental.extraOptimizations = cur :+ RangeJoinBinRule(spark)
  }
}
