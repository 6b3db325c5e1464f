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
  * Spark plans an inequality-only join — point-in-interval
  * (`p BETWEEN lo AND hi`) or interval overlap
  * (`l.start <= r.end AND r.start <= l.end`) — as
  * BroadcastNestedLoopJoin: O(|L|·|R|) pair evaluations, the classic
  * 100-TB cliff. This rule rewrites the logical join into an equi-join
  * on overlap BINS. Both patterns normalize to one shape: a `≤`/`<`
  * conjunct from left to right (lA ≤ rB) plus one from right to left
  * (rC ≤ lD). Each side explodes to the bins its [min, max] ENVELOPE
  * (least/greatest of its two bound expressions) touches, the join
  * keys on bin equality, a canonical-bin term keeps exactly ONE copy
  * of each candidate pair (the first shared bin,
  * max(⌊lmin/W⌋, ⌊rmin/W⌋)), and the ORIGINAL predicate stays as the
  * residual.
  *
  * Exactness holds for ALL inputs, including degenerate inverted
  * intervals: if a pair satisfies lA ≤ rB and rC ≤ lD, its envelopes
  * must overlap (disjointness on either side contradicts one of the
  * two inequalities), so every matching pair meets in its canonical
  * bin; the residual removes same-bin non-matches; the canonical-bin
  * equality removes duplicates. A point is the one-bin envelope
  * special case. Work amplification is envelope_span/W per row — W is
  * chosen by the user near the typical span via
  * `spark.graft.range-join.bin-size` (0 = rule inert).
  *
  * Registration uses public seams only: `GraftExtensions` for
  * builder-time `spark.sql.extensions`, or
  * `spark.experimental.extraOptimizations` on a live session (how the
  * `range_join_binned` gate attaches it).
  *
  * Floor division is spelled `(a - pmod(a, W)) / W` so negative
  * domains bin correctly (IntegralDivide truncates toward zero). All
  * bound expressions must be integral; everything is widened to
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
    val maxBins = Option(SQLConf.get.getConfString(MaxBinsConf, "1000000"))
      .map(_.toLong).getOrElse(1000000L)
    plan.transformUp {
      // match unconditionally and rewrite once — evaluating rewriteOf in
      // both guard and body built the full rewritten subplan twice per
      // optimizer fixed-point pass
      case j @ Join(_, _, Inner, Some(cond), _) if j.resolved =>
        rewriteOf(j, cond, bin, maxBins).getOrElse(j)
    }
  }

  /** One `≤`/`<` conjunct in each direction (lA ≤ rB, rC ≤ lD) over
    * integral expressions, with no existing equi conjunct (an equi-join
    * already avoids the nested loop). Covers BETWEEN (lA = lD = the
    * point) and interval overlap alike. */
  private def rewriteOf(j: Join, cond: Expression, bin: Long,
      maxBins: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => straddles(j, a, b)
      case EqualNullSafe(a, b) => straddles(j, a, b)
      case _ => false
    }
    if (hasEqui) return None

    def integral(e: Expression): Boolean =
      e.dataType == LongType || e.dataType == IntegerType
    def fromLeft(e: Expression) = e.references.subsetOf(j.left.outputSet) &&
      e.references.nonEmpty && integral(e)
    def fromRight(e: Expression) = e.references.subsetOf(j.right.outputSet) &&
      e.references.nonEmpty && integral(e)

    // normalize every comparison to `small ≤/< big`, oriented by side
    val le = conjuncts.flatMap {
      case LessThanOrEqual(a, b) => Some((a, b))
      case LessThan(a, b) => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case GreaterThan(a, b) => Some((b, a))
      case _ => None
    }
    val lr = le.collectFirst { case (a, b) if fromLeft(a) && fromRight(b) => (a, b) }
    val rl = le.collectFirst { case (a, b) if fromRight(a) && fromLeft(b) => (a, b) }

    (lr, rl) match {
      case (Some((lA, rB)), Some((rC, lD))) =>
        val w = Literal(bin, LongType)
        def floorDiv(e: Expression): Expression = {
          val el = Cast(e, LongType)
          IntegralDivide(Subtract(el, Pmod(el, w)), w)
        }
        def envelope(x: Expression, y: Expression): (Expression, Expression) =
          if (x.semanticEquals(y)) (x, y) // point: skip the Least/Greatest
          else (Least(Seq(x, y)), Greatest(Seq(x, y)))
        val (lMin, lMax) = envelope(lA, lD)
        val (rMin, rMax) = envelope(rC, rB)
        // Sequence is TimeZoneAware: resolved only with a zone set, and the
        // analyzer's ResolveTimeZone has already run by optimization time.
        // An outlier row whose envelope spans ≫ W bins would otherwise
        // dominate the query or blow Sequence's array-length ceiling with
        // an opaque error — guard per row with a typed failure telling the
        // user which knob to turn (clamping would silently DROP matches:
        // a pair meets only in its canonical bin, which can lie anywhere
        // in either envelope).
        def binsOf(mn: Expression, mx: Expression): Expression = {
          val seq = new Sequence(floorDiv(mn), floorDiv(mx), Some(Literal(1L, LongType)))
            .withTimeZone(SQLConf.get.sessionLocalTimeZone)
          val span = Subtract(floorDiv(mx), floorDiv(mn))
          val err = new RaiseError(Literal.create(
            s"range-join bin explosion: one row spans more than $maxBins bins of " +
              s"width $bin; raise $BinSizeConf or $MaxBinsConf",
            org.apache.spark.sql.types.StringType))
          If(GreaterThan(span, Literal(maxBins, LongType)),
            Cast(err, seq.dataType), seq)
        }
        def explodeBins(side: LogicalPlan, mn: Expression, mx: Expression,
            tag: String): (LogicalPlan, AttributeReference) = {
          val binsAlias = Alias(binsOf(mn, mx), s"_graft_bins_$tag")()
          val proj = Project(side.output :+ binsAlias, side)
          val binAttr = AttributeReference(s"_graft_bin_$tag", LongType,
            nullable = true)()
          (Generate(Explode(binsAlias.toAttribute), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(binAttr),
            child = proj), binAttr)
        }
        val (leftGen, lBin) = explodeBins(j.left, lMin, lMax, "l")
        val (rightGen, rBin) = explodeBins(j.right, rMin, rMax, "r")
        // canonical first shared bin keeps each candidate pair exactly once
        val canonical = EqualTo(lBin,
          Greatest(Seq(floorDiv(lMin), floorDiv(rMin))))
        val newCond = And(And(EqualTo(lBin, rBin), canonical), cond)
        val joined = Join(leftGen, rightGen, Inner, Some(newCond), j.hint)
        Some(Project(j.output, joined))
      case _ => None
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

  /** Per-row bin-count ceiling: a row whose envelope would explode to more
    * bins than this fails the query with a typed message instead of
    * dominating it or hitting Sequence's opaque array-length error. */
  val MaxBinsConf = "spark.graft.range-join.max-bins-per-row"

  /** Attach the rule to a LIVE session (idempotent). The builder-time
    * alternative is `spark.sql.extensions=graft.spark.GraftExtensions`. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[RangeJoinBinRule]))
      spark.experimental.extraOptimizations = cur :+ RangeJoinBinRule(spark)
  }
}
