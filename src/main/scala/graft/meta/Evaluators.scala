package graft.meta

import graft.core._

/** Metadata-pruning evaluators — the reference's "optimizer"
  * (ref: pyiceberg/expressions/visitors.py; SURVEY.md §2.C).
  *
  * All run on the driver over manifest metadata; Catalyst cannot do
  * manifest/stats pruning for a custom table format. Input expressions
  * must be NOT-free (apply Exprs.rewriteNot first) — matches the
  * reference's precondition (visitors.py:1175).
  */
object Evaluators {

  // ---- inclusive projection onto partition space --------------------------
  // (ref: visitors.py:836 inclusive_projection + Transform.project)

  /** Project a bound row filter to a bound expression over the partition
    * tuple, keyed by partition-field id. The result may-match: it is a
    * superset of the row filter (safe for pruning, never for deletes). */
  def inclusiveProjection(schema: Schema, spec: PartitionSpec, expr: BoundExpr): BoundExpr = {
    def project(e: BoundExpr): BoundExpr = e match {
      case BTrue => BTrue
      case BFalse => BFalse
      case BAnd(l, r) => (project(l), project(r)) match {
        case (BFalse, _) | (_, BFalse) => BFalse
        case (BTrue, b) => b
        case (b, BTrue) => b
        case (a, b) => BAnd(a, b)
      }
      // OR of projections is still inclusive
      case BOr(l, r) => (project(l), project(r)) match {
        case (BTrue, _) | (_, BTrue) => BTrue
        case (a, b) => BOr(a, b)
      }
      case BNot(_) => BTrue // NOT-free input expected; stay safe
      // a predicate already on a transformed term projects directly onto a
      // partition field with the SAME source and transform (its value IS
      // the partition value)
      case p: BoundPred if p.transform.isDefined =>
        spec.fields.find(pf => pf.sourceId == p.field.id && pf.transform == p.transform.get)
          .map { pf =>
            val pfField = NestedField(pf.fieldId, pf.name,
              pf.transform.resultType(p.field.fieldType))
            (p match {
              case BEq(_, _, v, _) => BEq(pfField, pf.name, v, None)
              case BNotEq(_, _, v, _) => BNotEq(pfField, pf.name, v, None)
              case BLt(_, _, v, _) => BLt(pfField, pf.name, v, None)
              case BLtEq(_, _, v, _) => BLtEq(pfField, pf.name, v, None)
              case BGt(_, _, v, _) => BGt(pfField, pf.name, v, None)
              case BGtEq(_, _, v, _) => BGtEq(pfField, pf.name, v, None)
              case BIn(_, _, vs, _) => BIn(pfField, pf.name, vs, None)
              case BNotIn(_, _, vs, _) => BNotIn(pfField, pf.name, vs, None)
              case _: BIsNull => BIsNull(pfField, pf.name, None)
              case _: BNotNull => BNotNull(pfField, pf.name, None)
              case _ => BTrue
            }): BoundExpr
          }.getOrElse(BTrue)
      case p: BoundPred =>
        val parts = spec.fields.filter(_.sourceId == p.field.id)
        if (parts.isEmpty) BTrue
        else parts.map(pf => projectPred(schema, pf, p)).reduce[BoundExpr] {
          case (BTrue, b) => b
          case (a, BTrue) => a
          case (a, b) => BAnd(a, b)
        }
    }
    project(expr)
  }

  /** Project one predicate through one partition field's transform. */
  private def projectPred(schema: Schema, pf: PartitionField, p: BoundPred): BoundExpr = {
    // a transform this engine doesn't know cannot prune anything — its
    // semantics (even null behavior) are unknown; stay conservative
    if (pf.transform.isInstanceOf[UnknownTransform]) return BTrue
    val srcType = p.field.fieldType
    val resType = pf.transform.resultType(srcType)
    val pfField = NestedField(pf.fieldId, pf.name, resType)
    def t(v: Any): Any = pf.transform.apply(v, srcType)
    val orderPreserving = pf.transform.preservesOrder

    p match {
      // all transforms are null-preserving
      case _: BIsNull => BIsNull(pfField, pf.name, None)
      case _: BNotNull => BNotNull(pfField, pf.name, None)
      case _: BIsNaN | _: BNotNaN =>
        if (pf.transform == IdentityTransform)
          (if (p.isInstanceOf[BIsNaN]) BIsNaN(pfField, pf.name, None) else BNotNaN(pfField, pf.name, None))
        else BTrue
      case BEq(_, _, v, _) => BEq(pfField, pf.name, t(v), None)
      case BIn(_, _, vs, _) => BIn(pfField, pf.name, vs.map(t), None)
      // Order-preserving transforms project ranges (may-match superset:
      // x < v  ⟹  T(x) <= T(v)). Non-order-preserving (bucket) cannot.
      case BLt(_, _, v, _) if orderPreserving => BLtEq(pfField, pf.name, t(v), None)
      case BLtEq(_, _, v, _) if orderPreserving => BLtEq(pfField, pf.name, t(v), None)
      case BGt(_, _, v, _) if orderPreserving => BGtEq(pfField, pf.name, t(v), None)
      case BGtEq(_, _, v, _) if orderPreserving => BGtEq(pfField, pf.name, t(v), None)
      case BStartsWith(_, _, s, _) => pf.transform match {
        case IdentityTransform => BStartsWith(pfField, pf.name, s, None)
        case TruncateTransform(w) if srcType == IString && s.length >= w =>
          BStartsWith(pfField, pf.name, s.substring(0, w), None)
        case _ => BTrue
      }
      case _ => BTrue // NotEq / NotIn / NotStartsWith and non-order ranges
    }
  }

  // ---- partition evaluator (exact, per data file) -------------------------
  // (ref: table/__init__.py:2676 _build_partition_evaluator)

  /** Evaluate a projected partition expression against a file's partition
    * tuple. Record keys = partition field ids. */
  def partitionMatches(spec: PartitionSpec, projected: BoundExpr, partition: Seq[Any]): Boolean = {
    val record: Map[Int, Any] = spec.fields.map(_.fieldId).zip(partition).toMap
    Evaluator.eval(projected, record)
  }

  // ---- manifest evaluator (ref: visitors.py:555 _ManifestEvalVisitor) -----

  /** Can any file in this manifest match? Evaluates the projected partition
    * expression against the manifest's per-field partition summaries. */
  def manifestMightMatch(spec: PartitionSpec, projected: BoundExpr, mf: ManifestFile): Boolean = {
    if (mf.partitions.isEmpty) return true
    val byFieldId: Map[Int, FieldSummary] =
      spec.fields.map(_.fieldId).zip(mf.partitions).toMap

    def walk(e: BoundExpr): Boolean = e match {
      case BTrue => true
      case BFalse => false
      case BAnd(l, r) => walk(l) && walk(r)
      case BOr(l, r) => walk(l) || walk(r)
      case BNot(_) => true
      case p: BoundPred =>
        byFieldId.get(p.field.id) match {
          case None => true
          case Some(s) => summaryMightMatch(p, s)
        }
    }
    walk(projected)
  }

  private def summaryMightMatch(p: BoundPred, s: FieldSummary): Boolean = {
    val t = p.termType
    def cmp(a: Any, b: Any): Int = Literals.compare(t, a, b)
    p match {
      case _: BIsNull => s.containsNull
      case _: BNotNull => s.lowerBound.isDefined || !s.containsNull
      case _: BIsNaN => s.containsNan.getOrElse(true)
      case _: BNotNaN => true
      case BEq(_, _, v, _) =>
        s.lowerBound.forall(lo => cmp(lo, v) <= 0) && s.upperBound.forall(hi => cmp(hi, v) >= 0)
      case BIn(_, _, vs, _) =>
        vs.exists(v => s.lowerBound.forall(lo => cmp(lo, v) <= 0) &&
          s.upperBound.forall(hi => cmp(hi, v) >= 0))
      case BLt(_, _, v, _) => s.lowerBound.forall(lo => cmp(lo, v) < 0)
      case BLtEq(_, _, v, _) => s.lowerBound.forall(lo => cmp(lo, v) <= 0)
      case BGt(_, _, v, _) => s.upperBound.forall(hi => cmp(hi, v) > 0)
      case BGtEq(_, _, v, _) => s.upperBound.forall(hi => cmp(hi, v) >= 0)
      case BStartsWith(_, _, pre, _) =>
        val loOk = s.lowerBound.forall { lo =>
          val los = lo.toString; los.take(pre.length) <= pre
        }
        val hiOk = s.upperBound.forall { hi =>
          val his = hi.toString; his.take(pre.length) >= pre
        }
        loOk && hiOk
      case _ => true
    }
  }

  // ---- inclusive metrics evaluator ---------------------------------------
  // (ref: visitors.py:1166 _InclusiveMetricsEvaluator)

  /** ROWS_MIGHT_MATCH on per-file column stats; false ⟹ skip the file. */
  def rowsMightMatch(expr: BoundExpr, f: DataFile): Boolean = {
    def walk(e: BoundExpr): Boolean = e match {
      case BTrue => true
      case BFalse => false
      case BAnd(l, r) => walk(l) && walk(r)
      case BOr(l, r) => walk(l) || walk(r)
      case BNot(_) => true
      case p: BoundPred if p.transform.isDefined => true
      case p: BoundPred => predMightMatch(p, f)
    }
    if (f.recordCount == 0) false else walk(expr)
  }

  private def predMightMatch(p: BoundPred, f: DataFile): Boolean = {
    val id = p.field.id
    val t = p.field.fieldType
    val nullCount = f.nullValueCounts.get(id)
    val valueCount = f.valueCounts.get(id)
    val nanCount = f.nanValueCounts.get(id)
    val lower = f.lowerBounds.get(id)
    val upper = f.upperBounds.get(id)
    def cmp(a: Any, b: Any): Int = Literals.compare(t, a, b)
    def allNull: Boolean = (nullCount, valueCount) match {
      case (Some(n), Some(v)) => n == v
      case _ => false
    }
    p match {
      case _: BIsNull => nullCount.forall(_ > 0)
      case _: BNotNull => !allNull
      case _: BIsNaN => nanCount.forall(_ > 0)
      case _: BNotNaN => (nanCount, valueCount) match {
        case (Some(n), Some(v)) => n < v
        case _ => true
      }
      case _ if allNull => false
      case BEq(_, _, v, _) =>
        lower.forall(lo => cmp(lo, v) <= 0) && upper.forall(hi => cmp(hi, v) >= 0)
      case BIn(_, _, vs, _) =>
        vs.exists(v => lower.forall(lo => cmp(lo, v) <= 0) && upper.forall(hi => cmp(hi, v) >= 0))
      case BLt(_, _, v, _) => lower.forall(lo => cmp(lo, v) < 0)
      case BLtEq(_, _, v, _) => lower.forall(lo => cmp(lo, v) <= 0)
      case BGt(_, _, v, _) => upper.forall(hi => cmp(hi, v) > 0)
      case BGtEq(_, _, v, _) => upper.forall(hi => cmp(hi, v) >= 0)
      case BStartsWith(_, _, pre, _) =>
        lower.forall(lo => lo.toString.take(pre.length) <= pre) &&
          upper.forall(hi => hi.toString.take(pre.length) >= pre)
      case _ => true // NotEq / NotIn / NotStartsWith: can't exclude via min/max
    }
  }

  // ---- strict metrics evaluator ------------------------------------------
  // (ref: visitors.py:1501 _StrictMetricsEvaluator)

  /** ROWS_MUST_MATCH: true ⟹ every row in the file matches, so a delete
    * by this predicate can drop the whole file metadata-only. Conservative
    * false on missing stats. */
  def rowsMustMatch(expr: BoundExpr, f: DataFile): Boolean = {
    def walk(e: BoundExpr): Boolean = e match {
      case BTrue => true
      case BFalse => false
      case BAnd(l, r) => walk(l) && walk(r)
      case BOr(l, r) => walk(l) || walk(r)
      case BNot(_) => false
      case p: BoundPred if p.transform.isDefined => false
      case p: BoundPred => predMustMatch(p, f)
    }
    walk(expr)
  }

  private def predMustMatch(p: BoundPred, f: DataFile): Boolean = {
    val id = p.field.id
    val t = p.field.fieldType
    val nullCount = f.nullValueCounts.get(id)
    val lower = f.lowerBounds.get(id)
    val upper = f.upperBounds.get(id)
    def cmp(a: Any, b: Any): Int = Literals.compare(t, a, b)
    // literal predicates never match null rows: require a known zero null count
    def noNulls: Boolean = nullCount.contains(0L)
    p match {
      case _: BIsNull => nullCount.contains(f.recordCount)
      case _: BNotNull => noNulls
      case _: BIsNaN => f.nanValueCounts.get(id).contains(f.recordCount)
      case _: BNotNaN => f.nanValueCounts.get(id).contains(0L) && noNulls
      case BLt(_, _, v, _) => noNulls && upper.exists(hi => cmp(hi, v) < 0)
      case BLtEq(_, _, v, _) => noNulls && upper.exists(hi => cmp(hi, v) <= 0)
      case BGt(_, _, v, _) => noNulls && lower.exists(lo => cmp(lo, v) > 0)
      case BGtEq(_, _, v, _) => noNulls && lower.exists(lo => cmp(lo, v) >= 0)
      case BEq(_, _, v, _) =>
        noNulls && lower.exists(lo => cmp(lo, v) == 0) && upper.exists(hi => cmp(hi, v) == 0)
      case BNotEq(_, _, v, _) =>
        noNulls && (upper.exists(hi => cmp(hi, v) < 0) || lower.exists(lo => cmp(lo, v) > 0))
      case BIn(_, _, vs, _) =>
        noNulls && lower.isDefined && upper.isDefined &&
          cmp(lower.get, upper.get) == 0 && vs.exists(v => cmp(lower.get, v) == 0)
      case BNotIn(_, _, vs, _) =>
        noNulls && vs.forall(v =>
          upper.exists(hi => cmp(hi, v) < 0) || lower.exists(lo => cmp(lo, v) > 0))
      case BStartsWith(_, _, pre, _) =>
        // must-match needs both bounds to share the full prefix
        noNulls && lower.exists(_.toString.startsWith(pre)) && upper.exists(_.toString.startsWith(pre))
      case _: BNotStartsWith => false
    }
  }

  // ---- residual (ref: visitors.py:1797 ResidualEvaluator) -----------------

  /** Per-file simplified filter given the file's partition values:
    * identity-partitioned predicates fold to true/false; everything else
    * stays as residual and is applied by Spark per-file (which still lets
    * parquet row-group pruning work on it). */
  def residual(schema: Schema, spec: PartitionSpec, expr: BoundExpr, partition: Seq[Any]): BoundExpr = {
    val identBySource: Map[Int, Int] = spec.fields.zipWithIndex.collect {
      case (pf, i) if pf.transform == IdentityTransform => pf.sourceId -> i
    }.toMap
    def fold(e: BoundExpr): BoundExpr = e match {
      case BAnd(l, r) => (fold(l), fold(r)) match {
        case (BFalse, _) | (_, BFalse) => BFalse
        case (BTrue, b) => b
        case (b, BTrue) => b
        case (a, b) => BAnd(a, b)
      }
      case BOr(l, r) => (fold(l), fold(r)) match {
        case (BTrue, _) | (_, BTrue) => BTrue
        case (BFalse, b) => b
        case (b, BFalse) => b
        case (a, b) => BOr(a, b)
      }
      case BNot(c) => fold(c) match {
        case BTrue => BFalse
        case BFalse => BTrue
        case other => BNot(other)
      }
      case p: BoundPred if p.transform.isEmpty && identBySource.contains(p.field.id) =>
        val v = partition(identBySource(p.field.id))
        if (Evaluator.eval(p, Map(p.field.id -> v))) BTrue else BFalse
      case other => other
    }
    fold(expr)
  }
}
