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

  /** Per-file simplified filter given the file's partition values
    * (ref: visitors.py:1797 ResidualEvaluator + per-transform
    * strict/inclusive projections, transforms.py:1069
    * _truncate_number_strict, :1095 _truncate_array_strict).
    *
    * Each predicate is tested against every partition field on its source
    * column: if a STRICT projection holds on the partition value the
    * predicate folds to true (every row matches); if the INCLUSIVE
    * projection fails it folds to false (no row can match); otherwise it
    * stays as residual and is applied by Spark per-file (which still lets
    * parquet row-group pruning work on it). Identity folds exactly;
    * order-preserving transforms (truncate, year/month/day/hour) fold
    * ranges; bucket folds equality/IN and null checks. */
  def residual(schema: Schema, spec: PartitionSpec, expr: BoundExpr, partition: Seq[Any]): BoundExpr = {
    val partsBySource: Map[Int, Seq[(PartitionField, Int)]] =
      spec.fields.zipWithIndex.groupBy(_._1.sourceId)

    def fold(e: BoundExpr): BoundExpr = e match {
      case BTrue => BTrue
      case BFalse => BFalse
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
      // a predicate on a transformed term folds EXACTLY when some
      // partition field applies the same transform to the same source:
      // the partition value IS the term value for every row in the file
      case p: BoundPred if p.transform.isDefined =>
        spec.fields.zipWithIndex.find { case (pf, _) =>
          pf.sourceId == p.field.id && pf.transform == p.transform.get
        } match {
          case Some((_, i)) =>
            if (Evaluator.evalTermValue(p, partition(i))) BTrue else BFalse
          case None => p
        }
      case p: BoundPred =>
        val folds = partsBySource.getOrElse(p.field.id, Nil)
          .map { case (pf, i) => foldOne(pf, partition(i), p) }
        if (folds.contains(Some(false))) BFalse
        else if (folds.contains(Some(true))) BTrue
        else p
    }
    fold(expr)
  }

  /** Fold one untransformed predicate against one partition field's value:
    * Some(true) = every row matches, Some(false) = none can, None = keep. */
  private def foldOne(pf: PartitionField, pv: Any, p: BoundPred): Option[Boolean] = {
    val srcType = p.field.fieldType
    val tr = pf.transform
    tr match {
      case VoidTransform | _: UnknownTransform => None
      // identity: the partition value is the row value — evaluate exactly
      case IdentityTransform => Some(Evaluator.evalTermValue(p, pv))
      case _ =>
        // remaining transforms (bucket/truncate/time) are null-preserving,
        // so a null partition value ⟺ every source value in the file is
        // null, and vice versa — unary predicates fold exactly
        if (pv == null) return Some(p match {
          case _: BIsNull => true
          case _: BNotNaN => true // null rows pass NotNaN (Spark isnan(null)=false)
          case _ => false // NotNull, IsNaN, and all literal predicates
        })
        p match {
          case _: BIsNull => Some(false)
          case _: BNotNull => Some(true)
          case _: BIsNaN | _: BNotNaN => None // transformed files may mix NaN
          case _ => tr match {
            case TruncateTransform(w) if srcType == IString =>
              foldTruncateString(w, pv.toString, p)
            case BucketTransform(_) => foldNonOrdered(tr, srcType, pv, p)
            case _ if tr.preservesOrder => foldOrdered(tr, srcType, pv, p)
            case _ => None
          }
        }
    }
  }

  /** Order-preserving transform over ALIGNED intervals: each partition
    * value pv covers source range [lo(pv), lo(next)), so comparing pv with
    * T(boundary) decides strict/inclusive matches
    * (ref: _truncate_number_strict transforms.py:1069). */
  private def foldOrdered(tr: Transform, srcType: IceType, pv: Any, p: BoundPred): Option[Boolean] = {
    val rt = tr.resultType(srcType)
    def t(v: Any): Any = tr.apply(v, srcType)
    def c(v: Any): Int = Literals.compare(rt, pv, t(v))
    // integral boundary nudge (ref: Literal.increment/decrement in
    // _truncate_number_strict): x <= v over intervals ⟸ pv < T(v+1),
    // which also covers v exactly at a partition boundary
    def incr(v: Any): Option[Any] = v match {
      case i: Int if i != Int.MaxValue => Some(i + 1)
      case l: Long if l != Long.MaxValue => Some(l + 1)
      case _ => None
    }
    def decr(v: Any): Option[Any] = v match {
      case i: Int if i != Int.MinValue => Some(i - 1)
      case l: Long if l != Long.MinValue => Some(l - 1)
      case _ => None
    }
    p match {
      case BEq(_, _, v, _) => if (c(v) != 0) Some(false) else None
      case BNotEq(_, _, v, _) => if (c(v) != 0) Some(true) else None
      case BLt(_, _, v, _) =>
        if (c(v) < 0) Some(true) else if (c(v) > 0) Some(false) else None
      case BLtEq(_, _, v, _) =>
        if (incr(v).map(c).getOrElse(c(v)) < 0) Some(true)
        else if (c(v) > 0) Some(false) else None
      case BGt(_, _, v, _) =>
        if (c(v) > 0) Some(true) else if (c(v) < 0) Some(false) else None
      case BGtEq(_, _, v, _) =>
        if (decr(v).map(c).getOrElse(c(v)) > 0) Some(true)
        else if (c(v) < 0) Some(false) else None
      case BIn(_, _, vs, _) =>
        if (vs.forall(v => c(v) != 0)) Some(false) else None
      case BNotIn(_, _, vs, _) =>
        if (vs.forall(v => c(v) != 0)) Some(true) else None
      case _ => None
    }
  }

  /** Non-order-preserving transform (bucket): only same-value mapping is
    * usable — equality/IN fold to false when the boundary lands in a
    * different bucket; nothing folds to true (collisions). */
  private def foldNonOrdered(tr: Transform, srcType: IceType, pv: Any, p: BoundPred): Option[Boolean] = {
    val rt = tr.resultType(srcType)
    def c(v: Any): Int = Literals.compare(rt, pv, tr.apply(v, srcType))
    p match {
      case BEq(_, _, v, _) => if (c(v) != 0) Some(false) else None
      case BIn(_, _, vs, _) => if (vs.forall(v => c(v) != 0)) Some(false) else None
      case _ => None
    }
  }

  /** truncate[w] over strings: pv is a ≤w-code-point prefix shared by
    * every row value (ref: TruncateTransform.strict_project
    * transforms.py:829 string branch). A pv SHORTER than w means no row
    * was truncated — every row value equals pv exactly, so any predicate
    * folds exactly. */
  private def foldTruncateString(w: Int, pv: String, p: BoundPred): Option[Boolean] = {
    if (pv.codePointCount(0, pv.length) < w)
      return Some(Evaluator.evalTermValue(p, pv))
    def cPref(s: String): Int = { // compare pv with the w-prefix of s
      val sw = if (s.codePointCount(0, s.length) <= w) s
        else s.substring(0, s.offsetByCodePoints(0, w))
      pv.compareTo(sw)
    }
    p match {
      case BEq(_, _, v, _) => if (cPref(v.toString) != 0) Some(false) else None
      case BNotEq(_, _, v, _) => if (cPref(v.toString) != 0) Some(true) else None
      // prefix blocks are ordered: rows of a lexicographically smaller
      // (resp. greater) prefix block are all smaller (resp. greater)
      case BLt(_, _, v, _) =>
        if (cPref(v.toString) < 0) Some(true) else if (cPref(v.toString) > 0) Some(false) else None
      case BLtEq(_, _, v, _) =>
        if (cPref(v.toString) < 0) Some(true) else if (cPref(v.toString) > 0) Some(false) else None
      case BGt(_, _, v, _) =>
        if (cPref(v.toString) > 0) Some(true) else if (cPref(v.toString) < 0) Some(false) else None
      case BGtEq(_, _, v, _) =>
        if (cPref(v.toString) > 0) Some(true) else if (cPref(v.toString) < 0) Some(false) else None
      case BIn(_, _, vs, _) =>
        if (vs.forall(v => cPref(v.toString) != 0)) Some(false) else None
      case BNotIn(_, _, vs, _) =>
        if (vs.forall(v => cPref(v.toString) != 0)) Some(true) else None
      case BStartsWith(_, _, s, _) =>
        val sLen = s.codePointCount(0, s.length)
        if (sLen <= w) Some(pv.startsWith(s)) // pv prefixes every row value
        else if (cPref(s) != 0) Some(false) // s disagrees with the shared prefix
        else None
      case BNotStartsWith(_, _, s, _) =>
        val sLen = s.codePointCount(0, s.length)
        if (sLen <= w) Some(!pv.startsWith(s))
        else if (cPref(s) != 0) Some(true)
        else None
      case _ => None
    }
  }
}
