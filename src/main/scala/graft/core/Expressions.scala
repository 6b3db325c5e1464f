package graft.core

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{coalesce, col, isnan, lit, not}

/** Boolean predicate expressions (ref: pyiceberg/expressions/__init__.py).
  *
  * Unbound expressions name columns by string (possibly `a.b.c` nested);
  * `Binder.bind` resolves names → field-ids against a Schema, coerces
  * literals to the field type's internal repr (dates → epoch days,
  * timestamps → epoch micros), and folds degenerate cases
  * (ref: expressions/visitors.py:198 BindVisitor).
  */
sealed trait Expr
case object AlwaysTrue extends Expr
case object AlwaysFalse extends Expr
final case class And(left: Expr, right: Expr) extends Expr
final case class Or(left: Expr, right: Expr) extends Expr
final case class Not(child: Expr) extends Expr

sealed trait Predicate extends Expr {
  def ref: String
  /** optional transform applied to the term, e.g. day(ts) == 19000
    * (ref: transforms.py:1158 BoundTransform). */
  def transform: Option[Transform]
}
final case class IsNull(ref: String, transform: Option[Transform] = None) extends Predicate
final case class NotNull(ref: String, transform: Option[Transform] = None) extends Predicate
final case class IsNaN(ref: String, transform: Option[Transform] = None) extends Predicate
final case class NotNaN(ref: String, transform: Option[Transform] = None) extends Predicate
final case class Eq(ref: String, value: Any, transform: Option[Transform] = None) extends Predicate
final case class NotEq(ref: String, value: Any, transform: Option[Transform] = None) extends Predicate
final case class Lt(ref: String, value: Any, transform: Option[Transform] = None) extends Predicate
final case class LtEq(ref: String, value: Any, transform: Option[Transform] = None) extends Predicate
final case class Gt(ref: String, value: Any, transform: Option[Transform] = None) extends Predicate
final case class GtEq(ref: String, value: Any, transform: Option[Transform] = None) extends Predicate
final case class In(ref: String, values: Seq[Any], transform: Option[Transform] = None) extends Predicate
final case class NotIn(ref: String, values: Seq[Any], transform: Option[Transform] = None) extends Predicate
final case class StartsWith(ref: String, value: String, transform: Option[Transform] = None) extends Predicate
final case class NotStartsWith(ref: String, value: String, transform: Option[Transform] = None) extends Predicate

// ---------------------------------------------------------------------------
// Bound form
// ---------------------------------------------------------------------------

sealed trait BoundExpr
case object BTrue extends BoundExpr
case object BFalse extends BoundExpr
final case class BAnd(left: BoundExpr, right: BoundExpr) extends BoundExpr
final case class BOr(left: BoundExpr, right: BoundExpr) extends BoundExpr
final case class BNot(child: BoundExpr) extends BoundExpr

sealed trait BoundPred extends BoundExpr {
  def field: NestedField
  def name: String // full dotted name in the bound schema
  def transform: Option[Transform]
  /** type of the compared term (transform result type, or field type). */
  def termType: IceType =
    transform.map(_.resultType(field.fieldType)).getOrElse(field.fieldType)
}
sealed trait BoundUnary extends BoundPred
sealed trait BoundLiteralPred extends BoundPred { def value: Any }
final case class BIsNull(field: NestedField, name: String, transform: Option[Transform]) extends BoundUnary
final case class BNotNull(field: NestedField, name: String, transform: Option[Transform]) extends BoundUnary
final case class BIsNaN(field: NestedField, name: String, transform: Option[Transform]) extends BoundUnary
final case class BNotNaN(field: NestedField, name: String, transform: Option[Transform]) extends BoundUnary
final case class BEq(field: NestedField, name: String, value: Any, transform: Option[Transform]) extends BoundLiteralPred
final case class BNotEq(field: NestedField, name: String, value: Any, transform: Option[Transform]) extends BoundLiteralPred
final case class BLt(field: NestedField, name: String, value: Any, transform: Option[Transform]) extends BoundLiteralPred
final case class BLtEq(field: NestedField, name: String, value: Any, transform: Option[Transform]) extends BoundLiteralPred
final case class BGt(field: NestedField, name: String, value: Any, transform: Option[Transform]) extends BoundLiteralPred
final case class BGtEq(field: NestedField, name: String, value: Any, transform: Option[Transform]) extends BoundLiteralPred
final case class BIn(field: NestedField, name: String, values: Set[Any], transform: Option[Transform]) extends BoundPred
final case class BNotIn(field: NestedField, name: String, values: Set[Any], transform: Option[Transform]) extends BoundPred
final case class BStartsWith(field: NestedField, name: String, value: String, transform: Option[Transform]) extends BoundPred
final case class BNotStartsWith(field: NestedField, name: String, value: String, transform: Option[Transform]) extends BoundPred

object Exprs {
  def and(es: Seq[Expr]): Expr = es.reduceOption(And(_, _)).getOrElse(AlwaysTrue)
  def or(es: Seq[Expr]): Expr = es.reduceOption(Or(_, _)).getOrElse(AlwaysFalse)

  /** Push NOT down to leaves via De Morgan (ref: visitors.py:424
    * rewrite_not) — the metrics evaluators require NOT-free input. */
  def rewriteNot(e: BoundExpr): BoundExpr = e match {
    case BNot(c) => negate(rewriteNot(c))
    case BAnd(l, r) => BAnd(rewriteNot(l), rewriteNot(r))
    case BOr(l, r) => BOr(rewriteNot(l), rewriteNot(r))
    case other => other
  }

  def negate(e: BoundExpr): BoundExpr = e match {
    case BTrue => BFalse
    case BFalse => BTrue
    case BAnd(l, r) => BOr(negate(l), negate(r))
    case BOr(l, r) => BAnd(negate(l), negate(r))
    case BNot(c) => rewriteNot(c)
    case BIsNull(f, n, t) => BNotNull(f, n, t)
    case BNotNull(f, n, t) => BIsNull(f, n, t)
    case BIsNaN(f, n, t) => BNotNaN(f, n, t)
    case BNotNaN(f, n, t) => BIsNaN(f, n, t)
    case BEq(f, n, v, t) => BNotEq(f, n, v, t)
    case BNotEq(f, n, v, t) => BEq(f, n, v, t)
    case BLt(f, n, v, t) => BGtEq(f, n, v, t)
    case BLtEq(f, n, v, t) => BGt(f, n, v, t)
    case BGt(f, n, v, t) => BLtEq(f, n, v, t)
    case BGtEq(f, n, v, t) => BLt(f, n, v, t)
    case BIn(f, n, v, t) => BNotIn(f, n, v, t)
    case BNotIn(f, n, v, t) => BIn(f, n, v, t)
    case BStartsWith(f, n, v, t) => BNotStartsWith(f, n, v, t)
    case BNotStartsWith(f, n, v, t) => BStartsWith(f, n, v, t)
  }

  /** Disjunctive normal form: OR-of-ANDs, one element per disjunct
    * (ref: visitors.py:1015 rewrite_to_dnf). NOT is pushed to the leaves
    * first; the distributive law can blow up exponentially, so this is an
    * EXPORT path (external engines that take DNF filter lists), never the
    * internal evaluator representation. */
  def rewriteToDnf(e: BoundExpr): Seq[BoundExpr] = {
    def walk(x: BoundExpr): Seq[BoundExpr] = x match {
      case BTrue => Seq(BTrue)
      case BFalse => Seq(BFalse)
      case BAnd(l, r) => for { a <- walk(l); b <- walk(r) } yield BAnd(a, b)
      case BOr(l, r) => walk(l) ++ walk(r)
      case BNot(c) => throw new IllegalArgumentException(s"Not expressions are not allowed: $c")
      case p => Seq(p)
    }
    walk(rewriteNot(e))
  }

  /** One DNF conjunct → (column, op, value) triples for export to engines
    * that accept plain filter lists (ref: visitors.py:977
    * ExpressionToPlainFormat / expression_to_plain_format). Values are the
    * engine-internal representation; IsNull/NotNull use value null. */
  def toPlainFormat(e: BoundExpr): Seq[Seq[(String, String, Any)]] =
    rewriteToDnf(e).map { conjunct =>
      def walk(x: BoundExpr): Seq[(String, String, Any)] = x match {
        case BTrue => Nil
        case BFalse => Nil
        case BAnd(l, r) => walk(l) ++ walk(r)
        case BOr(_, _) | BNot(_) =>
          throw new IllegalStateException("DNF conjunct must be AND-only")
        case BIsNull(f, _, _) => Seq((f.name, "==", null))
        case BNotNull(f, _, _) => Seq((f.name, "!=", null))
        case BIsNaN(f, _, _) => Seq((f.name, "==", Double.NaN))
        case BNotNaN(f, _, _) => Seq((f.name, "!=", Double.NaN))
        case BEq(f, _, v, _) => Seq((f.name, "==", v))
        case BNotEq(f, _, v, _) => Seq((f.name, "!=", v))
        case BLt(f, _, v, _) => Seq((f.name, "<", v))
        case BLtEq(f, _, v, _) => Seq((f.name, "<=", v))
        case BGt(f, _, v, _) => Seq((f.name, ">", v))
        case BGtEq(f, _, v, _) => Seq((f.name, ">=", v))
        case BIn(f, _, vs, _) => Seq((f.name, "in", vs))
        case BNotIn(f, _, vs, _) => Seq((f.name, "not in", vs))
        case BStartsWith(f, _, s, _) => Seq((f.name, "startswith", s))
        case BNotStartsWith(f, _, s, _) => Seq((f.name, "not startswith", s))
      }
      walk(conjunct)
    }

  /** Field ids referenced by an expression (ref: visitors.py:948). */
  def fieldIds(e: BoundExpr): Set[Int] = e match {
    case BAnd(l, r) => fieldIds(l) ++ fieldIds(r)
    case BOr(l, r) => fieldIds(l) ++ fieldIds(r)
    case BNot(c) => fieldIds(c)
    case p: BoundPred => Set(p.field.id)
    case _ => Set.empty
  }
}

// ---------------------------------------------------------------------------
// Literal coercion
// ---------------------------------------------------------------------------

/** Coercion result with truncation sentinels (ref: expressions/literals.py
  * LongLiteral.to(Int32) AboveMax/BelowMin). */
sealed trait Coerced
final case class CVal(v: Any) extends Coerced
case object CAboveMax extends Coerced
case object CBelowMin extends Coerced

object Literals {

  /** Coerce a parsed/user literal to the Iceberg internal repr of `t`:
    * date → Int epoch days, timestamp → Long epoch micros, decimal →
    * java.math.BigDecimal at the declared scale. */
  def coerce(raw: Any, t: IceType): Coerced = (raw, t) match {
    case (null, _) => CVal(null)
    case (b: Boolean, IBoolean) => CVal(b)
    case (n: Number, IInt) =>
      val l = n.longValue()
      if (l > Int.MaxValue) CAboveMax else if (l < Int.MinValue) CBelowMin else CVal(l.toInt)
    case (n: Number, ILong) => CVal(n.longValue())
    case (n: Number, IFloat) => CVal(n.floatValue())
    case (n: Number, IDouble) => CVal(n.doubleValue())
    case (n: java.math.BigDecimal, IDecimal(_, s)) =>
      CVal(n.setScale(s, java.math.RoundingMode.HALF_UP))
    case (n: Number, IDecimal(_, s)) =>
      CVal(new java.math.BigDecimal(n.toString).setScale(s, java.math.RoundingMode.HALF_UP))
    case (s: String, IDate) => CVal(LocalDate.parse(s).toEpochDay.toInt)
    case (n: Number, IDate) => CVal(n.intValue())
    case (s: String, ITimestamp) => CVal(parseTsMicros(s))
    case (s: String, ITimestamptz) => CVal(parseTsMicros(s))
    case (n: Number, ITimestamp) => CVal(n.longValue())
    case (n: Number, ITimestamptz) => CVal(n.longValue())
    case (s: String, IString) => CVal(s)
    // canonicalize (lowercases, zero-pads) so comparisons against scan
    // output and manifest bounds — both canonical — are exact; a malformed
    // literal keeps its raw form and simply matches nothing (same no-match
    // semantics as any non-existent value — a filter typo must not abort
    // the query)
    case (s: String, IUUID) =>
      CVal(try java.util.UUID.fromString(s).toString
      catch { case _: IllegalArgumentException => s })
    case (b: Array[Byte], IBinary) => CVal(b)
    case (b: Array[Byte], IFixed(_)) => CVal(b)
    case (s: String, IBinary) => CVal(s.getBytes("UTF-8"))
    case (v, other) =>
      throw new IllegalArgumentException(s"Cannot coerce $v (${v.getClass.getSimpleName}) to $other")
  }

  def parseTsMicros(s: String): Long = {
    val norm = s.replace(' ', 'T')
    val inst: Instant =
      if (norm.endsWith("Z") || norm.matches(".*[+-]\\d{2}:\\d{2}$"))
        java.time.OffsetDateTime.parse(norm).toInstant
      else if (norm.contains("T")) LocalDateTime.parse(norm).toInstant(ZoneOffset.UTC)
      else LocalDate.parse(norm).atStartOfDay.toInstant(ZoneOffset.UTC)
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  /** Total order per type for evaluator/stat comparisons. */
  def compare(t: IceType, a: Any, b: Any): Int = (a, b) match {
    case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Number, y: Number) if t == IFloat || t == IDouble =>
      java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: Number, y: Number) => java.lang.Long.compare(x.longValue(), y.longValue())
    case (x: String, y: String) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: Array[Byte], y: Array[Byte]) =>
      java.util.Arrays.compareUnsigned(x, y)
    case _ => throw new IllegalArgumentException(
      s"Cannot compare ${a.getClass.getSimpleName} and ${b.getClass.getSimpleName} as $t")
  }

  /** Convert an Iceberg-internal value to the matching Spark literal. */
  def toSparkLit(v: Any, t: IceType): Column = t match {
    case IDate => lit(LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue()))
    case ITimestamp | ITimestamptz | ITimestampNs | ITimestamptzNs =>
      val micros = v.asInstanceOf[Number].longValue()
      lit(Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
        Math.floorMod(micros, 1000000L) * 1000L))
    case _ => lit(v)
  }
}

// ---------------------------------------------------------------------------
// Binder
// ---------------------------------------------------------------------------

object Binder {

  def bind(schema: Schema, expr: Expr, caseSensitive: Boolean = true): BoundExpr = expr match {
    case AlwaysTrue => BTrue
    case AlwaysFalse => BFalse
    case And(l, r) => (bind(schema, l, caseSensitive), bind(schema, r, caseSensitive)) match {
      case (BFalse, _) | (_, BFalse) => BFalse
      case (BTrue, b) => b
      case (b, BTrue) => b
      case (a, b) => BAnd(a, b)
    }
    case Or(l, r) => (bind(schema, l, caseSensitive), bind(schema, r, caseSensitive)) match {
      case (BTrue, _) | (_, BTrue) => BTrue
      case (BFalse, b) => b
      case (b, BFalse) => b
      case (a, b) => BOr(a, b)
    }
    case Not(c) => Exprs.negate(bind(schema, c, caseSensitive))
    case p: Predicate => bindPred(schema, p, caseSensitive)
  }

  private def field(schema: Schema, name: String, cs: Boolean): (NestedField, String) = {
    val f = schema.findField(name, cs).getOrElse(
      throw new IllegalArgumentException(s"Could not find field '$name' in schema"))
    (f, name)
  }

  private def bindPred(schema: Schema, p: Predicate, cs: Boolean): BoundExpr = {
    val (f, name) = field(schema, p.ref, cs)
    val termT = p.transform.map(_.resultType(f.fieldType)).getOrElse(f.fieldType)
    def cv(raw: Any): Coerced = Literals.coerce(raw, termT)
    val floating = termT == IFloat || termT == IDouble
    p match {
      // binding IsNull on a required field folds to false (ref visitors.py
      // BindVisitor - bind_is_null)
      case IsNull(_, t) => if (f.required && t.isEmpty) BFalse else BIsNull(f, name, t)
      case NotNull(_, t) => if (f.required && t.isEmpty) BTrue else BNotNull(f, name, t)
      case IsNaN(_, t) =>
        if (!floating) BFalse else BIsNaN(f, name, t)
      case NotNaN(_, t) =>
        if (!floating) BTrue else BNotNaN(f, name, t)
      case Eq(_, v, t) => cv(v) match {
        case CVal(x) => BEq(f, name, x, t)
        case _ => BFalse
      }
      case NotEq(_, v, t) => cv(v) match {
        case CVal(x) => BNotEq(f, name, x, t)
        case _ => BTrue
      }
      case Lt(_, v, t) => cv(v) match {
        case CVal(x) => BLt(f, name, x, t)
        case CAboveMax => BTrue
        case CBelowMin => BFalse
      }
      case LtEq(_, v, t) => cv(v) match {
        case CVal(x) => BLtEq(f, name, x, t)
        case CAboveMax => BTrue
        case CBelowMin => BFalse
      }
      case Gt(_, v, t) => cv(v) match {
        case CVal(x) => BGt(f, name, x, t)
        case CAboveMax => BFalse
        case CBelowMin => BTrue
      }
      case GtEq(_, v, t) => cv(v) match {
        case CVal(x) => BGtEq(f, name, x, t)
        case CAboveMax => BFalse
        case CBelowMin => BTrue
      }
      case In(_, vs, t) =>
        val vals = vs.map(cv).collect { case CVal(x) => x }.toSet
        if (vals.isEmpty) BFalse
        else if (vals.size == 1) BEq(f, name, vals.head, t)
        else BIn(f, name, vals, t)
      case NotIn(_, vs, t) =>
        val vals = vs.map(cv).collect { case CVal(x) => x }.toSet
        if (vals.isEmpty) BTrue
        else if (vals.size == 1) BNotEq(f, name, vals.head, t)
        else BNotIn(f, name, vals, t)
      case StartsWith(_, v, t) => BStartsWith(f, name, v, t)
      case NotStartsWith(_, v, t) => BNotStartsWith(f, name, v, t)
    }
  }
}

// ---------------------------------------------------------------------------
// Compile bound expression → Spark Column
// ---------------------------------------------------------------------------

object ToColumn {

  def apply(e: BoundExpr): Column = compile(e)

  def compile(e: BoundExpr): Column = e match {
    case BTrue => lit(true)
    case BFalse => lit(false)
    case BAnd(l, r) => compile(l) && compile(r)
    case BOr(l, r) => compile(l) || compile(r)
    case BNot(c) => not(compile(c))
    case p: BoundPred => pred(p)
  }

  private def termCol(p: BoundPred): Column = {
    val base = col(p.name)
    p.transform.map(_.column(base, p.field.fieldType)).getOrElse(base)
  }

  private def pred(p: BoundPred): Column = {
    val c = termCol(p)
    def l(v: Any): Column = Literals.toSparkLit(v, p.termType)
    p match {
      case _: BIsNull => c.isNull
      case _: BNotNull => c.isNotNull
      case _: BIsNaN => isnan(c)
      case _: BNotNaN => !isnan(c)
      case BEq(_, _, v, _) => c === l(v)
      case BNotEq(_, _, v, _) => c =!= l(v)
      case BLt(_, _, v, _) => c < l(v)
      case BLtEq(_, _, v, _) => c <= l(v)
      case BGt(_, _, v, _) => c > l(v)
      case BGtEq(_, _, v, _) => c >= l(v)
      case BIn(_, _, vs, _) => c.isin(vs.toSeq.map(v => litValue(v, p.termType)): _*)
      case BNotIn(_, _, vs, _) => !c.isin(vs.toSeq.map(v => litValue(v, p.termType)): _*)
      case BStartsWith(_, _, v, _) => c.startsWith(v)
      case BNotStartsWith(_, _, v, _) => !c.startsWith(v)
    }
  }

  private def litValue(v: Any, t: IceType): Any = t match {
    case IDate => LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue())
    case ITimestamp | ITimestamptz | ITimestampNs | ITimestamptzNs =>
      val micros = v.asInstanceOf[Number].longValue()
      Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
    case _ => v
  }

  /** Complementary filter for copy-on-write delete: rows to KEEP when
    * deleting by `pred` — `NOT pred OR pred IS NULL` so null-evaluating
    * rows survive (ref: io/pyarrow.py:1093
    * _expression_to_complementary_pyarrow). */
  def complementary(e: BoundExpr): Column =
    !coalesce(compile(e), lit(false))
}

// ---------------------------------------------------------------------------
// Row-level evaluator against a partition record (id → value map)
// ---------------------------------------------------------------------------

/** Evaluate a bound expression against a record of field-id → Iceberg
  * internal value (ref: visitors.py:453 expression_evaluator). Used for
  * per-file partition pruning, not data rows (Spark does those). */
object Evaluator {

  def eval(e: BoundExpr, record: Map[Int, Any]): Boolean = e match {
    case BTrue => true
    case BFalse => false
    case BAnd(l, r) => eval(l, record) && eval(r, record)
    case BOr(l, r) => eval(l, record) || eval(r, record)
    case BNot(c) => !eval(c, record)
    case p: BoundPred => evalPred(p, record)
  }

  private def evalPred(p: BoundPred, record: Map[Int, Any]): Boolean = {
    val raw = record.get(p.field.id).orNull
    val v = p.transform match {
      case Some(t) => if (raw == null) null else t.apply(raw, p.field.fieldType)
      case None => raw
    }
    evalTermValue(p, v)
  }

  /** Evaluate a predicate given its TERM value directly (already
    * transformed, if the predicate has a transformed term) — used by the
    * residual evaluator, where a file's partition value IS the term value. */
  def evalTermValue(p: BoundPred, v: Any): Boolean = {
    val t = p.termType
    def cmp(other: Any): Int = Literals.compare(t, v, other)
    def isNanV: Boolean = v match {
      case f: Float => f.isNaN
      case d: Double => d.isNaN
      case _ => false
    }
    p match {
      case _: BIsNull => v == null
      case _: BNotNull => v != null
      // Spark's isnan(null) is false (not null): IsNaN drops nulls,
      // NotNaN keeps them
      case _: BIsNaN => v != null && isNanV
      case _: BNotNaN => v == null || !isNanV
      case _ if v == null => false
      // NaN ordering follows Spark SQL semantics (NaN is greater than any
      // other value, NaN == NaN), which java.lang.Double.compare matches —
      // the evaluator must agree with how Spark executes the residual
      // filter, not with IEEE/Arrow semantics
      case BEq(_, _, x, _) => cmp(x) == 0
      case BNotEq(_, _, x, _) => cmp(x) != 0
      case BLt(_, _, x, _) => cmp(x) < 0
      case BLtEq(_, _, x, _) => cmp(x) <= 0
      case BGt(_, _, x, _) => cmp(x) > 0
      case BGtEq(_, _, x, _) => cmp(x) >= 0
      case BIn(_, _, xs, _) => xs.exists(x => cmp(x) == 0)
      case BNotIn(_, _, xs, _) => !xs.exists(x => cmp(x) == 0)
      case BStartsWith(_, _, s, _) => v.toString.startsWith(s)
      case BNotStartsWith(_, _, s, _) => !v.toString.startsWith(s)
    }
  }
}
