package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-ORDER (Morton) clustering support for the compaction path.
  *
  * Two small codegen'd expressions compose into the z-value:
  * `ZNorm32` maps a column of any supported sortable type to an
  * ORDER-PRESERVING unsigned 32-bit key (as a long), and
  * `InterleaveBits` interleaves n such keys round-robin from the most
  * significant bit into one 64-bit z-value (null keys sort first).
  * Range-partitioning + sorting a compaction rewrite by that z-value
  * clusters the file layout so per-file min/max bounds become tight on
  * EVERY participating dimension — metadata pruning then skips files
  * for predicates on any of them, not just the leading sort column.
  * (Same design as the Iceberg Spark action's z-order rewrite; the
  * reference has no compaction at all.)
  */
object ZOrderBits {
  /** sign-flip maps two's-complement order to unsigned order */
  def normLong(v: Long): Long = ((v ^ Long.MinValue) >>> 32) & 0xffffffffL
  def normInt(v: Int): Long = (v.toLong ^ 0x80000000L) & 0xffffffffL
  /** IEEE754 total-order trick: flip all bits of negatives, the sign bit
    * of non-negatives, keep the top 32 */
  def normDouble(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    val k = if (b < 0) ~b else b ^ Long.MinValue
    (k >>> 32) & 0xffffffffL
  }
  def normFloat(v: Float): Long = {
    val b = java.lang.Float.floatToIntBits(v)
    val k = if (b < 0) ~b else b ^ Int.MinValue
    k.toLong & 0xffffffffL
  }
  /** first 4 UTF-8 bytes big-endian — lexicographic on the prefix */
  def normString(v: UTF8String): Long = {
    val bytes = v.getBytes
    var k = 0L
    var i = 0
    while (i < 4) {
      k = (k << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0L)
      i += 1
    }
    k
  }

  /** Interleave the low 32 bits of each key round-robin from the MSB:
    * bit 31 of key 0, bit 31 of key 1, …, bit 30 of key 0, … until 64
    * output bits are used; left-aligned when n == 1. */
  def interleave(keys: Array[Long]): Long = {
    val n = keys.length
    var out = 0L
    var produced = 0
    var bit = 31
    while (produced < 64 && bit >= 0) {
      var d = 0
      while (d < n && produced < 64) {
        out = (out << 1) | ((keys(d) >>> bit) & 1L)
        produced += 1
        d += 1
      }
      bit -= 1
    }
    if (produced < 64) out << (64 - produced) else out
  }
}

/** Order-preserving unsigned-32 normalization of a sortable column
  * (null propagates; InterleaveBits maps it to the minimum key). */
case class ZNorm32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | StringType | DateType | TimestampType |
           TimestampNTZType | _: DecimalType =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"zorder does not support ${other.catalogString}")
    }

  def compute(v: Any): Long = v match {
    case b: Byte => ZOrderBits.normInt(b.toInt)
    case sh: Short => ZOrderBits.normInt(sh.toInt)
    case i: Int => ZOrderBits.normInt(i) // covers date (days)
    case l: Long => ZOrderBits.normLong(l) // covers timestamp (micros)
    case f: Float => ZOrderBits.normFloat(f)
    case d: Double => ZOrderBits.normDouble(d)
    case s: UTF8String => ZOrderBits.normString(s)
    case d: Decimal => ZOrderBits.normDouble(d.toDouble)
    case other => throw new IllegalArgumentException(
      s"zorder does not support value $other")
  }

  override def nullSafeEval(v: Any): Any = compute(v)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("znorm", this, classOf[ZNorm32].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute((Object)($c));")
  }
  override protected def withNewChildInternal(c: Expression): ZNorm32 = copy(child = c)
}

/** 64-bit Morton interleave of n ZNorm32 keys; a null key (null input
  * column) takes value 0 — the minimum, matching NULLS FIRST. */
case class InterleaveBits(children: Seq[Expression]) extends Expression {
  require(children.nonEmpty && children.size <= 8, "zorder takes 1-8 columns")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  def compute(keys: Array[Long]): Long = ZOrderBits.interleave(keys)
  override def eval(input: InternalRow): Any = {
    val keys = new Array[Long](children.size)
    var i = 0
    while (i < keys.length) {
      val v = children(i).eval(input)
      keys(i) = if (v == null) 0L else v.asInstanceOf[Long]
      i += 1
    }
    ZOrderBits.interleave(keys)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ileave", this, classOf[InterleaveBits].getName)
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zkeys")
    val fill = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.isNull} ? 0L : ${e.value};"
    }.mkString("\n")
    val childCode = evals.map(_.code).reduce(_ + _)
    ev.copy(code =
      code"""
        $childCode
        long[] $arr = new long[${children.size}];
        ${fill}
        long ${ev.value} = $ref.compute($arr);
      """, isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): InterleaveBits =
    copy(children = cs)
}

object ZOrderFunctions {
  /** z-value column over 1–8 sortable columns, keyed by the TYPE-level
    * normalization (sign-flip / IEEE trick / string prefix). NOTE: for
    * narrow-range numeric data the type-level key concentrates variation
    * in its LOW bits (e.g. all of 0..60000 shares the top 18 bits), which
    * makes a poor interleave — the compaction path therefore prefers
    * [[zvalueOfKeys]] over min-max-scaled keys derived from column
    * bounds. This entry is the stats-free fallback. */
  def zvalue(cols: Seq[Column]): Column =
    GraftBridge.column(InterleaveBits(
      cols.map(c => ZNorm32(GraftBridge.expression(c)))))

  /** z-value over caller-built keys, each already an order-preserving
    * long in [0, 2³²) — e.g. min-max scaled from manifest bounds. */
  def zvalueOfKeys(keys: Seq[Column]): Column =
    GraftBridge.column(InterleaveBits(keys.map(GraftBridge.expression)))

  /** the type-level key alone (string prefix / sign flip / IEEE trick). */
  def znorm32(c: Column): Column =
    GraftBridge.column(ZNorm32(GraftBridge.expression(c)))
}
