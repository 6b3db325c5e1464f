package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-window minima over a long array — `out(i) = min(a(i..i+w-1))` for
  * every FULL window — as one O(n) monotonic-deque pass inside
  * whole-stage codegen.
  *
  * This is the winnowing fingerprint kernel (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): the alternatives are quadratic or shuffle-heavy — an
  * array-slice HOF form re-evaluates the (inlined) hash-array child per
  * window (O(n·w) hashing), and the explode + rowsBetween window form it
  * replaces shuffles EVERY gram hash on doc_id before the per-window min.
  * Here the minima are computed map-side where the row already is; only
  * the (array_distinct-ed) fingerprints reach the downstream shuffle —
  * at 100 TB the shuffle carries ~n/w values per doc instead of n.
  *
  * Empty result when the array holds fewer than `w` elements (no full
  * window). Null elements are not expected (hash arrays); a null input
  * array yields null. */
case class SlidingWindowMin(child: Expression, windowSize: Int)
    extends UnaryExpression {
  require(windowSize >= 1, s"window size must be >= 1, got $windowSize")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = n - windowSize + 1
    if (out <= 0) return new GenericArrayData(Array.emptyLongArray)
    val res = new Array[Long](out)
    // monotonic deque of candidate indices: values strictly increase from
    // head to tail, head is the current window's minimum
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // [head, tail)
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - windowSize) head += 1
      if (i >= windowSize - 1) res(i - windowSize + 1) = arr.getLong(dq(head))
      i += 1
    }
    new GenericArrayData(res)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("slidingMin", this, classOf[SlidingWindowMin].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SlidingWindowMin =
    copy(child = newChild)
}

object SlidingMinFunctions {
  /** Winnowing minima of a long-array column with window `w`. */
  def sliding_min(a: Column, w: Int): Column =
    GraftBridge.column(SlidingWindowMin(GraftBridge.expression(a), w))
}
