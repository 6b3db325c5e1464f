package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.unsafe.types.UTF8String
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

/** xxhash64 of every k-BYTE gram of a string, as one pass over the
  * UTF8String's backing bytes — `out(i) = xxhash64(bytes[i..i+k-1])`,
  * seed 42, bit-identical to Spark's `xxhash64(substr(text, i+1, k))`
  * for ASCII text (char == byte there; for multi-byte text this is the
  * byte-gram definition, and the winnow oracle export uses THIS same
  * expression so engine and oracle can never diverge).
  *
  * Replaces `transform(sequence(...), i => xxhash64(substr(text,i,k)))`,
  * which allocated a copied UTF8String per gram position — the r10
  * profile put that construction at ~2s of ds_winnow_dedup's 5.2s, ~1.3µs
  * per gram for what is an 8-byte hash. Here: zero per-gram allocation,
  * one long[] result per row.
  *
  * A string shorter than k bytes yields ONE gram over the whole string
  * (the substr form's behavior: substr(1, k) of a short string is the
  * string). Null input yields null. */
case class GramHash64(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"gram size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  def compute(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes
    if (nb <= k) {
      return new GenericArrayData(
        Array(XXH64.hashUnsafeBytes(base, off, nb, 42L)))
    }
    val m = nb - k + 1
    val res = new Array[Long](m)
    var i = 0
    while (i < m) {
      res(i) = XXH64.hashUnsafeBytes(base, off + i, k, 42L)
      i += 1
    }
    new GenericArrayData(res)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramHash", this, classOf[GramHash64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramHash64 =
    copy(child = newChild)
}

/** Repetition mass of a long array: `Σ c·(c−1)` over the multiplicity
  * `c` of each distinct value — the unnormalized Simpson repetition
  * numerator. One sort + one run-length pass per row, map-side; replaces
  * an explode + two-level groupBy that shuffled every gram hash (the
  * array is per-document, a few hundred longs — sorting it in-task is
  * noise next to a cluster-wide shuffle of the exploded grams). Null
  * input yields null; empty array yields 0. */
case class RunRepetition(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = arr.getLong(i); i += 1 }
    java.util.Arrays.sort(a)
    var rep = 0L
    var run = 1L
    i = 1
    while (i < n) {
      if (a(i) == a(i - 1)) run += 1
      else { rep += run * (run - 1); run = 1L }
      i += 1
    }
    rep + run * (run - 1)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("runRep", this, classOf[RunRepetition].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): RunRepetition =
    copy(child = newChild)
}

object SlidingMinFunctions {
  /** Winnowing minima of a long-array column with window `w`. */
  def sliding_min(a: Column, w: Int): Column =
    GraftBridge.column(SlidingWindowMin(GraftBridge.expression(a), w))
  /** xxhash64 (seed 42) of every k-byte gram of a string column. */
  def gram_hashes(text: Column, k: Int): Column =
    GraftBridge.column(GramHash64(GraftBridge.expression(text), k))
  /** Σ c·(c−1) over value multiplicities of a long-array column. */
  def run_repetition(a: Column): Column =
    GraftBridge.column(RunRepetition(GraftBridge.expression(a)))
}
