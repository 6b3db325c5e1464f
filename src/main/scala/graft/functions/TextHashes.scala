package graft.functions

import com.google.common.hash.Hashing
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared tokenization + hashing for the text-dedup operators.
  *
  * MinHash does NOT rehash every shingle per permutation (k murmur3
  * passes per shingle is the naive formulation): each shingle is hashed
  * ONCE to 64 bits — word hashes computed once and mixed per 3-window —
  * and the k permutations are multiply-shift universal hashes of that
  * value (the standard one-hash + k-mix scheme, e.g. Apache DataSketches).
  * Cuts signature cost from O(shingles × k × |shingle|) to
  * O(words × |word| + shingles × k) integer ops.
  */
object TextHashes {
  def tokens(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct

  /** Distinct n-word shingles (ref pattern: shingle→minhash→band). */
  def shingles(text: String, n: Int): Array[String] = {
    val ws = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (ws.length <= n) Array(ws.mkString(" "))
    else ws.sliding(n).map(_.mkString(" ")).toArray.distinct
  }

  def hash(word: String, seed: Int): Int =
    Hashing.murmur3_32_fixed(seed).hashUnencodedChars(word).asInt()

  private def word64(w: String): Long = {
    val lo = hash(w, 101)
    val hi = hash(w, 202)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  private def mix3(h0: Long, h1: Long, h2: Long): Long = {
    var h = h0
    h = (h ^ java.lang.Long.rotateLeft(h1, 21)) * 0x9E3779B97F4A7C15L
    h = (h ^ java.lang.Long.rotateLeft(h2, 42)) * 0xC2B2AE3D27D4EB4FL
    h ^ (h >>> 29)
  }

  /** DISTINCT 64-bit hashes of the 3-word shingles, one murmur pass per
    * WORD (not per shingle×permutation). Identity-by-hash: a 64-bit
    * collision merges two shingles — harmless inside probabilistic
    * signatures (the oracle rescans exactly). */
  def shingleHashes3(text: String): Array[Long] = {
    val ws = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (ws.length <= 3) return Array(mix3(
      if (ws.length > 0) word64(ws(0)) else 0L,
      if (ws.length > 1) word64(ws(1)) else 0L,
      if (ws.length > 2) word64(ws(2)) else 0L))
    val wh = new Array[Long](ws.length)
    var i = 0
    while (i < ws.length) { wh(i) = word64(ws(i)); i += 1 }
    val out = new Array[Long](ws.length - 2)
    i = 0
    while (i < out.length) { out(i) = mix3(wh(i), wh(i + 1), wh(i + 2)); i += 1 }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted hashes
    var n = 0
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(n) = out(i); n += 1 }
      i += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** SORTED DISTINCT 64-bit hashes of ALL n-word windows (n-gram
    * generalization of shingleHashes3, same word64 base + fold mix).
    * Docs shorter than n words yield one window over the whole doc —
    * matching concat_ws's null-skipping in the DuckDB oracle. */
  def windowHashes(text: String, n: Int): Array[Long] = {
    val ws = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val wh = new Array[Long](ws.length)
    var i = 0
    while (i < ws.length) { wh(i) = word64(ws(i)); i += 1 }
    val m = math.max(ws.length - n + 1, 1)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 0x9E3779B97F4A7C15L
      var j = i
      val end = math.min(i + n, ws.length)
      while (j < end) {
        h = (h ^ java.lang.Long.rotateLeft(wh(j), ((j - i) * 13 + 7) & 63)) *
          0xC2B2AE3D27D4EB4FL
        j += 1
      }
      out(i) = h ^ (h >>> 29)
      i += 1
    }
    java.util.Arrays.sort(out)
    var k = 0
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(k) = out(i); k += 1 }
      i += 1
    }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  /** splitmix64 — deterministic per-permutation multipliers/addends. */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private val permCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def perms(k: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(k, _ => {
      val a = new Array[Long](k); val b = new Array[Long](k)
      var p = 0
      while (p < k) {
        a(p) = splitmix64(p.toLong * 2) | 1L // odd multiplier
        b(p) = splitmix64(p.toLong * 2 + 1)
        p += 1
      }
      (a, b)
    })

  def minhashSignature(text: String, numPerms: Int): Array[Int] =
    minhashOfHashes(shingleHashes3(text), numPerms)

  def minhashOfHashes(hs: Array[Long], numPerms: Int): Array[Int] = {
    val (a, b) = perms(numPerms)
    val sig = new Array[Int](numPerms)
    java.util.Arrays.fill(sig, Int.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var p = 0
      while (p < numPerms) {
        val v = ((a(p) * h + b(p)) >>> 33).toInt // top bits, non-negative
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash: per-bit majority vote over the shingle hashes. */
  def simhash64(text: String): Long = {
    val hs = shingleHashes3(text)
    val acc = new Array[Int](64)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** MinHash signature as a codegen'd Catalyst expression: one pass over the
  * document, one 64-bit hash per shingle, k multiply-shift permutations
  * (ref pattern: shingle→minhash→band; SURVEY.md §2.L). Returns
  * array<int> of length `numPerms`. */
case class MinHashSig(child: Expression, numPerms: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  def compute(v: UTF8String): ArrayData =
    UnsafeArrayDataBridge.fromIntArray(TextHashes.minhashSignature(v.toString, numPerms))
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** MinHash signature derived from an ALREADY-COMPUTED shingle-hash array
  * (ShingleHashes3 output) — lets a query that needs both the hash set
  * (for exact rescore) and the signature shingle the text exactly once. */
case class MinHashOfHashes(child: Expression, numPerms: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  def compute(v: ArrayData): ArrayData = {
    val hs = v.toLongArray()
    UnsafeArrayDataBridge.fromIntArray(TextHashes.minhashOfHashes(hs, numPerms))
  }
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashOf", this, classOf[MinHashOfHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression): MinHashOfHashes = copy(child = c)
}

/** 64-bit SimHash as a codegen'd Catalyst expression. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  def compute(v: UTF8String): Long = TextHashes.simhash64(v.toString)
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Distinct 3-word shingles as a single JVM expression. Semantically equal
  * to the split/transform/concat_ws higher-order-function chain (and to
  * the DuckDB oracle's list_transform), but ~60× faster: the HOF chain
  * pays per-element lambda dispatch on every word of every document
  * (measured 10.6s vs 0.17s over sf0.1 documents). */
case class Shingles3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  def compute(v: UTF8String): ArrayData =
    new GenericArrayData(TextHashes.shingles(v.toString, 3)
      .map(s => UTF8String.fromString(s).asInstanceOf[Any]))
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[Shingles3].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression): Shingles3 = copy(child = c)
}

/** SORTED DISTINCT 64-bit hashes of the 3-word shingles (see
  * TextHashes.shingleHashes3). The dedup operators key their candidate
  * machinery on these instead of shingle strings: every downstream
  * shuffle (doc-frequency groupBy, prefix equi-join, band join) then
  * moves fixed 8-byte keys instead of ~25-byte strings, and set overlap
  * becomes a linear merge over sorted longs (SortedIntersectSize). */
case class ShingleHashes3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  def compute(v: UTF8String): ArrayData =
    UnsafeArrayDataBridge.fromLongArray(TextHashes.shingleHashes3(v.toString))
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes3].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression): ShingleHashes3 = copy(child = c)
}

/** SORTED DISTINCT 64-bit hashes of the n-word windows — the exact
  * substring-dedup operators (Lee et al. 2021 style) key on these; the
  * DuckDB oracle uses the literal window strings (identity-by-hash,
  * collision P ≈ n²/2⁶⁵, same argument as ShingleHashes3). */
case class WindowHashesN(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  def compute(v: UTF8String): ArrayData =
    UnsafeArrayDataBridge.fromLongArray(TextHashes.windowHashes(v.toString, n))
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("windowHashes", this, classOf[WindowHashesN].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(c: Expression): WindowHashesN = copy(child = c)
}

/** |a ∩ b| for two SORTED long arrays as one linear merge — replaces the
  * array_intersect + array_distinct(concat(...)) chain in the Jaccard
  * rescore (those build hash sets per row; this is two pointers over
  * primitive arrays). Inputs MUST be sorted distinct (ShingleHashes3
  * guarantees it). |a ∪ b| follows as |a| + |b| − |a ∩ b|. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("isect", this, classOf[SortedIntersectSize].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectSize =
    copy(left = l, right = r)
}

/** UnsafeArrayData.fromPrimitiveArray is Spark-internal; bridge it so
  * primitive arrays are emitted without boxing every element. */
object UnsafeArrayDataBridge {
  def fromIntArray(a: Array[Int]): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(a)
  def fromLongArray(a: Array[Long]): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(a)
}

object TextFunctions {
  def minhash_sig(c: Column, numPerms: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), numPerms))
  def minhash_of_hashes(c: Column, numPerms: Int): Column =
    GraftBridge.column(MinHashOfHashes(GraftBridge.expression(c), numPerms))
  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
  def shingles3(c: Column): Column =
    GraftBridge.column(Shingles3(GraftBridge.expression(c)))
  def shingle_hashes3(c: Column): Column =
    GraftBridge.column(ShingleHashes3(GraftBridge.expression(c)))
  def window_hashes(c: Column, n: Int): Column =
    GraftBridge.column(WindowHashesN(GraftBridge.expression(c), n))
  def sorted_intersect_size(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectSize(GraftBridge.expression(a), GraftBridge.expression(b)))
}
