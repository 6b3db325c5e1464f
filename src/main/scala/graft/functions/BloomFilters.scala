package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast-Bloom membership test as a codegen'd Catalyst expression —
  * the semi-join reduction primitive: ship a kilobytes-sized filter built
  * from the SMALL side of a join to every task, and drop non-matching
  * rows of the BIG side map-side before any shuffle. A Bloom filter has
  * false positives but NO false negatives, so `prefilter → exact join`
  * is lossless while shuffling only the surviving fraction; this is the
  * same mechanism as Spark's runtime row-level filtering, exposed as a
  * composable function.
  *
  * The serialized filter travels inside the expression (plan closure);
  * each executor deserializes it once per plan (transient lazy), and
  * whole-stage codegen calls straight into `mightContain` — no UDF
  * boxing, no codegen barrier. */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  // probes hash UTF-8 bytes — a non-string child must fail at analysis,
  // not as a ClassCastException inside codegen (AbstractDataType is
  // private[sql]; the inferred Seq[StringType.type] conforms)
  override def inputTypes = Seq(StringType)

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  def mightContain(v: UTF8String): Boolean = bloom.mightContainBinary(v.getBytes)

  override def nullSafeEval(v: Any): Any = mightContain(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMc", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContain($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomFunctions {
  /** Distributed Bloom build over a string Dataset: per-partition filters
    * merged associatively (treeAggregate) — the mergeable-summary shape,
    * so building from 100 TB costs one pass and a log-depth reduce of
    * fixed-size bitsets. Values are inserted as their UTF-8 bytes, the
    * same form `bloom_might_contain` probes. */
  def buildBloom(ds: Dataset[String], expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = ds.rdd.treeAggregate(BloomFilter.create(math.max(expectedItems, 1L), fpp))(
      (acc, s) => { acc.putBinary(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)); acc },
      (a, b) => { a.mergeInPlace(b); a })
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  def bloom_might_contain(c: Column, bloomBytes: Array[Byte]): Column =
    GraftBridge.column(BloomMightContain(GraftBridge.expression(c), bloomBytes))
}
