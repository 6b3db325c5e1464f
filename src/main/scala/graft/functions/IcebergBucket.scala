package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Transforms

/** Iceberg `bucket[n]` as a native Catalyst expression with codegen.
  *
  * Semantics: `(murmur3_x86_32(encode(v)) & Int.MaxValue) % n` with the
  * spec's type-specific encodings (ref: pyiceberg/transforms.py:245,
  * :327-384; Iceberg spec Appendix B). A Scala UDF would break whole-stage
  * codegen on the write fan-out hot path; this stays inside it by emitting
  * a static call per row.
  */
case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType => Transforms.bucketLong(v.asInstanceOf[Int].toLong, n)
    case LongType => Transforms.bucketLong(v.asInstanceOf[Long], n)
    case StringType => Transforms.bucketString(v.asInstanceOf[UTF8String], n)
    case BinaryType => Transforms.bucketBinary(v.asInstanceOf[Array[Byte]], n)
    case _: DecimalType => Transforms.bucketDecimal(v.asInstanceOf[Decimal], n)
    case DateType => Transforms.bucketLong(v.asInstanceOf[Int].toLong, n)
    case TimestampType | TimestampNTZType => Transforms.bucketLong(v.asInstanceOf[Long], n)
    case other => throw new UnsupportedOperationException(s"bucket over $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val T = "graft.core.Transforms"
    val call: String => String = child.dataType match {
      case IntegerType | DateType => c => s"$T.bucketLong((long) $c, $n)"
      case LongType | TimestampType | TimestampNTZType => c => s"$T.bucketLong($c, $n)"
      case StringType => c => s"$T.bucketString($c, $n)"
      case BinaryType => c => s"$T.bucketBinary($c, $n)"
      case _: DecimalType => c => s"$T.bucketDecimal($c, $n)"
      case other => throw new UnsupportedOperationException(s"bucket over $other")
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}
