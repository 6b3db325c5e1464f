package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core._

/** Spark V2 functions mirroring the engine's partition transforms
  * (ref transforms.py — bucket :245, truncate :772, time transforms
  * :457–:647), exposed through [[GraftCatalog]]'s FunctionCatalog face.
  *
  * These are what make STORAGE-PARTITIONED JOINS resolvable: when a scan
  * reports `KeyGroupedPartitioning(bucket(8, key), …)`, Spark looks the
  * `bucket` function up in the table's catalog to type-check the
  * transform and decide two tables' partitionings are compatible — two
  * graft tables bucketed the same way then join with NO shuffle on
  * either side (the 100 TB fact⋈fact case). The bound functions evaluate
  * with exactly the engine's transform semantics (spec murmur3 bucket,
  * epoch-ordinal time transforms), so a planner-side evaluation can
  * never disagree with the partition values in the manifests. */
object GraftFunctions {

  val names: Seq[String] = Seq("bucket", "truncate", "years", "months", "days", "hours")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "bucket" => Some(BucketUnbound)
    case "truncate" => Some(TruncateUnbound)
    case "years" => Some(new TimeUnbound("years", YearTransform, IntegerType))
    case "months" => Some(new TimeUnbound("months", MonthTransform, IntegerType))
    case "days" => Some(new TimeUnbound("days", DayTransform, DateType))
    case "hours" => Some(new TimeUnbound("hours", HourTransform, IntegerType))
    case _ => None
  }

  /** Spark internal value → the plain JVM form Transform.apply expects. */
  private[spark] def plainOf(v: Any, t: IceType): Any = v match {
    case null => null
    case s: UTF8String => s.toString
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case other => other
  }

  /** Transform result → Spark internal form. */
  private[spark] def internalOf(v: Any): Any = v match {
    case null => null
    case s: String => UTF8String.fromString(s)
    case d: java.math.BigDecimal => org.apache.spark.sql.types.Decimal(d)
    case other => other
  }

  /** Spark column type → the IceType driving transform semantics. */
  private[spark] def iceTypeOf(dt: DataType): Option[IceType] = dt match {
    case IntegerType => Some(IInt)
    case LongType => Some(ILong)
    case StringType => Some(IString)
    case DateType => Some(IDate)
    case TimestampType => Some(ITimestamptz)
    case TimestampNTZType => Some(ITimestamp)
    case d: DecimalType => Some(IDecimal(d.precision, d.scale))
    case BinaryType => Some(IBinary)
    case BooleanType => Some(IBoolean)
    case FloatType => Some(IFloat)
    case DoubleType => Some(IDouble)
    case _ => None
  }

  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): spec murmur3 bucket of col into n (partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket expects (numBuckets int, col); got $inputType")
      val dt = inputType.fields(1).dataType
      val ice = iceTypeOf(dt).getOrElse(
        throw new UnsupportedOperationException(s"bucket over $dt"))
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"
        override def produceResult(row: InternalRow): Integer = {
          if (row.isNullAt(0) || row.isNullAt(1)) return null
          val n = row.getInt(0)
          BucketTransform(n).apply(plainOf(row.get(1, dt), ice), ice) match {
            case null => null
            case i: Int => Integer.valueOf(i)
            case other => Integer.valueOf(other.asInstanceOf[Number].intValue())
          }
        }
      }
    }
  }

  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, col): width-w truncation of col (partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate expects (width int, col); got $inputType")
      val dt = inputType.fields(1).dataType
      val ice = iceTypeOf(dt).getOrElse(
        throw new UnsupportedOperationException(s"truncate over $dt"))
      new ScalarFunction[Any] {
        override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
        override def resultType(): DataType = dt
        override def name(): String = "truncate"
        override def canonicalName(): String = s"graft.truncate(${dt.catalogString})"
        override def produceResult(row: InternalRow): Any = {
          if (row.isNullAt(0) || row.isNullAt(1)) return null
          val w = row.getInt(0)
          internalOf(TruncateTransform(w).apply(plainOf(row.get(1, dt), ice), ice))
        }
      }
    }
  }

  private class TimeUnbound(fname: String, transform: Transform, result: DataType)
      extends UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"$fname(col): epoch-ordinal $fname of a date/timestamp (partition transform)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1, s"$fname expects (col); got $inputType")
      val dt = inputType.fields(0).dataType
      val ice = iceTypeOf(dt).filter {
        case IDate | ITimestamp | ITimestamptz => true
        case _ => false
      }.getOrElse(throw new UnsupportedOperationException(s"$fname over $dt"))
      new ScalarFunction[Integer] {
        override def inputTypes(): Array[DataType] = Array(dt)
        override def resultType(): DataType = result
        override def name(): String = fname
        override def canonicalName(): String = s"graft.$fname(${dt.catalogString})"
        override def produceResult(row: InternalRow): Integer = {
          if (row.isNullAt(0)) return null
          transform.apply(plainOf(row.get(0, dt), ice), ice) match {
            case null => null
            case i: Int => Integer.valueOf(i)
            case other => Integer.valueOf(other.asInstanceOf[Number].intValue())
          }
        }
      }
    }
  }
}
