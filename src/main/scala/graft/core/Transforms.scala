package graft.core

import java.math.BigInteger
import java.nio.charset.StandardCharsets
import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import com.google.common.hash.Hashing
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType => SparkDecimalType}

/** Iceberg partition transforms (ref: pyiceberg/transforms.py).
  *
  * Each transform supplies: a JVM value function (partition tuples,
  * predicate projection), a Spark Column function (write fan-out — stays in
  * codegen via built-in functions or a static-call expression), a result
  * type, and a human string (partition paths, ref partitioning.py:238).
  *
  * Bucket hashing is Iceberg's murmur3_x86_32 over type-specific byte
  * encodings (ref: transforms.py:327-384; Iceberg spec Appendix B) — NOT
  * Spark's `hash()`, which seeds differently and hashes internal rows.
  */
sealed trait Transform {
  def name: String
  /** Apply to a raw JVM value (null-safe). Input longs are micros for
    * timestamps, days for dates — i.e. the Iceberg internal repr. */
  def apply(value: Any, src: IceType): Any
  /** Spark column form; `c` is the source column. */
  def column(c: Column, src: IceType): Column
  def resultType(src: IceType): IceType
  def toHumanString(v: Any, src: IceType): String
  /** Can `this(pred)` be projected onto partition space for pruning?
    * (ref: transforms.py Transform.project). */
  def preservesOrder: Boolean
}

object Transforms {

  // ---- murmur3 over Iceberg byte encodings ------------------------------

  private val mm3 = Hashing.murmur3_32_fixed()

  def hashBytes(bytes: Array[Byte]): Int = mm3.hashBytes(bytes).asInt()

  def hashLong(v: Long): Int = {
    // 8-byte little-endian (ints are hashed as longs, spec Appendix B)
    val b = new Array[Byte](8)
    var x = v
    var i = 0
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    hashBytes(b)
  }

  def hashString(s: String): Int = hashBytes(s.getBytes(StandardCharsets.UTF_8))

  def hashDecimal(unscaled: BigInteger): Int = hashBytes(unscaled.toByteArray)

  // static-forwarder entry points for generated code
  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Integer.MAX_VALUE) % n
  def bucketString(s: org.apache.spark.unsafe.types.UTF8String, n: Int): Int =
    (hashBytes(s.getBytes) & Integer.MAX_VALUE) % n
  def bucketBinary(b: Array[Byte], n: Int): Int = (hashBytes(b) & Integer.MAX_VALUE) % n
  def bucketDecimal(d: org.apache.spark.sql.types.Decimal, n: Int): Int =
    (hashDecimal(d.toJavaBigDecimal.unscaledValue()) & Integer.MAX_VALUE) % n

  val EpochDay: LocalDate = LocalDate.of(1970, 1, 1)

  def microsToLocalDateTime(micros: Long): LocalDateTime =
    LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
}

case object IdentityTransform extends Transform {
  val name = "identity"
  def apply(v: Any, src: IceType): Any = v
  def column(c: Column, src: IceType): Column = c
  def resultType(src: IceType): IceType = src
  def toHumanString(v: Any, src: IceType): String = v match {
    case null => "null"
    case l: Long if src == ITimestamp || src == ITimestamptz =>
      Transforms.microsToLocalDateTime(l).toString
    case i: Int if src == IDate => Transforms.EpochDay.plusDays(i.toLong).toString
    case other => other.toString
  }
  val preservesOrder = true
}

final case class BucketTransform(n: Int) extends Transform {
  require(n > 0, "bucket count must be positive")
  val name = s"bucket[$n]"
  def apply(v: Any, src: IceType): Any = if (v == null) null else src match {
    case IInt => Transforms.bucketLong(v.asInstanceOf[Number].longValue(), n)
    case ILong | IDate | ITime | ITimestamp | ITimestamptz =>
      Transforms.bucketLong(v.asInstanceOf[Number].longValue(), n)
    case IString => (Transforms.hashString(v.toString) & Integer.MAX_VALUE) % n
    case IBinary | IFixed(_) =>
      (Transforms.hashBytes(v.asInstanceOf[Array[Byte]]) & Integer.MAX_VALUE) % n
    case IDecimal(_, _) =>
      (Transforms.hashDecimal(v.asInstanceOf[java.math.BigDecimal].unscaledValue()) &
        Integer.MAX_VALUE) % n
    case other => throw new IllegalArgumentException(s"Cannot bucket $other")
  }
  def column(c: Column, src: IceType): Column = {
    import org.apache.spark.sql.GraftBridge.{column => toCol, expression => toExpr}
    def bucketCol(inner: Column): Column = toCol(graft.functions.IcebergBucket(toExpr(inner), n))
    src match {
      case IInt | ILong | ITimestamp | ITimestamptz => bucketCol(c)
      case IDate => bucketCol(c.cast("int"))
      case IString | IBinary | IFixed(_) | IDecimal(_, _) => bucketCol(c)
      case other => throw new IllegalArgumentException(s"Cannot bucket $other")
    }
  }
  def resultType(src: IceType): IceType = IInt
  def toHumanString(v: Any, src: IceType): String = String.valueOf(v)
  val preservesOrder = false
}

final case class TruncateTransform(width: Int) extends Transform {
  require(width > 0, "truncate width must be positive")
  val name = s"truncate[$width]"
  def apply(v: Any, src: IceType): Any = if (v == null) null else src match {
    case IInt => { val i = v.asInstanceOf[Number].intValue(); i - Math.floorMod(i, width) }
    case ILong => { val l = v.asInstanceOf[Number].longValue(); l - Math.floorMod(l, width.toLong) }
    case IString =>
      val s = v.toString
      if (s.codePointCount(0, s.length) <= width) s
      else s.substring(0, s.offsetByCodePoints(0, width))
    case IBinary => v.asInstanceOf[Array[Byte]].take(width)
    case IDecimal(_, scale) =>
      val d = v.asInstanceOf[java.math.BigDecimal]
      val unscaled = d.unscaledValue()
      val w = BigInteger.valueOf(width.toLong)
      new java.math.BigDecimal(unscaled.subtract(unscaled.mod(w)), scale)
    case other => throw new IllegalArgumentException(s"Cannot truncate $other")
  }
  def column(c: Column, src: IceType): Column = src match {
    case IInt | ILong => c - pmod(c, lit(width))
    // NOTE: Spark substring counts UTF-16 code units; Iceberg counts code
    // points. Identical for BMP text (all testdata); supplementary-plane
    // correctness would need a custom expression.
    case IString => substring(c, 1, width)
    case IDecimal(p, s) => c - pmod(c, lit(new java.math.BigDecimal(BigInteger.valueOf(width.toLong), s)))
    case other => throw new IllegalArgumentException(s"Cannot truncate $other in column form")
  }
  def resultType(src: IceType): IceType = src
  def toHumanString(v: Any, src: IceType): String = String.valueOf(v)
  val preservesOrder = true
}

sealed abstract class TimeTransform(val name: String) extends Transform {
  val preservesOrder = true
  def resultType(src: IceType): IceType = if (name == "day") IDate else IInt

  /** Exact floorDiv on a long column: (x - pmod) is a non-negative-remainder
    * multiple of d, so the decimal division is exact (a bare long `/` would
    * go through double and lose precision above 2^53, and `div` truncates
    * toward zero — wrong pre-1970). */
  protected def floorDivCol(x: Column, d: Long): Column = {
    val m = x - pmod(x, lit(d))
    (m.cast(SparkDecimalType(38, 0)) / lit(java.math.BigDecimal.valueOf(d))).cast("long")
  }

  /** Session-timezone-FREE day ordinal of a timestamp column: raw epoch
    * micros → floorDiv. `c.cast("date")` / `year(ts)` / `month(ts)` all
    * interpret the instant in spark.sql.session.timeZone, which would make
    * written partition values disagree with the UTC-based JVM `apply` used
    * by predicate projection — wrong pruning on non-UTC sessions. */
  protected def utcDays(c: Column): Column =
    floorDivCol(unix_micros(c), 86400000000L).cast("int")

  protected def fromMicros(micros: Long): Int
  protected def fromDays(days: Int): Int
  def apply(v: Any, src: IceType): Any = if (v == null) null else src match {
    case IDate => fromDays(v.asInstanceOf[Number].intValue())
    case ITimestamp | ITimestamptz => fromMicros(v.asInstanceOf[Number].longValue())
    case other => throw new IllegalArgumentException(s"Cannot apply $name to $other")
  }
  /** Column form for a DateType source (dates carry no timezone, so the
    * builtin year/month are safe there). */
  protected def columnFromDate(d: Column): Column
  def column(c: Column, src: IceType): Column = src match {
    case IDate => columnFromDate(c)
    // NTZ is a wall-clock value: its date part is timezone-free by
    // construction, so the builtin cast is safe (and codegen-friendly)
    case ITimestamp => columnFromDate(c.cast("date"))
    // an instant (TIMESTAMP/ltz): NEVER year()/month()/cast(date), which
    // interpret it in spark.sql.session.timeZone — derive the UTC day
    // ordinal from raw epoch micros so written partition values agree
    // with the UTC-based JVM apply used by predicate projection
    case _ => columnFromDate(date_from_unix_date(utcDays(c)))
  }
}

case object YearTransform extends TimeTransform("year") {
  def fromMicros(m: Long): Int = Transforms.microsToLocalDateTime(m).getYear - 1970
  def fromDays(d: Int): Int = Transforms.EpochDay.plusDays(d.toLong).getYear - 1970
  protected def columnFromDate(d: Column): Column = (year(d) - lit(1970)).cast("int")
  def toHumanString(v: Any, src: IceType): String =
    if (v == null) "null" else (v.asInstanceOf[Number].intValue() + 1970).toString
}

case object MonthTransform extends TimeTransform("month") {
  def fromMicros(m: Long): Int = {
    val dt = Transforms.microsToLocalDateTime(m)
    (dt.getYear - 1970) * 12 + (dt.getMonthValue - 1)
  }
  def fromDays(d: Int): Int = {
    val ld = Transforms.EpochDay.plusDays(d.toLong)
    (ld.getYear - 1970) * 12 + (ld.getMonthValue - 1)
  }
  protected def columnFromDate(d: Column): Column =
    ((year(d) - lit(1970)) * lit(12) + month(d) - lit(1)).cast("int")
  def toHumanString(v: Any, src: IceType): String = {
    if (v == null) return "null"
    val ord = v.asInstanceOf[Number].intValue()
    f"${1970 + Math.floorDiv(ord, 12)}%04d-${Math.floorMod(ord, 12) + 1}%02d"
  }
}

case object DayTransform extends TimeTransform("day") {
  def fromMicros(m: Long): Int = Math.floorDiv(m, 86400000000L).toInt
  def fromDays(d: Int): Int = d
  protected def columnFromDate(d: Column): Column = d
  def toHumanString(v: Any, src: IceType): String =
    if (v == null) "null" else Transforms.EpochDay.plusDays(v.asInstanceOf[Number].longValue()).toString
}

case object HourTransform extends TimeTransform("hour") {
  def fromMicros(m: Long): Int = Math.floorDiv(m, 3600000000L).toInt
  def fromDays(d: Int): Int =
    throw new IllegalArgumentException("hour transform not applicable to date")
  protected def columnFromDate(d: Column): Column =
    throw new IllegalArgumentException("hour transform not applicable to date")
  override def column(c: Column, src: IceType): Column = src match {
    case ITimestamp => // NTZ wall clock: date/hour parts are tz-free
      (datediff(c.cast("date"), to_date(lit("1970-01-01"))).cast("long") * lit(24L) +
        hour(c).cast("long")).cast("int")
    case _ => floorDivCol(unix_micros(c), 3600000000L).cast("int")
  }
  def toHumanString(v: Any, src: IceType): String = {
    if (v == null) return "null"
    val h = v.asInstanceOf[Number].longValue()
    val dt = LocalDateTime.ofEpochSecond(h * 3600L, 0, ZoneOffset.UTC)
    f"${dt.getYear}%04d-${dt.getMonthValue}%02d-${dt.getDayOfMonth}%02d-${dt.getHour}%02d"
  }
}

case object VoidTransform extends Transform {
  val name = "void"
  def apply(v: Any, src: IceType): Any = null
  def column(c: Column, src: IceType): Column = lit(null)
  def resultType(src: IceType): IceType = src
  def toHumanString(v: Any, src: IceType): String = "null"
  val preservesOrder = false
}

/** Placeholder for a transform name this engine doesn't know — a table
  * written by a newer engine stays READABLE (metadata loads; scans cannot
  * prune or compute on the field and any attempt to apply it fails loudly)
  * instead of failing at parse (ref: transforms.py:971 UnknownTransform). */
final case class UnknownTransform(raw: String) extends Transform {
  /** serialize the ORIGINAL name so metadata round-trips unchanged. */
  def name: String = raw
  def apply(v: Any, src: IceType): Any =
    throw new UnsupportedOperationException(s"Cannot apply unknown transform '$raw'")
  def column(c: Column, src: IceType): Column =
    throw new UnsupportedOperationException(s"Cannot apply unknown transform '$raw'")
  def resultType(src: IceType): IceType = IString
  def toHumanString(v: Any, src: IceType): String = String.valueOf(v)
  val preservesOrder = false
}

object Transform {
  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** Parse from the spec string form (ref: transforms.py parse_transform). */
  def parse(s: String): Transform = s match {
    case "identity" => IdentityTransform
    case "year" => YearTransform
    case "month" => MonthTransform
    case "day" => DayTransform
    case "hour" => HourTransform
    case "void" => VoidTransform
    case BucketRe(n) => BucketTransform(n.toInt)
    case TruncateRe(w) => TruncateTransform(w.toInt)
    case other => UnknownTransform(other)
  }
}
