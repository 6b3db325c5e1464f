package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Iceberg single-value binary serialization (ref: pyiceberg/conversions.py;
  * Iceberg spec Appendix D "Single-value serialization").
  *
  * Used for stats bounds in manifests and default values in metadata.
  * Must be bit-exact: little-endian ints/longs/floats/doubles, UTF-8
  * strings, decimal unscaled big-endian, date as int days, time/timestamp
  * as long micros.
  */
object Conversions {

  def toBytes(t: IceType, v: Any): Array[Byte] = t match {
    case IBoolean => Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0)
    case IInt | IDate =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v.asInstanceOf[Number].intValue()).array()
    case ILong | ITime | ITimestamp | ITimestamptz =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(v.asInstanceOf[Number].longValue()).array()
    // ns types serialize the spec-exact nanosecond long; engine-internal
    // values are micros (the read-side downcast domain), so scale up
    case ITimestampNs | ITimestamptzNs =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(Math.multiplyExact(v.asInstanceOf[Number].longValue(), 1000L)).array()
    case IFloat =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putFloat(v.asInstanceOf[Number].floatValue()).array()
    case IDouble =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putDouble(v.asInstanceOf[Number].doubleValue()).array()
    case IString => v.toString.getBytes(StandardCharsets.UTF_8)
    case IUUID =>
      val u = java.util.UUID.fromString(v.toString)
      ByteBuffer.allocate(16).putLong(u.getMostSignificantBits)
        .putLong(u.getLeastSignificantBits).array()
    // v3 geometry/geography single values are WKB — raw bytes, same as
    // binary (foreign manifests may carry bounding-box point bounds)
    case IBinary | IFixed(_) | IGeometry(_) | IGeography(_, _) => v.asInstanceOf[Array[Byte]]
    case IDecimal(_, _) => v.asInstanceOf[java.math.BigDecimal].unscaledValue().toByteArray
    case other => throw new IllegalArgumentException(s"Cannot serialize $other")
  }

  def fromBytes(t: IceType, b: Array[Byte]): Any = t match {
    case IBoolean => b(0) != 0
    case IInt | IDate => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
    case ILong | ITime | ITimestamp | ITimestamptz =>
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong
    // decode boundary of the ns→us downcast: manifest stats and partition
    // values written in nanos enter the engine as micros. floorDiv keeps
    // bounds sound for the AS-SERVED (downcast) data: floor is monotone,
    // so min/max of served values = floorDiv of the stored ns min/max.
    case ITimestampNs | ITimestamptzNs =>
      Math.floorDiv(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong, 1000L)
    case IFloat => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getFloat
    case IDouble => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getDouble
    case IString => new String(b, StandardCharsets.UTF_8)
    case IUUID =>
      val bb = ByteBuffer.wrap(b)
      new java.util.UUID(bb.getLong, bb.getLong).toString
    case IBinary | IFixed(_) | IGeometry(_) | IGeography(_, _) => b
    case IDecimal(_, scale) =>
      new java.math.BigDecimal(new java.math.BigInteger(b), scale)
    case other => throw new IllegalArgumentException(s"Cannot deserialize $other")
  }

  /** Parse a partition-path string value back to the internal value
    * (ref: conversions.py:112 partition_to_py). */
  def fromPartitionString(t: IceType, s: String): Any = {
    if (s == null || s == "null" || s == "__HIVE_DEFAULT_PARTITION__") return null
    t match {
      case IBoolean => s.toBoolean
      case IInt => s.toInt
      case ILong => s.toLong
      case IFloat => s.toFloat
      case IDouble => s.toDouble
      case IString => s
      case IDate => java.time.LocalDate.parse(s).toEpochDay.toInt
      case ITimestamp | ITimestamptz | ITimestampNs | ITimestamptzNs =>
        Literals.parseTsMicros(s)
      case IDecimal(_, scale) => new java.math.BigDecimal(s).setScale(scale)
      case IUUID => // canonical lowercase; malformed values kept raw
        try java.util.UUID.fromString(s).toString
        catch { case _: IllegalArgumentException => s }
      case IBinary | IFixed(_) => s.getBytes(StandardCharsets.UTF_8)
      case other => throw new IllegalArgumentException(s"Cannot parse partition value for $other")
    }
  }
}
