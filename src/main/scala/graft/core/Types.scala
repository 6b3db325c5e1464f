package graft.core

import org.apache.spark.sql.types._

/** Iceberg type system → Spark SQL mapping.
  *
  * Mirrors the reference's types (ref: pyiceberg/types.py:691-930) and the
  * mapping table in SURVEY.md §1.2. Field-ids ride in Spark StructField
  * metadata under both our key and `parquet.field.id` so Spark's parquet
  * reader/writer resolves columns BY ID (the reference's core semantic,
  * ref: pyiceberg/schema.py — resolution by id, not name).
  */
sealed trait IceType {
  /** Iceberg JSON type name (spec). */
  def repr: String
  def toSpark: DataType
  def isPrimitive: Boolean = true
}

case object IBoolean extends IceType { val repr = "boolean"; val toSpark = BooleanType }
case object IInt extends IceType { val repr = "int"; val toSpark = IntegerType }
case object ILong extends IceType { val repr = "long"; val toSpark = LongType }
case object IFloat extends IceType { val repr = "float"; val toSpark = FloatType }
case object IDouble extends IceType { val repr = "double"; val toSpark = DoubleType }
case class IDecimal(precision: Int, scale: Int) extends IceType {
  val repr = s"decimal($precision, $scale)"
  val toSpark = DecimalType(precision, scale)
}
case object IDate extends IceType { val repr = "date"; val toSpark = DateType }
/** Micros since midnight; no direct Spark type — surfaced as long (SURVEY §1.2). */
case object ITime extends IceType { val repr = "time"; val toSpark = LongType }
/** Micros, no zone (ref types.py:828). */
case object ITimestamp extends IceType { val repr = "timestamp"; val toSpark = TimestampNTZType }
/** Micros, UTC-adjusted (ref types.py:844). */
case object ITimestamptz extends IceType { val repr = "timestamptz"; val toSpark = TimestampType }
/** v3 nanos, no zone (ref types.py:860 TimestampNanoType). READ-ONLY in
  * this engine: Spark has no nanosecond timestamp, so scans downcast
  * ns→us exactly as the reference's arrow reader does for v1/v2 files
  * (io/pyarrow.py:1654 downcast_ns_timestamp_to_us); everything
  * engine-internal (literals, stats, partition values) is normalized to
  * the MICROsecond domain at the decode boundary. Writes reject typed. */
case object ITimestampNs extends IceType { val repr = "timestamp_ns"; val toSpark = TimestampNTZType }
/** v3 nanos, UTC-adjusted (ref types.py:879) — same read-only downcast. */
case object ITimestamptzNs extends IceType { val repr = "timestamptz_ns"; val toSpark = TimestampType }
case object IString extends IceType { val repr = "string"; val toSpark = StringType }
/** v3 `unknown` (ref types.py:946 UnknownType): a column whose values are
  * all null — used when a type is not known at write time; promotable to
  * any primitive. Data files never store it; scans project NULL and
  * writes drop the column from the physical file. */
case object IUnknown extends IceType { val repr = "unknown"; val toSpark = NullType }
/** v3 geometry (ref types.py:965 GeometryType): WKB bytes at runtime —
  * the reference's arrow mapping without geoarrow is plain large_binary
  * (io/pyarrow.py:825), which is exactly Spark BinaryType here. The CRS
  * rides in the type string only. */
case class IGeometry(crs: String = "OGC:CRS84") extends IceType {
  val repr: String = if (crs == "OGC:CRS84") "geometry" else s"geometry('$crs')"
  val toSpark = BinaryType
}
/** v3 geography (ref types.py:1031 GeographyType): WKB bytes; CRS +
  * edge-interpolation algorithm ride in the type string. */
case class IGeography(crs: String = "OGC:CRS84", algorithm: String = "spherical")
    extends IceType {
  val repr: String =
    if (crs == "OGC:CRS84" && algorithm == "spherical") "geography"
    else if (algorithm == "spherical") s"geography('$crs')"
    else s"geography('$crs', '$algorithm')"
  val toSpark = BinaryType
}
/** Deliberate deviation from the reference (io/pyarrow.py stores UUID as
  * parquet fixed[16]): Spark's parquet writer cannot emit
  * FIXED_LEN_BYTE_ARRAY for non-decimal columns, so UUID DATA columns are
  * stored as canonical strings. Manifest/metadata single-value encoding
  * stays spec-exact 16-byte big-endian (Conversions.toBytes), so bounds,
  * partition values and pruning are cross-engine correct. */
case object IUUID extends IceType { val repr = "uuid"; val toSpark = StringType }
case object IBinary extends IceType { val repr = "binary"; val toSpark = BinaryType }
case class IFixed(length: Int) extends IceType {
  val repr = s"fixed[$length]"; val toSpark = BinaryType
}

final case class NestedField(
    id: Int,
    name: String,
    fieldType: IceType,
    required: Boolean = false,
    doc: Option[String] = None,
    initialDefault: Option[Any] = None,
    writeDefault: Option[Any] = None)

case class IStruct(fields: Seq[NestedField]) extends IceType {
  val repr = "struct"
  override def isPrimitive = false
  def toSpark: DataType = StructType(fields.map(SchemaConv.toSparkField))
}
case class IList(elementId: Int, element: IceType, elementRequired: Boolean) extends IceType {
  val repr = "list"
  override def isPrimitive = false
  def toSpark: DataType = ArrayType(element.toSpark, containsNull = !elementRequired)
}
case class IMap(keyId: Int, key: IceType, valueId: Int, value: IceType, valueRequired: Boolean)
    extends IceType {
  val repr = "map"
  override def isPrimitive = false
  def toSpark: DataType = MapType(key.toSpark, value.toSpark, valueContainsNull = !valueRequired)
}

object SchemaConv {
  val FieldIdKey = "iceberg.field-id"
  val ParquetFieldIdKey = "parquet.field.id"

  def toSparkField(f: NestedField): StructField = {
    val md = new MetadataBuilder()
      .putLong(FieldIdKey, f.id.toLong)
      .putLong(ParquetFieldIdKey, f.id.toLong)
    f.doc.foreach(d => md.putString("comment", d))
    StructField(f.name, f.fieldType.toSpark, nullable = !f.required, md.build())
  }

  def fieldId(sf: StructField): Option[Int] =
    if (sf.metadata.contains(FieldIdKey)) Some(sf.metadata.getLong(FieldIdKey).toInt)
    else if (sf.metadata.contains(ParquetFieldIdKey)) Some(sf.metadata.getLong(ParquetFieldIdKey).toInt)
    else None

  /** Spark type → Iceberg type, assigning ids from the supplied counter for
    * nested ids (used when creating a table from an existing DataFrame;
    * ref: schema.py:1316 assign_fresh_schema_ids). */
  def fromSpark(dt: DataType, nextId: () => Int): IceType = dt match {
    case BooleanType => IBoolean
    case IntegerType | ShortType | ByteType => IInt
    case LongType => ILong
    case FloatType => IFloat
    case DoubleType => IDouble
    case d: DecimalType => IDecimal(d.precision, d.scale)
    case DateType => IDate
    case TimestampNTZType => ITimestamp
    case TimestampType => ITimestamptz
    case StringType => IString
    case BinaryType => IBinary
    case st: StructType =>
      IStruct(st.fields.toSeq.map { sf =>
        val id = nextId()
        NestedField(id, sf.name, fromSpark(sf.dataType, nextId), required = !sf.nullable)
      })
    case at: ArrayType =>
      val id = nextId()
      IList(id, fromSpark(at.elementType, nextId), elementRequired = !at.containsNull)
    case mt: MapType =>
      val kid = nextId(); val vid = nextId()
      IMap(kid, fromSpark(mt.keyType, nextId), vid, fromSpark(mt.valueType, nextId),
        valueRequired = !mt.valueContainsNull)
    case other => throw new IllegalArgumentException(s"Unsupported Spark type: $other")
  }

  /** Type promotion rules (ref: schema.py:1647 promote): int→long,
    * float→double, decimal precision widening (same scale), fixed→binary. */
  def promotable(from: IceType, to: IceType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    // v3 spec: unknown promotes to any primitive (ref io/pyarrow.py:819)
    case (IUnknown, t) if t.isPrimitive && t != IUnknown => true
    case (IInt, ILong) => true
    case (IFloat, IDouble) => true
    case (IDecimal(p1, s1), IDecimal(p2, s2)) => s1 == s2 && p2 >= p1
    case (IFixed(_), IBinary) => true
    case (IString, IBinary) => true
    case (IBinary, IString) => true
    case _ => false
  }
}
