package graft.spark

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.hive.ql.exec.vector._
import org.apache.orc.{OrcFile, TypeDescription}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

import graft.core._
import graft.meta.MetadataJson

/** DSv2 row reader for ORC data files (the reference reads ORC:
  * io/pyarrow.py:1119–1125). Resolution mirrors the parquet Group-API
  * fallback: `iceberg.id` type attributes first (ORC_FIELD_ID_KEY
  * io/pyarrow.py:740), then top-level name; unresolved fields null-fill.
  * Decoding drives ORC's own vectorized RecordReader with a column
  * `include` mask (only requested columns are decompressed) and walks the
  * VectorizedRowBatch row-wise into InternalRow — the same
  * batch-decode/row-emit shape as GraftVectorizedRowReader, so it mixes
  * freely with the other row-mode readers in one scan.
  *
  * ORC files enter a table only through add_files (our writer is parquet,
  * like the reference's), so they carry no applicable delete files — the
  * library face enforces that at registration/scan; the factory rejects
  * delete-bearing ORC partitions with the same error. */
class GraftOrcPartitionReader(path: String, schemaJson: String, limit: Long = -1L,
    conf: Configuration = new Configuration())
    extends PartitionReader[InternalRow] {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val schema: Schema = MetadataJson.schemaFromJson(mapper.readTree(schemaJson))

  private val reader = OrcFile.createReader(new Path(path),
    OrcFile.readerOptions(conf).useUTCTimestamp(true))
  private val fileSchema: TypeDescription = reader.getSchema
  require(fileSchema.getCategory == TypeDescription.Category.STRUCT,
    s"ORC file $path has a non-struct root schema")

  /** (output index, root-child column index or None, type). */
  private case class FieldPlan(outIdx: Int, colIdx: Option[Int], t: IceType)

  private val plans: Seq[FieldPlan] = {
    val names = fileSchema.getFieldNames
    val children = fileSchema.getChildren
    def idOf(td: TypeDescription): Option[Int] =
      Option(td.getAttributeValue("iceberg.id"))
        .flatMap(v => scala.util.Try(v.toInt).toOption)
    schema.fields.zipWithIndex.map { case (f, i) =>
      var hit = -1
      var nameHit = -1
      var c = 0
      while (c < names.size()) {
        if (idOf(children.get(c)).contains(f.id)) hit = c
        if (names.get(c) == f.name && nameHit < 0) nameHit = c
        c += 1
      }
      FieldPlan(i, Some(if (hit >= 0) hit else nameHit).filter(_ >= 0), f.fieldType)
    }
  }

  private val rows = {
    // decompress only the requested subtrees (count-style scans keep just
    // the root: ORC row iteration needs no data column)
    val include = new Array[Boolean](fileSchema.getMaximumId + 1)
    include(0) = true
    plans.flatMap(_.colIdx).foreach { c =>
      val td = fileSchema.getChildren.get(c)
      (td.getId to td.getMaximumId).foreach(i => include(i) = true)
    }
    reader.rows(reader.options().include(include))
  }
  private val batch: VectorizedRowBatch = fileSchema.createRowBatch()
  private var batchPos = 0
  private var emitted = 0L

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (batchPos >= batch.size) {
      if (!rows.nextBatch(batch)) return false
      batchPos = 0
    }
    true
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(plans.size)
    val r = batchPos
    plans.foreach { p =>
      p.colIdx match {
        case None => row.update(p.outIdx, null)
        case Some(c) => row.update(p.outIdx, convert(batch.cols(c), r, p.t))
      }
    }
    batchPos += 1
    emitted += 1
    row
  }

  private def convert(v: ColumnVector, r: Int, t: IceType): Any = {
    val i = if (v.isRepeating) 0 else r
    if (!v.noNulls && v.isNull(i)) return null
    (v, t) match {
      case (lv: LongColumnVector, IBoolean) => lv.vector(i) != 0L
      case (lv: LongColumnVector, IInt | IDate) => lv.vector(i).toInt
      case (lv: LongColumnVector, ILong | ITime) => lv.vector(i)
      case (dv: DoubleColumnVector, IFloat) => dv.vector(i).toFloat
      case (dv: DoubleColumnVector, IDouble) => dv.vector(i)
      case (bv: BytesColumnVector, IString) =>
        UTF8String.fromBytes(bv.vector(i), bv.start(i), bv.length(i))
      case (bv: BytesColumnVector, IUUID) =>
        val b = java.util.Arrays.copyOfRange(bv.vector(i), bv.start(i),
          bv.start(i) + bv.length(i))
        UTF8String.fromString(
          if (b.length == 16) Conversions.fromBytes(IUUID, b).toString
          else new String(b, java.nio.charset.StandardCharsets.UTF_8))
      case (bv: BytesColumnVector, IBinary | IFixed(_)) =>
        java.util.Arrays.copyOfRange(bv.vector(i), bv.start(i), bv.start(i) + bv.length(i))
      case (dv: DecimalColumnVector, IDecimal(p, s)) =>
        Decimal(dv.vector(i).getHiveDecimal.bigDecimalValue.setScale(s), p, s)
      case (tv: TimestampColumnVector, ITimestamp | ITimestamptz) =>
        // time = epoch millis, nanos = full nanos-of-second
        Math.floorDiv(tv.getTime(i), 1000L) * 1000000L + tv.getNanos(i) / 1000L
      case (lv: LongColumnVector, ITimestamp | ITimestamptz) => lv.vector(i)
      case (_, other) =>
        throw new UnsupportedOperationException(
          s"DSv2 ORC reader: $other over ${v.getClass.getSimpleName}")
    }
  }

  override def close(): Unit = { rows.close(); reader.close() }
}
