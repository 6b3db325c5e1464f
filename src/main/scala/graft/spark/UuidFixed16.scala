package graft.spark

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport

/** WriteSupport that stores uuid columns as the spec's physical layout —
  * FIXED_LEN_BYTE_ARRAY(16) with the UUID logical annotation (ref
  * io/pyarrow.py:2145+ writes fixed[16]) — while Spark's row converters
  * keep emitting plain 16-byte binaries: parquet's column writers accept
  * `addBinary` for FLBA, so only the DECLARED message type needs
  * patching. The caller must present uuid values as 16-byte binary
  * columns (canonical-string → bytes happens in the staged projection).
  *
  * Tradeoff (documented in COVERAGE.md): files written this way read
  * back through the same BINARY-requesting readers as foreign fixed[16]
  * files — bounds, pruning and values are identical; the string-stored
  * layout remains the default because Spark's vectorized writer path
  * (df.write) cannot produce FLBA. */
class GraftUuidFixed16WriteSupport(uuidCols: Set[String]) extends ParquetWriteSupport {

  override def init(configuration: Configuration): WriteSupport.WriteContext = {
    val ctx = super.init(configuration)
    val patched = ctx.getSchema.getFields.asScala.map {
      case f if uuidCols.contains(f.getName) && f.isPrimitive =>
        val b = Types.primitive(
            PrimitiveType.PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY, f.getRepetition)
          .length(16).as(LogicalTypeAnnotation.uuidType())
        (if (f.getId != null) b.id(f.getId.intValue()) else b).named(f.getName)
      case f => f
    }
    new WriteSupport.WriteContext(
      new MessageType(ctx.getSchema.getName, patched.asJava), ctx.getExtraMetaData)
  }
}
