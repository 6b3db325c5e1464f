package graft.meta

import graft.core._

/** Manifest-layer model (ref: pyiceberg/manifest.py).
  *
  * Bounds and partition values are kept as decoded Iceberg internal values
  * in memory (dates = epoch days Int, timestamps = epoch micros Long,
  * decimals = java BigDecimal); the Avro manifest codec serializes them
  * with the spec's single-value binary encoding (Conversions).
  */
object FileContent {
  val Data = 0
  val PositionDeletes = 1
  val EqualityDeletes = 2
}

object EntryStatus {
  val Existing = 0
  val Added = 1
  val Deleted = 2
}

final case class DataFile(
    content: Int,
    filePath: String,
    fileFormat: String,
    /** positional, aligned with the spec's partition fields. */
    partition: Seq[Any],
    recordCount: Long,
    fileSizeInBytes: Long,
    valueCounts: Map[Int, Long] = Map.empty,
    nullValueCounts: Map[Int, Long] = Map.empty,
    nanValueCounts: Map[Int, Long] = Map.empty,
    lowerBounds: Map[Int, Any] = Map.empty,
    upperBounds: Map[Int, Any] = Map.empty,
    columnSizes: Map[Int, Long] = Map.empty,
    splitOffsets: Seq[Long] = Nil,
    sortOrderId: Option[Int] = None,
    specId: Int = 0,
    /** field ids of the equality columns (content=EqualityDeletes only). */
    equalityIds: Seq[Int] = Nil,
    /** deletion vectors only (v3): the single data file this DV applies to,
      * plus the blob's byte range inside the puffin file
      * (ref: manifest.py:413–430). */
    referencedDataFile: Option[String] = None,
    contentOffset: Option[Long] = None,
    contentSizeInBytes: Option[Long] = None,
    /** v3 row lineage (spec field 142): the _row_id of this file's first
      * row. None = inherit from the manifest (manifest.firstRowId +
      * record counts of preceding ADDED files). */
    firstRowId: Option[Long] = None) {
  /** True for a v3 deletion-vector entry (puffin-format position deletes). */
  def isDeletionVector: Boolean =
    content == FileContent.PositionDeletes && fileFormat.equalsIgnoreCase("puffin")
}

final case class ManifestEntry(
    status: Int,
    snapshotId: Long,
    dataSequenceNumber: Long,
    fileSequenceNumber: Long,
    dataFile: DataFile)

/** Per-partition-field summary in the manifest list
  * (ref: manifest.py:653 PartitionFieldSummary). */
final case class FieldSummary(
    containsNull: Boolean,
    containsNan: Option[Boolean],
    lowerBound: Option[Any],
    upperBound: Option[Any])

final case class ManifestFile(
    manifestPath: String,
    manifestLength: Long,
    partitionSpecId: Int,
    content: Int, // 0=data, 1=deletes
    sequenceNumber: Long,
    minSequenceNumber: Long,
    addedSnapshotId: Long,
    addedFilesCount: Int,
    existingFilesCount: Int,
    deletedFilesCount: Int,
    addedRowsCount: Long,
    existingRowsCount: Long,
    deletedRowsCount: Long,
    partitions: Seq[FieldSummary] = Nil,
    /** v3 row lineage (spec field 520): starting _row_id assigned to this
      * data manifest; entries with null first_row_id inherit from it. */
    firstRowId: Option[Long] = None)

final case class PartitionField(sourceId: Int, fieldId: Int, name: String, transform: Transform)

final case class PartitionSpec(specId: Int, fields: Seq[PartitionField]) {
  def isUnpartitioned: Boolean = fields.isEmpty
  /** Schema for partition tuples: field ids are the partition field ids. */
  def partitionType(schema: Schema): Seq[NestedField] = fields.map { pf =>
    val src = schema.byId(pf.sourceId)
    NestedField(pf.fieldId, pf.name, pf.transform.resultType(src.fieldType))
  }
  /** `k1=v1/k2=v2` partition path (ref: partitioning.py:238). */
  def partitionToPath(values: Seq[Any], schema: Schema): String =
    fields.zip(values).map { case (pf, v) =>
      val src = schema.byId(pf.sourceId)
      val human = pf.transform.toHumanString(v, src.fieldType)
      s"${java.net.URLEncoder.encode(pf.name, "UTF-8")}=${java.net.URLEncoder.encode(human, "UTF-8")}"
    }.mkString("/")
}

object PartitionSpec {
  val Unpartitioned: PartitionSpec = PartitionSpec(0, Nil)
  /** Partition field ids start at 1000 (Iceberg spec). */
  val StartFieldId = 1000

  def build(schema: Schema, specId: Int, fields: (String, Transform, String)*): PartitionSpec = {
    val pfs = fields.zipWithIndex.map { case ((srcName, t, name), i) =>
      val src = schema.findField(srcName).getOrElse(
        throw new IllegalArgumentException(s"No such column: $srcName"))
      PartitionField(src.id, StartFieldId + i, name, t)
    }
    PartitionSpec(specId, pfs)
  }
}
