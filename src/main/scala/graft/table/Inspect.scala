package graft.table

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.core._
import graft.meta._

/** Metadata tables (ref: pyiceberg/table/inspect.py) — each is a DataFrame
  * built from a driver-side metadata walk; `partitions` is a real
  * groupBy over the entries (ref inspect.py:329's accumulation loop
  * becomes a Spark aggregation).
  */
final class Inspect(table: IceTable) {
  private def spark = table.spark
  private def m = table.metadata

  private def df(rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  /** ref: inspect.py:68 */
  def snapshots(): DataFrame = {
    val schema = StructType(Seq(
      StructField("committed_at", TimestampType),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("parent_id", LongType),
      StructField("operation", StringType),
      StructField("manifest_list", StringType),
      StructField("summary", MapType(StringType, StringType))))
    df(m.snapshots.map(s => Row(
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(s.timestampMs)),
      s.snapshotId, s.parentSnapshotId.map(Long.box).orNull, s.operation,
      s.manifestList, s.summary)), schema)
  }

  /** ref: inspect.py:233 */
  def refs(): DataFrame = {
    val schema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType),
      StructField("snapshot_id", LongType)))
    df(m.refs.toSeq.sortBy(_._1).map { case (n, r) =>
      Row(n, r.refType.toUpperCase, r.snapshotId) }, schema)
  }

  /** ref: inspect.py:519 — snapshot lineage with is_current_ancestor. */
  def history(): DataFrame = {
    val ancestors: Set[Long] = m.currentSnapshotId
      .map(id => m.ancestorsOf(id).map(_.snapshotId).toSet).getOrElse(Set.empty)
    val schema = StructType(Seq(
      StructField("made_current_at", TimestampType),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("parent_id", LongType),
      StructField("is_current_ancestor", BooleanType, nullable = false)))
    df(m.snapshotLog.map { e =>
      val snap = m.snapshotById(e.snapshotId)
      Row(java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(e.timestampMs)),
        e.snapshotId, snap.flatMap(_.parentSnapshotId).map(Long.box).orNull,
        ancestors.contains(e.snapshotId))
    }, schema)
  }

  /** ref: inspect.py:483 */
  def metadataLogEntries(): DataFrame = {
    val schema = StructType(Seq(
      StructField("timestamp", TimestampType),
      StructField("file", StringType)))
    df(m.metadataLog.map(e => Row(
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(e.timestampMs)),
      e.metadataFile)), schema)
  }

  /** ref: inspect.py:480 manifests of the current snapshot. */
  def manifests(): DataFrame = {
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("length", LongType, nullable = false),
      StructField("partition_spec_id", IntegerType, nullable = false),
      StructField("content", IntegerType, nullable = false),
      StructField("added_snapshot_id", LongType, nullable = false),
      StructField("added_data_files_count", IntegerType, nullable = false),
      StructField("existing_data_files_count", IntegerType, nullable = false),
      StructField("deleted_data_files_count", IntegerType, nullable = false),
      StructField("added_rows_count", LongType, nullable = false),
      StructField("existing_rows_count", LongType, nullable = false)))
    val rows = m.currentSnapshot.toSeq
      .flatMap(s => ManifestIO.readManifestList(s.manifestList))
      .map(mf => Row(mf.manifestPath, mf.manifestLength, mf.partitionSpecId, mf.content,
        mf.addedSnapshotId, mf.addedFilesCount, mf.existingFilesCount, mf.deletedFilesCount,
        mf.addedRowsCount, mf.existingRowsCount))
    df(rows, schema)
  }

  private def manifestsOf(snapshotId: Option[Long]): Seq[(Long, ManifestFile)] =
    snapshotId.map(id => m.snapshotById(id).getOrElse(
        throw new IllegalArgumentException(s"No snapshot $id")))
      .orElse(m.currentSnapshot).toSeq
      .flatMap(s => ManifestIO.readManifestList(s.manifestList).map(s.snapshotId -> _))

  /** One Row per LIVE manifest entry — a driver loop under the
    * distributed-planning threshold, a Spark job over the manifest list
    * past it (VERDICT r6 W2: `files()` with readable_metrics on a
    * 10⁶-file table is GBs of driver heap if rows build driver-side;
    * same fan-out seam as Scan.planFiles and the expiry walk). `build`
    * MUST capture only serializable metadata (schema, spec maps,
    * precomputed leaf/struct lists) — never `this`. */
  private def entryRowsDF(mfs: Seq[(Long, ManifestFile)], outSchema: StructType,
      build: (Long, ManifestFile, ManifestEntry) => Option[Row]): DataFrame = {
    val specsById = mfs.map(_._2.partitionSpecId).distinct
      .map(id => id -> m.specById(id)).toMap
    val mSchema = m.schema
    if (mfs.size < IceScan.distributedPlanningThreshold) {
      val rows = mfs.flatMap { case (sid, mf) =>
        ManifestIO.readManifest(mf.manifestPath, specsById(mf.partitionSpecId), mSchema)
          .filter(_.status != EntryStatus.Deleted)
          .flatMap(e => build(sid, mf, e))
      }
      df(rows, outSchema)
    } else {
      val ioEntries = Io.confEntries(spark)
      val sc = spark.sparkContext
      val rdd = sc.parallelize(mfs, math.min(mfs.size, sc.defaultParallelism))
        .flatMap { case (sid, mf) =>
          ManifestIO.readManifest(mf.manifestPath, specsById(mf.partitionSpecId), mSchema,
              Io.confFrom(ioEntries))
            .filter(_.status != EntryStatus.Deleted)
            .flatMap(e => build(sid, mf, e))
        }
      spark.createDataFrame(rdd, outSchema)
    }
  }

  // ---- readable_metrics machinery (ref: inspect.py:550 row builder,
  // :613 _get_files_schema) — per-LEAF stats decoded into typed structs,
  // keyed by dotted column path (struct members get their own entry).

  private def readableMetricsType: StructType = StructType(
    m.schema.leafColInfo.map { case (path, id, _) =>
      val t = m.schema.byId(id).fieldType
      StructField(path, StructType(Seq(
        StructField("column_size", LongType),
        StructField("value_count", LongType),
        StructField("null_value_count", LongType),
        StructField("nan_value_count", LongType),
        StructField("lower_bound", t.toSpark),
        StructField("upper_bound", t.toSpark))))
    })

  /** (leaf id, type) in readable_metrics column order — the serializable
    * input the static row builders take instead of `this`. */
  private def leafInfo: Seq[(Int, IceType)] =
    m.schema.leafColInfo.map { case (_, id, _) => (id, m.schema.byId(id).fieldType) }

  /** Union of every spec's partition fields, merged by name (first type
    * wins) — the `partition` struct column (ref: specs_struct
    * table/metadata.py; a file from an older spec leaves newer fields
    * null). */
  private lazy val specsStructFields: Seq[(String, IceType)] = {
    val seen = scala.collection.mutable.LinkedHashMap[String, IceType]()
    m.partitionSpecs.foreach(sp => sp.partitionType(m.schema).foreach { nf =>
      if (!seen.contains(nf.name)) seen += nf.name -> nf.fieldType
    })
    seen.toSeq
  }

  /** ref: inspect.py:682 files / :550 row builder; `snapshotId` selects a
    * historical snapshot like the reference's files(snapshot_id). */
  def files(content: Option[Int] = None, snapshotId: Option[Long] = None): DataFrame = {
    val partType = StructType(specsStructFields.map { case (n, t) =>
      StructField(n, t.toSpark) })
    val schema = StructType(Seq(
      StructField("content", IntegerType, nullable = false),
      StructField("file_path", StringType),
      StructField("file_format", StringType),
      StructField("spec_id", IntegerType, nullable = false),
      StructField("partition", partType),
      StructField("record_count", LongType, nullable = false),
      StructField("file_size_in_bytes", LongType, nullable = false),
      StructField("column_sizes", MapType(IntegerType, LongType)),
      StructField("value_counts", MapType(IntegerType, LongType)),
      StructField("null_value_counts", MapType(IntegerType, LongType)),
      StructField("nan_value_counts", MapType(IntegerType, LongType)),
      StructField("lower_bounds", MapType(IntegerType, BinaryType)),
      StructField("upper_bounds", MapType(IntegerType, BinaryType)),
      StructField("key_metadata", BinaryType),
      StructField("split_offsets", ArrayType(LongType)),
      StructField("equality_ids", ArrayType(IntegerType)),
      StructField("sort_order_id", IntegerType),
      StructField("readable_metrics", readableMetricsType)))
    // serializable captures only — the build closure may run on executors
    val structFields = specsStructFields
    val leaves = leafInfo
    val typesById: Map[Int, IceType] = m.schema.byId.map { case (id, f) => id -> f.fieldType }
    val specNames: Map[Int, Seq[String]] =
      m.partitionSpecs.map(sp => sp.specId -> sp.fields.map(_.name)).toMap
    val cont = content
    entryRowsDF(manifestsOf(snapshotId), schema, (_, mf, e) => {
      val f = e.dataFile
      if (!cont.forall(_ == f.content)) None
      else Some(Row(f.content, f.filePath, f.fileFormat, mf.partitionSpecId,
        Inspect.partitionRow(structFields, specNames(mf.partitionSpecId), f.partition),
        f.recordCount, f.fileSizeInBytes,
        f.columnSizes, f.valueCounts, f.nullValueCounts, f.nanValueCounts,
        Inspect.boundsBytes(typesById, f.lowerBounds),
        Inspect.boundsBytes(typesById, f.upperBounds),
        null,
        if (f.splitOffsets.isEmpty) null else f.splitOffsets,
        if (f.equalityIds.isEmpty) null else f.equalityIds,
        f.sortOrderId.map(Int.box).orNull,
        Inspect.metricsRow(leaves, f)))
    })
  }

  def dataFiles(snapshotId: Option[Long] = None): DataFrame =
    files(Some(FileContent.Data), snapshotId)
  def deleteFiles(snapshotId: Option[Long] = None): DataFrame =
    files(Some(FileContent.PositionDeletes), snapshotId)

  /** The CONTENT of position deletes at the current (or given) snapshot —
    * one row per deleted (data-file path, position), decoded from BOTH
    * position-delete parquet files and v3 deletion vectors. Beyond the
    * reference (inspect.py has no position_deletes table); the shape
    * follows the Iceberg spec's metadata table of the same name, minus
    * the optional `row` payload our writer never produces.
    *
    * Scale: parquet delete files are read as ONE distributed Spark scan
    * (delete_file_path recovered from the scan's `_metadata` column and
    * mapped to spec ids through a broadcast descriptor join); DV puffin
    * blobs decode executor-side from ranged reads. Only file-level
    * descriptors (path, spec, offset) touch the driver — same
    * metadata-sized collect as Scan.planFiles. */
  def positionDeletes(snapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val outSchema = StructType(Seq(
      StructField("file_path", StringType),
      StructField("pos", LongType, nullable = false),
      StructField("spec_id", IntegerType, nullable = false),
      StructField("delete_file_path", StringType)))
    // MINIMAL descriptors only — (path, format, offset, size, referenced,
    // spec) tuples, stats maps stripped during the manifest walk, so
    // driver memory is ∝ delete files × ~100 B (the same metadata-sized
    // collect as Scan.planFiles). Past the distributed-planning threshold
    // the walk itself runs as a Spark job over the manifest list.
    type Desc = (String, String, Long, Long, String, Int)
    def toDesc(e: ManifestEntry, sid: Int): Desc = {
      val f = e.dataFile
      (f.filePath, f.fileFormat, f.contentOffset.getOrElse(-1L),
        f.contentSizeInBytes.getOrElse(f.fileSizeInBytes),
        f.referencedDataFile.orNull, sid)
    }
    val mfs = manifestsOf(snapshotId).filter(_._2.content == 1)
    val specsById = mfs.map(_._2.partitionSpecId).distinct
      .map(id => id -> m.specById(id)).toMap
    val mSchema = m.schema
    val descs: Seq[Desc] =
      if (mfs.size < IceScan.distributedPlanningThreshold)
        mfs.flatMap { case (_, mf) =>
          ManifestIO.readManifest(mf.manifestPath, specsById(mf.partitionSpecId), mSchema)
            .filter(e => e.status != EntryStatus.Deleted &&
              e.dataFile.content == FileContent.PositionDeletes)
            .map(toDesc(_, mf.partitionSpecId))
        }
      else {
        val ioEntries = Io.confEntries(spark)
        val sc = spark.sparkContext
        sc.parallelize(mfs, math.min(mfs.size, sc.defaultParallelism))
          .flatMap { case (_, mf) =>
            ManifestIO.readManifest(mf.manifestPath, specsById(mf.partitionSpecId),
                mSchema, Io.confFrom(ioEntries))
              .filter(e => e.status != EntryStatus.Deleted &&
                e.dataFile.content == FileContent.PositionDeletes)
              .map(toDesc(_, mf.partitionSpecId))
          }.collect().toSeq
      }
    val (dvs, parquets) = descs.partition(_._2.equalsIgnoreCase("puffin"))
    def empty = df(Nil, outSchema)
    val fromParquet = if (parquets.isEmpty) empty else {
      val specDf = df(parquets.map { case (p, _, _, _, _, sid) =>
        Row(PathUtil.canon(p), sid) },
        StructType(Seq(StructField("delete_file_path", StringType),
          StructField("spec_id", IntegerType, nullable = false))))
      spark.read.parquet(parquets.map(_._1): _*)
        .select(col("file_path"), col("pos"),
          PathUtil.metaPathCol(col("_metadata.file_path")).as("delete_file_path"))
        .join(broadcast(specDf), Seq("delete_file_path"))
        .select(col("file_path"), col("pos"), col("spec_id"), col("delete_file_path"))
    }
    val fromDvs = if (dvs.isEmpty) empty else {
      val ioEntries = Io.confEntries(spark)
      val sc = spark.sparkContext
      val rdd = sc.parallelize(dvs, math.min(dvs.size, sc.defaultParallelism))
        .flatMap { case (pp, _, off, len, referenced, sid) =>
          DeletionVector.readPositions(pp, off, len, Io.confFrom(ioEntries))
            .map(pos => Row(referenced, pos, sid, pp))
        }
      spark.createDataFrame(rdd, outSchema)
    }
    fromParquet.unionByName(fromDvs)
      .orderBy(col("delete_file_path"), col("file_path"), col("pos"))
  }

  /** ref: inspect.py:106 entries (status + snapshot + file + metrics). */
  def entries(snapshotId: Option[Long] = None): DataFrame = {
    val schema = StructType(Seq(
      StructField("status", IntegerType, nullable = false),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("sequence_number", LongType, nullable = false),
      StructField("file_sequence_number", LongType, nullable = false),
      StructField("file_path", StringType),
      StructField("record_count", LongType, nullable = false),
      StructField("readable_metrics", readableMetricsType)))
    val leaves = leafInfo
    entryRowsDF(manifestsOf(snapshotId), schema, (_, _, e) =>
      Some(Row(e.status, e.snapshotId, e.dataSequenceNumber, e.fileSequenceNumber,
        e.dataFile.filePath, e.dataFile.recordCount,
        Inspect.metricsRow(leaves, e.dataFile))))
  }

  /** ref: inspect.py:691 all_manifests — manifests of every snapshot. */
  def allManifests(): DataFrame = {
    val schema = StructType(Seq(
      StructField("reference_snapshot_id", LongType, nullable = false),
      StructField("path", StringType),
      StructField("content", IntegerType, nullable = false),
      StructField("added_snapshot_id", LongType, nullable = false)))
    val rows = m.snapshots.flatMap { s =>
      ManifestIO.readManifestList(s.manifestList).map(mf =>
        Row(s.snapshotId, mf.manifestPath, mf.content, mf.addedSnapshotId))
    }
    df(rows, schema)
  }

  /** ref: inspect.py:682 all_files — files reachable from any snapshot. */
  def allFiles(): DataFrame = {
    val schema = StructType(Seq(
      StructField("snapshot_id", LongType, nullable = false),
      StructField("content", IntegerType, nullable = false),
      StructField("file_path", StringType),
      StructField("record_count", LongType, nullable = false)))
    val mfsAll = m.snapshots.flatMap(s =>
      ManifestIO.readManifestList(s.manifestList).map(s.snapshotId -> _))
    entryRowsDF(mfsAll, schema, (sid, _, e) =>
      Some(Row(sid, e.dataFile.content, e.dataFile.filePath,
        e.dataFile.recordCount))).distinct()
  }

  /** ref: inspect.py:725/:728 — all_files restricted by content kind. */
  def allDataFiles(): DataFrame =
    allFiles().filter(org.apache.spark.sql.functions.col("content") === FileContent.Data)
  def allDeleteFiles(): DataFrame =
    allFiles().filter(org.apache.spark.sql.functions.col("content") =!= FileContent.Data)

  /** ref: inspect.py:263 partitions — per-partition data/delete rollups as
    * a Spark aggregation over the entries. Full reference column parity
    * (data + position/equality-delete record and file counts, total data
    * size, last_updated_at/_snapshot_id); the partition itself is the path
    * STRING (`k=v/...`) rather than the reference's struct — one column
    * shape across specs. */
  /** Per-partition aggregation (ref inspect.py:263 — `snapshot_id` pins
    * the walked snapshot, `row_filter` prunes partitions through the
    * same inclusive projection + partition evaluator the scan planner
    * uses, so only partitions that COULD match contribute). */
  def partitions(snapshotId: Option[Long] = None,
      rowFilter: graft.core.Expr = graft.core.AlwaysTrue,
      caseSensitive: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions._
    val schema = StructType(Seq(
      StructField("partition", StringType),
      StructField("spec_id", IntegerType, nullable = false),
      StructField("content", IntegerType, nullable = false),
      StructField("record_count", LongType, nullable = false),
      StructField("file_size", LongType, nullable = false),
      StructField("committed_ms", LongType),
      StructField("snapshot_id", LongType)))
    val bound = graft.core.Exprs.rewriteNot(
      graft.core.Binder.bind(m.schema, rowFilter, caseSensitive))
    // serializable captures: projections and snapshot lineage precomputed
    // per spec / per snapshot (both metadata-sized), never `this`
    val mSchema = m.schema
    val specsLocal: Map[Int, PartitionSpec] =
      m.partitionSpecs.map(sp => sp.specId -> sp).toMap
    val projBySpec: Map[Int, graft.core.BoundExpr] = specsLocal.map { case (id, sp) =>
      id -> Evaluators.inclusiveProjection(mSchema, sp, bound) }
    val snapInfo: Map[Long, Long] = m.snapshots.map(s => s.snapshotId -> s.timestampMs).toMap
    val rowsDF = entryRowsDF(manifestsOf(snapshotId), schema, (_, mf, e) => {
      val sp = specsLocal(mf.partitionSpecId)
      if (!Evaluators.partitionMatches(sp, projBySpec(sp.specId), e.dataFile.partition)) None
      else Some(Row(Seq(sp.partitionToPath(e.dataFile.partition, mSchema), sp.specId) ++
        Inspect.statsTail(snapInfo, e): _*))
    })
    Inspect.partitionRollup(rowsDF, Seq(col("partition"), col("spec_id")),
      dataRecordName = "record_count", dataFileName = "file_count",
      extra = Nil,
      lastUpdated = timestamp_millis(max(col("committed_ms"))).as("last_updated_at"))
  }

  /** Spec-shaped PARTITION STATISTICS rows (Iceberg spec §Partition
    * Statistics file; ref models the registration side only,
    * table/statistics.py:46 PartitionStatisticsFile): one row per
    * partition tuple of the snapshot, with the spec's field names and a
    * TYPED unified partition struct (all specs' fields ordered by
    * partition field id, null where a file's spec lacks the field).
    * `total_record_count` is left null — an accurate post-delete count
    * needs a data read, and the spec marks it optional. The entry walk
    * distributes past the planning threshold like every inspect table;
    * the aggregation is a Spark groupBy, so 10⁶ partitions never
    * build on the driver. */
  def partitionStatsFrame(snapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val unified: Seq[(Int, String, IceType)] = m.partitionSpecs
      .flatMap(sp => sp.fields.flatMap(pf =>
        m.schema.byId.get(pf.sourceId).map(src =>
          (pf.fieldId, pf.name, pf.transform.resultType(src.fieldType)))))
      .distinctBy(_._1).sortBy(_._1)
    val partType = StructType(unified.map { case (_, n, t) =>
      StructField(n, t.toSpark, nullable = true) })
    val entrySchema = StructType(Seq(
      StructField("partition", partType),
      StructField("spec_id", IntegerType, nullable = false),
      StructField("content", IntegerType, nullable = false),
      StructField("record_count", LongType, nullable = false),
      StructField("file_size", LongType, nullable = false),
      StructField("committed_ms", LongType),
      StructField("snapshot_id", LongType)))
    val specsLocal: Map[Int, PartitionSpec] =
      m.partitionSpecs.map(sp => sp.specId -> sp).toMap
    val unifiedIds = unified.map(_._1)
    val unifiedTypes = unified.map(t => t._1 -> t._3).toMap
    val snapInfo: Map[Long, Long] = m.snapshots.map(s => s.snapshotId -> s.timestampMs).toMap
    val rowsDF = entryRowsDF(manifestsOf(snapshotId), entrySchema, (_, mf, e) => {
      val sp = specsLocal(mf.partitionSpecId)
      val byFieldId = sp.fields.map(_.fieldId).zip(e.dataFile.partition).toMap
      val tuple = Row(unifiedIds.map(id =>
        byFieldId.get(id).map(v =>
          Inspect.externalValue(unifiedTypes(id), v)).orNull): _*)
      Some(Row(Seq(tuple, sp.specId) ++ Inspect.statsTail(snapInfo, e): _*))
    })
    // one row per UNIFIED partition tuple: after spec evolution, files of
    // different specs can unify to the SAME tuple (dropped field → null);
    // grouping by (partition, spec_id) would emit duplicate tuples in the
    // stats file, so the tuple alone is the key and spec_id reports the
    // newest spec that contributed files
    Inspect.partitionRollup(rowsDF, Seq(col("partition")),
      dataRecordName = "data_record_count", dataFileName = "data_file_count",
      extra = Seq(lit(null).cast(LongType).as("total_record_count")),
      lastUpdated = max(col("committed_ms")).as("last_updated_at"),
      leadCols = Seq(max(col("spec_id")).as("spec_id")))
  }
}

/** Static row builders for the metadata tables — free of any reference to
  * the table handle so `entryRowsDF`'s build closures can run on
  * executors (the distributed path past the planning threshold). */
private[table] object Inspect {

  /** Shared (content, record_count, file_size, committed_ms, snapshot_id)
    * row tail for the per-partition rollups. */
  def statsTail(snapInfo: Map[Long, Long], e: graft.meta.ManifestEntry): Seq[Any] = Seq(
    e.dataFile.content, e.dataFile.recordCount, e.dataFile.fileSizeInBytes,
    snapInfo.get(e.snapshotId).map(Long.box).orNull,
    if (snapInfo.contains(e.snapshotId)) Long.box(e.snapshotId) else null)

  /** Shared data/delete rollup for `partitions()` and
    * `partitionStatsFrame` — ONE copy of the eight content-conditional
    * aggregates so a fix to delete counting can't silently miss one of
    * the two faces. `leadCols` land right after the group keys (the
    * stats file's spec-ordered `spec_id` column); `extra` between the
    * delete counts and the last-updated pair. */
  def partitionRollup(rows: org.apache.spark.sql.DataFrame,
      keys: Seq[org.apache.spark.sql.Column], dataRecordName: String,
      dataFileName: String, extra: Seq[org.apache.spark.sql.Column],
      lastUpdated: org.apache.spark.sql.Column,
      leadCols: Seq[org.apache.spark.sql.Column] = Nil): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    def ifContent(c: Int, v: org.apache.spark.sql.Column) =
      sum(when(col("content") === c, v).otherwise(0L))
    val aggs = leadCols ++ Seq(
      ifContent(FileContent.Data, col("record_count")).as(dataRecordName),
      ifContent(FileContent.Data, lit(1L)).cast("int").as(dataFileName),
      ifContent(FileContent.Data, col("file_size")).as("total_data_file_size_in_bytes"),
      ifContent(FileContent.PositionDeletes, col("record_count"))
        .as("position_delete_record_count"),
      ifContent(FileContent.PositionDeletes, lit(1L)).cast("int")
        .as("position_delete_file_count"),
      ifContent(FileContent.EqualityDeletes, col("record_count"))
        .as("equality_delete_record_count"),
      ifContent(FileContent.EqualityDeletes, lit(1L)).cast("int")
        .as("equality_delete_file_count")) ++ extra ++ Seq(
      lastUpdated,
      max_by(col("snapshot_id"), col("committed_ms")).as("last_updated_snapshot_id"))
    rows.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** internal repr → external JVM value createDataFrame accepts. */
  def externalValue(t: IceType, v: Any): Any = v match {
    case null => null
    case _ => t match {
      case IDate => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
        v.asInstanceOf[Int].toLong))
      case ITimestamp | ITimestampNs => java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(v.asInstanceOf[Long], 1000000L),
        (Math.floorMod(v.asInstanceOf[Long], 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      case ITimestamptz | ITimestamptzNs =>
        val us = v.asInstanceOf[Long]
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
      case _ => v
    }
  }

  /** readable_metrics struct row (ref: inspect.py:550 row builder). */
  def metricsRow(leaves: Seq[(Int, IceType)], f: DataFile): Row = Row(
    leaves.map { case (id, t) =>
      Row(
        f.columnSizes.get(id).map(Long.box).orNull,
        f.valueCounts.get(id).map(Long.box).orNull,
        f.nullValueCounts.get(id).map(Long.box).orNull,
        f.nanValueCounts.get(id).map(Long.box).orNull,
        externalValue(t, f.lowerBounds.getOrElse(id, null)),
        externalValue(t, f.upperBounds.getOrElse(id, null)))
    }: _*)

  /** Partition tuple → merged-by-name specs struct (older-spec files
    * leave newer fields null). */
  def partitionRow(structFields: Seq[(String, IceType)], specFieldNames: Seq[String],
      values: Seq[Any]): Row = {
    val byName = specFieldNames.zip(values).toMap
    Row(structFields.map { case (n, t) =>
      externalValue(t, byName.getOrElse(n, null)) }: _*)
  }

  def boundsBytes(typesById: Map[Int, IceType],
      bounds: Map[Int, Any]): Map[Int, Array[Byte]] =
    bounds.flatMap { case (id, v) =>
      typesById.get(id).map(t => id -> Conversions.toBytes(t, v)) }
}
