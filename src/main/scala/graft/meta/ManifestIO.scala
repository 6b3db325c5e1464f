package graft.meta

import java.io.File
import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

import graft.core._

/** Avro manifest + manifest-list reader/writer
  * (ref: pyiceberg/manifest.py:783 ManifestFile, :1045 ManifestWriter,
  * :1305 manifest-list writers; avro/file.py).
  *
  * Spec-shaped v2 layout: entries carry status/snapshot/sequence numbers
  * and a data_file struct whose partition is a typed struct per spec and
  * whose stats maps are int-keyed arrays of key/value with bounds in the
  * single-value binary encoding (Conversions).
  */
object ManifestIO {

  // ---- avro schema construction ----

  private def avroPrim(t: IceType): AvroSchema = t match {
    case IBoolean => AvroSchema.create(AvroSchema.Type.BOOLEAN)
    case IInt | IDate => AvroSchema.create(AvroSchema.Type.INT)
    case ILong | ITime | ITimestamp | ITimestamptz => AvroSchema.create(AvroSchema.Type.LONG)
    case IFloat => AvroSchema.create(AvroSchema.Type.FLOAT)
    case IDouble => AvroSchema.create(AvroSchema.Type.DOUBLE)
    case IString | IUUID => AvroSchema.create(AvroSchema.Type.STRING)
    case IBinary | IFixed(_) | IDecimal(_, _) => AvroSchema.create(AvroSchema.Type.BYTES)
    case other => throw new IllegalArgumentException(s"No avro mapping for $other")
  }

  private def nullable(s: AvroSchema): AvroSchema =
    AvroSchema.createUnion(AvroSchema.create(AvroSchema.Type.NULL), s)

  /** Tag a field with the Iceberg `field-id` prop — the channel foreign
    * readers (Java Iceberg, pyiceberg schema_conversion.py:94) resolve by,
    * independent of version-specific field names. */
  private def withId(f: AvroSchema.Field, id: Int): AvroSchema.Field = {
    f.addProp("field-id", Integer.valueOf(id)); f
  }

  private def kvArray(name: String, valueType: AvroSchema.Type,
      keyId: Int, valueId: Int): AvroSchema = {
    val kv = AvroSchema.createRecord(name + "_kv", null, null, false, Seq(
      withId(new AvroSchema.Field("key", AvroSchema.create(AvroSchema.Type.INT), null, null), keyId),
      withId(new AvroSchema.Field("value", AvroSchema.create(valueType), null, null), valueId)).asJava)
    val arr = AvroSchema.createArray(kv)
    // map-encoded-as-array marker (ref: schema_conversion.py:428)
    arr.addProp("logicalType", "map")
    arr
  }

  private def longArray(elementId: Int): AvroSchema = {
    val arr = AvroSchema.createArray(AvroSchema.create(AvroSchema.Type.LONG))
    arr.addProp("element-id", Integer.valueOf(elementId)); arr
  }

  private def intArray(elementId: Int): AvroSchema = {
    val arr = AvroSchema.createArray(AvroSchema.create(AvroSchema.Type.INT))
    arr.addProp("element-id", Integer.valueOf(elementId)); arr
  }

  private def partitionSchema(spec: PartitionSpec, schema: Schema): AvroSchema = {
    if (spec.fields.isEmpty)
      return SchemaBuilder.record("r102").fields().endRecord()
    val fields = spec.partitionType(schema).map { nf =>
      withId(new AvroSchema.Field(sanitize(nf.name), nullable(avroPrim(nf.fieldType)),
        null, AvroSchema.Field.NULL_DEFAULT_VALUE), nf.id)
    }
    AvroSchema.createRecord("r102", null, null, false, fields.asJava)
  }

  /** Partition-struct field names must satisfy Avro naming rules; the
    * injective `_xHHHH` encoding (ref: schema.py:1384 make_compatible_name)
    * keeps exotic names (`day(ts)`, `a.b` vs `a_b`) collision-free in
    * manifests. */
  private def sanitize(n: String): String = graft.core.Schema.makeCompatibleName(n)

  private def dataFileSchema(spec: PartitionSpec, schema: Schema): AvroSchema = {
    // field ids per the spec's DATA_FILE_TYPE (ref: manifest.py:134-:316)
    val fields = Seq(
      withId(new AvroSchema.Field("content", AvroSchema.create(AvroSchema.Type.INT), null, null), 134),
      withId(new AvroSchema.Field("file_path", AvroSchema.create(AvroSchema.Type.STRING), null, null), 100),
      withId(new AvroSchema.Field("file_format", AvroSchema.create(AvroSchema.Type.STRING), null, null), 101),
      withId(new AvroSchema.Field("partition", partitionSchema(spec, schema), null, null), 102),
      withId(new AvroSchema.Field("record_count", AvroSchema.create(AvroSchema.Type.LONG), null, null), 103),
      withId(new AvroSchema.Field("file_size_in_bytes", AvroSchema.create(AvroSchema.Type.LONG), null, null), 104),
      withId(new AvroSchema.Field("column_sizes", nullable(kvArray("k117_v118", AvroSchema.Type.LONG, 117, 118)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 108),
      withId(new AvroSchema.Field("value_counts", nullable(kvArray("k119_v120", AvroSchema.Type.LONG, 119, 120)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 109),
      withId(new AvroSchema.Field("null_value_counts", nullable(kvArray("k121_v122", AvroSchema.Type.LONG, 121, 122)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 110),
      withId(new AvroSchema.Field("nan_value_counts", nullable(kvArray("k138_v139", AvroSchema.Type.LONG, 138, 139)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 137),
      withId(new AvroSchema.Field("lower_bounds", nullable(kvArray("k126_v127", AvroSchema.Type.BYTES, 126, 127)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 125),
      withId(new AvroSchema.Field("upper_bounds", nullable(kvArray("k129_v130", AvroSchema.Type.BYTES, 129, 130)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 128),
      withId(new AvroSchema.Field("split_offsets", nullable(longArray(133)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 132),
      withId(new AvroSchema.Field("equality_ids", nullable(intArray(136)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 135),
      withId(new AvroSchema.Field("sort_order_id", nullable(AvroSchema.create(AvroSchema.Type.INT)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 140),
      // deletion-vector fields (v3; ref manifest.py:413-430)
      withId(new AvroSchema.Field("first_row_id", nullable(AvroSchema.create(AvroSchema.Type.LONG)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 142),
      withId(new AvroSchema.Field("referenced_data_file", nullable(AvroSchema.create(AvroSchema.Type.STRING)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 143),
      withId(new AvroSchema.Field("content_offset", nullable(AvroSchema.create(AvroSchema.Type.LONG)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 144),
      withId(new AvroSchema.Field("content_size_in_bytes", nullable(AvroSchema.create(AvroSchema.Type.LONG)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 145))
    AvroSchema.createRecord("r2", null, null, false, fields.asJava)
  }

  private def entrySchema(spec: PartitionSpec, schema: Schema): AvroSchema = {
    // entry ids per MANIFEST_ENTRY_SCHEMAS[2] (ref: manifest.py:571)
    val fields = Seq(
      withId(new AvroSchema.Field("status", AvroSchema.create(AvroSchema.Type.INT), null, null), 0),
      withId(new AvroSchema.Field("snapshot_id", nullable(AvroSchema.create(AvroSchema.Type.LONG)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 1),
      withId(new AvroSchema.Field("sequence_number", nullable(AvroSchema.create(AvroSchema.Type.LONG)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 3),
      withId(new AvroSchema.Field("file_sequence_number", nullable(AvroSchema.create(AvroSchema.Type.LONG)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 4),
      withId(new AvroSchema.Field("data_file", dataFileSchema(spec, schema), null, null), 2))
    AvroSchema.createRecord("manifest_entry", null, null, false, fields.asJava)
  }

  private val fieldSummarySchema: AvroSchema = {
    // ids per PARTITION_FIELD_SUMMARY_TYPE (ref: manifest.py:645)
    val fields = Seq(
      withId(new AvroSchema.Field("contains_null", AvroSchema.create(AvroSchema.Type.BOOLEAN), null, null), 509),
      withId(new AvroSchema.Field("contains_nan", nullable(AvroSchema.create(AvroSchema.Type.BOOLEAN)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 518),
      withId(new AvroSchema.Field("lower_bound", nullable(AvroSchema.create(AvroSchema.Type.BYTES)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 510),
      withId(new AvroSchema.Field("upper_bound", nullable(AvroSchema.create(AvroSchema.Type.BYTES)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 511))
    AvroSchema.createRecord("r508", null, null, false, fields.asJava)
  }

  private val manifestFileSchema: AvroSchema = {
    // ids per MANIFEST_LIST_FILE_SCHEMAS[2] (ref: manifest.py:739)
    def f(n: String, t: AvroSchema.Type, id: Int) =
      withId(new AvroSchema.Field(n, AvroSchema.create(t), null, null), id)
    val partitionsArr = AvroSchema.createArray(fieldSummarySchema)
    partitionsArr.addProp("element-id", Integer.valueOf(508))
    val fields = Seq(
      f("manifest_path", AvroSchema.Type.STRING, 500),
      f("manifest_length", AvroSchema.Type.LONG, 501),
      f("partition_spec_id", AvroSchema.Type.INT, 502),
      f("content", AvroSchema.Type.INT, 517),
      f("sequence_number", AvroSchema.Type.LONG, 515),
      f("min_sequence_number", AvroSchema.Type.LONG, 516),
      f("added_snapshot_id", AvroSchema.Type.LONG, 503),
      f("added_files_count", AvroSchema.Type.INT, 504),
      f("existing_files_count", AvroSchema.Type.INT, 505),
      f("deleted_files_count", AvroSchema.Type.INT, 506),
      f("added_rows_count", AvroSchema.Type.LONG, 512),
      f("existing_rows_count", AvroSchema.Type.LONG, 513),
      f("deleted_rows_count", AvroSchema.Type.LONG, 514),
      withId(new AvroSchema.Field("partitions", nullable(partitionsArr), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 507),
      withId(new AvroSchema.Field("first_row_id", nullable(AvroSchema.create(AvroSchema.Type.LONG)), null, AvroSchema.Field.NULL_DEFAULT_VALUE), 520))
    AvroSchema.createRecord("manifest_file", null, null, false, fields.asJava)
  }

  // ---- write manifest ----

  /** `write.avro.compression-codec` values → avro codec factories (ref:
    * TableProperties.WRITE_AVRO_COMPRESSION, table/__init__.py:160 —
    * default gzip). Reads auto-detect from the file header, so any
    * foreign codec on the classpath just works. */
  private[meta] def codecFor(name: String): org.apache.avro.file.CodecFactory =
    name match {
      case "gzip" | "deflate" => org.apache.avro.file.CodecFactory.deflateCodec(6)
      case "zstd" | "zstandard" => org.apache.avro.file.CodecFactory.zstandardCodec(3)
      case "snappy" => org.apache.avro.file.CodecFactory.snappyCodec()
      case "uncompressed" | "null" | "none" => org.apache.avro.file.CodecFactory.nullCodec()
      case other => throw new IllegalArgumentException(
        s"Unsupported avro compression codec: $other")
    }

  val DefaultAvroCodec = "gzip"

  def writeManifest(path: String, entries: Seq[ManifestEntry], spec: PartitionSpec,
      schema: Schema, codec: String = DefaultAvroCodec, content: Int = 0): Long = {
    val avro = entrySchema(spec, schema)
    val dfSchema = avro.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    val partTypes = spec.partitionType(schema)

    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avro))
    writer.setCodec(codecFor(codec))
    // spec-mandated avro header metadata (ref: ManifestWriter._meta,
    // manifest.py:1117 + content discriminator :1274/:1287) — foreign
    // readers take the ICEBERG schema, spec, and manifest content from
    // here, not from the avro record schema
    writer.setMeta("schema", MetadataJson.schemaToJson(schema).toString)
    writer.setMeta("partition-spec",
      MetadataJson.specToJson(spec).get("fields").toString)
    writer.setMeta("partition-spec-id", spec.specId.toString)
    writer.setMeta("format-version", "2")
    writer.setMeta("content", if (content == 0) "data" else "deletes")
    writer.create(avro, Io.create(path))
    try {
      entries.foreach { e =>
        val rec = new GenericData.Record(avro)
        rec.put("status", e.status)
        rec.put("snapshot_id", e.snapshotId)
        rec.put("sequence_number", e.dataSequenceNumber)
        rec.put("file_sequence_number", e.fileSequenceNumber)
        val df = new GenericData.Record(dfSchema)
        df.put("content", e.dataFile.content)
        df.put("file_path", e.dataFile.filePath)
        df.put("file_format", e.dataFile.fileFormat)
        val part = new GenericData.Record(partSchema)
        partTypes.zip(e.dataFile.partition).foreach { case (nf, v) =>
          part.put(sanitize(nf.name), avroValue(nf.fieldType, v))
        }
        df.put("partition", part)
        df.put("record_count", e.dataFile.recordCount)
        df.put("file_size_in_bytes", e.dataFile.fileSizeInBytes)
        df.put("column_sizes", kvRecords(dfSchema, "column_sizes", e.dataFile.columnSizes))
        df.put("value_counts", kvRecords(dfSchema, "value_counts", e.dataFile.valueCounts))
        df.put("null_value_counts", kvRecords(dfSchema, "null_value_counts", e.dataFile.nullValueCounts))
        df.put("nan_value_counts", kvRecords(dfSchema, "nan_value_counts", e.dataFile.nanValueCounts))
        df.put("lower_bounds", boundRecords(dfSchema, "lower_bounds", e.dataFile.lowerBounds, schema))
        df.put("upper_bounds", boundRecords(dfSchema, "upper_bounds", e.dataFile.upperBounds, schema))
        df.put("split_offsets", if (e.dataFile.splitOffsets.isEmpty) null
          else e.dataFile.splitOffsets.map(java.lang.Long.valueOf).asJava)
        df.put("equality_ids", if (e.dataFile.equalityIds.isEmpty) null
          else e.dataFile.equalityIds.map(Integer.valueOf).asJava)
        df.put("sort_order_id", e.dataFile.sortOrderId.map(Integer.valueOf).orNull)
        df.put("first_row_id", e.dataFile.firstRowId.map(java.lang.Long.valueOf).orNull)
        df.put("referenced_data_file", e.dataFile.referencedDataFile.orNull)
        df.put("content_offset", e.dataFile.contentOffset.map(java.lang.Long.valueOf).orNull)
        df.put("content_size_in_bytes", e.dataFile.contentSizeInBytes.map(java.lang.Long.valueOf).orNull)
        rec.put("data_file", df)
        writer.append(rec)
      }
    } finally writer.close()
    Io.size(path)
  }

  private def avroValue(t: IceType, v: Any): Any = v match {
    case null => null
    case d: java.math.BigDecimal => ByteBuffer.wrap(d.unscaledValue().toByteArray)
    case b: Array[Byte] => ByteBuffer.wrap(b)
    case other => other
  }

  private def kvRecords(df: AvroSchema, field: String, m: Map[Int, Long]): AnyRef = {
    if (m.isEmpty) return null
    val arr = df.getField(field).schema().getTypes.get(1)
    val kv = arr.getElementType
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      val r = new GenericData.Record(kv)
      r.put("key", k); r.put("value", v); r
    }.asJava
  }

  /** Bound types for the spec's RESERVED position-delete columns — these
    * ids never appear in a table schema, but delete-file entries carry
    * file_path bounds under them (the Iceberg readers' path index for
    * position deletes and DVs keys off exactly these). */
  private val ReservedBoundTypes: Map[Int, graft.core.IceType] = Map(
    2147483546 -> graft.core.IString, // file_path
    2147483545 -> graft.core.ILong)   // pos

  private def boundType(schema: Schema, id: Int): Option[graft.core.IceType] =
    schema.byId.get(id).map(_.fieldType).orElse(ReservedBoundTypes.get(id))

  private def boundRecords(df: AvroSchema, field: String, m: Map[Int, Any],
      schema: Schema): AnyRef = {
    if (m.isEmpty) return null
    val arr = df.getField(field).schema().getTypes.get(1)
    val kv = arr.getElementType
    m.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      boundType(schema, k).map { tpe =>
        val r = new GenericData.Record(kv)
        r.put("key", k)
        r.put("value", ByteBuffer.wrap(Conversions.toBytes(tpe, v)))
        r
      }
    }.asJava
  }

  // ---- read manifest ----

  /** Avro container reader over any warehouse scheme (local fast path;
    * FsInput/FSDataInputStream elsewhere). `confOverride` lets
    * EXECUTOR-side callers (distributed planning) supply a shipped conf —
    * Io.conf's process-global factory is only installed on the driver. */
  private def openAvro(path: String,
      confOverride: org.apache.hadoop.conf.Configuration): DataFileReader[GenericRecord] =
    if (Io.isLocal(path))
      new DataFileReader[GenericRecord](new File(PathUtil.canon(path)),
        new GenericDatumReader[GenericRecord]())
    else new DataFileReader[GenericRecord](
      new org.apache.avro.mapred.FsInput(new org.apache.hadoop.fs.Path(path),
        if (confOverride != null) confOverride else Io.confFor(path)),
      new GenericDatumReader[GenericRecord]())

  /** Convenience overload applying sequence/snapshot inheritance from the
    * owning manifest-list row (ref: manifest.py:1006
    * _inherit_from_manifest — a foreign v2 writer leaves ADDED entries'
    * sequence numbers null, to be inherited at read time). */
  def readManifest(mf: ManifestFile, spec: PartitionSpec, schema: Schema,
      confOverride: org.apache.hadoop.conf.Configuration): Seq[ManifestEntry] =
    readManifest(mf.manifestPath, spec, schema, confOverride,
      inheritSnapshotId = Some(mf.addedSnapshotId),
      inheritSequenceNumber = Some(mf.sequenceNumber),
      inheritFirstRowId = mf.firstRowId)

  /** Manifest-open counter — test instrumentation for pruning asserts
    * (accurate in local mode where executors share the JVM; zero cost
    * otherwise). Cache hits do NOT count: the counter measures real
    * decodes. */
  val manifestOpens = new java.util.concurrent.atomic.AtomicLong(0)

  // ---- manifest entry cache (ref: manifest.py:895 _ManifestCache) ----
  //
  // Manifests are IMMUTABLE by path, and consecutive snapshots share most
  // of their manifest forest — so every repeated metadata walk (a CDC
  // poll planning both snapshots, a changelog trigger, a metadata table
  // re-walking the head) re-decodes bytes that cannot have changed. The
  // reference dedups ManifestFile objects process-wide with a
  // configurable LRU (manifest.py:895, public clear_manifest_cache
  // :947); this is the entry-level analog: decoded Seq[ManifestEntry]
  // keyed by canonical path plus every decode input (spec, schema, the
  // inheritance triple — the same path re-read under an evolved schema
  // or a backfilled first_row_id decodes differently and caches
  // separately). Size-bounded in total ENTRIES; LRU eviction;
  // invalidation-free. Configure via the `graft.manifest-cache-size`
  // system property / GRAFT_MANIFEST_CACHE_SIZE env (0 disables,
  // mirroring the reference's manifest-cache-size).

  /** Default bound: ~the reference's 128-manifest default at a few
    * thousand entries per manifest. One entry is a descriptor + stats
    * maps (~1 KB); the default caps the cache at low hundreds of MB. */
  val DefaultManifestCacheEntries = 262144L

  @volatile private var cacheMax: Long =
    sys.props.get("graft.manifest-cache-size")
      .orElse(sys.env.get("GRAFT_MANIFEST_CACHE_SIZE"))
      .map(_.toLong).getOrElse(DefaultManifestCacheEntries)

  def manifestCacheSize: Long = cacheMax

  /** 0 disables and clears (the reference's `manifest-cache-size: 0`). */
  def setManifestCacheSize(maxEntries: Long): Unit = {
    cacheMax = math.max(0L, maxEntries)
    cacheLock.synchronized { evictTo(cacheMax); listEvictTo(cacheMax) }
  }

  /** Cache-hit counter (test instrumentation, local mode). */
  val manifestCacheHits = new java.util.concurrent.atomic.AtomicLong(0)

  private final case class EntryCacheKey(path: String, spec: PartitionSpec,
      schema: Schema, inheritSnapshotId: Option[Long],
      inheritSequenceNumber: Option[Long], inheritFirstRowId: Option[Long])

  private val cacheLock = new Object
  // access-order LinkedHashMap = LRU; guarded by cacheLock
  private val entryCache =
    new java.util.LinkedHashMap[EntryCacheKey, Seq[ManifestEntry]](64, 0.75f, true)
  private var cachedEntryCount = 0L

  /** Release all cached metadata — manifest entries, manifest lists, and
    * parsed table-metadata JSON (ref: manifest.py:947 clear_manifest_cache
    * — long-lived or memory-sensitive processes). */
  def clearManifestCache(): Unit = {
    cacheLock.synchronized { evictTo(0L); listEvictTo(0L) }
    MetadataCache.clear()
  }

  private def evictTo(budget: Long): Unit = {
    val it = entryCache.entrySet().iterator()
    while (cachedEntryCount > budget && it.hasNext) {
      val e = it.next() // least-recently-used first
      cachedEntryCount -= math.max(1, e.getValue.size)
      it.remove()
    }
  }

  private def cacheGet(k: EntryCacheKey): Option[Seq[ManifestEntry]] =
    cacheLock.synchronized(Option(entryCache.get(k)))

  private def cachePut(k: EntryCacheKey, v: Seq[ManifestEntry]): Unit =
    cacheLock.synchronized {
      val w = math.max(1, v.size).toLong
      if (w > cacheMax || entryCache.containsKey(k)) return
      entryCache.put(k, v)
      cachedEntryCount += w
      // the just-put key is most-recent under access order, so eviction
      // never removes it while anything older remains
      evictTo(cacheMax)
    }

  def readManifest(path: String, spec: PartitionSpec, schema: Schema,
      confOverride: org.apache.hadoop.conf.Configuration = null,
      inheritSnapshotId: Option[Long] = None,
      inheritSequenceNumber: Option[Long] = None,
      inheritFirstRowId: Option[Long] = None): Seq[ManifestEntry] = {
    val key =
      if (cacheMax > 0)
        Some(EntryCacheKey(PathUtil.canon(path), spec, schema,
          inheritSnapshotId, inheritSequenceNumber, inheritFirstRowId))
      else None
    key.flatMap(cacheGet).foreach { hit =>
      manifestCacheHits.incrementAndGet()
      return hit
    }
    val out = decodeManifest(path, spec, schema, confOverride,
      inheritSnapshotId, inheritSequenceNumber, inheritFirstRowId)
    key.foreach(cachePut(_, out))
    out
  }

  private def decodeManifest(path: String, spec: PartitionSpec, schema: Schema,
      confOverride: org.apache.hadoop.conf.Configuration,
      inheritSnapshotId: Option[Long],
      inheritSequenceNumber: Option[Long],
      inheritFirstRowId: Option[Long]): Seq[ManifestEntry] = {
    manifestOpens.incrementAndGet()
    val reader = openAvro(path, confOverride)
    val partTypes = spec.partitionType(schema)
    // Foreign writers may sanitize partition-struct names differently —
    // resolve by the avro field-id prop when present, our sanitized name
    // otherwise (ref: avro/resolver.py resolves by id, names are advisory).
    val partNameById: Map[Int, String] = {
      val ps = reader.getSchema.getField("data_file").schema()
        .getField("partition").schema()
      val rec = if (ps.getType == AvroSchema.Type.UNION)
        ps.getTypes.asScala.find(_.getType == AvroSchema.Type.RECORD).getOrElse(ps)
      else ps
      if (rec.getType != AvroSchema.Type.RECORD) Map.empty
      else rec.getFields.asScala.flatMap { f =>
        Option(f.getObjectProp("field-id")).collect {
          case n: java.lang.Number => n.intValue -> f.name
        }
      }.toMap
    }
    try {
      val b = Seq.newBuilder[ManifestEntry]
      while (reader.hasNext) {
        val rec = reader.next()
        val df = rec.get("data_file").asInstanceOf[GenericRecord]
        val part = df.get("partition").asInstanceOf[GenericRecord]
        val partValues = partTypes.map { nf =>
          fromAvro(nf.fieldType,
            part.get(partNameById.getOrElse(nf.id, sanitize(nf.name))))
        }
        // v1 manifests (MANIFEST_ENTRY_SCHEMAS[1]/DATA_FILE_TYPE[1],
        // manifest.py:566/:224) have NO sequence-number, content, or
        // equality-ids slots at all — GenericData.Record.get(name) THROWS
        // for unknown fields, so every version-dependent field goes
        // through the absent-tolerant fieldOpt
        val status = rec.get("status").asInstanceOf[Int]
        // inheritance (ref _inherit_from_manifest): a null sequence number
        // takes the manifest's own when the entry is ADDED (or the whole
        // manifest predates sequence numbers, seq 0)
        def inheritSeq(raw: Option[Long]): Long = raw.getOrElse {
          inheritSequenceNumber.filter(s => s == 0L || status == 1).getOrElse(0L)
        }
        b += ManifestEntry(
          status = status,
          snapshotId = fieldOpt(rec, "snapshot_id").map(_.asInstanceOf[Long])
            .orElse(inheritSnapshotId).getOrElse(0L),
          dataSequenceNumber = inheritSeq(
            fieldOpt(rec, "sequence_number").map(_.asInstanceOf[Long])),
          fileSequenceNumber = inheritSeq(
            fieldOpt(rec, "file_sequence_number").map(_.asInstanceOf[Long])),
          dataFile = DataFile(
            // v1 predates delete files: no content slot means data
            content = fieldOpt(df, "content").map(_.asInstanceOf[Int]).getOrElse(0),
            filePath = df.get("file_path").toString,
            fileFormat = df.get("file_format").toString,
            partition = partValues,
            recordCount = df.get("record_count").asInstanceOf[Long],
            fileSizeInBytes = df.get("file_size_in_bytes").asInstanceOf[Long],
            valueCounts = kvMap(fieldOpt(df, "value_counts").orNull),
            nullValueCounts = kvMap(fieldOpt(df, "null_value_counts").orNull),
            nanValueCounts = kvMap(fieldOpt(df, "nan_value_counts").orNull),
            lowerBounds = boundMap(fieldOpt(df, "lower_bounds").orNull, schema),
            upperBounds = boundMap(fieldOpt(df, "upper_bounds").orNull, schema),
            columnSizes = kvMap(fieldOpt(df, "column_sizes").orNull),
            splitOffsets = fieldOpt(df, "split_offsets")
              .map(_.asInstanceOf[java.util.List[Long]].asScala.toSeq).getOrElse(Nil),
            sortOrderId = fieldOpt(df, "sort_order_id").map(_.asInstanceOf[Int]),
            specId = spec.specId,
            equalityIds = fieldOpt(df, "equality_ids")
              .map(_.asInstanceOf[java.util.List[Int]].asScala.toSeq).getOrElse(Nil),
            firstRowId = fieldOpt(df, "first_row_id").map(_.asInstanceOf[Long]),
            referencedDataFile = fieldOpt(df, "referenced_data_file").map(_.toString),
            contentOffset = fieldOpt(df, "content_offset").map(_.asInstanceOf[Long]),
            contentSizeInBytes = fieldOpt(df, "content_size_in_bytes").map(_.asInstanceOf[Long])))
      }
      val entries = b.result()
      // v3 row-lineage inheritance (spec §Row Lineage / field 142): an
      // ADDED or EXISTING data file with null first_row_id takes the
      // manifest's first_row_id advanced by the record counts of
      // preceding null-first_row_id data files; explicit values
      // (materialized at manifest rewrite) pass through untouched and
      // consume no range. EXISTING matters for manifests whose entries
      // were carried from pre-v3 state by a dead-file rewrite and only
      // later got a manifest-level range backfilled.
      inheritFirstRowId match {
        case Some(start) =>
          var next = start
          entries.map { e =>
            if (e.dataFile.content == FileContent.Data &&
                e.dataFile.firstRowId.isEmpty &&
                (e.status == EntryStatus.Added || e.status == EntryStatus.Existing)) {
              val withId = e.copy(dataFile = e.dataFile.copy(firstRowId = Some(next)))
              next += e.dataFile.recordCount
              withId
            } else e
          }
        case None => entries
      }
    } finally reader.close()
  }

  private def longOr(v: Any, dflt: Long): Long =
    Option(v).map(_.asInstanceOf[Long]).getOrElse(dflt)

  /** Null-safe read of a field that may be absent from older manifests
    * (pre-DV writers): Avro resolves a missing reader field to its default,
    * but files written before the field existed have no slot at all. */
  private def fieldOpt(rec: GenericRecord, name: String): Option[Any] =
    if (rec.getSchema.getField(name) == null) None else Option(rec.get(name))

  private def fromAvro(t: IceType, v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case bb: ByteBuffer =>
      val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
      t match {
        case IDecimal(_, s) => new java.math.BigDecimal(new java.math.BigInteger(bytes), s)
        case _ => bytes
      }
    case other => other
  }

  private def kvMap(v: Any): Map[Int, Long] =
    Option(v).map(_.asInstanceOf[java.util.List[GenericRecord]].asScala.map { r =>
      r.get("key").asInstanceOf[Int] -> r.get("value").asInstanceOf[Long]
    }.toMap).getOrElse(Map.empty)

  private def boundMap(v: Any, schema: Schema): Map[Int, Any] =
    Option(v).map(_.asInstanceOf[java.util.List[GenericRecord]].asScala.flatMap { r =>
      val k = r.get("key").asInstanceOf[Int]
      boundType(schema, k).map { tpe =>
        val bb = r.get("value").asInstanceOf[ByteBuffer]
        val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
        k -> Conversions.fromBytes(tpe, bytes)
      }
    }.toMap).getOrElse(Map.empty)

  // ---- manifest list ----

  /** Manifest-list-open counter — same instrumentation contract as
    * manifestOpens: counts real decodes, never cache hits. */
  val manifestListOpens = new java.util.concurrent.atomic.AtomicLong(0)

  // Manifest LISTS are immutable by path too (one per snapshot, written
  // once at commit), and every metadata walk — scan plan, CDC poll,
  // changelog trigger, inspect table — starts by reading one. The list
  // cache is the entry cache's sibling: keyed by canonical path alone
  // (decoding needs no spec/schema), budgeted in ManifestFile rows under
  // the SAME `graft.manifest-cache-size` knob (0 disables both, the
  // reference's manifest-cache-size semantics), so a repeat walk over an
  // unchanged table performs ZERO avro IO end to end.
  private val listCache =
    new java.util.LinkedHashMap[String, Seq[ManifestFile]](64, 0.75f, true)
  private var cachedListRows = 0L

  private def listEvictTo(budget: Long): Unit = {
    val it = listCache.entrySet().iterator()
    while (cachedListRows > budget && it.hasNext) {
      val e = it.next()
      cachedListRows -= math.max(1, e.getValue.size)
      it.remove()
    }
  }

  def writeManifestList(path: String, manifests: Seq[ManifestFile],
      codec: String = DefaultAvroCodec,
      snapshotId: Option[Long] = None,
      parentSnapshotId: Option[Long] = None,
      sequenceNumber: Option[Long] = None): Unit = {
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](manifestFileSchema))
    writer.setCodec(codecFor(codec))
    // list header metadata (ref: ManifestListWriterV2, manifest.py:1374)
    writer.setMeta("format-version", "2")
    snapshotId.foreach(id => writer.setMeta("snapshot-id", id.toString))
    writer.setMeta("parent-snapshot-id",
      parentSnapshotId.map(_.toString).getOrElse("null"))
    sequenceNumber.foreach(sq => writer.setMeta("sequence-number", sq.toString))
    writer.create(manifestFileSchema, Io.create(path))
    try {
      manifests.foreach { m =>
        val rec = new GenericData.Record(manifestFileSchema)
        rec.put("manifest_path", m.manifestPath)
        rec.put("manifest_length", m.manifestLength)
        rec.put("partition_spec_id", m.partitionSpecId)
        rec.put("content", m.content)
        rec.put("sequence_number", m.sequenceNumber)
        rec.put("min_sequence_number", m.minSequenceNumber)
        rec.put("added_snapshot_id", m.addedSnapshotId)
        rec.put("added_files_count", m.addedFilesCount)
        rec.put("existing_files_count", m.existingFilesCount)
        rec.put("deleted_files_count", m.deletedFilesCount)
        rec.put("added_rows_count", m.addedRowsCount)
        rec.put("existing_rows_count", m.existingRowsCount)
        rec.put("deleted_rows_count", m.deletedRowsCount)
        rec.put("first_row_id", m.firstRowId.map(java.lang.Long.valueOf).orNull)
        rec.put("partitions", if (m.partitions.isEmpty) null else m.partitions.map { s =>
          val r = new GenericData.Record(fieldSummarySchema)
          r.put("contains_null", s.containsNull)
          r.put("contains_nan", s.containsNan.map(java.lang.Boolean.valueOf).orNull)
          // summaries carry raw bytes; the typed decode happens at prune
          // time when the spec's field types are known
          r.put("lower_bound", s.lowerBound.map(b => ByteBuffer.wrap(b.asInstanceOf[Array[Byte]])).orNull)
          r.put("upper_bound", s.upperBound.map(b => ByteBuffer.wrap(b.asInstanceOf[Array[Byte]])).orNull)
          r
        }.asJava)
        writer.append(rec)
      }
    } finally writer.close()
  }

  /** Count statuses/rows straight out of a manifest's entries — the repair
    * path for foreign v1 manifest lists whose optional count fields were
    * omitted (they're optional in the v1 list schema, manifest.py:730).
    * Status enum: 0=EXISTING, 1=ADDED, 2=DELETED. */
  private def deriveCounts(manifestPath: String): (Int, Int, Int, Long, Long, Long) = {
    val r = openAvro(manifestPath, null)
    try {
      var af = 0; var ef = 0; var df = 0; var ar = 0L; var er = 0L; var dr = 0L
      while (r.hasNext) {
        val e = r.next()
        val rc = e.get("data_file").asInstanceOf[GenericRecord]
          .get("record_count").asInstanceOf[Long]
        e.get("status").asInstanceOf[Int] match {
          case 1 => af += 1; ar += rc
          case 0 => ef += 1; er += rc
          case _ => df += 1; dr += rc
        }
      }
      (af, ef, df, ar, er, dr)
    } finally r.close()
  }

  def readManifestList(path: String): Seq[ManifestFile] = {
    val key = if (cacheMax > 0) Some(PathUtil.canon(path)) else None
    key.foreach { k =>
      cacheLock.synchronized(Option(listCache.get(k))).foreach { hit =>
        manifestCacheHits.incrementAndGet()
        return hit
      }
    }
    val out = decodeManifestList(path)
    key.foreach { k =>
      cacheLock.synchronized {
        val w = math.max(1, out.size).toLong
        if (w <= cacheMax && !listCache.containsKey(k)) {
          listCache.put(k, out)
          cachedListRows += w
          listEvictTo(cacheMax)
        }
      }
    }
    out
  }

  private def decodeManifestList(path: String): Seq[ManifestFile] = {
    manifestListOpens.incrementAndGet()
    val reader = openAvro(path, null)
    try {
      // Foreign v1 lists (Java/pyiceberg ManifestListWriterV1) name the
      // counts `added_data_files_count` etc. and omit content / sequence
      // numbers entirely (ref: manifest.py:723 v1 vs :739 v2 schemas).
      // Resolve fields by the spec's avro `field-id` property first (the
      // version-independent channel — ids 500..520 are fixed), then by
      // either known name, and NEVER let a missing field unbox to 0: the
      // optional v1 counts are re-derived from the manifest itself.
      val ws = reader.getSchema
      val byId: Map[Int, String] = ws.getFields.asScala.flatMap { f =>
        Option(f.getObjectProp("field-id")).collect {
          case n: java.lang.Number => n.intValue -> f.name
        }
      }.toMap
      def fld(r: GenericRecord, id: Int, names: String*): AnyRef =
        byId.get(id).orElse(names.find(n => ws.getField(n) != null))
          .map(r.get).orNull
      def reqFld(r: GenericRecord, id: Int, names: String*): AnyRef = {
        val v = fld(r, id, names: _*)
        require(v != null, s"Manifest list $path is missing required field " +
          s"id=$id (${names.mkString("/")}) — refusing to default it")
        v
      }
      val b = Seq.newBuilder[ManifestFile]
      while (reader.hasNext) {
        val r = reader.next()
        val mPath = reqFld(r, 500, "manifest_path").toString
        // validate the remaining required fields BEFORE the (potentially
        // file-reading) count derivation, so malformed lists fail typed
        val mLength = reqFld(r, 501, "manifest_length").asInstanceOf[Long]
        val mSpecId = reqFld(r, 502, "partition_spec_id").asInstanceOf[Int]
        val mSnapId = reqFld(r, 503, "added_snapshot_id").asInstanceOf[Long]
        // v1: counts are optional — absent means unknown, not zero
        val counts = (
          fld(r, 504, "added_files_count", "added_data_files_count"),
          fld(r, 505, "existing_files_count", "existing_data_files_count"),
          fld(r, 506, "deleted_files_count", "deleted_data_files_count"),
          fld(r, 512, "added_rows_count"),
          fld(r, 513, "existing_rows_count"),
          fld(r, 514, "deleted_rows_count"))
        val (af, ef, df, ar, er, dr) = counts match {
          case (a: Integer, e: Integer, d: Integer, a2: java.lang.Long,
              e2: java.lang.Long, d2: java.lang.Long) =>
            (a.intValue, e.intValue, d.intValue, a2.longValue, e2.longValue, d2.longValue)
          case _ => deriveCounts(mPath)
        }
        b += ManifestFile(
          manifestPath = mPath,
          manifestLength = mLength,
          partitionSpecId = mSpecId,
          // v1 lists predate delete manifests: absent content means data
          content = Option(fld(r, 517, "content")).fold(0)(_.asInstanceOf[Int]),
          // v1 has no sequence numbers; 0 matches v1 inheritance semantics
          sequenceNumber = Option(fld(r, 515, "sequence_number")).fold(0L)(_.asInstanceOf[Long]),
          minSequenceNumber = Option(fld(r, 516, "min_sequence_number")).fold(0L)(_.asInstanceOf[Long]),
          addedSnapshotId = mSnapId,
          addedFilesCount = af,
          existingFilesCount = ef,
          deletedFilesCount = df,
          addedRowsCount = ar,
          existingRowsCount = er,
          deletedRowsCount = dr,
          partitions = Option(r.get("partitions"))
            .map(_.asInstanceOf[java.util.List[GenericRecord]].asScala.toSeq.map { s =>
              FieldSummary(
                containsNull = s.get("contains_null").asInstanceOf[Boolean],
                containsNan = Option(s.get("contains_nan")).map(_.asInstanceOf[Boolean]),
                lowerBound = Option(s.get("lower_bound")).map { bb0 =>
                  val bb = bb0.asInstanceOf[ByteBuffer]
                  val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes); bytes
                },
                upperBound = Option(s.get("upper_bound")).map { bb0 =>
                  val bb = bb0.asInstanceOf[ByteBuffer]
                  val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes); bytes
                })
            }).getOrElse(Nil),
          firstRowId = Option(fld(r, 520, "first_row_id")).map(_.asInstanceOf[Long]))
      }
      b.result()
    } finally reader.close()
  }
}
