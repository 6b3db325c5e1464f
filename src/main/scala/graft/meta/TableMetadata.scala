package graft.meta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.core._

/** Iceberg table metadata tree (ref: pyiceberg/table/metadata.py:128,491 —
  * V2 common fields) with spec-shaped JSON (de)serialization.
  */
final case class Snapshot(
    snapshotId: Long,
    parentSnapshotId: Option[Long],
    sequenceNumber: Long,
    timestampMs: Long,
    manifestList: String,
    summary: Map[String, String],
    schemaId: Int,
    /** v3 row lineage: first row id assigned to this snapshot's new rows. */
    firstRowId: Option[Long] = None,
    /** v3 row lineage: upper bound of rows assigned ids by this snapshot
      * (spec `added-rows`; ref snapshots.py:252). */
    addedRows: Option[Long] = None) {
  def operation: String = summary.getOrElse("operation", "append")
}

/** Puffin blob descriptor inside a statistics file
  * (ref: table/statistics.py BlobMetadata / puffin spec). */
final case class BlobMetadata(
    blobType: String,
    snapshotId: Long,
    sequenceNumber: Long,
    fields: Seq[Int],
    properties: Map[String, String] = Map.empty)

/** Table statistics file entry (ref: table/statistics.py:24 StatisticsFile,
  * metadata field `statistics`). */
final case class StatisticsFile(
    snapshotId: Long,
    statisticsPath: String,
    fileSizeInBytes: Long,
    fileFooterSizeInBytes: Long,
    blobMetadata: Seq[BlobMetadata] = Nil)

/** Partition statistics file entry (ref: table/statistics.py:46
  * PartitionStatisticsFile; metadata field `partition-statistics` —
  * the common fields only, no footer size / blobs). */
final case class PartitionStatisticsFile(
    snapshotId: Long,
    statisticsPath: String,
    fileSizeInBytes: Long)

/** "branch" | "tag", with the spec's optional per-ref retention fields
  * (ref: table/refs.py:40 — tags cannot carry snapshot-retention fields,
  * all values must be positive). */
final case class SnapshotRef(snapshotId: Long, refType: String,
    minSnapshotsToKeep: Option[Int] = None,
    maxSnapshotAgeMs: Option[Long] = None,
    maxRefAgeMs: Option[Long] = None) {
  require(refType != "tag" || minSnapshotsToKeep.isEmpty,
    "Tags do not support setting minSnapshotsToKeep")
  require(refType != "tag" || maxSnapshotAgeMs.isEmpty,
    "Tags do not support setting maxSnapshotAgeMs")
  require(minSnapshotsToKeep.forall(_ > 0), "minSnapshotsToKeep must be > 0")
  require(maxSnapshotAgeMs.forall(_ > 0), "maxSnapshotAgeMs must be > 0")
  require(maxRefAgeMs.forall(_ > 0), "maxRefAgeMs must be > 0")
}

final case class SortField(sourceId: Int, transform: Transform, direction: String, nullOrder: String)
final case class SortOrder(orderId: Int, fields: Seq[SortField])

final case class SnapshotLogEntry(timestampMs: Long, snapshotId: Long)
final case class MetadataLogEntry(timestampMs: Long, metadataFile: String)

final case class TableMetadata(
    formatVersion: Int = 2,
    tableUuid: String,
    location: String,
    lastSequenceNumber: Long = 0,
    lastUpdatedMs: Long = 0,
    lastColumnId: Int = 0,
    schemas: Seq[Schema] = Nil,
    currentSchemaId: Int = 0,
    partitionSpecs: Seq[PartitionSpec] = Seq(PartitionSpec.Unpartitioned),
    defaultSpecId: Int = 0,
    lastPartitionId: Int = PartitionSpec.StartFieldId - 1,
    sortOrders: Seq[SortOrder] = Seq(SortOrder(0, Nil)),
    defaultSortOrderId: Int = 0,
    properties: Map[String, String] = Map.empty,
    currentSnapshotId: Option[Long] = None,
    snapshots: Seq[Snapshot] = Nil,
    snapshotLog: Seq[SnapshotLogEntry] = Nil,
    metadataLog: Seq[MetadataLogEntry] = Nil,
    refs: Map[String, SnapshotRef] = Map.empty,
    statistics: Seq[StatisticsFile] = Nil,
    partitionStatistics: Seq[PartitionStatisticsFile] = Nil,
    /** v3 row lineage: next row id to assign (spec `next-row-id`). */
    nextRowId: Option[Long] = None) {

  def schema: Schema = schemas.find(_.schemaId == currentSchemaId)
    .getOrElse(throw new IllegalStateException(s"No schema $currentSchemaId"))
  def spec: PartitionSpec = partitionSpecs.find(_.specId == defaultSpecId)
    .getOrElse(throw new IllegalStateException(s"No spec $defaultSpecId"))
  def specById(id: Int): PartitionSpec = partitionSpecs.find(_.specId == id)
    .getOrElse(throw new IllegalStateException(s"No spec $id"))
  def schemaById(id: Int): Schema = schemas.find(_.schemaId == id).getOrElse(schema)
  def currentSnapshot: Option[Snapshot] =
    currentSnapshotId.flatMap(id => snapshots.find(_.snapshotId == id))
  def snapshotById(id: Long): Option[Snapshot] = snapshots.find(_.snapshotId == id)

  def snapshotByName(name: String): Option[Snapshot] =
    refs.get(name).flatMap(r => snapshotById(r.snapshotId))

  /** Latest snapshot committed at or before `tsMs`
    * (ref: table/__init__.py:1399 snapshot_as_of_timestamp). */
  def snapshotAsOf(tsMs: Long): Option[Snapshot] =
    snapshotLog.filter(_.timestampMs <= tsMs).lastOption
      .flatMap(e => snapshotById(e.snapshotId))

  /** Ancestors of a snapshot, nearest first (ref: table/snapshots.py ancestors_of). */
  def ancestorsOf(id: Long): Seq[Snapshot] = {
    val b = Seq.newBuilder[Snapshot]
    var cur = snapshotById(id)
    while (cur.isDefined) {
      b += cur.get
      cur = cur.get.parentSnapshotId.flatMap(snapshotById)
    }
    b.result()
  }
}

/** Path-keyed LRU of PARSED table metadata.
  *
  * Metadata files are write-once in every catalog here (HadoopCatalog uses
  * CREATE_NEW version files, the SQL/Hive/Glue/Dynamo/BigQuery pointer
  * catalogs name them `v<N>-<uuid>`), so a path's parse result can never go
  * stale within a table's lifetime. `refresh()` — which streaming sources
  * call once per trigger — then costs one pointer probe instead of
  * re-reading and re-parsing the whole metadata JSON (MBs on a table with
  * a long snapshot history). The one real hazard, a DROPPED table
  * recreated at the same deterministic HadoopCatalog paths, is handled by
  * invalidateUnder from dropTable/forgetTable; a FOREIGN process dropping
  * and recreating a table under this process's feet has the same staleness
  * window as Iceberg's own CachingCatalog. Shares the
  * `graft.manifest-cache-size = 0` kill switch with the manifest caches. */
object MetadataCache {
  /** Real read+parse count (cache hits excluded) — test instrumentation. */
  val parses = new java.util.concurrent.atomic.AtomicLong(0)
  val hits = new java.util.concurrent.atomic.AtomicLong(0)
  private val MaxPaths = 128
  private val lock = new Object
  private val lru =
    new java.util.LinkedHashMap[String, TableMetadata](16, 0.75f, true)

  private def parse(path: String): TableMetadata = {
    parses.incrementAndGet()
    MetadataJson.fromJson(new String(Io.readBytes(path),
      java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Read table metadata at an immutable metadata-file `path`. */
  def read(path: String): TableMetadata = {
    if (ManifestIO.manifestCacheSize <= 0) return parse(path)
    val k = PathUtil.canon(path)
    lock.synchronized(Option(lru.get(k))) match {
      case Some(h) => hits.incrementAndGet(); h
      case None =>
        val m = parse(path)
        lock.synchronized {
          lru.put(k, m)
          val it = lru.keySet().iterator()
          while (lru.size() > MaxPaths && it.hasNext) { it.next(); it.remove() }
        }
        m
    }
  }

  /** Drop every cached path under `prefix` — dropTable/forgetTable call
    * this because a recreated HadoopCatalog table reuses `v<N>` paths. */
  def invalidateUnder(prefix: String): Unit = {
    val p = PathUtil.canon(prefix)
    lock.synchronized {
      val it = lru.keySet().iterator()
      while (it.hasNext) if (it.next().startsWith(p)) it.remove()
    }
  }

  def clear(): Unit = lock.synchronized(lru.clear())
}

object MetadataJson {
  private val mapper = new ObjectMapper()

  // ---- types ----
  def typeToJson(t: IceType, o: ObjectNode => Unit = _ => ()): JsonNode = t match {
    case IStruct(fields) =>
      val n = mapper.createObjectNode()
      n.put("type", "struct")
      o(n)
      val fs = n.putArray("fields")
      fields.foreach(f => fs.add(fieldToJson(f)))
      n
    case IList(eid, e, req) =>
      val n = mapper.createObjectNode()
      n.put("type", "list"); n.put("element-id", eid); n.put("element-required", req)
      n.set[JsonNode]("element", typeToJson(e)); n
    case IMap(kid, k, vid, v, req) =>
      val n = mapper.createObjectNode()
      n.put("type", "map"); n.put("key-id", kid); n.put("value-id", vid)
      n.set[JsonNode]("key", typeToJson(k)); n.set[JsonNode]("value", typeToJson(v))
      n.put("value-required", req); n
    case IDecimal(p, s) => mapper.getNodeFactory.textNode(s"decimal($p, $s)")
    case IFixed(l) => mapper.getNodeFactory.textNode(s"fixed[$l]")
    case prim => mapper.getNodeFactory.textNode(prim.repr)
  }

  def typeFromJson(n: JsonNode): IceType = {
    if (n.isTextual) {
      val s = n.asText()
      val dec = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
      val fix = """fixed\[(\d+)\]""".r
      val geom = """geometry(?:\(\s*['"]([^'"]+)['"]\s*\))?""".r
      val geog = """geography(?:\(\s*['"]([^'"]+)['"](?:\s*,\s*['"]([^'"]+)['"])?\s*\))?""".r
      s match {
        case "boolean" => IBoolean
        case "int" => IInt
        case "long" => ILong
        case "float" => IFloat
        case "double" => IDouble
        case "date" => IDate
        case "time" => ITime
        case "timestamp" => ITimestamp
        case "timestamptz" => ITimestamptz
        case "string" => IString
        case "uuid" => IUUID
        case "binary" => IBinary
        case dec(p, sc) => IDecimal(p.toInt, sc.toInt)
        case fix(l) => IFixed(l.toInt)
        // v3 nanosecond timestamps: readable with the reference's ns→us
        // downcast (io/pyarrow.py:1654); writes reject in WriteFiles
        case "timestamp_ns" => ITimestampNs
        case "timestamptz_ns" => ITimestamptzNs
        // v3 tail types (types.py:946-:1031): unknown is all-null;
        // geometry/geography are WKB binary (the reference's non-geoarrow
        // arrow mapping, io/pyarrow.py:825). Parse patterns mirror
        // types.py:71/:73 GEOMETRY_REGEX/GEOGRAPHY_REGEX.
        case "unknown" => IUnknown
        case geom(crs) => IGeometry(Option(crs).getOrElse("OGC:CRS84"))
        case geog(crs, algo) => IGeography(
          Option(crs).getOrElse("OGC:CRS84"), Option(algo).getOrElse("spherical"))
        // variant: in the v3 spec but absent from the reference's type
        // system — fail typed, same as the reference's pydantic parse
        case "variant" =>
          throw new UnsupportedOperationException(
            s"Iceberg v3 type '$s' is not supported by this engine")
        case other => throw new IllegalArgumentException(s"Unknown type: $other")
      }
    } else n.get("type").asText() match {
      case "struct" =>
        IStruct(iter(n.get("fields")).map(fieldFromJson))
      case "list" =>
        IList(n.get("element-id").asInt(), typeFromJson(n.get("element")),
          n.get("element-required").asBoolean())
      case "map" =>
        IMap(n.get("key-id").asInt(), typeFromJson(n.get("key")),
          n.get("value-id").asInt(), typeFromJson(n.get("value")),
          n.get("value-required").asBoolean())
      case other => throw new IllegalArgumentException(s"Unknown complex type: $other")
    }
  }

  private def fieldToJson(f: NestedField): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("id", f.id); n.put("name", f.name); n.put("required", f.required)
    n.set[JsonNode]("type", typeToJson(f.fieldType))
    f.doc.foreach(n.put("doc", _))
    f.initialDefault.foreach(d => n.putPOJO("initial-default", d))
    f.writeDefault.foreach(d => n.putPOJO("write-default", d))
    n
  }

  private def fieldFromJson(n: JsonNode): NestedField =
    NestedField(
      n.get("id").asInt(), n.get("name").asText(), typeFromJson(n.get("type")),
      n.get("required").asBoolean(),
      Option(n.get("doc")).map(_.asText()),
      Option(n.get("initial-default")).map(jsonScalar),
      Option(n.get("write-default")).map(jsonScalar))

  private def jsonScalar(n: JsonNode): Any =
    if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else n.asText()

  def schemaToJson(s: Schema): ObjectNode = {
    val n = typeToJson(s.struct, o => {
      o.put("schema-id", s.schemaId)
      if (s.identifierFieldIds.nonEmpty) {
        val arr = o.putArray("identifier-field-ids")
        s.identifierFieldIds.foreach(arr.add)
      }
    }).asInstanceOf[ObjectNode]
    n
  }

  def schemaFromJson(n: JsonNode): Schema =
    Schema(iter(n.get("fields")).map(fieldFromJson),
      Option(n.get("schema-id")).map(_.asInt()).getOrElse(0),
      Option(n.get("identifier-field-ids")).map(a => iter(a).map(_.asInt())).getOrElse(Nil))

  def specToJson(sp: PartitionSpec): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("spec-id", sp.specId)
    val fs = n.putArray("fields")
    sp.fields.foreach { f =>
      val fn = mapper.createObjectNode()
      fn.put("source-id", f.sourceId); fn.put("field-id", f.fieldId)
      fn.put("name", f.name); fn.put("transform", f.transform.name)
      fs.add(fn)
    }
    n
  }

  def specFromJson(n: JsonNode): PartitionSpec =
    PartitionSpec(n.get("spec-id").asInt(), iter(n.get("fields")).map { f =>
      PartitionField(f.get("source-id").asInt(), f.get("field-id").asInt(),
        f.get("name").asText(), Transform.parse(f.get("transform").asText()))
    })

  private def iter(n: JsonNode): Seq[JsonNode] = {
    val b = Seq.newBuilder[JsonNode]
    val it = n.elements()
    while (it.hasNext) b += it.next()
    b.result()
  }

  // ---- fragment codecs (shared with the REST update protocol) ----------
  def sortOrderToJson(so: SortOrder): ObjectNode = {
    val son = mapper.createObjectNode()
    son.put("order-id", so.orderId)
    val sf = son.putArray("fields")
    so.fields.foreach { f =>
      val fn = mapper.createObjectNode()
      fn.put("source-id", f.sourceId); fn.put("transform", f.transform.name)
      fn.put("direction", f.direction); fn.put("null-order", f.nullOrder)
      sf.add(fn)
    }
    son
  }

  def sortOrderFromJson(so: JsonNode): SortOrder =
    SortOrder(so.get("order-id").asInt(), iter(so.get("fields")).map { f =>
      SortField(f.get("source-id").asInt(), Transform.parse(f.get("transform").asText()),
        f.get("direction").asText(), f.get("null-order").asText())
    })

  def snapshotToJson(s: Snapshot): ObjectNode = {
    val sn = mapper.createObjectNode()
    sn.put("snapshot-id", s.snapshotId)
    s.parentSnapshotId.foreach(sn.put("parent-snapshot-id", _))
    sn.put("sequence-number", s.sequenceNumber)
    sn.put("timestamp-ms", s.timestampMs)
    sn.put("manifest-list", s.manifestList)
    sn.put("schema-id", s.schemaId)
    s.firstRowId.foreach(sn.put("first-row-id", _))
    s.addedRows.foreach(sn.put("added-rows", _))
    val sum = sn.putObject("summary")
    s.summary.foreach { case (k, v) => sum.put(k, v) }
    sn
  }

  def snapshotFromJson(s: JsonNode): Snapshot =
    Snapshot(
      s.get("snapshot-id").asLong(),
      Option(s.get("parent-snapshot-id")).map(_.asLong()),
      Option(s.get("sequence-number")).map(_.asLong()).getOrElse(0L),
      s.get("timestamp-ms").asLong(),
      s.get("manifest-list").asText(),
      Option(s.get("summary")).map(strMap).getOrElse(Map.empty),
      Option(s.get("schema-id")).map(_.asInt()).getOrElse(0),
      Option(s.get("first-row-id")).map(_.asLong()),
      Option(s.get("added-rows")).map(_.asLong()))

  def statisticsToJson(st: StatisticsFile): ObjectNode = {
    val sn = mapper.createObjectNode()
    sn.put("snapshot-id", st.snapshotId)
    sn.put("statistics-path", st.statisticsPath)
    sn.put("file-size-in-bytes", st.fileSizeInBytes)
    sn.put("file-footer-size-in-bytes", st.fileFooterSizeInBytes)
    val bArr = sn.putArray("blob-metadata")
    st.blobMetadata.foreach { b =>
      val bn = mapper.createObjectNode()
      bn.put("type", b.blobType)
      bn.put("snapshot-id", b.snapshotId)
      bn.put("sequence-number", b.sequenceNumber)
      val fArr = bn.putArray("fields"); b.fields.foreach(fArr.add)
      val pObj = bn.putObject("properties")
      b.properties.foreach { case (k, v) => pObj.put(k, v) }
      bArr.add(bn)
    }
    sn
  }

  def statisticsFromJson(st: JsonNode): StatisticsFile =
    StatisticsFile(
      st.get("snapshot-id").asLong(),
      st.get("statistics-path").asText(),
      st.get("file-size-in-bytes").asLong(),
      st.get("file-footer-size-in-bytes").asLong(),
      Option(st.get("blob-metadata")).map(ba => iter(ba).map { b =>
        BlobMetadata(
          b.get("type").asText(),
          b.get("snapshot-id").asLong(),
          b.get("sequence-number").asLong(),
          Option(b.get("fields")).map(fa => iter(fa).map(_.asInt())).getOrElse(Nil),
          Option(b.get("properties")).map(strMap).getOrElse(Map.empty))
      }).getOrElse(Nil))

  def partitionStatisticsToJson(ps: PartitionStatisticsFile): ObjectNode = {
    val pn = mapper.createObjectNode()
    pn.put("snapshot-id", ps.snapshotId)
    pn.put("statistics-path", ps.statisticsPath)
    pn.put("file-size-in-bytes", ps.fileSizeInBytes)
    pn
  }

  def partitionStatisticsFromJson(ps: JsonNode): PartitionStatisticsFile =
    PartitionStatisticsFile(
      ps.get("snapshot-id").asLong(),
      ps.get("statistics-path").asText(),
      ps.get("file-size-in-bytes").asLong())

  private def strMap(p: JsonNode): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    val it = p.properties().iterator()
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
    b.result()
  }

  // ---- full metadata ----
  def toJson(m: TableMetadata): String = {
    val n = mapper.createObjectNode()
    n.put("format-version", m.formatVersion)
    n.put("table-uuid", m.tableUuid)
    n.put("location", m.location)
    if (m.formatVersion >= 2) n.put("last-sequence-number", m.lastSequenceNumber)
    n.put("last-updated-ms", m.lastUpdatedMs)
    n.put("last-column-id", m.lastColumnId)
    n.put("current-schema-id", m.currentSchemaId)
    val sArr = n.putArray("schemas"); m.schemas.foreach(s => sArr.add(schemaToJson(s)))
    n.put("default-spec-id", m.defaultSpecId)
    val pArr = n.putArray("partition-specs"); m.partitionSpecs.foreach(p => pArr.add(specToJson(p)))
    n.put("last-partition-id", m.lastPartitionId)
    if (m.formatVersion == 1) {
      // v1 legacy single-schema/spec fields, written alongside the list
      // forms (ref: metadata.py TableMetadataV1 construct_refs/schema)
      n.set[JsonNode]("schema", schemaToJson(m.schema))
      val legacy = n.putArray("partition-spec")
      m.spec.fields.foreach { f =>
        val fn = mapper.createObjectNode()
        fn.put("source-id", f.sourceId); fn.put("field-id", f.fieldId)
        fn.put("name", f.name); fn.put("transform", f.transform.name)
        legacy.add(fn)
      }
    }
    if (m.formatVersion >= 3) m.nextRowId.foreach(n.put("next-row-id", _))
    n.put("default-sort-order-id", m.defaultSortOrderId)
    val soArr = n.putArray("sort-orders")
    m.sortOrders.foreach(so => soArr.add(sortOrderToJson(so)))
    val props = n.putObject("properties")
    m.properties.foreach { case (k, v) => props.put(k, v) }
    m.currentSnapshotId.foreach(n.put("current-snapshot-id", _))
    val snaps = n.putArray("snapshots")
    m.snapshots.foreach(s => snaps.add(snapshotToJson(s)))
    if (m.statistics.nonEmpty) {
      val stArr = n.putArray("statistics")
      m.statistics.foreach(st => stArr.add(statisticsToJson(st)))
    }
    if (m.partitionStatistics.nonEmpty) {
      val pArr = n.putArray("partition-statistics")
      m.partitionStatistics.foreach(ps => pArr.add(partitionStatisticsToJson(ps)))
    }
    val slog = n.putArray("snapshot-log")
    m.snapshotLog.foreach { e =>
      val en = mapper.createObjectNode()
      en.put("timestamp-ms", e.timestampMs); en.put("snapshot-id", e.snapshotId)
      slog.add(en)
    }
    val mlog = n.putArray("metadata-log")
    m.metadataLog.foreach { e =>
      val en = mapper.createObjectNode()
      en.put("timestamp-ms", e.timestampMs); en.put("metadata-file", e.metadataFile)
      mlog.add(en)
    }
    val refsN = n.putObject("refs")
    m.refs.foreach { case (name, r) =>
      val rn = refsN.putObject(name)
      rn.put("snapshot-id", r.snapshotId); rn.put("type", r.refType)
      r.minSnapshotsToKeep.foreach(v => rn.put("min-snapshots-to-keep", v))
      r.maxSnapshotAgeMs.foreach(v => rn.put("max-snapshot-age-ms", v))
      r.maxRefAgeMs.foreach(v => rn.put("max-ref-age-ms", v))
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  }

  def fromJson(json: String): TableMetadata = {
    val n = mapper.readTree(json)
    def optLong(name: String): Option[Long] = Option(n.get(name)).map(_.asLong())
    val formatVersion = n.get("format-version").asInt()
    // v1 legacy single-forms (ref: metadata.py TableMetadataV1 — `schema`
    // and `partition-spec` predate the versioned lists)
    val schemas =
      if (n.has("schemas")) iter(n.get("schemas")).map(schemaFromJson)
      else Seq(schemaFromJson(n.get("schema")))
    val specs =
      if (n.has("partition-specs")) iter(n.get("partition-specs")).map(specFromJson)
      else if (n.has("partition-spec"))
        Seq(PartitionSpec(0, iter(n.get("partition-spec")).zipWithIndex.map { case (f, i) =>
          PartitionField(f.get("source-id").asInt(),
            Option(f.get("field-id")).map(_.asInt()).getOrElse(PartitionSpec.StartFieldId + i),
            f.get("name").asText(), Transform.parse(f.get("transform").asText()))
        }))
      else Seq(PartitionSpec.Unpartitioned)
    TableMetadata(
      formatVersion = formatVersion,
      tableUuid = n.get("table-uuid").asText(),
      location = n.get("location").asText(),
      lastSequenceNumber = Option(n.get("last-sequence-number")).map(_.asLong()).getOrElse(0L),
      lastUpdatedMs = Option(n.get("last-updated-ms")).map(_.asLong()).getOrElse(0L),
      lastColumnId = Option(n.get("last-column-id")).map(_.asInt()).getOrElse(0),
      schemas = schemas,
      currentSchemaId = Option(n.get("current-schema-id")).map(_.asInt())
        .orElse(schemas.headOption.map(_.schemaId)).getOrElse(0),
      partitionSpecs = specs,
      defaultSpecId = Option(n.get("default-spec-id")).map(_.asInt()).getOrElse(0),
      lastPartitionId = Option(n.get("last-partition-id")).map(_.asInt())
        .getOrElse(PartitionSpec.StartFieldId - 1),
      sortOrders = Option(n.get("sort-orders")).map(a => iter(a).map(sortOrderFromJson))
        .getOrElse(Seq(SortOrder(0, Nil))),
      defaultSortOrderId = Option(n.get("default-sort-order-id")).map(_.asInt()).getOrElse(0),
      properties = Option(n.get("properties")).map { p =>
        val b = Map.newBuilder[String, String]
        val it = p.properties().iterator()
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
        b.result()
      }.getOrElse(Map.empty),
      currentSnapshotId = optLong("current-snapshot-id").filter(_ != -1),
      snapshots = Option(n.get("snapshots")).map(a => iter(a).map(snapshotFromJson))
        .getOrElse(Nil),
      snapshotLog = Option(n.get("snapshot-log")).map(a => iter(a).map { e =>
        SnapshotLogEntry(e.get("timestamp-ms").asLong(), e.get("snapshot-id").asLong())
      }).getOrElse(Nil),
      metadataLog = Option(n.get("metadata-log")).map(a => iter(a).map { e =>
        MetadataLogEntry(e.get("timestamp-ms").asLong(), e.get("metadata-file").asText())
      }).getOrElse(Nil),
      refs = Option(n.get("refs")).map { r =>
        val b = Map.newBuilder[String, SnapshotRef]
        val it = r.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          val v = e.getValue
          def optL(k: String) = Option(v.get(k)).filterNot(_.isNull).map(_.asLong())
          b += e.getKey -> SnapshotRef(v.get("snapshot-id").asLong(),
            v.get("type").asText(),
            minSnapshotsToKeep = optL("min-snapshots-to-keep").map(_.toInt),
            maxSnapshotAgeMs = optL("max-snapshot-age-ms"),
            maxRefAgeMs = optL("max-ref-age-ms"))
        }
        b.result()
      }.getOrElse(Map.empty),
      statistics = Option(n.get("statistics")).map(a => iter(a).map(statisticsFromJson))
        .getOrElse(Nil),
      partitionStatistics = Option(n.get("partition-statistics")).map(a =>
        iter(a).map(partitionStatisticsFromJson)).getOrElse(Nil),
      nextRowId = optLong("next-row-id"))
  }
}
