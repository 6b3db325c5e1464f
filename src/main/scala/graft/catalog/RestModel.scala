package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.core.Schema
import graft.meta.PartitionSpec
import graft.meta._

/** Iceberg REST catalog commit protocol: the spec's `TableUpdate` and
  * `TableRequirement` wire model (ref: pyiceberg/table/update/__init__.py:85–246
  * update actions, :755–910 requirements; the REST OpenAPI spec's
  * CommitTableRequest is `{identifier, requirements, updates}`).
  *
  * The reference's Transaction accumulates updates natively; our engine
  * produces full [[TableMetadata]] trees. [[RestUpdates.diff]] converts a
  * (base → target) metadata transition into the spec's update list, and
  * [[RestUpdates.apply]] replays an update list onto a base — the server
  * side of the same protocol. `apply(diff(base, target))` must reproduce
  * `target` up to the server-maintained fields (last-updated-ms and the
  * metadata-log, which the REST spec leaves to the server — the reference
  * client never sends metadata-log updates either).
  */
sealed trait TableUpdate
object TableUpdate {
  final case class AssignUuid(uuid: String) extends TableUpdate
  final case class UpgradeFormatVersion(formatVersion: Int) extends TableUpdate
  final case class AddSchema(schema: Schema) extends TableUpdate
  /** -1 = last added schema (spec sentinel). */
  final case class SetCurrentSchema(schemaId: Int) extends TableUpdate
  final case class AddSpec(spec: PartitionSpec) extends TableUpdate
  final case class SetDefaultSpec(specId: Int) extends TableUpdate
  final case class AddSortOrder(order: SortOrder) extends TableUpdate
  final case class SetDefaultSortOrder(orderId: Int) extends TableUpdate
  final case class AddSnapshot(snapshot: Snapshot) extends TableUpdate
  final case class SetSnapshotRef(refName: String, ref: SnapshotRef)
      extends TableUpdate
  final case class RemoveSnapshots(snapshotIds: Seq[Long]) extends TableUpdate
  final case class RemoveSnapshotRef(refName: String) extends TableUpdate
  final case class SetLocation(location: String) extends TableUpdate
  final case class SetProperties(updates: Map[String, String]) extends TableUpdate
  final case class RemoveProperties(removals: Seq[String]) extends TableUpdate
  final case class SetStatistics(statistics: StatisticsFile) extends TableUpdate
  final case class RemoveStatistics(snapshotId: Long) extends TableUpdate
  final case class SetPartitionStatistics(statistics: PartitionStatisticsFile) extends TableUpdate
  final case class RemovePartitionStatistics(snapshotId: Long) extends TableUpdate
  final case class RemoveSchemas(schemaIds: Seq[Int]) extends TableUpdate
  final case class RemovePartitionSpecs(specIds: Seq[Int]) extends TableUpdate
}

/** Optimistic-concurrency asserts checked by the server against its
  * CURRENT state before applying updates (ref: update/__init__.py:771+). */
sealed trait TableRequirement {
  /** None = satisfied; Some(message) = commit must fail with 409. */
  def check(base: Option[TableMetadata]): Option[String]
}
object TableRequirement {
  final case object AssertCreate extends TableRequirement {
    def check(base: Option[TableMetadata]): Option[String] =
      base.map(_ => "Table already exists")
  }
  final case class AssertTableUuid(uuid: String) extends TableRequirement {
    def check(base: Option[TableMetadata]): Option[String] = base match {
      case None => Some("Requirement failed: table does not exist")
      case Some(m) if m.tableUuid != uuid =>
        Some(s"Table UUID does not match: $uuid != ${m.tableUuid}")
      case _ => None
    }
  }
  final case class AssertRefSnapshotId(ref: String, snapshotId: Option[Long])
      extends TableRequirement {
    def check(base: Option[TableMetadata]): Option[String] = base match {
      case None => Some("Requirement failed: table does not exist")
      case Some(m) =>
        val actual = m.refs.get(ref).map(_.snapshotId)
        if (actual == snapshotId) None
        else if (actual.isEmpty) Some(s"Requirement failed: branch or tag $ref is missing, expected ${snapshotId.get}")
        else if (snapshotId.isEmpty) Some(s"Requirement failed: $ref was created concurrently")
        else Some(s"Requirement failed: $ref has changed: expected ${snapshotId.get}, found ${actual.get}")
    }
  }
  final case class AssertLastAssignedFieldId(id: Int) extends TableRequirement {
    def check(base: Option[TableMetadata]): Option[String] = base match {
      case None => Some("Requirement failed: table does not exist")
      case Some(m) if m.lastColumnId != id =>
        Some(s"Requirement failed: last assigned field id has changed: expected $id, found ${m.lastColumnId}")
      case _ => None
    }
  }
  final case class AssertCurrentSchemaId(id: Int) extends TableRequirement {
    def check(base: Option[TableMetadata]): Option[String] = base match {
      case None => Some("Requirement failed: table does not exist")
      case Some(m) if m.currentSchemaId != id =>
        Some(s"Requirement failed: current schema id has changed: expected $id, found ${m.currentSchemaId}")
      case _ => None
    }
  }
  final case class AssertLastAssignedPartitionId(id: Int) extends TableRequirement {
    def check(base: Option[TableMetadata]): Option[String] = base match {
      case None => Some("Requirement failed: table does not exist")
      case Some(m) if m.lastPartitionId != id =>
        Some(s"Requirement failed: last assigned partition id has changed: expected $id, found ${m.lastPartitionId}")
      case _ => None
    }
  }
  final case class AssertDefaultSpecId(id: Int) extends TableRequirement {
    def check(base: Option[TableMetadata]): Option[String] = base match {
      case None => Some("Requirement failed: table does not exist")
      case Some(m) if m.defaultSpecId != id =>
        Some(s"Requirement failed: default spec id has changed: expected $id, found ${m.defaultSpecId}")
      case _ => None
    }
  }
  final case class AssertDefaultSortOrderId(id: Int) extends TableRequirement {
    def check(base: Option[TableMetadata]): Option[String] = base match {
      case None => Some("Requirement failed: table does not exist")
      case Some(m) if m.defaultSortOrderId != id =>
        Some(s"Requirement failed: default sort order id has changed: expected $id, found ${m.defaultSortOrderId}")
      case _ => None
    }
  }
}

object RestUpdates {
  import TableUpdate._
  private val mapper = new ObjectMapper()

  // ---- JSON (wire) -------------------------------------------------------

  def updateToJson(u: TableUpdate): ObjectNode = {
    val n = mapper.createObjectNode()
    u match {
      case AssignUuid(uuid) =>
        n.put("action", "assign-uuid"); n.put("uuid", uuid)
      case UpgradeFormatVersion(v) =>
        n.put("action", "upgrade-format-version"); n.put("format-version", v)
      case AddSchema(s) =>
        n.put("action", "add-schema")
        n.set[JsonNode]("schema", MetadataJson.schemaToJson(s))
      case SetCurrentSchema(id) =>
        n.put("action", "set-current-schema"); n.put("schema-id", id)
      case AddSpec(sp) =>
        n.put("action", "add-spec")
        n.set[JsonNode]("spec", MetadataJson.specToJson(sp))
      case SetDefaultSpec(id) =>
        n.put("action", "set-default-spec"); n.put("spec-id", id)
      case AddSortOrder(so) =>
        n.put("action", "add-sort-order")
        n.set[JsonNode]("sort-order", MetadataJson.sortOrderToJson(so))
      case SetDefaultSortOrder(id) =>
        n.put("action", "set-default-sort-order"); n.put("sort-order-id", id)
      case AddSnapshot(s) =>
        n.put("action", "add-snapshot")
        n.set[JsonNode]("snapshot", MetadataJson.snapshotToJson(s))
      case SetSnapshotRef(name, r) =>
        n.put("action", "set-snapshot-ref")
        n.put("ref-name", name); n.put("type", r.refType)
        n.put("snapshot-id", r.snapshotId)
        r.minSnapshotsToKeep.foreach(v => n.put("min-snapshots-to-keep", v))
        r.maxSnapshotAgeMs.foreach(v => n.put("max-snapshot-age-ms", v))
        r.maxRefAgeMs.foreach(v => n.put("max-ref-age-ms", v))
      case RemoveSnapshots(ids) =>
        n.put("action", "remove-snapshots")
        val a = n.putArray("snapshot-ids"); ids.foreach(a.add)
      case RemoveSnapshotRef(name) =>
        n.put("action", "remove-snapshot-ref"); n.put("ref-name", name)
      case SetLocation(loc) =>
        n.put("action", "set-location"); n.put("location", loc)
      case SetProperties(up) =>
        n.put("action", "set-properties")
        val o = n.putObject("updates"); up.foreach { case (k, v) => o.put(k, v) }
      case RemoveProperties(rm) =>
        n.put("action", "remove-properties")
        val a = n.putArray("removals"); rm.foreach(a.add)
      case SetStatistics(st) =>
        n.put("action", "set-statistics")
        n.set[JsonNode]("statistics", MetadataJson.statisticsToJson(st))
      case RemoveStatistics(id) =>
        n.put("action", "remove-statistics"); n.put("snapshot-id", id)
      case SetPartitionStatistics(st) =>
        n.put("action", "set-partition-statistics")
        n.set[JsonNode]("partition-statistics", MetadataJson.partitionStatisticsToJson(st))
      case RemovePartitionStatistics(id) =>
        n.put("action", "remove-partition-statistics"); n.put("snapshot-id", id)
      case RemoveSchemas(ids) =>
        n.put("action", "remove-schemas")
        val a = n.putArray("schema-ids"); ids.foreach(a.add)
      case RemovePartitionSpecs(ids) =>
        n.put("action", "remove-partition-specs")
        val a = n.putArray("spec-ids"); ids.foreach(a.add)
    }
    n
  }

  def updateFromJson(n: JsonNode): TableUpdate = n.get("action").asText() match {
    case "assign-uuid" => AssignUuid(n.get("uuid").asText())
    case "upgrade-format-version" => UpgradeFormatVersion(n.get("format-version").asInt())
    case "add-schema" => AddSchema(MetadataJson.schemaFromJson(n.get("schema")))
    case "set-current-schema" => SetCurrentSchema(n.get("schema-id").asInt())
    case "add-spec" => AddSpec(MetadataJson.specFromJson(n.get("spec")))
    case "set-default-spec" => SetDefaultSpec(n.get("spec-id").asInt())
    case "add-sort-order" => AddSortOrder(MetadataJson.sortOrderFromJson(n.get("sort-order")))
    case "set-default-sort-order" => SetDefaultSortOrder(n.get("sort-order-id").asInt())
    case "add-snapshot" => AddSnapshot(MetadataJson.snapshotFromJson(n.get("snapshot")))
    case "set-snapshot-ref" =>
      def optL(k: String) = Option(n.get(k)).filterNot(_.isNull).map(_.asLong())
      SetSnapshotRef(n.get("ref-name").asText(), SnapshotRef(
        n.get("snapshot-id").asLong(), n.get("type").asText(),
        minSnapshotsToKeep = optL("min-snapshots-to-keep").map(_.toInt),
        maxSnapshotAgeMs = optL("max-snapshot-age-ms"),
        maxRefAgeMs = optL("max-ref-age-ms")))
    case "remove-snapshots" => RemoveSnapshots(arr(n.get("snapshot-ids")).map(_.asLong()))
    case "remove-snapshot-ref" => RemoveSnapshotRef(n.get("ref-name").asText())
    case "set-location" => SetLocation(n.get("location").asText())
    case "set-properties" => SetProperties(strMap(n.get("updates")))
    case "remove-properties" => RemoveProperties(arr(n.get("removals")).map(_.asText()))
    case "set-statistics" => SetStatistics(MetadataJson.statisticsFromJson(n.get("statistics")))
    case "remove-statistics" => RemoveStatistics(n.get("snapshot-id").asLong())
    case "set-partition-statistics" =>
      SetPartitionStatistics(MetadataJson.partitionStatisticsFromJson(n.get("partition-statistics")))
    case "remove-partition-statistics" => RemovePartitionStatistics(n.get("snapshot-id").asLong())
    case "remove-schemas" => RemoveSchemas(arr(n.get("schema-ids")).map(_.asInt()))
    case "remove-partition-specs" => RemovePartitionSpecs(arr(n.get("spec-ids")).map(_.asInt()))
    case other => throw new IllegalArgumentException(s"Unknown update action: $other")
  }

  def requirementToJson(r: TableRequirement): ObjectNode = {
    import TableRequirement._
    val n = mapper.createObjectNode()
    r match {
      case AssertCreate => n.put("type", "assert-create")
      case AssertTableUuid(u) => n.put("type", "assert-table-uuid"); n.put("uuid", u)
      case AssertRefSnapshotId(ref, id) =>
        n.put("type", "assert-ref-snapshot-id"); n.put("ref", ref)
        id match { case Some(i) => n.put("snapshot-id", i); case None => n.putNull("snapshot-id") }
      case AssertLastAssignedFieldId(i) =>
        n.put("type", "assert-last-assigned-field-id"); n.put("last-assigned-field-id", i)
      case AssertCurrentSchemaId(i) =>
        n.put("type", "assert-current-schema-id"); n.put("current-schema-id", i)
      case AssertLastAssignedPartitionId(i) =>
        n.put("type", "assert-last-assigned-partition-id"); n.put("last-assigned-partition-id", i)
      case AssertDefaultSpecId(i) =>
        n.put("type", "assert-default-spec-id"); n.put("default-spec-id", i)
      case AssertDefaultSortOrderId(i) =>
        n.put("type", "assert-default-sort-order-id"); n.put("default-sort-order-id", i)
    }
    n
  }

  def requirementFromJson(n: JsonNode): TableRequirement = {
    import TableRequirement._
    n.get("type").asText() match {
      case "assert-create" => AssertCreate
      case "assert-table-uuid" => AssertTableUuid(n.get("uuid").asText())
      case "assert-ref-snapshot-id" =>
        val idNode = n.get("snapshot-id")
        AssertRefSnapshotId(n.get("ref").asText(),
          if (idNode == null || idNode.isNull) None else Some(idNode.asLong()))
      case "assert-last-assigned-field-id" =>
        AssertLastAssignedFieldId(n.get("last-assigned-field-id").asInt())
      case "assert-current-schema-id" =>
        AssertCurrentSchemaId(n.get("current-schema-id").asInt())
      case "assert-last-assigned-partition-id" =>
        AssertLastAssignedPartitionId(n.get("last-assigned-partition-id").asInt())
      case "assert-default-spec-id" => AssertDefaultSpecId(n.get("default-spec-id").asInt())
      case "assert-default-sort-order-id" =>
        AssertDefaultSortOrderId(n.get("default-sort-order-id").asInt())
      case other => throw new IllegalArgumentException(s"Unknown requirement type: $other")
    }
  }

  private def arr(n: JsonNode): Seq[JsonNode] = {
    val b = Seq.newBuilder[JsonNode]
    val it = n.elements()
    while (it.hasNext) b += it.next()
    b.result()
  }
  private def strMap(p: JsonNode): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    val it = p.properties().iterator()
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
    b.result()
  }

  // ---- diff: (base → target) metadata transition → spec updates ----------

  /** Express `target` as spec updates over `base` (None = create).
    *
    * The metadata-log is intentionally NOT diffed: the REST spec leaves
    * the log to the server (it appends the previous metadata location on
    * each commit), and the reference client never sends log updates.
    */
  def diff(base: Option[TableMetadata], target: TableMetadata): Seq[TableUpdate] = {
    val b = Seq.newBuilder[TableUpdate]
    base match {
      case None =>
        b += AssignUuid(target.tableUuid)
        b += UpgradeFormatVersion(target.formatVersion)
        b += SetLocation(target.location)
        target.schemas.foreach(s => b += AddSchema(s))
        b += SetCurrentSchema(target.currentSchemaId)
        target.partitionSpecs.foreach(sp => b += AddSpec(sp))
        b += SetDefaultSpec(target.defaultSpecId)
        target.sortOrders.foreach(so => b += AddSortOrder(so))
        b += SetDefaultSortOrder(target.defaultSortOrderId)
        if (target.properties.nonEmpty) b += SetProperties(target.properties)
        // replay snapshots oldest-first so parent links resolve
        target.snapshots.sortBy(s => (s.sequenceNumber, s.timestampMs))
          .foreach(s => b += AddSnapshot(s))
        target.refs.foreach { case (name, r) =>
          b += SetSnapshotRef(name, r)
        }
        target.statistics.foreach(st => b += SetStatistics(st))
        target.partitionStatistics.foreach(ps => b += SetPartitionStatistics(ps))
      case Some(m) =>
        if (target.formatVersion != m.formatVersion)
          b += UpgradeFormatVersion(target.formatVersion)
        if (target.location != m.location) b += SetLocation(target.location)

        val baseSchemaIds = m.schemas.map(_.schemaId).toSet
        val targetSchemaIds = target.schemas.map(_.schemaId).toSet
        target.schemas.filterNot(s => baseSchemaIds(s.schemaId)).foreach(s => b += AddSchema(s))
        val droppedSchemas = m.schemas.map(_.schemaId).filterNot(targetSchemaIds)
        if (droppedSchemas.nonEmpty) b += RemoveSchemas(droppedSchemas)
        if (target.currentSchemaId != m.currentSchemaId)
          b += SetCurrentSchema(target.currentSchemaId)

        val baseSpecIds = m.partitionSpecs.map(_.specId).toSet
        val targetSpecIds = target.partitionSpecs.map(_.specId).toSet
        target.partitionSpecs.filterNot(sp => baseSpecIds(sp.specId)).foreach(sp => b += AddSpec(sp))
        val droppedSpecs = m.partitionSpecs.map(_.specId).filterNot(targetSpecIds)
        if (droppedSpecs.nonEmpty) b += RemovePartitionSpecs(droppedSpecs)
        if (target.defaultSpecId != m.defaultSpecId) b += SetDefaultSpec(target.defaultSpecId)

        val baseOrderIds = m.sortOrders.map(_.orderId).toSet
        target.sortOrders.filterNot(so => baseOrderIds(so.orderId)).foreach(so => b += AddSortOrder(so))
        if (target.defaultSortOrderId != m.defaultSortOrderId)
          b += SetDefaultSortOrder(target.defaultSortOrderId)

        val propChanges = target.properties.filter { case (k, v) => m.properties.get(k) != Some(v) }
        if (propChanges.nonEmpty) b += SetProperties(propChanges)
        val propRemovals = m.properties.keys.filterNot(target.properties.contains).toSeq
        if (propRemovals.nonEmpty) b += RemoveProperties(propRemovals)

        val baseSnapIds = m.snapshots.map(_.snapshotId).toSet
        val targetSnapIds = target.snapshots.map(_.snapshotId).toSet
        target.snapshots.filterNot(s => baseSnapIds(s.snapshotId))
          .sortBy(s => (s.sequenceNumber, s.timestampMs))
          .foreach(s => b += AddSnapshot(s))
        val droppedSnaps = m.snapshots.map(_.snapshotId).filterNot(targetSnapIds)
        if (droppedSnaps.nonEmpty) b += RemoveSnapshots(droppedSnaps)

        target.refs.foreach { case (name, r) =>
          if (m.refs.get(name) != Some(r)) b += SetSnapshotRef(name, r)
        }
        m.refs.keys.filterNot(target.refs.contains).foreach(name => b += RemoveSnapshotRef(name))

        val baseStats = m.statistics.map(s => s.snapshotId -> s).toMap
        target.statistics.foreach { st =>
          if (baseStats.get(st.snapshotId) != Some(st)) b += SetStatistics(st)
        }
        val targetStatIds = target.statistics.map(_.snapshotId).toSet
        m.statistics.map(_.snapshotId).filterNot(targetStatIds)
          .foreach(id => b += RemoveStatistics(id))

        val basePStats = m.partitionStatistics.map(s => s.snapshotId -> s).toMap
        target.partitionStatistics.foreach { ps =>
          if (basePStats.get(ps.snapshotId) != Some(ps)) b += SetPartitionStatistics(ps)
        }
        val targetPStatIds = target.partitionStatistics.map(_.snapshotId).toSet
        m.partitionStatistics.map(_.snapshotId).filterNot(targetPStatIds)
          .foreach(id => b += RemovePartitionStatistics(id))
    }
    b.result()
  }

  /** Requirements guarding a (base → target) transition: assert the BASE
    * values of everything the diff changes (ref: each UpdateTableMetadata
    * builder emits its own requirement, update/__init__.py). */
  def requirements(base: Option[TableMetadata], target: TableMetadata): Seq[TableRequirement] = {
    import TableRequirement._
    base match {
      case None => Seq(AssertCreate)
      case Some(m) =>
        val b = Seq.newBuilder[TableRequirement]
        b += AssertTableUuid(m.tableUuid)
        val changedRefs =
          target.refs.keys.filter(k => target.refs.get(k) != m.refs.get(k)) ++
          m.refs.keys.filterNot(target.refs.contains)
        changedRefs.toSeq.distinct.foreach { ref =>
          b += AssertRefSnapshotId(ref, m.refs.get(ref).map(_.snapshotId))
        }
        val schemasAdded = target.schemas.map(_.schemaId).toSet != m.schemas.map(_.schemaId).toSet
        if (schemasAdded || target.currentSchemaId != m.currentSchemaId) {
          b += AssertCurrentSchemaId(m.currentSchemaId)
          b += AssertLastAssignedFieldId(m.lastColumnId)
        }
        val specsAdded =
          target.partitionSpecs.map(_.specId).toSet != m.partitionSpecs.map(_.specId).toSet
        if (specsAdded) b += AssertLastAssignedPartitionId(m.lastPartitionId)
        if (target.defaultSpecId != m.defaultSpecId) b += AssertDefaultSpecId(m.defaultSpecId)
        if (target.defaultSortOrderId != m.defaultSortOrderId)
          b += AssertDefaultSortOrderId(m.defaultSortOrderId)
        b.result()
    }
  }

  // ---- apply: replay updates onto a base (the server side) ---------------

  /** Replay `updates` onto `base` (None = create), maintaining the
    * server-owned fields: last-column-id / last-partition-id /
    * last-sequence-number are recomputed from added schemas/specs/
    * snapshots; set-snapshot-ref on a branch that becomes the main branch
    * updates current-snapshot-id + snapshot-log; remove-snapshots trims
    * the snapshot-log; next-row-id (v3) advances by the added snapshot's
    * `added-records` (ref: update/__init__.py:320–560 apply fns). */
  def applyUpdates(base: Option[TableMetadata], updates: Seq[TableUpdate],
      nowMs: Long): TableMetadata = {
    import TableUpdate._
    var m = base.getOrElse(TableMetadata(
      formatVersion = 1, tableUuid = "", location = "",
      schemas = Nil, partitionSpecs = Nil, sortOrders = Nil,
      lastPartitionId = PartitionSpec.StartFieldId - 1))
    var lastAddedSchema = -1
    var lastAddedSpec = -1
    var lastAddedOrder = -1
    updates.foreach {
      case AssignUuid(uuid) => m = m.copy(tableUuid = uuid)
      case UpgradeFormatVersion(v) =>
        require(v >= m.formatVersion, s"Cannot downgrade v${m.formatVersion} to v$v")
        m = m.copy(formatVersion = v,
          nextRowId = if (v >= 3) m.nextRowId.orElse(Some(0L)) else m.nextRowId)
      case SetLocation(loc) => m = m.copy(location = loc)
      case AddSchema(s) =>
        require(!m.schemas.exists(_.schemaId == s.schemaId),
          s"Schema id ${s.schemaId} already exists")
        lastAddedSchema = s.schemaId
        m = m.copy(schemas = m.schemas :+ s,
          lastColumnId = math.max(m.lastColumnId, s.highestFieldId))
      case SetCurrentSchema(id) =>
        val resolved = if (id == -1) lastAddedSchema else id
        require(m.schemas.exists(_.schemaId == resolved), s"No schema $resolved")
        m = m.copy(currentSchemaId = resolved)
      case AddSpec(sp) =>
        require(!m.partitionSpecs.exists(_.specId == sp.specId),
          s"Spec id ${sp.specId} already exists")
        lastAddedSpec = sp.specId
        val maxField = (sp.fields.map(_.fieldId) :+ (PartitionSpec.StartFieldId - 1)).max
        m = m.copy(partitionSpecs = m.partitionSpecs :+ sp,
          lastPartitionId = math.max(m.lastPartitionId, maxField))
      case SetDefaultSpec(id) =>
        val resolved = if (id == -1) lastAddedSpec else id
        require(m.partitionSpecs.exists(_.specId == resolved), s"No spec $resolved")
        m = m.copy(defaultSpecId = resolved)
      case AddSortOrder(so) =>
        require(!m.sortOrders.exists(_.orderId == so.orderId),
          s"Sort order ${so.orderId} already exists")
        lastAddedOrder = so.orderId
        m = m.copy(sortOrders = m.sortOrders :+ so)
      case SetDefaultSortOrder(id) =>
        val resolved = if (id == -1) lastAddedOrder else id
        require(m.sortOrders.exists(_.orderId == resolved), s"No sort order $resolved")
        m = m.copy(defaultSortOrderId = resolved)
      case AddSnapshot(s) =>
        require(!m.snapshots.exists(_.snapshotId == s.snapshotId),
          s"Snapshot ${s.snapshotId} already exists")
        val addedRecords = s.summary.get("added-records").map(_.toLong).getOrElse(0L)
        m = m.copy(snapshots = m.snapshots :+ s,
          lastSequenceNumber = math.max(m.lastSequenceNumber, s.sequenceNumber),
          lastUpdatedMs = s.timestampMs,
          nextRowId = s.firstRowId.map(f => math.max(
            m.nextRowId.getOrElse(0L), f + addedRecords)).orElse(m.nextRowId))
      case SetSnapshotRef(name, r) =>
        val id = r.snapshotId
        require(m.snapshots.exists(_.snapshotId == id),
          s"Cannot set $name to unknown snapshot $id")
        m = m.copy(refs = m.refs + (name -> r))
        if (name == "main") {
          val alreadyLogged = m.snapshotLog.lastOption.exists(_.snapshotId == id)
          // stamp with the snapshot's own ts for a fresh append (so the
          // entry matches what the committer wrote), but NEVER let the
          // log go non-monotonic: a ROLLBACK to an older snapshot logs at
          // commit time (ref update/__init__.py:493–506 — last_updated_ms
          // falls back to now when the ref doesn't pair with add-snapshot)
          val lastTs = m.snapshotLog.lastOption.map(_.timestampMs).getOrElse(Long.MinValue)
          val snapTs = m.snapshotById(id).map(_.timestampMs).getOrElse(nowMs)
          m = m.copy(currentSnapshotId = Some(id),
            snapshotLog = if (alreadyLogged) m.snapshotLog
              else m.snapshotLog :+ SnapshotLogEntry(
                if (snapTs >= lastTs) snapTs else nowMs, id))
        }
      case RemoveSnapshots(ids) =>
        val gone = ids.toSet
        // surviving children of removed snapshots lose their parent link
        // (ref: update/__init__.py:520–544 — the remove-snapshots applier
        // nulls dangling parents so lineage walks stay closed)
        val kept = m.snapshots.filterNot(s => gone(s.snapshotId)).map { s =>
          if (s.parentSnapshotId.exists(gone)) s.copy(parentSnapshotId = None) else s
        }
        m = m.copy(
          snapshots = kept,
          snapshotLog = m.snapshotLog.filterNot(e => gone(e.snapshotId)))
      case RemoveSnapshotRef(name) =>
        m = m.copy(refs = m.refs - name,
          currentSnapshotId = if (name == "main") None else m.currentSnapshotId)
      case SetProperties(up) => m = m.copy(properties = m.properties ++ up)
      case RemoveProperties(rm) => m = m.copy(properties = m.properties -- rm)
      case SetStatistics(st) =>
        m = m.copy(statistics =
          m.statistics.filterNot(_.snapshotId == st.snapshotId) :+ st)
      case RemoveStatistics(id) =>
        m = m.copy(statistics = m.statistics.filterNot(_.snapshotId == id))
      case SetPartitionStatistics(st) =>
        m = m.copy(partitionStatistics =
          m.partitionStatistics.filterNot(_.snapshotId == st.snapshotId) :+ st)
      case RemovePartitionStatistics(id) =>
        m = m.copy(partitionStatistics =
          m.partitionStatistics.filterNot(_.snapshotId == id))
      case RemoveSchemas(ids) =>
        val gone = ids.toSet
        require(!gone(m.currentSchemaId), "Cannot remove the current schema")
        m = m.copy(schemas = m.schemas.filterNot(s => gone(s.schemaId)))
      case RemovePartitionSpecs(ids) =>
        val gone = ids.toSet
        require(!gone(m.defaultSpecId), "Cannot remove the default spec")
        m = m.copy(partitionSpecs = m.partitionSpecs.filterNot(sp => gone(sp.specId)))
    }
    m.copy(lastUpdatedMs = nowMs)
  }
}
