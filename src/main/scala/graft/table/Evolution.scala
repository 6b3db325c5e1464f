package graft.table

import graft.core._
import graft.meta._

/** Schema evolution builder (ref: pyiceberg/table/update/schema.py).
  *
  * Changes are staged and applied in one metadata commit; field-ids are
  * never reused, so old data files keep reading correctly through id-based
  * projection.
  */
final class SchemaUpdate(table: IceTable) {
  private var fields: Vector[NestedField] = table.schema.fields.toVector
  private var nextId: Int = math.max(table.metadata.lastColumnId, table.schema.highestFieldId)
  private var identifierIds: Seq[Int] = table.schema.identifierFieldIds

  private def idx(name: String): Int = {
    val i = fields.indexWhere(_.name == name)
    require(i >= 0, s"No such column: $name")
    i
  }

  /** ref: update/schema.py:163 add_column */
  def addColumn(name: String, t: IceType, doc: Option[String] = None,
      default: Option[Any] = None): SchemaUpdate = {
    require(!fields.exists(_.name == name), s"Column $name already exists")
    nextId += 1
    fields = fields :+ NestedField(nextId, name, t, required = false, doc,
      initialDefault = default, writeDefault = default)
    this
  }

  /** ref: update/schema.py:297 rename_column — id stays, name changes. */
  def renameColumn(from: String, to: String): SchemaUpdate = {
    require(!fields.exists(_.name == to), s"Column $to already exists")
    val i = idx(from)
    fields = fields.updated(i, fields(i).copy(name = to))
    this
  }

  /** ref: update/schema.py (delete via _ApplyChanges :697) */
  def dropColumn(name: String): SchemaUpdate = {
    val i = idx(name)
    require(!identifierIds.contains(fields(i).id), s"Cannot drop identifier field $name")
    fields = fields.patch(i, Nil, 1)
    this
  }

  /** ref: update/schema.py:439 update_column — only widening promotions. */
  def updateColumnType(name: String, to: IceType): SchemaUpdate = {
    val i = idx(name)
    val from = fields(i).fieldType
    require(SchemaConv.promotable(from, to), s"Cannot promote ${from.repr} to ${to.repr}")
    fields = fields.updated(i, fields(i).copy(fieldType = to))
    this
  }

  /** ref: update/schema.py:343 make_column_optional */
  def makeColumnOptional(name: String): SchemaUpdate = {
    val i = idx(name)
    fields = fields.updated(i, fields(i).copy(required = false))
    this
  }

  def updateColumnDoc(name: String, doc: String): SchemaUpdate = {
    val i = idx(name)
    fields = fields.updated(i, fields(i).copy(doc = Some(doc)))
    this
  }

  /** ref: update/schema.py:538-624 move_first/before/after */
  def moveFirst(name: String): SchemaUpdate = {
    val i = idx(name); val f = fields(i)
    fields = f +: fields.patch(i, Nil, 1)
    this
  }

  def moveBefore(name: String, other: String): SchemaUpdate = {
    val i = idx(name); val f = fields(i)
    val rest = fields.patch(i, Nil, 1)
    val j = rest.indexWhere(_.name == other)
    require(j >= 0, s"No such column: $other")
    fields = (rest.take(j) :+ f) ++ rest.drop(j)
    this
  }

  def moveAfter(name: String, other: String): SchemaUpdate = {
    val i = idx(name); val f = fields(i)
    val rest = fields.patch(i, Nil, 1)
    val j = rest.indexWhere(_.name == other)
    require(j >= 0, s"No such column: $other")
    fields = (rest.take(j + 1) :+ f) ++ rest.drop(j + 1)
    this
  }

  /** ref: update/schema.py:355 set_identifier_fields */
  def setIdentifierFields(names: String*): SchemaUpdate = {
    identifierIds = names.map(n => fields(idx(n)).id)
    this
  }

  /** ref: update/schema.py:146 union_by_name — add input fields missing
    * from the current schema (no type changes here beyond promotion). */
  def unionByName(other: Schema): SchemaUpdate = {
    other.fields.foreach { of =>
      fields.find(_.name == of.name) match {
        case None => addColumn(of.name, of.fieldType, of.doc)
        case Some(cur) if cur.fieldType != of.fieldType &&
            SchemaConv.promotable(cur.fieldType, of.fieldType) =>
          updateColumnType(cur.name, of.fieldType)
        case _ =>
      }
    }
    this
  }

  def commit(): Unit = {
    val newSchema = Schema(fields,
      schemaId = table.metadata.schemas.map(_.schemaId).max + 1,
      identifierFieldIds = identifierIds)
    table.commitMetadata { m =>
      m.copy(
        schemas = m.schemas :+ newSchema,
        currentSchemaId = newSchema.schemaId,
        lastColumnId = math.max(m.lastColumnId, nextId))
    }
  }
}

/** Partition-spec evolution (ref: pyiceberg/table/update/spec.py). Old
  * files keep their spec; scans build per-spec evaluators. */
final class SpecUpdate(table: IceTable) {
  private var fields: Vector[PartitionField] = table.spec.fields.toVector
  private var nextFieldId: Int =
    math.max(table.metadata.lastPartitionId, PartitionSpec.StartFieldId - 1)

  def addField(sourceName: String, transform: Transform, name: String = null): SpecUpdate = {
    val src = table.schema.findField(sourceName).getOrElse(
      throw new IllegalArgumentException(s"No such column: $sourceName"))
    nextFieldId += 1
    val pname = Option(name).getOrElse(s"${sourceName}_${transform.name.takeWhile(_ != '[')}")
    fields = fields :+ PartitionField(src.id, nextFieldId, pname, transform)
    this
  }

  def removeField(name: String): SpecUpdate = {
    val i = fields.indexWhere(_.name == name)
    require(i >= 0, s"No partition field $name")
    fields = fields.patch(i, Nil, 1)
    this
  }

  def renameField(from: String, to: String): SpecUpdate = {
    val i = fields.indexWhere(_.name == from)
    require(i >= 0, s"No partition field $from")
    fields = fields.updated(i, fields(i).copy(name = to))
    this
  }

  def commit(): Unit = {
    val newSpec = PartitionSpec(table.metadata.partitionSpecs.map(_.specId).max + 1, fields)
    table.commitMetadata { m =>
      m.copy(
        partitionSpecs = m.partitionSpecs :+ newSpec,
        defaultSpecId = newSpec.specId,
        lastPartitionId = math.max(m.lastPartitionId, nextFieldId))
    }
  }
}

/** Branch/tag + rollback management (ref: table/update/snapshot.py:864-999
  * ManageSnapshots). */
final class ManageSnapshots(table: IceTable) {
  def createTag(name: String, snapshotId: Long): ManageSnapshots = {
    table.commitMetadata(m => m.copy(refs = m.refs + (name -> SnapshotRef(snapshotId, "tag"))))
    this
  }
  def createBranch(name: String, snapshotId: Long): ManageSnapshots = {
    table.commitMetadata(m => m.copy(refs = m.refs + (name -> SnapshotRef(snapshotId, "branch"))))
    this
  }
  def removeTag(name: String): ManageSnapshots = {
    table.commitMetadata(m => m.copy(refs = m.refs - name))
    this
  }
  def removeBranch(name: String): ManageSnapshots = removeTag(name)

  def setCurrentSnapshot(snapshotId: Long): ManageSnapshots = {
    require(table.metadata.snapshotById(snapshotId).isDefined, s"No snapshot $snapshotId")
    table.commitMetadata { m =>
      m.copy(currentSnapshotId = Some(snapshotId),
        refs = m.refs + ("main" -> SnapshotRef(snapshotId, "branch")),
        snapshotLog = m.snapshotLog :+ SnapshotLogEntry(System.currentTimeMillis(), snapshotId))
    }
    this
  }

  def rollbackToSnapshot(snapshotId: Long): ManageSnapshots = setCurrentSnapshot(snapshotId)

  def rollbackToTimestamp(tsMs: Long): ManageSnapshots = {
    val snap = table.metadata.snapshotAsOf(tsMs).getOrElse(
      throw new IllegalArgumentException(s"No snapshot at $tsMs"))
    setCurrentSnapshot(snap.snapshotId)
  }
}

/** Snapshot expiry (ref: table/maintenance.py:30 + ExpireSnapshots
  * update/snapshot.py:1032 — branch/tag heads are protected). */
object Maintenance {
  def expireSnapshots(table: IceTable, olderThanMs: Long, retainLast: Int = 1): Seq[Long] = {
    val m = table.metadata
    val protectedIds: Set[Long] =
      m.refs.values.map(_.snapshotId).toSet ++ m.currentSnapshotId.toSet ++
        m.currentSnapshotId.toSeq.flatMap(id => m.ancestorsOf(id).map(_.snapshotId)).toSet
    val byTime = m.snapshots.sortBy(_.timestampMs)
    val keepNewest = byTime.takeRight(retainLast).map(_.snapshotId).toSet
    val expired = byTime
      .filter(s => s.timestampMs < olderThanMs && !protectedIds(s.snapshotId) &&
        !keepNewest(s.snapshotId))
      .map(_.snapshotId)
    if (expired.nonEmpty) {
      val gone = expired.toSet
      table.commitMetadata(meta => meta.copy(
        snapshots = meta.snapshots.filterNot(s => gone(s.snapshotId)),
        snapshotLog = meta.snapshotLog.filterNot(e => gone(e.snapshotId))))
    }
    expired
  }
}
