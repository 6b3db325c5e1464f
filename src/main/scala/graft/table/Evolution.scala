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

  /** Apply `op` to the field list CONTAINING the column at dotted `path` —
    * every operation below works at any nesting depth (ref:
    * update/schema.py:850 _UnionByNameVisitor walks struct internals the
    * same way). */
  /** Path navigation uses Iceberg's canonical segments: struct members by
    * name, list elements as `element`, map sides as `key`/`value` — so
    * `renameColumn("items.element.status", "state")` renames a leaf
    * INSIDE a list of structs (ref schema.py:1141 _IndexByName indexes
    * the same paths). */
  private def editLevel(path: String)(
      op: (Vector[NestedField], String) => Vector[NestedField]): Unit = {
    def rec(fs: Vector[NestedField], parts: Seq[String]): Vector[NestedField] = parts match {
      case Seq(leaf) => op(fs, leaf)
      case head +: rest =>
        val i = fs.indexWhere(_.name == head)
        require(i >= 0, s"No such column: $head")
        fs.updated(i, fs(i).copy(fieldType = recType(fs(i).fieldType, head, rest)))
    }
    def recType(t: IceType, owner: String, parts: Seq[String]): IceType = t match {
      case IStruct(children) => IStruct(rec(children.toVector, parts))
      case IList(eid, el, req) =>
        require(parts.head == "element" && parts.sizeIs > 1,
          s"Column $owner is a list; address its members as $owner.element.<name>")
        IList(eid, recType(el, s"$owner.element", parts.tail), req)
      case IMap(kid, k, vid, v, req) => parts.head match {
        case "key" if parts.sizeIs > 1 =>
          IMap(kid, recType(k, s"$owner.key", parts.tail), vid, v, req)
        case "value" if parts.sizeIs > 1 =>
          IMap(kid, k, vid, recType(v, s"$owner.value", parts.tail), req)
        case other => throw new IllegalArgumentException(
          s"Column $owner is a map; address $owner.key.<name> or $owner.value.<name>, not $other")
      }
      case other =>
        throw new IllegalArgumentException(s"Column $owner is ${other.repr}, not a struct")
    }
    fields = rec(fields, path.split("\\.").toSeq)
  }

  private def idxIn(fs: Vector[NestedField], name: String): Int = {
    val i = fs.indexWhere(_.name == name)
    require(i >= 0, s"No such column: $name")
    i
  }

  /** Fresh ids for every nested field of a newly added (possibly complex)
    * column. */
  private def assignIds(t: IceType): IceType = t match {
    case IStruct(fs) => IStruct(fs.map { f =>
      nextId += 1; val id = nextId
      f.copy(id = id, fieldType = assignIds(f.fieldType))
    })
    case IList(_, e, req) =>
      nextId += 1; val id = nextId
      IList(id, assignIds(e), req)
    case IMap(_, k, _, v, req) =>
      nextId += 1; val kid = nextId
      nextId += 1; val vid = nextId
      IMap(kid, assignIds(k), vid, assignIds(v), req)
    case prim => prim
  }

  /** ref: update/schema.py:163 add_column — dotted path adds INSIDE a
    * struct (`info.score` appends `score` to struct `info`). */
  def addColumn(name: String, t: IceType, doc: Option[String] = None,
      default: Option[Any] = None): SchemaUpdate = {
    editLevel(name) { (fs, leaf) =>
      require(!fs.exists(_.name == leaf), s"Column $name already exists")
      nextId += 1
      fs :+ NestedField(nextId, leaf, assignIds(t), required = false, doc,
        initialDefault = default, writeDefault = default)
    }
    this
  }

  /** ref: update/schema.py:297 rename_column — id stays, name changes; `to`
    * is the new LEAF name (`renameColumn("info.status", "state")`). */
  def renameColumn(from: String, to: String): SchemaUpdate = {
    require(!to.contains('.'), "rename target is a leaf name, not a path")
    editLevel(from) { (fs, leaf) =>
      require(!fs.exists(_.name == to), s"Column $to already exists")
      val i = idxIn(fs, leaf)
      fs.updated(i, fs(i).copy(name = to))
    }
    this
  }

  /** ref: update/schema.py (delete via _ApplyChanges :697) */
  def dropColumn(name: String): SchemaUpdate = {
    editLevel(name) { (fs, leaf) =>
      val i = idxIn(fs, leaf)
      require(!identifierIds.contains(fs(i).id), s"Cannot drop identifier field $name")
      fs.patch(i, Nil, 1)
    }
    this
  }

  /** ref: update/schema.py:439 update_column — only widening promotions. */
  def updateColumnType(name: String, to: IceType): SchemaUpdate = {
    editLevel(name) { (fs, leaf) =>
      val i = idxIn(fs, leaf)
      val from = fs(i).fieldType
      require(SchemaConv.promotable(from, to), s"Cannot promote ${from.repr} to ${to.repr}")
      fs.updated(i, fs(i).copy(fieldType = to))
    }
    this
  }

  /** ref: update/schema.py:343 make_column_optional */
  def makeColumnOptional(name: String): SchemaUpdate = {
    editLevel(name) { (fs, leaf) =>
      val i = idxIn(fs, leaf)
      fs.updated(i, fs(i).copy(required = false))
    }
    this
  }

  def updateColumnDoc(name: String, doc: String): SchemaUpdate = {
    editLevel(name) { (fs, leaf) =>
      val i = idxIn(fs, leaf)
      fs.updated(i, fs(i).copy(doc = Some(doc)))
    }
    this
  }

  /** ref: update/schema.py:284 set_default_value — changes the WRITE
    * default only (initial-default is fixed at add time; rewriting it
    * would change what old files read back). Pass null to clear. */
  def setDefaultValue(name: String, value: Any): SchemaUpdate = {
    editLevel(name) { (fs, leaf) =>
      val i = idxIn(fs, leaf)
      require(!(fs(i).required && value == null),
        s"Cannot clear the default of required column $name")
      fs.updated(i, fs(i).copy(writeDefault = Option(value)))
    }
    this
  }

  /** ref: update/schema.py:538-624 move_first/before/after — within one
    * struct level. */
  def moveFirst(name: String): SchemaUpdate = {
    editLevel(name) { (fs, leaf) =>
      val i = idxIn(fs, leaf); val f = fs(i)
      f +: fs.patch(i, Nil, 1)
    }
    this
  }

  def moveBefore(name: String, other: String): SchemaUpdate = move(name, other, after = false)
  def moveAfter(name: String, other: String): SchemaUpdate = move(name, other, after = true)

  private def move(name: String, other: String, after: Boolean): SchemaUpdate = {
    val otherLeaf = other.split("\\.").last
    editLevel(name) { (fs, leaf) =>
      val i = idxIn(fs, leaf); val f = fs(i)
      val rest = fs.patch(i, Nil, 1)
      val j = idxIn(rest, otherLeaf) + (if (after) 1 else 0)
      (rest.take(j) :+ f) ++ rest.drop(j)
    }
    this
  }

  /** ref: update/schema.py:355 set_identifier_fields */
  def setIdentifierFields(names: String*): SchemaUpdate = {
    val sch = Schema(fields)
    identifierIds = names.map(n => sch.findField(n).getOrElse(
      throw new IllegalArgumentException(s"No such column: $n")).id)
    this
  }

  /** ref: update/schema.py:146 union_by_name, :850 _UnionByNameVisitor —
    * recursive: fields missing at ANY depth are added (fresh ids), and
    * promotable type differences are widened, struct internals included. */
  def unionByName(other: Schema): SchemaUpdate = {
    def merge(cur: Vector[NestedField], inc: Seq[NestedField]): Vector[NestedField] = {
      var out = cur
      inc.foreach { of =>
        out.indexWhere(_.name == of.name) match {
          case -1 =>
            nextId += 1
            out = out :+ NestedField(nextId, of.name, assignIds(of.fieldType),
              required = false, of.doc)
          case i =>
            val curF = out(i)
            (curF.fieldType, of.fieldType) match {
              case (IStruct(a), IStruct(b)) =>
                out = out.updated(i, curF.copy(fieldType = IStruct(merge(a.toVector, b))))
              case (a, b) if a != b && SchemaConv.promotable(a, b) =>
                out = out.updated(i, curF.copy(fieldType = b))
              case _ =>
            }
        }
      }
      out
    }
    fields = merge(fields, other.fields)
    this
  }

  def commit(): Unit = {
    val newSchema = Schema(fields,
      schemaId = table.metadata.schemas.map(_.schemaId).max + 1,
      identifierFieldIds = identifierIds)
    if (table.metadata.formatVersion >= 3)
      RowLineage.requireNoReservedNames(newSchema)
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
  /** (ref: create_tag update/snapshot.py:864 — optional max_ref_age_ms;
    * tags cannot carry snapshot-retention fields, refs.py:49). */
  def createTag(name: String, snapshotId: Long,
      maxRefAgeMs: Option[Long] = None): ManageSnapshots = {
    // a ref to a nonexistent snapshot would dangle and break VERSION AS OF
    // (ref: update/__init__.py:491 'Cannot set ... to unknown snapshot')
    table.commitMetadata { m =>
      require(m.snapshotById(snapshotId).isDefined,
        s"Cannot set tag $name to unknown snapshot: $snapshotId")
      m.copy(refs = m.refs +
        (name -> SnapshotRef(snapshotId, "tag", maxRefAgeMs = maxRefAgeMs)))
    }
    this
  }
  /** (ref: create_branch update/snapshot.py:893 — optional
    * max_snapshot_age_ms / min_snapshots_to_keep / max_ref_age_ms). */
  def createBranch(name: String, snapshotId: Long,
      minSnapshotsToKeep: Option[Int] = None,
      maxSnapshotAgeMs: Option[Long] = None,
      maxRefAgeMs: Option[Long] = None): ManageSnapshots = {
    table.commitMetadata { m =>
      require(m.snapshotById(snapshotId).isDefined,
        s"Cannot set branch $name to unknown snapshot: $snapshotId")
      m.copy(refs = m.refs +
        (name -> SnapshotRef(snapshotId, "branch", minSnapshotsToKeep,
          maxSnapshotAgeMs, maxRefAgeMs)))
    }
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

  /** Fast-forward `branch` to the head of `to` — the PUBLISH step of
    * write-audit-publish: audit commits land on a staging branch
    * (append(df, props, Some("audit"))), and once validated,
    * fastForward("main", "audit") makes them current atomically. Requires
    * `branch`'s head (if any) to be an ancestor of the target, so a
    * publish can never silently drop commits that landed on `branch`
    * meanwhile. Moving main also moves current-snapshot-id + the snapshot
    * log (the fast_forward of the public java API; pyiceberg exposes the
    * same move via set_ref updates). */
  def fastForward(branch: String, to: String): ManageSnapshots = {
    table.commitMetadata { m =>
      val target = m.refs.getOrElse(to,
        throw new IllegalArgumentException(s"No ref $to")).snapshotId
      m.refs.get(branch).foreach { cur =>
        require(cur.refType == "branch", s"$branch is a tag — tags cannot move")
        require(m.ancestorsOf(target).exists(_.snapshotId == cur.snapshotId),
          s"Cannot fast-forward $branch: its head ${cur.snapshotId} is not an " +
            s"ancestor of $to ($target) — a merge/rebase, not a fast-forward")
      }
      val moved = m.copy(refs = m.refs + (branch -> SnapshotRef(target, "branch")))
      if (branch == "main")
        moved.copy(currentSnapshotId = Some(target),
          snapshotLog = m.snapshotLog :+ SnapshotLogEntry(System.currentTimeMillis(), target))
      else moved
    }
    this
  }

  def rollbackToTimestamp(tsMs: Long): ManageSnapshots = {
    val snap = table.metadata.snapshotAsOf(tsMs).getOrElse(
      throw new IllegalArgumentException(s"No snapshot at $tsMs"))
    setCurrentSnapshot(snap.snapshotId)
  }
}

/** Chained snapshot-expiry builder (ref: MaintenanceTable
  * table/maintenance.py:30 returns ExpireSnapshots update/snapshot.py:1032
  * — by_id :1082 / by_ids :1103 / older_than :1118; branch/tag heads are
  * always protected, and by_id of a protected id raises while commit
  * silently re-filters, matching the reference's asymmetry). `retainLast`
  * is our extension (the reference keeps the current head via ref
  * protection only). */
final class ExpireSnapshots private[table] (table: IceTable) {
  private val toExpire = scala.collection.mutable.LinkedHashSet[Long]()
  // 0 = no newest-N retention (the reference protects via refs only);
  // the legacy expireSnapshots(olderThanMs, retainLast) sets it explicitly
  private var keepLast = 0
  private var cleanFiles = false

  /** Also DELETE files reachable only from expired snapshots (our
    * extension — the reference removes metadata only, update/snapshot.py
    * :1032, so expired storage is never reclaimed). A data file survives
    * iff some SURVIVING snapshot references it LIVE (Added/Existing);
    * Deleted-status references do not retain — matching Iceberg-format
    * expiry semantics, where changelog reads older than the expiry
    * horizon lose removed-row contents. Metadata is committed BEFORE any
    * delete, so a crash leaves only orphans, never dangling references. */
  def cleanExpiredFiles(enabled: Boolean): this.type = { cleanFiles = enabled; this }

  private def m = table.metadata
  /** Branch/tag HEADS plus the current snapshot — exactly the reference's
    * protection set (update/snapshot.py:1068 _get_protected_snapshot_ids).
    * Ancestors are expirable: snapshots are self-contained (each owns its
    * manifest list), so removing history only retires time travel to it. */
  private def protectedIds: Set[Long] =
    retentionView(m, System.currentTimeMillis())._2

  /** PER-REF retention (extension following iceberg-java RemoveSnapshots;
    * the reference persists the fields — table/refs.py:40 — but its
    * expiry only protects heads): (1) refs other than main whose HEAD
    * snapshot is older than their max-ref-age-ms are dropped by this
    * expiry commit; (2) each surviving branch carrying retention fields
    * additionally protects its newest min-snapshots-to-keep ancestors and
    * every ancestor younger than max-snapshot-age-ms. Returns the
    * surviving refs and the protection set. */
  private def retentionView(meta: graft.meta.TableMetadata,
      nowMs: Long): (Map[String, graft.meta.SnapshotRef], Set[Long]) = {
    val refsAfter = meta.refs.filter { case (name, r) =>
      name == "main" || r.maxRefAgeMs.forall { maxAge =>
        val headTs = meta.snapshotById(r.snapshotId).map(_.timestampMs)
          .getOrElse(Long.MaxValue)
        nowMs - headTs <= maxAge
      }
    }
    val prot = scala.collection.mutable.Set[Long]()
    prot ++= refsAfter.values.map(_.snapshotId)
    prot ++= meta.currentSnapshotId
    refsAfter.values.filter(r => r.refType == "branch" &&
        (r.minSnapshotsToKeep.isDefined || r.maxSnapshotAgeMs.isDefined))
      .foreach { r =>
        val keepN = r.minSnapshotsToKeep.getOrElse(1)
        meta.ancestorsOf(r.snapshotId).zipWithIndex.foreach { case (s, i) =>
          if (i < keepN ||
              r.maxSnapshotAgeMs.exists(a => nowMs - s.timestampMs <= a))
            prot += s.snapshotId
        }
      }
    (refsAfter, prot.toSet)
  }

  def byId(id: Long): this.type = {
    require(m.snapshotById(id).isDefined, s"Snapshot with ID $id does not exist")
    require(!protectedIds(id), s"Snapshot with ID $id is protected and cannot be expired")
    toExpire += id
    this
  }

  def byIds(ids: Seq[Long]): this.type = { ids.foreach(byId); this }

  def olderThan(tsMs: Long): this.type = {
    val prot = protectedIds
    m.snapshots.filter(s => s.timestampMs < tsMs && !prot(s.snapshotId))
      .foreach(toExpire += _.snapshotId)
    this
  }

  def retainLast(n: Int): this.type = {
    require(n >= 1, s"retainLast must be >= 1: $n")
    keepLast = n
    this
  }

  /** Expired snapshot ids actually removed. Protection and retention are
    * re-derived INSIDE the commit closure, against whatever (possibly
    * refreshed-on-retry) metadata the swap ultimately applies to — a
    * concurrent tag/branch/rollback to an expiring snapshot that lands
    * before our CAS keeps that snapshot (the reference re-filters at
    * commit time too, update/snapshot.py:1050). Orphan reachability runs
    * AFTER the successful swap, from the winning base's surviving
    * snapshots, so no file referenced by concurrently-committed state is
    * ever deleted; a crash between swap and delete leaves only orphans,
    * never dangling references. */
  def commit(): Seq[Long] = {
    val wanted = toExpire.toSet
    val nowMs = System.currentTimeMillis()
    // no-op pre-check against CURRENT metadata: scheduled maintenance that
    // expires nothing must not write a new metadata version (churn +
    // spurious CAS conflicts for concurrent writers). The authoritative
    // filtering still re-runs inside the retry closure.
    locally {
      val meta = table.metadata
      val (refsAfter, prot) = retentionView(meta, nowMs)
      val keepNewest = if (keepLast == 0) Set.empty[Long]
        else meta.snapshots.sortBy(_.timestampMs).takeRight(keepLast).map(_.snapshotId).toSet
      val refsChange = refsAfter != meta.refs
      if (!refsChange && !meta.snapshots.exists(s =>
        wanted(s.snapshotId) && !prot(s.snapshotId) && !keepNewest(s.snapshotId)))
        return Nil
    }
    // captured from the closure's FINAL (winning) application
    var expSnaps: Seq[graft.meta.Snapshot] = Nil
    var keptSnaps: Seq[graft.meta.Snapshot] = Nil
    var expStatsPaths: Seq[String] = Nil
    table.commitMetadata { meta =>
      val (refsAfter, prot) = retentionView(meta, nowMs)
      val keepNewest = if (keepLast == 0) Set.empty[Long]
        else meta.snapshots.sortBy(_.timestampMs).takeRight(keepLast).map(_.snapshotId).toSet
      val gone = meta.snapshots.sortBy(_.timestampMs).map(_.snapshotId)
        .filter(id => wanted(id) && !prot(id) && !keepNewest(id)).toSet
      expSnaps = meta.snapshots.filter(s => gone(s.snapshotId))
      // children of removed snapshots lose their dangling parent pointer
      // (reference parity: update/__init__.py:520-527)
      keptSnaps = meta.snapshots.filterNot(s => gone(s.snapshotId)).map(s =>
        if (s.parentSnapshotId.exists(gone)) s.copy(parentSnapshotId = None) else s)
      // statistics / partition-statistics of removed snapshots go with
      // them (reference parity: update/__init__.py:540-544); their files
      // are physically reclaimed below iff cleanFiles
      expStatsPaths = meta.statistics.filter(st => gone(st.snapshotId)).map(_.statisticsPath) ++
        meta.partitionStatistics.filter(ps => gone(ps.snapshotId)).map(_.statisticsPath)
      meta.copy(
        snapshots = keptSnaps,
        refs = refsAfter,
        snapshotLog = meta.snapshotLog.filterNot(e => gone(e.snapshotId)),
        statistics = meta.statistics.filterNot(st => gone(st.snapshotId)),
        partitionStatistics = meta.partitionStatistics.filterNot(ps => gone(ps.snapshotId)))
    }
    if (cleanFiles && expSnaps.nonEmpty) {
      val orphans = orphanFiles(expSnaps, keptSnaps) ++ expStatsPaths
      if (orphans.nonEmpty) deleteOrphans(orphans)
    }
    expSnaps.map(_.snapshotId)
  }

  /** Files reachable ONLY from expired snapshots: expired manifest lists,
    * manifests absent from every surviving list, and content files with
    * no LIVE reference in any surviving manifest. The content-file diff
    * runs as a Spark job past the distributed-planning threshold —
    * reachability over a 100 TB table's manifests is a cluster walk, not
    * a driver loop. */
  private def orphanFiles(expSnaps: Seq[graft.meta.Snapshot],
      keptSnaps: Seq[graft.meta.Snapshot]): Seq[String] = {
    import graft.meta.{EntryStatus, ManifestIO, Io}
    val keptLists = keptSnaps.map(_.manifestList).toSet
    val expLists = expSnaps.map(_.manifestList).distinct.filterNot(keptLists)

    val keptManifests = keptSnaps.flatMap(s =>
      ManifestIO.readManifestList(s.manifestList)).map(_.manifestPath).toSet
    val expManifestsAll = expSnaps.flatMap(s =>
      ManifestIO.readManifestList(s.manifestList)).distinctBy(_.manifestPath)
    val expManifests = expManifestsAll.filterNot(mf => keptManifests(mf.manifestPath))

    // content-file reachability: candidate paths from expired-only
    // manifests minus LIVE paths of surviving manifests
    val keptMfs = keptSnaps.flatMap(s => ManifestIO.readManifestList(s.manifestList))
      .distinctBy(_.manifestPath)
    val schemaLocal = m.schema
    val specsById = (keptMfs ++ expManifests).map(_.partitionSpecId).distinct
      .map(id => id -> m.specById(id)).toMap
    def pathsOf(mfs: Seq[graft.meta.ManifestFile], liveOnly: Boolean): Set[String] = {
      val entries: Seq[String] =
        if (mfs.size < IceScan.distributedPlanningThreshold)
          mfs.flatMap { mf =>
            ManifestIO.readManifest(mf.manifestPath, specsById(mf.partitionSpecId), schemaLocal)
              .filter(e => !liveOnly || e.status != EntryStatus.Deleted)
              .map(_.dataFile.filePath)
          }
        else {
          val ioEntries = Io.confEntries(table.spark)
          val sc = table.spark.sparkContext
          sc.parallelize(mfs, math.min(mfs.size, sc.defaultParallelism))
            .flatMap { mf =>
              ManifestIO.readManifest(mf.manifestPath, specsById(mf.partitionSpecId),
                  schemaLocal, Io.confFrom(ioEntries))
                .filter(e => !liveOnly || e.status != EntryStatus.Deleted)
                .map(_.dataFile.filePath)
            }.distinct().collect().toSeq
        }
      entries.toSet
    }
    val keptLive = pathsOf(keptMfs, liveOnly = true)
    val candidates = pathsOf(expManifests, liveOnly = false)
    (expLists ++ expManifests.map(_.manifestPath) ++ (candidates -- keptLive)).distinct
  }

  private def deleteOrphans(paths: Seq[String]): Unit = {
    import graft.meta.Io
    if (paths.size < 64) paths.foreach(p =>
      try Io.delete(p) catch { case _: Exception => () })
    else {
      // executor-side deletes with the shipped session conf — a wide
      // expiry on an object store is bounded by store throughput, not one
      // driver thread
      val ioEntries = Io.confEntries(table.spark)
      val sc = table.spark.sparkContext
      sc.parallelize(paths, math.min(paths.size / 32 + 1, sc.defaultParallelism))
        .foreachPartition { it =>
          val c = Io.confFrom(ioEntries)
          it.foreach { p =>
            try {
              val hp = new org.apache.hadoop.fs.Path(p)
              if (!Io.isLocal(p)) hp.getFileSystem(c).delete(hp, false)
              else Io.delete(p)
            } catch { case _: Exception => () }
          }
        }
    }
  }
}

/** Snapshot expiry (ref: table/maintenance.py:30 + ExpireSnapshots
  * update/snapshot.py:1032 — branch/tag heads are protected). */
object Maintenance {
  def expireSnapshots(table: IceTable, olderThanMs: Long, retainLast: Int = 1): Seq[Long] =
    new ExpireSnapshots(table).olderThan(olderThanMs).retainLast(retainLast).commit()

  /** Delete files under the table's data/staging directories that NO
    * snapshot references and that are older than `olderThanMs` — the
    * leftovers of crashed writes (staged files whose commit never
    * happened, speculative task output). The age guard keeps in-flight
    * commits safe: a file younger than the horizon may belong to a write
    * racing this call. Returns the deleted paths. (Our extension — the
    * reference has no orphan-file GC; complements
    * expireSnapshots().cleanExpiredFiles, which reclaims files that WERE
    * referenced.)
    *
    * Scale shape: the LISTING fans out per first-level prefix ON
    * EXECUTORS, each prefix served by one recursive `FileSystem
    * .listFiles` — object stores implement it as flat LIST pages with
    * the mtime riding each page (no per-file stat round-trips), so a
    * 10⁶-object tree costs (prefixes × pages) parallel requests rather
    * than hours of one-thread driver walking. The referenced-set
    * manifest read likewise fans out past the distributed-planning
    * threshold; the driver keeps only the path diff (metadata-sized),
    * and deletes are batched executor-side past 64 paths. */
  def removeOrphanFiles(table: IceTable, olderThanMs: Long): Seq[String] = {
    import graft.meta.{Io, ManifestIO}
    import graft.core.PathUtil
    val m = table.metadata
    val sc = table.spark.sparkContext
    val ioEntries = Io.confEntries(table.spark)

    val allMfs = m.snapshots.flatMap(s => ManifestIO.readManifestList(s.manifestList))
      .distinctBy(_.manifestPath)
    val specsById = allMfs.map(_.partitionSpecId).distinct
      .map(id => id -> m.specById(id)).toMap
    val schemaLocal = m.schema
    val dataRefs: Seq[String] =
      if (allMfs.size < IceScan.distributedPlanningThreshold)
        allMfs.flatMap(mf => ManifestIO.readManifest(mf.manifestPath,
          specsById(mf.partitionSpecId), schemaLocal).map(_.dataFile.filePath))
      else
        sc.parallelize(allMfs, math.min(allMfs.size, sc.defaultParallelism))
          .flatMap(mf => ManifestIO.readManifest(mf.manifestPath,
            specsById(mf.partitionSpecId), schemaLocal, Io.confFrom(ioEntries))
            .map(_.dataFile.filePath))
          .collect().toSeq
    val referenced: Set[String] =
      (m.snapshots.map(_.manifestList) ++ allMfs.map(_.manifestPath) ++ dataRefs)
        .map(PathUtil.canon).toSet

    // first-level split on the driver (one LIST per root), recursive
    // listing per prefix on executors; age-filter applied executor-side
    // so only old-enough candidates travel back
    val roots = (Seq(s"${table.location}/data", s"${table.location}/staging") ++
      m.properties.get("write.data.path")).distinct
      .filter(Io.exists)
    val firstLevel: Seq[(String, Boolean, Long)] = roots.flatMap { r =>
      val hp = new org.apache.hadoop.fs.Path(r)
      hp.getFileSystem(Io.confFor(r)).listStatus(hp).toSeq
        .map(st => (st.getPath.toString, st.isDirectory, st.getModificationTime))
    }
    val prefixes = firstLevel.collect { case (p, true, _) => p }
    val rootFiles = firstLevel.collect { case (p, false, mt) if mt < olderThanMs => p }
    val walked: Seq[String] =
      if (prefixes.isEmpty) Nil
      else sc.parallelize(prefixes, math.min(prefixes.size, sc.defaultParallelism))
        .flatMap { d =>
          val hp = new org.apache.hadoop.fs.Path(d)
          val fs = hp.getFileSystem(Io.confFrom(ioEntries))
          val it = fs.listFiles(hp, true)
          val buf = Seq.newBuilder[String]
          while (it.hasNext) {
            val st = it.next()
            if (st.getModificationTime < olderThanMs) buf += st.getPath.toString
          }
          buf.result()
        }.collect().toSeq

    val orphans = (rootFiles ++ walked).map(PathUtil.canon).distinct
      .filterNot(referenced)
    deletePaths(table, orphans)
    orphans
  }

  /** Distributed deletes past a small threshold — shared by orphan GC
    * (the expiry path has its own copy keyed to its instance state). */
  private def deletePaths(table: IceTable, paths: Seq[String]): Unit = {
    import graft.meta.Io
    if (paths.size < 64) paths.foreach(p =>
      try Io.delete(p) catch { case _: Exception => () })
    else {
      val ioEntries = Io.confEntries(table.spark)
      val sc = table.spark.sparkContext
      sc.parallelize(paths, math.min(paths.size / 32 + 1, sc.defaultParallelism))
        .foreachPartition { it =>
          val c = Io.confFrom(ioEntries)
          it.foreach { p =>
            try {
              val hp = new org.apache.hadoop.fs.Path(p)
              if (!Io.isLocal(p)) hp.getFileSystem(c).delete(hp, false)
              else Io.delete(p)
            } catch { case _: Exception => () }
          }
        }
    }
  }
}
