package graft.catalog

import java.util.UUID
import java.util.concurrent.atomic.AtomicLong

import graft.core._
import graft.meta._
import graft.table.IceTable
import org.apache.spark.sql.SparkSession

// ---------------------------------------------------------------------------
// Hive-metastore wire shapes (the thrift record model the reference maps
// tables onto: catalog/hive.py:195 _construct_hive_storage_descriptor /
// :216 _construct_parameters / :356 _convert_iceberg_into_hive). Kept
// SDK-free: `HmsApi` below is the injectable client seam — production
// wires a thrift HiveMetaStoreClient behind it; this zero-egress build
// ships `InMemoryHmsApi`, which implements the same contract (entity
// CRUD + the metastore's EXCLUSIVE table-lock protocol + the typed
// exception shapes) in memory.
// ---------------------------------------------------------------------------

final case class HiveFieldSchema(name: String, hiveType: String, comment: Option[String] = None)

final case class HiveStorageDescriptor(
    cols: Seq[HiveFieldSchema],
    location: String,
    inputFormat: String = "org.apache.hadoop.mapred.FileInputFormat",
    outputFormat: String = "org.apache.hadoop.mapred.FileOutputFormat",
    serdeLib: String = "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe")

final case class HiveTableRecord(
    dbName: String,
    tableName: String,
    owner: String,
    createTimeSec: Long,
    sd: HiveStorageDescriptor,
    tableType: String, // "EXTERNAL_TABLE"
    parameters: Map[String, String])

final case class HiveDatabase(
    name: String,
    description: Option[String] = None,
    locationUri: Option[String] = None,
    parameters: Map[String, String] = Map.empty)

/** Lock states as the metastore reports them
  * (hive_metastore.thrift LockState). */
object HmsLockState extends Enumeration {
  val Acquired, Waiting, Aborted, NotAcquired = Value
}
final case class HmsLockResponse(lockId: Long, state: HmsLockState.Value)

/** Typed service exceptions (the thrift exception shapes hive.py matches
  * on: NoSuchObjectException / AlreadyExistsException). */
final class HmsNoSuchObject(msg: String) extends RuntimeException(msg)
final class HmsAlreadyExists(msg: String) extends RuntimeException(msg)

/** The client seam: exactly the metastore operations the reference
  * catalog calls (hive.py — create_table :376, alter_table :611,
  * get_table :382, lock/check_lock/unlock :545–:556/:502/:630 plus
  * database CRUD). */
trait HmsApi {
  /** Request an EXCLUSIVE lock on db.table (hive.py:493
    * _create_lock_request). Returns ACQUIRED, or WAITING when another
    * holder exists — poll [[checkLock]] until promoted. */
  def lock(db: String, table: String): HmsLockResponse
  def checkLock(lockId: Long): HmsLockResponse
  def unlock(lockId: Long): Unit
  def createTable(t: HiveTableRecord): Unit
  def alterTable(db: String, name: String, t: HiveTableRecord): Unit
  def getTable(db: String, name: String): HiveTableRecord
  def getTables(db: String): Seq[String]
  def dropTable(db: String, name: String): Unit
  def createDatabase(d: HiveDatabase): Unit
  def alterDatabase(name: String, d: HiveDatabase): Unit
  def getDatabase(name: String): HiveDatabase
  def getDatabases(): Seq[HiveDatabase]
  def dropDatabase(name: String): Unit
}

/** In-memory fake with the full metastore contract — CRUD, typed errors,
  * and a REAL exclusive-lock queue per table: the first locker is
  * ACQUIRED, later lockers are WAITING and get promoted in order as
  * holders unlock, so the catalog's WAITING→poll→ACQUIRED path is
  * genuinely exercisable in tests. */
class InMemoryHmsApi extends HmsApi {
  private val dbs = scala.collection.mutable.Map[String, HiveDatabase]()
  private val tables = scala.collection.mutable.Map[(String, String), HiveTableRecord]()
  private val lockIds = new AtomicLong(0)
  // (db, table) -> FIFO of waiting/holding lock ids; head holds the lock
  private val lockQueues =
    scala.collection.mutable.Map[(String, String), scala.collection.mutable.Queue[Long]]()
  private val lockKeys = scala.collection.mutable.Map[Long, (String, String)]()

  private def requireDb(name: String): Unit =
    if (!dbs.contains(name)) throw new HmsNoSuchObject(s"Database $name not found")

  def lock(db: String, table: String): HmsLockResponse = synchronized {
    val id = lockIds.incrementAndGet()
    val q = lockQueues.getOrElseUpdate((db, table), scala.collection.mutable.Queue.empty)
    q.enqueue(id)
    lockKeys(id) = (db, table)
    HmsLockResponse(id,
      if (q.head == id) HmsLockState.Acquired else HmsLockState.Waiting)
  }

  def checkLock(lockId: Long): HmsLockResponse = synchronized {
    val key = lockKeys.getOrElse(lockId,
      throw new HmsNoSuchObject(s"No such lock $lockId"))
    val q = lockQueues(key)
    HmsLockResponse(lockId,
      if (q.nonEmpty && q.head == lockId) HmsLockState.Acquired else HmsLockState.Waiting)
  }

  def unlock(lockId: Long): Unit = synchronized {
    lockKeys.remove(lockId).foreach { key =>
      val q = lockQueues(key)
      lockQueues(key) = q.filterNot(_ == lockId)
    }
  }

  def createTable(t: HiveTableRecord): Unit = synchronized {
    requireDb(t.dbName)
    val key = (t.dbName, t.tableName)
    if (tables.contains(key))
      throw new HmsAlreadyExists(s"Table ${t.dbName}.${t.tableName} already exists")
    tables(key) = t
  }

  def alterTable(db: String, name: String, t: HiveTableRecord): Unit = synchronized {
    if (!tables.contains((db, name)))
      throw new HmsNoSuchObject(s"Table $db.$name not found")
    // thrift alter_table supports RENAME: the new record names the target
    if ((t.dbName, t.tableName) != ((db, name))) {
      if (tables.contains((t.dbName, t.tableName)))
        throw new HmsAlreadyExists(s"Table ${t.dbName}.${t.tableName} already exists")
      requireDb(t.dbName)
      tables.remove((db, name))
    }
    tables((t.dbName, t.tableName)) = t
  }

  def getTable(db: String, name: String): HiveTableRecord = synchronized {
    tables.getOrElse((db, name),
      throw new HmsNoSuchObject(s"Table $db.$name not found"))
  }

  def getTables(db: String): Seq[String] = synchronized {
    tables.keys.filter(_._1 == db).map(_._2).toSeq.sorted
  }

  def dropTable(db: String, name: String): Unit = synchronized {
    if (tables.remove((db, name)).isEmpty)
      throw new HmsNoSuchObject(s"Table $db.$name not found")
  }

  def createDatabase(d: HiveDatabase): Unit = synchronized {
    if (dbs.contains(d.name))
      throw new HmsAlreadyExists(s"Database ${d.name} already exists")
    dbs(d.name) = d
  }

  def alterDatabase(name: String, d: HiveDatabase): Unit = synchronized {
    requireDb(name); dbs(name) = d.copy(name = name)
  }

  def getDatabase(name: String): HiveDatabase = synchronized {
    dbs.getOrElse(name, throw new HmsNoSuchObject(s"Database $name not found"))
  }

  def getDatabases(): Seq[HiveDatabase] = synchronized(dbs.values.toSeq.sortBy(_.name))

  def dropDatabase(name: String): Unit = synchronized {
    requireDb(name)
    if (tables.keys.exists(_._1 == name))
      throw new HmsAlreadyExists(s"Database $name is not empty")
    dbs -= name
  }
}

/** Hive-metastore-backed catalog (ref: catalog/hive.py:294 HiveCatalog).
  *
  * Like Glue, HMS is a metadata-POINTER store: the table record carries
  * `parameters{EXTERNAL=TRUE, table_type=ICEBERG, metadata_location,
  * previous_metadata_location}` plus a hive-typed column listing for
  * HiveQL consoles; the metadata JSON lives under the table location.
  * The commit protocol is the reference's LOCK-based one (hive.py:523
  * commit_table) — HMS has no compare-and-swap, so the catalog takes an
  * exclusive metastore lock on the table, re-reads the pointer under the
  * lock, verifies the expected version, writes the new metadata JSON,
  * swings the pointer with alter_table, and unlocks in a finally. A
  * WAITING lock is polled with exponential backoff
  * (hive.py:502 _wait_for_lock: multiplier 2, min/max wait,
  * `lock-check-retries` attempts); exhausting the retries fails the
  * commit typed, and a version mismatch under the lock surfaces as
  * [[CommitConflictException]] → the engine's standard retry.
  */
class HiveCatalog(
    val warehouse: String,
    val spark: SparkSession,
    val api: HmsApi = new InMemoryHmsApi,
    val catalogName: String = "hive",
    /** `hive.hive2-compatible` (hive.py:125): hive2 lacks `timestamp
      * with local time zone`, so timestamptz degrades to `timestamp`. */
    val hive2Compatible: Boolean = false,
    /** `lock-check-min-wait-time` / `-max-` / `lock-check-retries`
      * (hive.py:133–138; defaults 100 ms / 60 s / 4). */
    val lockCheckMinWaitMs: Long = 100,
    val lockCheckMaxWaitMs: Long = 60000,
    val lockCheckRetries: Int = 4,
    /** Injectable so tests exercise the backoff schedule without
      * sleeping. */
    val sleeper: Long => Unit = Thread.sleep) extends Catalog {

  import HiveCatalog._

  Io.register(warehouse, () => spark.sessionState.newHadoopConf())
  Io.confFactory = () => spark.sessionState.newHadoopConf()

  private val DefaultDb = "default"

  private def split(name: String): (String, String) = {
    val i = name.lastIndexOf('.')
    if (i < 0) (DefaultDb, name) else (name.substring(0, i), name.substring(i + 1))
  }
  private def tableDir(name: String) = s"$warehouse/${name.replace('.', '/')}"

  private def ensureDefaultDb(): Unit =
    try api.createDatabase(HiveDatabase(DefaultDb))
    catch { case _: HmsAlreadyExists => }
  ensureDefaultDb()

  private val VersionRe = """.*/v(\d+)-[^/]*\.metadata\.json""".r
  private def versionOf(location: String): Int = location match {
    case VersionRe(v) => v.toInt
    case _ => throw new IllegalStateException(s"Unparseable metadata location $location")
  }

  /** ref hive.py:327 _convert_hive_into_iceberg — reject records that
    * are not iceberg tables or lack the pointer, with the reference's
    * messages. */
  private def metadataLocationOf(rec: HiveTableRecord): String = {
    val tt = rec.parameters.getOrElse(TableTypeKey,
      throw new IllegalArgumentException(
        s"Property $TableTypeKey missing, could not determine type: " +
          s"${rec.dbName}.${rec.tableName}"))
    require(tt.equalsIgnoreCase("ICEBERG"),
      s"Property table_type is $tt, expected iceberg: ${rec.dbName}.${rec.tableName}")
    rec.parameters.getOrElse(MetadataLocationKey,
      throw new IllegalArgumentException(
        s"Table property $MetadataLocationKey is missing: ${rec.dbName}.${rec.tableName}"))
  }

  private def recordOf(name: String): Option[HiveTableRecord] = {
    val (db, tbl) = split(name)
    try Some(api.getTable(db, tbl)) catch { case _: HmsNoSuchObject => None }
  }

  def tableExists(name: String): Boolean = recordOf(name).isDefined
  def currentVersion(name: String): Option[Int] =
    recordOf(name).map(r => versionOf(metadataLocationOf(r)))

  def createTable(name: String, schema: Schema,
      spec: PartitionSpec = PartitionSpec.Unpartitioned,
      properties: Map[String, String] = Map.empty): IceTable = {
    require(!tableExists(name), s"Table $name already exists")
    val meta = applyFormatVersion(TableMetadata(
      tableUuid = UUID.randomUUID().toString,
      location = tableDir(name),
      lastUpdatedMs = System.currentTimeMillis(),
      lastColumnId = schema.highestFieldId,
      schemas = Seq(schema),
      currentSchemaId = schema.schemaId,
      partitionSpecs = Seq(spec),
      defaultSpecId = spec.specId,
      lastPartitionId = if (spec.fields.isEmpty) PartitionSpec.StartFieldId - 1
        else spec.fields.map(_.fieldId).max,
      properties = properties))
    val v = commit(name, 0, meta)
    new IceTable(this, name, meta, v)
  }

  def loadTable(name: String): IceTable = {
    val rec = recordOf(name).getOrElse(
      throw new IllegalArgumentException(s"Table $name not found"))
    val loc = metadataLocationOf(rec)
    // uuid-named metadata files are immutable: parse is path-cache-served
    new IceTable(this, name, MetadataCache.read(loc), versionOf(loc))
  }

  /** ref hive.py:502 _wait_for_lock: exponential backoff (×2 per
    * attempt, clamped to [min, max]) polling check_lock; retries
    * exhausted → typed commit failure naming the final state. */
  private def waitForLock(db: String, tbl: String, lockId: Long): Unit = {
    var attempt = 0
    var wait = lockCheckMinWaitMs
    while (attempt < lockCheckRetries) {
      sleeper(wait)
      attempt += 1
      val r = api.checkLock(lockId)
      r.state match {
        case HmsLockState.Acquired => return
        case HmsLockState.Waiting =>
          wait = math.min(wait * 2, lockCheckMaxWaitMs)
        case other => throw new IllegalStateException(
          s"Failed to check lock for $db.$tbl, state: $other")
      }
    }
    throw new IllegalStateException(
      s"Failed to acquire lock for $db.$tbl within $lockCheckRetries checks")
  }

  def commit(name: String, expectedVersion: Int, meta: TableMetadata): Int = {
    val (db, tbl) = split(name)
    val next = expectedVersion + 1
    // take the exclusive metastore lock BEFORE reading current state —
    // the whole read-check-write sequence runs under it (hive.py:545)
    val lockResp = api.lock(db, tbl)
    try {
      lockResp.state match {
        case HmsLockState.Acquired =>
        case HmsLockState.Waiting => waitForLock(db, tbl, lockResp.lockId)
        case other => throw new IllegalStateException(
          s"Failed to acquire lock for $name, state: $other")
      }

      val cur = recordOf(name)
      if (expectedVersion == 0) {
        if (cur.isDefined) throw new CommitConflictException(name, next)
        val newLoc = s"${meta.location}/metadata/v$next-${UUID.randomUUID()}.metadata.json"
        Io.writeBytes(newLoc, MetadataJson.toJson(meta).getBytes("UTF-8"))
        try api.createTable(record(db, tbl, meta, newLoc, prevLocation = None,
          existingParams = Map.empty))
        catch { case _: HmsAlreadyExists =>
          Io.delete(newLoc); throw new CommitConflictException(name, next) }
      } else {
        val rec = cur.getOrElse(throw new CommitConflictException(name, next))
        val curLoc = metadataLocationOf(rec)
        if (versionOf(curLoc) != expectedVersion)
          throw new CommitConflictException(name, next)
        val newLoc = s"${meta.location}/metadata/v$next-${UUID.randomUUID()}.metadata.json"
        Io.writeBytes(newLoc, MetadataJson.toJson(meta).getBytes("UTF-8"))
        // HMS property merge (hive.py:576 note): preserve HMS-native
        // parameters set by other systems, drop iceberg properties the
        // commit removed, overlay the new pointer + iceberg properties
        val prevIceberg = {
          val prevJson = new String(Io.readBytes(curLoc), "UTF-8")
          MetadataJson.fromJson(prevJson).properties.keySet
        }
        val preserved = rec.parameters -- (prevIceberg -- meta.properties.keySet)
        api.alterTable(db, tbl, record(db, tbl, meta, newLoc,
          prevLocation = Some(curLoc), existingParams = preserved))
      }
      next
    } finally api.unlock(lockResp.lockId)
  }

  private def record(db: String, tbl: String, meta: TableMetadata, loc: String,
      prevLocation: Option[String], existingParams: Map[String, String]): HiveTableRecord =
    HiveTableRecord(
      dbName = db,
      tableName = tbl,
      owner = meta.properties.getOrElse("owner", System.getProperty("user.name", "graft")),
      createTimeSec = System.currentTimeMillis() / 1000,
      sd = storageDescriptor(meta.schema, meta.location, hive2Compatible),
      tableType = "EXTERNAL_TABLE",
      parameters = existingParams ++ parameters(loc, prevLocation, meta.properties))

  def dropTable(name: String): Unit = {
    forgetTable(name)
    if (Io.exists(tableDir(name))) Io.delete(tableDir(name), recursive = true)
  }

  protected def forgetTable(name: String): Unit = {
    val (db, tbl) = split(name)
    try api.dropTable(db, tbl)
    catch { case _: HmsNoSuchObject =>
      throw new IllegalArgumentException(s"Table $name not found") }
  }

  /** HMS renames natively: alter_table with the record renamed (ref
    * hive.py:682 rename_table — unlike Glue's copy+delete). */
  override def renameTable(from: String, to: String): Unit = {
    val (fromDb, fromTbl) = split(from)
    val (toDb, toTbl) = split(to)
    val rec = recordOf(from).getOrElse(
      throw new IllegalArgumentException(s"Table $from not found"))
    try api.getDatabase(toDb)
    catch { case _: HmsNoSuchObject =>
      throw new IllegalArgumentException(s"Namespace $toDb does not exist") }
    try api.alterTable(fromDb, fromTbl, rec.copy(dbName = toDb, tableName = toTbl))
    catch { case _: HmsAlreadyExists =>
      throw new IllegalArgumentException(s"Table $to already exists") }
  }

  // ---- namespaces = HMS databases ----------------------------------------

  def createNamespace(ns: String): Unit =
    try api.createDatabase(HiveDatabase(ns,
      locationUri = Some(s"$warehouse/${ns.replace('.', '/')}")))
    catch { case _: HmsAlreadyExists =>
      throw new IllegalArgumentException(s"Namespace $ns already exists") }

  def dropNamespace(ns: String): Unit =
    try api.dropDatabase(ns)
    catch {
      case _: HmsNoSuchObject =>
        throw new IllegalArgumentException(s"Namespace $ns does not exist")
      case e: HmsAlreadyExists => // "not empty" from the service
        throw new IllegalStateException(e.getMessage)
    }

  def listNamespaces(): Seq[String] =
    api.getDatabases().map(_.name).filter(_ != DefaultDb)

  def listTables(ns: String = ""): Seq[String] = {
    val db = if (ns.isEmpty) DefaultDb else ns
    try api.getTables(db).map(t => if (db == DefaultDb) t else s"$db.$t")
    catch { case _: HmsNoSuchObject => Nil }
  }

  /** Namespace properties ride the database record; `comment` and
    * `location` are first-class fields (ref hive.py:231
    * _annotate_namespace). */
  override def loadNamespaceProperties(ns: String): Map[String, String] = {
    val d = try api.getDatabase(ns)
      catch { case _: HmsNoSuchObject =>
        throw new IllegalArgumentException(s"Namespace $ns does not exist") }
    d.parameters ++
      d.locationUri.map("location" -> _) ++
      d.description.map("comment" -> _)
  }

  override def updateNamespaceProperties(ns: String, updates: Map[String, String],
      removals: Set[String] = Set.empty): Unit = {
    val merged = (loadNamespaceProperties(ns) -- removals) ++ updates
    api.alterDatabase(ns, HiveDatabase(ns,
      description = merged.get("comment"),
      locationUri = merged.get("location"),
      parameters = merged - "comment" - "location"))
  }

  // ---- views: not supported on HMS in the reference (hive.py:436
  // create_view raises NotImplementedError) --------------------------------
  protected def viewLocation(name: String): Option[String] = None
  protected def storeView(name: String, version: Int, expected: Option[String],
      json: String, location: String): String =
    throw new UnsupportedOperationException("Views are not supported on the Hive catalog")
  protected def linkView(name: String, metadataLocation: String): Unit =
    throw new UnsupportedOperationException("Views are not supported on the Hive catalog")
  protected def forgetView(name: String): Unit =
    throw new UnsupportedOperationException("Views are not supported on the Hive catalog")
  def listViews(ns: String = ""): Seq[String] = Nil
}

object HiveCatalog {
  /** HMS table-parameter keys (ref hive.py:209–213). */
  val ExternalKey = "EXTERNAL"
  val TableTypeKey = "table_type"
  val MetadataLocationKey = "metadata_location"
  val PrevMetadataLocationKey = "previous_metadata_location"

  /** Iceberg type → HiveQL type string (ref hive.py:244
    * HIVE_PRIMITIVE_TYPES + SchemaToHiveConverter :262). */
  def hiveTypeOf(t: IceType, hive2Compatible: Boolean): String = t match {
    case IBoolean => "boolean"
    case IInt => "int"
    case ILong => "bigint"
    case IFloat => "float"
    case IDouble => "double"
    case IDate => "date"
    case ITime => "string"
    case ITimestamp | ITimestampNs => "timestamp"
    // hive2 has no `timestamp with local time zone` (hive.py:288)
    case ITimestamptz | ITimestamptzNs =>
      if (hive2Compatible) "timestamp" else "timestamp with local time zone"
    case IString => "string"
    case IUUID => "string"
    case IBinary | IFixed(_) => "binary"
    case IDecimal(p, s) => s"decimal($p,$s)"
    case IUnknown => "void"
    case IGeometry(_) | IGeography(_, _) => "binary" // WKB payload
    case IStruct(fs) =>
      fs.map(f => s"${f.name}:${hiveTypeOf(f.fieldType, hive2Compatible)}")
        .mkString("struct<", ",", ">")
    case IList(_, el, _) => s"array<${hiveTypeOf(el, hive2Compatible)}>"
    case IMap(_, k, _, v, _) =>
      s"map<${hiveTypeOf(k, hive2Compatible)},${hiveTypeOf(v, hive2Compatible)}>"
  }

  /** ref hive.py:195 _construct_hive_storage_descriptor. */
  def storageDescriptor(schema: Schema, location: String,
      hive2Compatible: Boolean): HiveStorageDescriptor =
    HiveStorageDescriptor(
      schema.fields.map(f =>
        HiveFieldSchema(f.name, hiveTypeOf(f.fieldType, hive2Compatible), f.doc)),
      location)

  /** ref hive.py:216 _construct_parameters: the iceberg pointer triple +
    * flattened metadata properties (pointer keys win on collision). */
  def parameters(metadataLocation: String, prevLocation: Option[String],
      metadataProperties: Map[String, String]): Map[String, String] = {
    val pointer = Map(
      ExternalKey -> "TRUE",
      TableTypeKey -> "ICEBERG",
      MetadataLocationKey -> metadataLocation) ++
      prevLocation.map(PrevMetadataLocationKey -> _)
    metadataProperties.filterNot { case (k, _) => pointer.contains(k) } ++ pointer
  }
}
