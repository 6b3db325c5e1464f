package graft.catalog

import java.util.UUID
import java.util.concurrent.atomic.AtomicLong

import graft.core._
import graft.meta._
import graft.table.IceTable
import org.apache.spark.sql.SparkSession

// ---------------------------------------------------------------------------
// Glue wire shapes (the AWS Glue data-catalog record model the reference
// maps tables onto: catalog/glue.py:239 _construct_table_input / :288
// _construct_database_input). Kept SDK-free: `GlueApi` below is the
// injectable client seam — production wires the AWS SDK GlueClient behind
// it; this zero-egress build ships `InMemoryGlueApi`, which implements the
// same contract (entity CRUD + VersionId optimistic locking + the typed
// exception protocol) in memory.
// ---------------------------------------------------------------------------

/** One Glue column of the StorageDescriptor (catalog/glue.py:204
  * _to_columns: name, the hive-ish type string, and the iceberg field
  * parameters Athena/Glue consoles read). */
final case class GlueColumn(name: String, colType: String,
    parameters: Map[String, String], comment: Option[String] = None)

final case class GlueStorageDescriptor(columns: Seq[GlueColumn], location: String)

/** TableInput — what a writer sends. */
final case class GlueTableInput(
    name: String,
    tableType: String, // "EXTERNAL_TABLE"
    parameters: Map[String, String],
    storageDescriptor: GlueStorageDescriptor,
    description: Option[String] = None)

/** Table — what the service returns; `versionId` is Glue's optimistic
  * lock token (every successful update mints a new one). */
final case class GlueTableRecord(
    name: String,
    databaseName: String,
    tableType: String,
    parameters: Map[String, String],
    storageDescriptor: GlueStorageDescriptor,
    versionId: String,
    description: Option[String] = None)

final case class GlueDatabaseInput(
    name: String,
    locationUri: Option[String] = None,
    description: Option[String] = None,
    parameters: Map[String, String] = Map.empty)

/** Typed service exceptions (the boto3 exception shapes glue.py matches
  * on: EntityNotFoundException / AlreadyExistsException /
  * ConcurrentModificationException). */
final class GlueEntityNotFound(msg: String) extends RuntimeException(msg)
final class GlueAlreadyExists(msg: String) extends RuntimeException(msg)
final class GlueConcurrentModification(msg: String) extends RuntimeException(msg)

/** The client seam: exactly the Glue operations the reference catalog
  * calls (create_table / update_table / get_table / get_tables /
  * delete_table + database CRUD). */
trait GlueApi {
  def createTable(database: String, input: GlueTableInput): Unit
  /** `versionId` must match the service's current version or the call
    * fails with [[GlueConcurrentModification]] — Glue's optimistic lock
    * (glue.py:404 _update_glue_table). */
  def updateTable(database: String, input: GlueTableInput, versionId: String): Unit
  def getTable(database: String, name: String): GlueTableRecord
  def getTables(database: String): Seq[GlueTableRecord]
  def deleteTable(database: String, name: String): Unit
  def createDatabase(input: GlueDatabaseInput): Unit
  def updateDatabase(name: String, input: GlueDatabaseInput): Unit
  def getDatabase(name: String): GlueDatabaseInput
  def getDatabases(): Seq[GlueDatabaseInput]
  def deleteDatabase(name: String): Unit
}

/** In-memory fake with the full service contract — CRUD, typed errors,
  * and VersionId minting/checking — so the catalog's commit-retry logic
  * is exercised for real (the same pattern the REST loopback used). */
final class InMemoryGlueApi extends GlueApi {
  private val lock = new Object
  private val versions = new AtomicLong(0)
  private var dbs = Map.empty[String, GlueDatabaseInput]
  private var tables = Map.empty[(String, String), GlueTableRecord]

  private def requireDb(database: String): Unit =
    if (!dbs.contains(database))
      throw new GlueEntityNotFound(s"Database $database not found")

  def createTable(database: String, input: GlueTableInput): Unit = lock.synchronized {
    requireDb(database)
    val key = (database, input.name)
    if (tables.contains(key))
      throw new GlueAlreadyExists(s"Table $database.${input.name} already exists")
    tables += key -> GlueTableRecord(input.name, database, input.tableType,
      input.parameters, input.storageDescriptor,
      versionId = versions.incrementAndGet().toString, input.description)
  }

  def updateTable(database: String, input: GlueTableInput, versionId: String): Unit =
    lock.synchronized {
      val cur = getTable(database, input.name)
      if (cur.versionId != versionId)
        throw new GlueConcurrentModification(
          s"Table $database.${input.name} was modified: version ${cur.versionId} != $versionId")
      tables += (database, input.name) -> cur.copy(
        tableType = input.tableType, parameters = input.parameters,
        storageDescriptor = input.storageDescriptor,
        versionId = versions.incrementAndGet().toString,
        description = input.description.orElse(cur.description))
    }

  def getTable(database: String, name: String): GlueTableRecord = lock.synchronized {
    tables.getOrElse((database, name),
      throw new GlueEntityNotFound(s"Table $database.$name not found"))
  }

  def getTables(database: String): Seq[GlueTableRecord] = lock.synchronized {
    requireDb(database)
    tables.collect { case ((d, _), t) if d == database => t }.toSeq.sortBy(_.name)
  }

  def deleteTable(database: String, name: String): Unit = lock.synchronized {
    getTable(database, name)
    tables -= ((database, name))
  }

  def createDatabase(input: GlueDatabaseInput): Unit = lock.synchronized {
    if (dbs.contains(input.name))
      throw new GlueAlreadyExists(s"Database ${input.name} already exists")
    dbs += input.name -> input
  }

  def updateDatabase(name: String, input: GlueDatabaseInput): Unit = lock.synchronized {
    requireDb(name)
    dbs += name -> input.copy(name = name)
  }

  def getDatabase(name: String): GlueDatabaseInput = lock.synchronized {
    dbs.getOrElse(name, throw new GlueEntityNotFound(s"Database $name not found"))
  }

  def getDatabases(): Seq[GlueDatabaseInput] =
    lock.synchronized(dbs.values.toSeq.sortBy(_.name))

  def deleteDatabase(name: String): Unit = lock.synchronized {
    requireDb(name)
    if (tables.keys.exists(_._1 == name))
      throw new GlueAlreadyExists(s"Database $name is not empty")
    dbs -= name
  }
}

/** Glue-backed catalog (ref: catalog/glue.py:318 GlueCatalog).
  *
  * Glue is a metadata-POINTER store: each table record carries
  * `Parameters{table_type=ICEBERG, metadata_location,
  * previous_metadata_location}` plus a flattened column listing for the
  * Glue/Athena consoles; the metadata JSON itself lives as files under
  * the table location, exactly like every other catalog here. Commits
  * write the candidate `v<N>-<uuid>.metadata.json`, then swing the
  * pointer with `UpdateTable(VersionId=...)` — Glue's optimistic lock —
  * so a concurrent committer surfaces as
  * [[GlueConcurrentModification]] → CommitConflictException and the
  * engine's standard retry takes over (ref glue.py:634 commit_table,
  * :404 _update_glue_table).
  *
  * Tables with no namespace land in a default database (Glue requires
  * one). Namespace properties live on the database record
  * (LocationUri / Description / Parameters, ref :288).
  */
class GlueCatalog(
    val warehouse: String,
    val spark: SparkSession,
    val api: GlueApi = new InMemoryGlueApi,
    val catalogName: String = "glue") extends Catalog {

  import GlueCatalog._

  Io.register(warehouse, () => spark.sessionState.newHadoopConf())
  Io.confFactory = () => spark.sessionState.newHadoopConf()

  private val DefaultDb = "default"

  private def split(name: String): (String, String) = {
    val i = name.lastIndexOf('.')
    if (i < 0) (DefaultDb, name) else (name.substring(0, i), name.substring(i + 1))
  }
  private def tableDir(name: String) = s"$warehouse/${name.replace('.', '/')}"

  private def ensureDefaultDb(): Unit =
    try api.createDatabase(GlueDatabaseInput(DefaultDb))
    catch { case _: GlueAlreadyExists => }
  ensureDefaultDb()

  private val VersionRe = """.*/v(\d+)-[^/]*\.metadata\.json""".r
  private def versionOf(location: String): Int = location match {
    case VersionRe(v) => v.toInt
    case _ => throw new IllegalStateException(s"Unparseable metadata location $location")
  }

  /** ref glue.py:360 _convert_glue_to_iceberg — reject records that are
    * not iceberg tables or lack the pointer, with the reference's
    * messages. */
  private def metadataLocationOf(rec: GlueTableRecord): String = {
    val tt = rec.parameters.getOrElse(TableTypeKey,
      throw new IllegalArgumentException(
        s"Property $TableTypeKey missing, could not determine type: " +
          s"${rec.databaseName}.${rec.name}"))
    require(tt.equalsIgnoreCase("ICEBERG"),
      s"Property table_type is $tt, expected ICEBERG: ${rec.databaseName}.${rec.name}")
    rec.parameters.getOrElse(MetadataLocationKey,
      throw new IllegalArgumentException(
        s"Table property $MetadataLocationKey is missing: ${rec.databaseName}.${rec.name}"))
  }

  private def recordOf(name: String): Option[GlueTableRecord] = {
    val (db, tbl) = split(name)
    try Some(api.getTable(db, tbl)) catch { case _: GlueEntityNotFound => None }
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

  def commit(name: String, expectedVersion: Int, meta: TableMetadata): Int = {
    val (db, tbl) = split(name)
    val next = expectedVersion + 1
    val newLoc = s"${meta.location}/metadata/v$next-${UUID.randomUUID()}.metadata.json"
    Io.writeBytes(newLoc, MetadataJson.toJson(meta).getBytes("UTF-8"))

    if (expectedVersion == 0) {
      val input = tableInput(tbl, newLoc, meta, prevLocation = None)
      try api.createTable(db, input)
      catch {
        case e: GlueAlreadyExists =>
          Io.delete(newLoc)
          throw new CommitConflictException(name, next)
        case e: GlueEntityNotFound => // auto-create the database, once
          api.createDatabase(GlueDatabaseInput(db))
          try api.createTable(db, input)
          catch { case _: GlueAlreadyExists =>
            Io.delete(newLoc); throw new CommitConflictException(name, next) }
      }
    } else {
      val cur = recordOf(name).getOrElse {
        Io.delete(newLoc)
        throw new CommitConflictException(name, next)
      }
      val curLoc = metadataLocationOf(cur)
      if (versionOf(curLoc) != expectedVersion) {
        Io.delete(newLoc)
        throw new CommitConflictException(name, next)
      }
      val input = tableInput(tbl, newLoc, meta, prevLocation = Some(curLoc),
        existing = Some(cur))
      try api.updateTable(db, input, cur.versionId)
      catch {
        case _: GlueConcurrentModification =>
          Io.delete(newLoc)
          throw new CommitConflictException(name, next)
      }
    }
    next
  }

  def dropTable(name: String): Unit = {
    forgetTable(name)
    if (Io.exists(tableDir(name))) Io.delete(tableDir(name), recursive = true)
  }

  protected def forgetTable(name: String): Unit = {
    val (db, tbl) = split(name)
    try api.deleteTable(db, tbl)
    catch { case _: GlueEntityNotFound =>
      throw new IllegalArgumentException(s"Table $name not found") }
  }

  // ---- namespaces = Glue databases ---------------------------------------

  def createNamespace(ns: String): Unit =
    try api.createDatabase(GlueDatabaseInput(ns,
      locationUri = Some(s"$warehouse/${ns.replace('.', '/')}")))
    catch { case _: GlueAlreadyExists =>
      throw new IllegalArgumentException(s"Namespace $ns already exists") }

  def dropNamespace(ns: String): Unit =
    try api.deleteDatabase(ns)
    catch {
      case _: GlueEntityNotFound =>
        throw new IllegalArgumentException(s"Namespace $ns does not exist")
      case e: GlueAlreadyExists => // "not empty" from the fake
        throw new IllegalStateException(e.getMessage)
    }

  def listNamespaces(): Seq[String] =
    api.getDatabases().map(_.name).filter(_ != DefaultDb)

  def listTables(ns: String = ""): Seq[String] = {
    val db = if (ns.isEmpty) DefaultDb else ns
    try api.getTables(db).map(t =>
      if (db == DefaultDb) t.name else s"$db.${t.name}")
    catch { case _: GlueEntityNotFound => Nil }
  }

  /** Namespace properties live on the database record (ref glue.py:288:
    * Description and LocationUri are first-class, the rest Parameters). */
  override def loadNamespaceProperties(ns: String): Map[String, String] = {
    val d = try api.getDatabase(ns)
      catch { case _: GlueEntityNotFound =>
        throw new IllegalArgumentException(s"Namespace $ns does not exist") }
    d.parameters ++
      d.locationUri.map("location" -> _) ++
      d.description.map("Description" -> _)
  }

  override def updateNamespaceProperties(ns: String, updates: Map[String, String],
      removals: Set[String] = Set.empty): Unit = {
    val merged = (loadNamespaceProperties(ns) -- removals) ++ updates
    api.updateDatabase(ns, GlueDatabaseInput(ns,
      locationUri = merged.get("location"),
      description = merged.get("Description"),
      parameters = merged - "location" - "Description"))
  }

  // ---- views: not supported on Glue, mirroring the reference
  // (glue.py:974–:998 — every view op raises NotImplementedError) -------
  protected def viewLocation(name: String): Option[String] = None
  protected def storeView(name: String, version: Int, expected: Option[String],
      json: String, location: String): String =
    throw new UnsupportedOperationException(
      "Glue catalog does not support views (ref glue.py:974)")
  protected def linkView(name: String, metadataLocation: String): Unit =
    throw new UnsupportedOperationException(
      "Glue catalog does not support views (ref glue.py:974)")
  protected def forgetView(name: String): Unit =
    throw new UnsupportedOperationException(
      "Glue catalog does not support views (ref glue.py:974)")
  def listViews(ns: String = ""): Seq[String] = Nil

  /** Glue has no rename op: create the new record carrying the SAME
    * parameters (pointer included), then delete the old (ref
    * glue.py:754 rename_table / :263 _construct_rename_table_input). */
  override def renameTable(from: String, to: String): Unit = {
    val rec = recordOf(from).getOrElse(
      throw new IllegalArgumentException(s"Table $from not found"))
    require(!tableExists(to), s"Table $to already exists")
    val (toDb, toTbl) = split(to)
    try api.getDatabase(toDb)
    catch { case _: GlueEntityNotFound => api.createDatabase(GlueDatabaseInput(toDb)) }
    api.createTable(toDb, GlueTableInput(toTbl, rec.tableType, rec.parameters,
      rec.storageDescriptor, rec.description))
    try forgetTable(from)
    catch { case e: Exception =>
      // roll the copy back rather than leave two records for one pointer
      api.deleteTable(toDb, toTbl)
      throw e
    }
  }
}

object GlueCatalog {
  /** Glue table-parameter keys (ref catalog/__init__.py TABLE_TYPE /
    * METADATA_LOCATION / PREVIOUS_METADATA_LOCATION constants). */
  val TableTypeKey = "table_type"
  val MetadataLocationKey = "metadata_location"
  val PrevMetadataLocationKey = "previous_metadata_location"

  /** Hive-ish type string for the Glue console (ref glue.py:163
    * GLUE_PRIMITIVE_TYPES + _IcebergSchemaToGlueType). */
  def glueType(t: IceType): String = t match {
    case IBoolean => "boolean"
    case IInt => "int"
    case ILong => "bigint"
    case IFloat => "float"
    case IDouble => "double"
    case IDate => "date"
    case ITime | IString | IUUID => "string"
    case ITimestamp | ITimestamptz => "timestamp"
    case IDecimal(p, s) => s"decimal($p,$s)"
    case IBinary | IFixed(_) => "binary"
    case IStruct(fs) =>
      s"struct<${fs.map(f => s"${f.name}:${glueType(f.fieldType)}").mkString(",")}>"
    case IList(_, el, _) => s"array<${glueType(el)}>"
    case IMap(_, k, _, v, _) => s"map<${glueType(k)},${glueType(v)}>"
    case other => other.repr // ns timestamps etc: the reference falls back to str(type)
  }

  /** Flattened column listing: current schema first (current=true), then
    * columns only older schemas know (current=false) — ref glue.py:204. */
  def toColumns(meta: TableMetadata): Seq[GlueColumn] = {
    val out = scala.collection.mutable.LinkedHashMap[String, GlueColumn]()
    def add(f: NestedField, current: Boolean): Unit =
      if (!out.contains(f.name))
        out(f.name) = GlueColumn(f.name, glueType(f.fieldType), Map(
          "iceberg.field.id" -> f.id.toString,
          "iceberg.field.optional" -> (!f.required).toString,
          "iceberg.field.current" -> current.toString), f.doc)
    meta.schemaById(meta.currentSchemaId).fields.foreach(add(_, current = true))
    meta.schemas.filter(_.schemaId != meta.currentSchemaId)
      .foreach(_.fields.foreach(add(_, current = false)))
    out.values.toSeq
  }

  /** ref glue.py:239 _construct_table_input / :145 _construct_parameters:
    * existing parameters carry over, pointer keys overwrite, table
    * properties are mirrored for the console. */
  def tableInput(name: String, metadataLocation: String, meta: TableMetadata,
      prevLocation: Option[String],
      existing: Option[GlueTableRecord] = None): GlueTableInput = {
    val params = existing.map(_.parameters).getOrElse(Map.empty) ++
      meta.properties ++
      Map(TableTypeKey -> "ICEBERG", MetadataLocationKey -> metadataLocation) ++
      prevLocation.map(PrevMetadataLocationKey -> _)
    GlueTableInput(name, "EXTERNAL_TABLE", params,
      GlueStorageDescriptor(toColumns(meta), meta.location),
      description = meta.properties.get("Description"))
  }
}
