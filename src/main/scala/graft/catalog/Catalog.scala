package graft.catalog

import java.util.UUID

import graft.core.{RowLineage, Schema}
import graft.meta._
import graft.table.IceTable
import graft.view.{SqlViewRepresentation, View, ViewHistoryEntry, ViewMetadata, ViewMetadataJson, ViewVersion}
import org.apache.spark.sql.SparkSession

/** Catalog surface (ref: pyiceberg/catalog/__init__.py:347 Catalog ABC —
  * create/load/drop/register/rename + namespace CRUD; commit is the
  * engine's optimistic metadata swap, :554 Catalog.commit_table).
  *
  * Table identifiers are dot-separated; everything before the last dot is
  * the namespace (`ns.sub.table` lives under `<warehouse>/ns/sub/table`).
  */
trait Catalog {
  def spark: SparkSession
  def warehouse: String

  def createTable(name: String, schema: Schema,
      spec: PartitionSpec = PartitionSpec.Unpartitioned,
      properties: Map[String, String] = Map.empty): IceTable
  def loadTable(name: String): IceTable
  def dropTable(name: String): Unit

  /** Drop AND delete every file any snapshot references (ref: purge_table
    * catalog/__init__.py:525, :952 — deletion failures warn, not raise).
    *
    * By default deletion is RESTRICTED to paths under the table location:
    * externally-registered (add_files) files may also be registered in a
    * second table or owned by an external writer, so purging one table
    * must not silently destroy data it doesn't own. Pass
    * `deleteExternalFiles = true` to opt into deleting add_files paths
    * too. Failures are surfaced as warnings, never swallowed. */
  def purgeTable(name: String, deleteExternalFiles: Boolean = false): Unit = {
    val table = loadTable(name)
    val m = table.metadata
    val referenced = m.snapshots.flatMap { s =>
      val mfs = try graft.meta.ManifestIO.readManifestList(s.manifestList)
        catch { case _: Exception => Nil }
      (s.manifestList +: mfs.map(_.manifestPath)) ++ mfs.flatMap { mf =>
        try graft.meta.ManifestIO.readManifest(mf.manifestPath,
            m.specById(mf.partitionSpecId), m.schema).map(_.dataFile.filePath)
        catch { case _: Exception => Nil }
      }
    }.distinct
    val loc = table.location
    val (owned, external) = referenced.partition(p =>
      graft.core.PathUtil.canon(p).startsWith(graft.core.PathUtil.canon(loc) + "/"))
    dropTable(name)
    val toDelete = if (deleteExternalFiles) owned ++ external else owned
    if (!deleteExternalFiles && external.nonEmpty)
      System.err.println(s"[purgeTable] $name: kept ${external.size} externally-registered " +
        "file(s) outside the table location (pass deleteExternalFiles=true to remove)")
    toDelete.foreach { p =>
      try Io.delete(p)
      catch { case e: Exception =>
        System.err.println(s"[purgeTable] $name: failed to delete $p: ${e.getMessage}")
      }
    }
  }
  /** Creation-time `format-version` table property (ref: metadata.py:595
    * new_table_metadata pops TableProperties.FORMAT_VERSION): applied to
    * the metadata's format version, never persisted as a property. A v3
    * table starts row lineage with next-row-id = 0. */
  protected def applyFormatVersion(meta: TableMetadata): TableMetadata =
    meta.properties.get("format-version") match {
      case None => meta
      case Some(v) =>
        val fv = v.toInt
        require(fv >= 1 && fv <= 3, s"Unsupported format version $v")
        if (fv >= 3) RowLineage.requireNoReservedNames(meta.schema)
        meta.copy(formatVersion = fv,
          properties = meta.properties - "format-version",
          nextRowId = if (fv >= 3) Some(0L) else None)
    }

  def tableExists(name: String): Boolean
  def currentVersion(name: String): Option[Int]
  /** Atomic optimistic swap to `expectedVersion + 1`; throws
    * CommitConflictException when a concurrent committer won. */
  def commit(name: String, expectedVersion: Int, meta: TableMetadata): Int

  // ---- namespaces (ref: catalog ABC create_namespace :470 etc.) ---------
  def createNamespace(ns: String): Unit
  /** Drops an EMPTY namespace; throws if tables remain. */
  def dropNamespace(ns: String): Unit
  def listNamespaces(): Seq[String]
  def listTables(ns: String = ""): Seq[String]

  /** Namespace properties (ref: catalog/__init__.py:614
    * load_namespace_properties / update_namespace_properties). Default:
    * a properties file in the namespace directory under the warehouse —
    * works for every filesystem-rooted catalog; REST overrides with the
    * protocol's endpoints. */
  def loadNamespaceProperties(ns: String): Map[String, String] = {
    val path = s"$warehouse/${ns.replace('.', '/')}/.namespace.properties"
    if (!Io.exists(path)) Map.empty
    else {
      val p = new java.util.Properties()
      p.load(new java.io.ByteArrayInputStream(Io.readBytes(path)))
      import scala.jdk.CollectionConverters._
      p.stringPropertyNames().asScala.map(k => k -> p.getProperty(k)).toMap
    }
  }

  def updateNamespaceProperties(ns: String, updates: Map[String, String],
      removals: Set[String] = Set.empty): Unit = {
    require(listNamespaces().contains(ns), s"Namespace $ns does not exist")
    val merged = (loadNamespaceProperties(ns) -- removals) ++ updates
    val p = new java.util.Properties()
    merged.foreach { case (k, v) => p.setProperty(k, v) }
    val out = new java.io.ByteArrayOutputStream()
    p.store(out, null)
    Io.writeBytes(s"$warehouse/${ns.replace('.', '/')}/.namespace.properties",
      out.toByteArray)
  }

  /** STAGED table creation (ref: create_table_transaction
    * catalog/__init__.py:914 → CreateTableTransaction): the catalog sees
    * NOTHING until `commitTransaction()` — all intermediate commits
    * (appends, schema changes, properties) land on an in-memory staging
    * catalog, and the final metadata registers atomically through the
    * same CREATE_NEW swap as registerTable. Staged data files are written
    * under the table's future location before registration, so an
    * abandoned transaction leaves only unreferenced files (orphans),
    * never a half-created catalog entry; a concurrent create of the same
    * name makes commitTransaction throw CommitConflictException. */
  def createTableTransaction(name: String, schema: Schema,
      spec: PartitionSpec = PartitionSpec.Unpartitioned,
      properties: Map[String, String] = Map.empty): CreateTableTransaction = {
    require(!tableExists(name), s"Table $name already exists")
    val outer = this
    val meta = applyFormatVersion(TableMetadata(
      tableUuid = UUID.randomUUID().toString,
      location = s"$warehouse/${name.replace('.', '/')}",
      lastUpdatedMs = System.currentTimeMillis(),
      lastColumnId = schema.highestFieldId,
      schemas = Seq(schema),
      currentSchemaId = schema.schemaId,
      partitionSpecs = Seq(spec),
      defaultSpecId = spec.specId,
      lastPartitionId = if (spec.fields.isEmpty) PartitionSpec.StartFieldId - 1
        else spec.fields.map(_.fieldId).max,
      properties = properties))
    val stagingCat: Catalog = new Catalog {
      private var state: (Int, TableMetadata) = (0, meta)
      def spark: SparkSession = outer.spark
      def warehouse: String = outer.warehouse
      def commit(n: String, expectedVersion: Int, m: TableMetadata): Int =
        synchronized {
          if (expectedVersion != state._1)
            throw new CommitConflictException(n, expectedVersion)
          state = (state._1 + 1, m)
          state._1
        }
      def loadTable(n: String): IceTable = synchronized {
        new IceTable(this, name, state._2, state._1)
      }
      def tableExists(n: String): Boolean = n == name
      def currentVersion(n: String): Option[Int] = synchronized(Some(state._1))
      def createTable(n: String, s: Schema, sp: PartitionSpec,
          p: Map[String, String]): IceTable =
        throw new UnsupportedOperationException("staged create-table transaction")
      def dropTable(n: String): Unit =
        throw new UnsupportedOperationException("staged create-table transaction")
      override def renameTable(from: String, to: String): Unit =
        throw new UnsupportedOperationException("staged create-table transaction")
      def createNamespace(ns: String): Unit = ()
      def dropNamespace(ns: String): Unit = ()
      def listNamespaces(): Seq[String] = Nil
      def listTables(ns: String): Seq[String] = Seq(name)
      protected def forgetTable(n: String): Unit = ()
      protected def forgetView(n: String): Unit = ()
      protected def linkView(n: String, metadataLocation: String): Unit =
        throw new UnsupportedOperationException("staged create-table transaction")
      def listViews(ns: String): Seq[String] = Nil
      protected def storeView(n: String, version: Int, expected: Option[String],
          json: String, location: String): String =
        throw new UnsupportedOperationException("staged create-table transaction")
      protected def viewLocation(n: String): Option[String] = None
    }
    new CreateTableTransaction(outer, new IceTable(stagingCat, name, meta, 0))
  }

  /** Adopt an existing table by its metadata file WITHOUT rewriting data
    * (ref: register_table :498). The table keeps its original location. */
  def registerTable(name: String, metadataPath: String): IceTable = {
    require(!tableExists(name), s"Table $name already exists")
    val meta = MetadataCache.read(metadataPath)
    commit(name, 0, meta)
    loadTable(name)
  }

  /** Rename the catalog entry; data/metadata files stay at the original
    * location (ref: rename_table :538 — Iceberg rename is metadata-only). */
  def renameTable(from: String, to: String): Unit = {
    require(tableExists(from), s"Table $from not found")
    require(!tableExists(to), s"Table $to already exists")
    val meta = loadTable(from).metadata
    commit(to, 0, meta)
    forgetTable(from)
  }

  /** Remove the catalog ENTRY only (rename support) — never data files. */
  protected def forgetTable(name: String): Unit

  // ---- views (ref: catalog ABC view surface — create_view
  // catalog/__init__.py:723, view_exists :476, list_views :638, load_view
  // :652, register_view :696, drop_view :712; metadata model
  // pyiceberg/view/metadata.py; the reference ships these only on its REST
  // backend — here all three catalogs implement them) --------------------

  /** Current view-metadata file location (None = no such view). */
  protected def viewLocation(name: String): Option[String]
  /** CAS-store view metadata: `expected` is the prior metadata location
    * (None = create). Returns the new location; throws
    * [[CommitConflictException]] when a concurrent committer won. */
  protected def storeView(name: String, version: Int, expected: Option[String],
      json: String, location: String): String
  /** Adopt an EXISTING metadata file as a new view entry (register). */
  protected def linkView(name: String, metadataLocation: String): Unit
  /** Remove the view ENTRY only. */
  protected def forgetView(name: String): Unit
  def listViews(ns: String = ""): Seq[String]

  def viewExists(name: String): Boolean = viewLocation(name).isDefined

  def loadView(name: String): View = {
    val loc = viewLocation(name).getOrElse(
      throw new IllegalArgumentException(s"View $name not found"))
    new View(name, ViewMetadataJson.fromJson(new String(Io.readBytes(loc), "UTF-8")), loc)
  }

  /** ref create_view :723 (REST impl rest/__init__.py:972): version 1,
    * one SQL representation, the view's namespace as the default. */
  def createView(name: String, schema: Schema, sql: String,
      dialect: String = "spark",
      properties: Map[String, String] = Map.empty): View = {
    require(!viewExists(name), s"View $name already exists")
    require(!tableExists(name), s"Table $name already exists")
    val now = System.currentTimeMillis()
    val loc = s"$warehouse/${name.replace('.', '/')}"
    val version = ViewVersion(
      versionId = 1, schemaId = schema.schemaId, timestampMs = now,
      summary = Map("engine-name" -> "graft", "operation" -> "create"),
      representations = Seq(SqlViewRepresentation(sql, dialect)),
      defaultNamespace = name.split('.').dropRight(1).toSeq)
    val meta = ViewMetadata(UUID.randomUUID().toString, 1, loc, Seq(schema), 1,
      Seq(version), Seq(ViewHistoryEntry(now, 1)), properties)
    val newLoc = storeView(name, 1, None, ViewMetadataJson.toJson(meta), loc)
    new View(name, meta, newLoc)
  }

  /** CREATE OR REPLACE: appends an immutable new ViewVersion (+ its schema
    * under a fresh schema-id) and bumps current-version-id — the version
    * log keeps full history, exactly the view spec's evolution model. */
  def replaceView(name: String, schema: Schema, sql: String,
      dialect: String = "spark"): View = {
    val old = loadView(name)
    val now = System.currentTimeMillis()
    val newSchemaId = old.metadata.schemas.map(_.schemaId).max + 1
    val newVersionId = old.metadata.versions.map(_.versionId).max + 1
    val version = ViewVersion(
      versionId = newVersionId, schemaId = newSchemaId, timestampMs = now,
      summary = Map("engine-name" -> "graft", "operation" -> "replace"),
      representations = Seq(SqlViewRepresentation(sql, dialect)),
      defaultNamespace = name.split('.').dropRight(1).toSeq)
    val meta = old.metadata.copy(
      schemas = old.metadata.schemas :+ Schema(schema.fields, newSchemaId,
        schema.identifierFieldIds),
      currentVersionId = newVersionId,
      versions = old.metadata.versions :+ version,
      versionLog = old.metadata.versionLog :+ ViewHistoryEntry(now, newVersionId))
    val newLoc = storeView(name, newVersionId, Some(old.metadataLocation),
      ViewMetadataJson.toJson(meta), old.metadata.location)
    new View(name, meta, newLoc)
  }

  /** ref register_view :696 — adopt existing metadata without rewriting. */
  def registerView(name: String, metadataLocation: String): View = {
    require(!viewExists(name), s"View $name already exists")
    // validate before linking — a bad file must not become an entry
    ViewMetadataJson.fromJson(new String(Io.readBytes(metadataLocation), "UTF-8"))
    linkView(name, metadataLocation)
    loadView(name)
  }

  /** ref drop_view :712 — the ENTRY is dropped; metadata files a register
    * might still reference are left in place. */
  def dropView(name: String): Unit = {
    require(viewExists(name), s"View $name not found")
    forgetView(name)
  }
}

/** Filesystem ("hadoop"-style) catalog (ref: SURVEY §7 step 5).
  *
  * Layout: `<warehouse>/<ns dirs>/<name>/metadata/v<N>.metadata.json` +
  * `version-hint.text`. Commits are optimistic: writing `v<N+1>` uses an
  * atomic create-new — a concurrent commit to the same version loses and
  * must retry (ref: Transaction commit, table/__init__.py:1039).
  */
class HadoopCatalog(val warehouse: String, val spark: SparkSession) extends Catalog {

  // metadata IO must see spark.hadoop.* (custom schemes, s3a credentials);
  // registered under the warehouse scheme so catalogs on different schemes
  // don't contaminate each other (ADVICE r5); the process fallback still
  // covers scheme-less paths. The factory re-derives the conf so later
  // session conf changes are picked up
  Io.register(warehouse, () => spark.sessionState.newHadoopConf())
  Io.confFactory = () => spark.sessionState.newHadoopConf()

  private def tableDir(name: String) = s"$warehouse/${name.replace('.', '/')}"
  private def metadataDir(name: String) = s"${tableDir(name)}/metadata"
  private def hintFile(name: String) = s"${metadataDir(name)}/version-hint.text"
  private def versionFile(name: String, v: Int) = s"${metadataDir(name)}/v$v.metadata.json"

  def tableExists(name: String): Boolean = Io.exists(hintFile(name))

  def createTable(
      name: String,
      schema: Schema,
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
    val v = currentVersion(name).getOrElse(
      throw new IllegalArgumentException(s"Table $name not found"))
    // version files are CREATE_NEW (write-once), so the parse is
    // path-cache-served: a streaming refresh() costs one hint probe
    new IceTable(this, name, MetadataCache.read(versionFile(name, v)), v)
  }

  def dropTable(name: String): Unit =
    if (Io.exists(tableDir(name))) {
      Io.delete(tableDir(name), recursive = true)
      // a recreated table reuses the deterministic v<N> paths
      MetadataCache.invalidateUnder(metadataDir(name))
    }

  protected def forgetTable(name: String): Unit = {
    // the catalog ENTRY is the version hint + version files; the avro
    // manifests in the same dir are table data still referenced by the
    // renamed-to entry's metadata — they must survive
    val md = metadataDir(name)
    Io.list(md).foreach { case (n, _) =>
      if (n == "version-hint.text" || (n.startsWith("v") && n.endsWith(".metadata.json")))
        Io.delete(s"$md/$n")
    }
    MetadataCache.invalidateUnder(md)
  }

  def createNamespace(ns: String): Unit =
    Io.mkdirs(s"$warehouse/${ns.replace('.', '/')}")

  def dropNamespace(ns: String): Unit = {
    require(listTables(ns).isEmpty, s"Namespace $ns is not empty")
    Io.delete(s"$warehouse/${ns.replace('.', '/')}")
  }

  /** Directories under the warehouse that are not themselves tables or
    * views. */
  def listNamespaces(): Seq[String] =
    Io.list(warehouse).collect {
      case (n, true) if !Io.exists(s"$warehouse/$n/metadata/version-hint.text") &&
        !Io.exists(s"$warehouse/$n/metadata/view-hint.text") => n
    }.sorted

  def listTables(ns: String = ""): Seq[String] = {
    val dir = if (ns.isEmpty) warehouse else s"$warehouse/${ns.replace('.', '/')}"
    Io.list(dir).collect {
      case (n, true) if Io.exists(s"$dir/$n/metadata/version-hint.text") =>
        if (ns.isEmpty) n else s"$ns.$n"
    }.sorted
  }

  def currentVersion(name: String): Option[Int] =
    if (!Io.exists(hintFile(name))) None
    else {
      val raw = new String(Io.readBytes(hintFile(name)), "UTF-8").trim
      raw.toIntOption.orElse {
        // a torn hint (foreign writer republishing non-atomically while
        // we read) must not fail a concurrent refresh — the committed
        // version files are the durable truth; take the newest
        Io.list(metadataDir(name)).collect {
          case (n, false) if n.startsWith("v") && n.endsWith(".metadata.json") =>
            n.stripPrefix("v").stripSuffix(".metadata.json").toIntOption
        }.flatten.maxOption
      }
    }

  // ---- views: `view-hint.text` + `v<N>.view-metadata.json` under the
  // view's own metadata dir — the same optimistic-create commit shape as
  // tables, with a DIFFERENT hint name so table and view entries stay
  // disjoint (the metadata JSON also self-discriminates: view-uuid vs
  // table-uuid) ----------------------------------------------------------

  private def viewHint(name: String) = s"${metadataDir(name)}/view-hint.text"

  protected def viewLocation(name: String): Option[String] =
    if (Io.exists(viewHint(name)))
      Some(new String(Io.readBytes(viewHint(name)), "UTF-8").trim)
    else None

  protected def storeView(name: String, version: Int, expected: Option[String],
      json: String, location: String): String = {
    val path = s"$location/metadata/v$version.view-metadata.json"
    // CREATE_NEW on the versioned file is the commit arbiter, as for
    // tables: a concurrent replace at the same version loses here
    if (!Io.writeBytesIfAbsent(path, json.getBytes("UTF-8")))
      throw new CommitConflictException(name, version)
    Io.writeBytesAtomic(viewHint(name), path.getBytes("UTF-8"))
    path
  }

  protected def linkView(name: String, metadataLocation: String): Unit =
    Io.writeBytesAtomic(viewHint(name), metadataLocation.getBytes("UTF-8"))

  protected def forgetView(name: String): Unit = {
    val md = metadataDir(name)
    Io.list(md).foreach { case (n, _) =>
      if (n == "view-hint.text" || n.endsWith(".view-metadata.json"))
        Io.delete(s"$md/$n")
    }
  }

  def listViews(ns: String = ""): Seq[String] = {
    val dir = if (ns.isEmpty) warehouse else s"$warehouse/${ns.replace('.', '/')}"
    Io.list(dir).collect {
      case (n, true) if Io.exists(s"$dir/$n/metadata/view-hint.text") =>
        if (ns.isEmpty) n else s"$ns.$n"
    }.sorted
  }

  /** Optimistic commit: atomically create the next version file; fails if a
    * concurrent writer already created it. Returns the new version.
    * (Io.writeBytesIfAbsent is a true CREATE_NEW — link(2) locally, which
    * fails atomically when the target exists; rename would silently
    * REPLACE, a TOCTOU race where both committers "succeed".) */
  def commit(name: String, expectedVersion: Int, meta: TableMetadata): Int = {
    val next = expectedVersion + 1
    if (!Io.writeBytesIfAbsent(versionFile(name, next),
        MetadataJson.toJson(meta).getBytes("UTF-8")))
      throw new CommitConflictException(name, next)
    // atomic republish: a streaming source's concurrent refresh must never
    // read a truncated hint mid-write
    Io.writeBytesAtomic(hintFile(name), next.toString.getBytes("UTF-8"))
    next
  }
}

/** In-memory catalog (ref: pyiceberg/catalog/memory.py): metadata versions
  * live in a map, data files under a scratch warehouse dir. Commits are
  * atomic via synchronized compare-and-append. */
class MemoryCatalog(val warehouse: String, val spark: SparkSession) extends Catalog {
  private val tables =
    scala.collection.mutable.Map[String, Vector[TableMetadata]]()

  def tableExists(name: String): Boolean = tables.synchronized(tables.contains(name))

  def createTable(name: String, schema: Schema, spec: PartitionSpec,
      properties: Map[String, String]): IceTable = {
    require(!tableExists(name), s"Table $name already exists")
    val meta = applyFormatVersion(TableMetadata(
      tableUuid = UUID.randomUUID().toString,
      location = s"$warehouse/${name.replace('.', '/')}",
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

  def loadTable(name: String): IceTable = tables.synchronized {
    val vs = tables.getOrElse(name,
      throw new IllegalArgumentException(s"Table $name not found"))
    new IceTable(this, name, vs.last, vs.size)
  }

  def dropTable(name: String): Unit = tables.synchronized { tables.remove(name) }
  protected def forgetTable(name: String): Unit = dropTable(name)

  def currentVersion(name: String): Option[Int] =
    tables.synchronized(tables.get(name).map(_.size))

  def commit(name: String, expectedVersion: Int, meta: TableMetadata): Int =
    tables.synchronized {
      val vs = tables.getOrElse(name, Vector.empty)
      if (vs.size != expectedVersion) throw new CommitConflictException(name, expectedVersion + 1)
      tables(name) = vs :+ meta
      vs.size + 1
    }

  private val nss = scala.collection.mutable.Set[String]()
  def createNamespace(ns: String): Unit = nss.synchronized { nss += ns }
  def dropNamespace(ns: String): Unit = nss.synchronized {
    require(listTables(ns).isEmpty, s"Namespace $ns is not empty")
    nss -= ns
  }
  def listNamespaces(): Seq[String] = nss.synchronized(nss.toSeq.sorted)
  def listTables(ns: String = ""): Seq[String] = tables.synchronized {
    if (ns.isEmpty) tables.keys.filterNot(_.contains('.')).toSeq.sorted
    else tables.keys.filter(_.startsWith(ns + ".")).toSeq.sorted
  }

  // ---- views: entry map in memory, metadata files under the scratch
  // warehouse (so register/load round-trip through real files) -----------
  private val views = scala.collection.mutable.Map[String, String]()

  protected def viewLocation(name: String): Option[String] =
    views.synchronized(views.get(name))

  protected def storeView(name: String, version: Int, expected: Option[String],
      json: String, location: String): String = views.synchronized {
    if (views.get(name) != expected) throw new CommitConflictException(name, version)
    val path = s"$location/metadata/v$version-${UUID.randomUUID()}.view-metadata.json"
    Io.writeBytes(path, json.getBytes("UTF-8"))
    views(name) = path
    path
  }

  protected def linkView(name: String, metadataLocation: String): Unit =
    views.synchronized { views(name) = metadataLocation }

  protected def forgetView(name: String): Unit =
    views.synchronized { views.remove(name) }

  def listViews(ns: String = ""): Seq[String] = views.synchronized {
    if (ns.isEmpty) views.keys.filterNot(_.contains('.')).toSeq.sorted
    else views.keys.filter(_.startsWith(ns + ".")).toSeq.sorted
  }
}

/** Handle returned by [[Catalog.createTableTransaction]]: `table` is the
  * STAGED table (every DML/DDL on it commits to memory only);
  * `commitTransaction()` atomically registers the accumulated metadata in
  * the real catalog and returns the durable table. */
final class CreateTableTransaction private[catalog] (
    real: Catalog, val table: IceTable) {
  private var committed = false
  def append(df: org.apache.spark.sql.DataFrame): this.type = {
    table.append(df); this
  }
  def commitTransaction(): IceTable = synchronized {
    require(!committed, "Transaction already committed")
    real.commit(table.name, 0, table.refresh().metadata)
    committed = true
    real.loadTable(table.name)
  }
}

class CommitConflictException(table: String, version: Int)
  extends RuntimeException(s"Concurrent commit to $table at version $version")

/** Catalog-less read-only table from a metadata.json file
  * (ref: StaticTable.from_metadata table/__init__.py:1782). */
object StaticTable {
  def fromMetadata(metadataPath: String, spark: SparkSession): IceTable = {
    val meta = MetadataCache.read(metadataPath)
    val readOnly = new HadoopCatalog(meta.location, spark) {
      override def commit(name: String, expectedVersion: Int, m: TableMetadata): Int =
        throw new UnsupportedOperationException("StaticTable is read-only")
    }
    new IceTable(readOnly, "static", meta)
  }
}

/** Every operation raises — parity with the reference's NoopCatalog test
  * double (ref: catalog/noop.py — NotImplementedError across the ABC
  * surface). Useful where a Catalog is structurally required but must
  * never be exercised (wiring tests, default slots). */
class NoopCatalog(val spark: SparkSession) extends Catalog {
  private def nope: Nothing =
    throw new UnsupportedOperationException("NoopCatalog implements no operation")
  override def warehouse: String = nope
  override def createTable(name: String, schema: Schema, spec: PartitionSpec,
      properties: Map[String, String]): IceTable = nope
  override def loadTable(name: String): IceTable = nope
  override def dropTable(name: String): Unit = nope
  override def purgeTable(name: String, deleteExternalFiles: Boolean): Unit = nope
  override def tableExists(name: String): Boolean = nope
  override def currentVersion(name: String): Option[Int] = nope
  override def commit(name: String, expectedVersion: Int, meta: TableMetadata): Int = nope
  override def createNamespace(ns: String): Unit = nope
  override def dropNamespace(ns: String): Unit = nope
  override def listNamespaces(): Seq[String] = nope
  override def listTables(ns: String): Seq[String] = nope
  override def loadNamespaceProperties(ns: String): Map[String, String] = nope
  override def updateNamespaceProperties(ns: String, updates: Map[String, String],
      removals: Set[String]): Unit = nope
  override def listViews(ns: String): Seq[String] = nope
  override protected def forgetTable(name: String): Unit = nope
  override protected def forgetView(name: String): Unit = nope
  override protected def linkView(name: String, metadataLocation: String): Unit = nope
  override protected def storeView(name: String, version: Int, expected: Option[String],
      json: String, location: String): String = nope
  override protected def viewLocation(name: String): Option[String] = nope
}
