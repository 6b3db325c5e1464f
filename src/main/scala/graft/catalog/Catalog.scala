package graft.catalog

import java.nio.file.{Files, Paths}
import java.util.UUID

import graft.core.Schema
import graft.meta._
import graft.table.IceTable
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

  /** Adopt an existing table by its metadata file WITHOUT rewriting data
    * (ref: register_table :498). The table keeps its original location. */
  def registerTable(name: String, metadataPath: String): IceTable = {
    require(!tableExists(name), s"Table $name already exists")
    val meta = MetadataJson.fromJson(
      new String(Files.readAllBytes(Paths.get(metadataPath)), "UTF-8"))
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
}

/** Filesystem ("hadoop"-style) catalog (ref: SURVEY §7 step 5).
  *
  * Layout: `<warehouse>/<ns dirs>/<name>/metadata/v<N>.metadata.json` +
  * `version-hint.text`. Commits are optimistic: writing `v<N+1>` uses an
  * atomic create-new — a concurrent commit to the same version loses and
  * must retry (ref: Transaction commit, table/__init__.py:1039).
  */
class HadoopCatalog(val warehouse: String, val spark: SparkSession) extends Catalog {

  private def tableDir(name: String) = s"$warehouse/${name.replace('.', '/')}"
  private def metadataDir(name: String) = s"${tableDir(name)}/metadata"
  private def hintFile(name: String) = s"${metadataDir(name)}/version-hint.text"
  private def versionFile(name: String, v: Int) = s"${metadataDir(name)}/v$v.metadata.json"

  def tableExists(name: String): Boolean = Files.exists(Paths.get(hintFile(name)))

  def createTable(
      name: String,
      schema: Schema,
      spec: PartitionSpec = PartitionSpec.Unpartitioned,
      properties: Map[String, String] = Map.empty): IceTable = {
    require(!tableExists(name), s"Table $name already exists")
    val meta = TableMetadata(
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
      properties = properties)
    val v = commit(name, 0, meta)
    new IceTable(this, name, meta, v)
  }

  def loadTable(name: String): IceTable = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalArgumentException(s"Table $name not found"))
    val json = new String(Files.readAllBytes(Paths.get(versionFile(name, v))), "UTF-8")
    new IceTable(this, name, MetadataJson.fromJson(json), v)
  }

  def dropTable(name: String): Unit = {
    val dir = Paths.get(tableDir(name))
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  protected def forgetTable(name: String): Unit = {
    // the catalog ENTRY is the version hint + version files; the avro
    // manifests in the same dir are table data still referenced by the
    // renamed-to entry's metadata — they must survive
    val md = Paths.get(metadataDir(name))
    if (Files.exists(md)) {
      val s = Files.list(md)
      try s.forEach { p =>
        val n = p.getFileName.toString
        if (n == "version-hint.text" || (n.startsWith("v") && n.endsWith(".metadata.json")))
          Files.deleteIfExists(p)
      } finally s.close()
    }
  }

  def createNamespace(ns: String): Unit =
    Files.createDirectories(Paths.get(s"$warehouse/${ns.replace('.', '/')}"))

  def dropNamespace(ns: String): Unit = {
    require(listTables(ns).isEmpty, s"Namespace $ns is not empty")
    Files.deleteIfExists(Paths.get(s"$warehouse/${ns.replace('.', '/')}"))
  }

  /** Directories under the warehouse that are not themselves tables. */
  def listNamespaces(): Seq[String] = {
    val root = Paths.get(warehouse)
    if (!Files.isDirectory(root)) return Nil
    val s = Files.list(root)
    try {
      val b = Seq.newBuilder[String]
      s.forEach { p =>
        if (Files.isDirectory(p) &&
          !Files.exists(p.resolve("metadata/version-hint.text")))
          b += p.getFileName.toString
      }
      b.result().sorted
    } finally s.close()
  }

  def listTables(ns: String = ""): Seq[String] = {
    val dir = if (ns.isEmpty) Paths.get(warehouse)
      else Paths.get(s"$warehouse/${ns.replace('.', '/')}")
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try {
      val b = Seq.newBuilder[String]
      s.forEach { p =>
        if (Files.exists(p.resolve("metadata/version-hint.text")))
          b += (if (ns.isEmpty) p.getFileName.toString
            else s"$ns.${p.getFileName}")
      }
      b.result().sorted
    } finally s.close()
  }

  def currentVersion(name: String): Option[Int] = {
    val hint = Paths.get(hintFile(name))
    if (Files.exists(hint)) Some(new String(Files.readAllBytes(hint), "UTF-8").trim.toInt)
    else None
  }

  /** Optimistic commit: atomically create the next version file; fails if a
    * concurrent writer already created it. Returns the new version. */
  def commit(name: String, expectedVersion: Int, meta: TableMetadata): Int = {
    val next = expectedVersion + 1
    val target = Paths.get(versionFile(name, next))
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent, s".v$next-", ".json.tmp")
    Files.write(tmp, MetadataJson.toJson(meta).getBytes("UTF-8"))
    try {
      // true CREATE_NEW: link(2) fails atomically when the target exists.
      // (rename(2) — Files.move ATOMIC_MOVE — silently REPLACES an
      // existing target, so exists()+move is a TOCTOU race where both
      // concurrent committers can "succeed" and one snapshot is lost.)
      Files.createLink(target, tmp)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(name, next)
    } finally Files.deleteIfExists(tmp)
    Files.write(Paths.get(hintFile(name)), next.toString.getBytes("UTF-8"))
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
    val meta = TableMetadata(
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
      properties = properties)
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
}

class CommitConflictException(table: String, version: Int)
  extends RuntimeException(s"Concurrent commit to $table at version $version")

/** Catalog-less read-only table from a metadata.json file
  * (ref: StaticTable.from_metadata table/__init__.py:1782). */
object StaticTable {
  def fromMetadata(metadataPath: String, spark: SparkSession): IceTable = {
    val json = new String(Files.readAllBytes(Paths.get(metadataPath)), "UTF-8")
    val meta = MetadataJson.fromJson(json)
    val readOnly = new HadoopCatalog(meta.location, spark) {
      override def commit(name: String, expectedVersion: Int, m: TableMetadata): Int =
        throw new UnsupportedOperationException("StaticTable is read-only")
    }
    new IceTable(readOnly, "static", meta)
  }
}
