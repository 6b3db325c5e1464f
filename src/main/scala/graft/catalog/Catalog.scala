package graft.catalog

import java.nio.file.{Files, Paths}
import java.util.UUID

import graft.core.Schema
import graft.meta._
import graft.table.IceTable
import org.apache.spark.sql.SparkSession

/** Filesystem ("hadoop"-style) catalog (ref: pyiceberg/catalog/__init__.py:347
  * Catalog ABC; SURVEY §7 step 5).
  *
  * Layout: `<warehouse>/<name>/metadata/v<N>.metadata.json` +
  * `version-hint.text`. Commits are optimistic: writing `v<N+1>` uses an
  * atomic create-new — a concurrent commit to the same version loses and
  * must retry (ref: Transaction commit, table/__init__.py:1039).
  */
class HadoopCatalog(val warehouse: String, val spark: SparkSession) {

  private def tableDir(name: String) = s"$warehouse/$name"
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
