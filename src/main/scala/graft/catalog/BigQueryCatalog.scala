package graft.catalog

import java.util.UUID
import java.util.concurrent.atomic.AtomicLong

import graft.core._
import graft.meta._
import graft.table.IceTable
import org.apache.spark.sql.SparkSession

// ---------------------------------------------------------------------------
// BigQuery-metastore wire shapes (the record model the reference maps
// tables onto: catalog/bigquery_metastore.py:374
// _create_external_catalog_table_options / :386 dataset options / :411
// _create_table_parameters). Kept SDK-free: `BqApi` below is the
// injectable client seam — production wires google-cloud-bigquery behind
// it; this zero-egress build ships `InMemoryBqApi` with the same
// contract (dataset/table CRUD, Conflict/NotFound shapes, and etag
// preconditions on update).
// ---------------------------------------------------------------------------

final case class BqStorageDescriptor(
    locationUri: String,
    inputFormat: String = "org.apache.hadoop.mapred.FileInputFormat",
    outputFormat: String = "org.apache.hadoop.mapred.FileOutputFormat",
    serdeLib: String = "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe")

/** ExternalCatalogTableOptions — the hive-shaped envelope BigQuery
  * stores for external catalog tables. */
final case class BqExternalTableOptions(
    storageDescriptor: BqStorageDescriptor,
    parameters: Map[String, String])

/** ExternalCatalogDatasetOptions (ref :386): the dataset-level default
  * storage root (`<warehouse>/<db>.db`) plus namespace properties. */
final case class BqExternalDatasetOptions(
    defaultStorageLocationUri: String,
    parameters: Map[String, String])

final case class BqDataset(
    datasetId: String,
    options: Option[BqExternalDatasetOptions])

/** Table record; `etag` is BigQuery's optimistic-concurrency token
  * (if-match semantics on update). */
final case class BqTableRecord(
    datasetId: String,
    tableId: String,
    options: BqExternalTableOptions,
    etag: String)

/** Typed service exceptions (the google.api_core shapes the reference
  * matches on: NotFound / Conflict; PreconditionFailed for etag). */
final class BqNotFound(msg: String) extends RuntimeException(msg)
final class BqConflict(msg: String) extends RuntimeException(msg)
final class BqPreconditionFailed(msg: String) extends RuntimeException(msg)

/** The client seam: the BigQuery operations the reference catalog calls
  * (create_table :155, get_table :207, delete_table :228, list_tables
  * :255, dataset CRUD :162/:244/:270) plus etag-guarded update_table for
  * the commit extension. */
trait BqApi {
  def createDataset(d: BqDataset): Unit
  def getDataset(id: String): BqDataset
  def updateDataset(d: BqDataset): Unit
  def deleteDataset(id: String): Unit
  def listDatasets(): Seq[BqDataset]
  def createTable(t: BqTableRecord): Unit
  def getTable(dataset: String, table: String): BqTableRecord
  /** Fails with [[BqPreconditionFailed]] unless `etag` matches the
    * stored record's current etag (BigQuery if-match). */
  def updateTable(t: BqTableRecord, etag: String): Unit
  def deleteTable(dataset: String, table: String): Unit
  def listTables(dataset: String): Seq[String]
}

/** In-memory fake with the full service contract — CRUD, typed errors,
  * etag minting on every successful write. */
class InMemoryBqApi extends BqApi {
  private val datasets = scala.collection.mutable.Map[String, BqDataset]()
  private val tables = scala.collection.mutable.Map[(String, String), BqTableRecord]()
  private val etags = new AtomicLong(0)

  private def requireDs(id: String): Unit =
    if (!datasets.contains(id)) throw new BqNotFound(s"Dataset $id not found")

  def createDataset(d: BqDataset): Unit = synchronized {
    if (datasets.contains(d.datasetId))
      throw new BqConflict(s"Dataset ${d.datasetId} already exists")
    datasets(d.datasetId) = d
  }
  def getDataset(id: String): BqDataset = synchronized {
    datasets.getOrElse(id, throw new BqNotFound(s"Dataset $id not found"))
  }
  def updateDataset(d: BqDataset): Unit = synchronized {
    requireDs(d.datasetId); datasets(d.datasetId) = d
  }
  def deleteDataset(id: String): Unit = synchronized {
    requireDs(id)
    if (tables.keys.exists(_._1 == id))
      throw new BqConflict(s"Dataset $id is not empty")
    datasets -= id
  }
  def listDatasets(): Seq[BqDataset] = synchronized(datasets.values.toSeq.sortBy(_.datasetId))

  def createTable(t: BqTableRecord): Unit = synchronized {
    requireDs(t.datasetId)
    val key = (t.datasetId, t.tableId)
    if (tables.contains(key))
      throw new BqConflict(s"Table ${t.datasetId}.${t.tableId} already exists")
    tables(key) = t.copy(etag = s"etag-${etags.incrementAndGet()}")
  }
  def getTable(dataset: String, table: String): BqTableRecord = synchronized {
    tables.getOrElse((dataset, table),
      throw new BqNotFound(s"Table $dataset.$table not found"))
  }
  def updateTable(t: BqTableRecord, etag: String): Unit = synchronized {
    val cur = getTable(t.datasetId, t.tableId)
    if (cur.etag != etag)
      throw new BqPreconditionFailed(
        s"etag mismatch for ${t.datasetId}.${t.tableId}: " +
          s"expected ${cur.etag}, got $etag")
    tables((t.datasetId, t.tableId)) = t.copy(etag = s"etag-${etags.incrementAndGet()}")
  }
  def deleteTable(dataset: String, table: String): Unit = synchronized {
    if (tables.remove((dataset, table)).isEmpty)
      throw new BqNotFound(s"Table $dataset.$table not found")
  }
  def listTables(dataset: String): Seq[String] = synchronized {
    tables.keys.filter(_._1 == dataset).map(_._2).toSeq.sorted
  }
}

/** BigQuery-metastore-backed catalog (ref:
  * catalog/bigquery_metastore.py:65 BigQueryMetastoreCatalog).
  *
  * BigQuery datasets are the namespaces; each table record carries an
  * ExternalCatalogTableOptions envelope — a hive-shaped
  * StorageDescriptor plus `parameters{metadata_location,
  * table_type=iceberg, EXTERNAL=true, uuid, numFiles/numRows/totalSize}`
  * (ref :411 _create_table_parameters). The metadata JSON lives under
  * the table location like every other catalog here.
  *
  * The REFERENCE's commit_table raises NotImplementedError (:234) — its
  * BigQuery catalog is create/load/drop/list only. This engine goes one
  * step further: commits swing the pointer with an etag-guarded
  * update_table (BigQuery's native if-match optimistic concurrency), so
  * appends and DML work; pass `parityCommits = true` to get the
  * reference's exact create-only behavior. rename_table raises in both
  * (:240 — BigQuery has no table rename).
  */
class BigQueryCatalog(
    val warehouse: String,
    val spark: SparkSession,
    val api: BqApi = new InMemoryBqApi,
    val projectId: String = "graft-project",
    val catalogName: String = "bigquery",
    val parityCommits: Boolean = false) extends Catalog {

  import BigQueryCatalog._

  Io.register(warehouse, () => spark.sessionState.newHadoopConf())
  Io.confFactory = () => spark.sessionState.newHadoopConf()

  private val DefaultDs = "default"

  private def split(name: String): (String, String) = {
    val i = name.lastIndexOf('.')
    if (i < 0) (DefaultDs, name) else (name.substring(0, i), name.substring(i + 1))
  }
  /** ref :444 _get_default_warehouse_location_for_dataset:
    * `<warehouse>/<db>.db`, table dirs under it. */
  private def datasetDir(ds: String) = s"$warehouse/$ds.db"
  private def tableDir(name: String): String = {
    val (ds, tbl) = split(name)
    s"${datasetDir(ds)}/$tbl"
  }

  private def ensureDefaultDs(): Unit =
    try api.createDataset(BqDataset(DefaultDs,
      Some(BqExternalDatasetOptions(datasetDir(DefaultDs), Map.empty))))
    catch { case _: BqConflict => }
  ensureDefaultDs()

  private val VersionRe = """.*/v(\d+)-[^/]*\.metadata\.json""".r
  private def versionOf(location: String): Int = location match {
    case VersionRe(v) => v.toInt
    case _ => throw new IllegalStateException(s"Unparseable metadata location $location")
  }

  /** ref :394 _convert_bigquery_table_to_iceberg_table — the pointer
    * rides ExternalCatalogTableOptions.parameters. */
  private def metadataLocationOf(rec: BqTableRecord): String = {
    val p = rec.options.parameters
    p.get(TableTypeKey).filter(_.equalsIgnoreCase("ICEBERG")).getOrElse(
      throw new IllegalArgumentException(
        s"Property $TableTypeKey missing or not iceberg: " +
          s"${rec.datasetId}.${rec.tableId}"))
    p.getOrElse(MetadataLocationKey,
      throw new IllegalArgumentException(
        s"Table property $MetadataLocationKey is missing: " +
          s"${rec.datasetId}.${rec.tableId}"))
  }

  private def recordOf(name: String): Option[BqTableRecord] = {
    val (ds, tbl) = split(name)
    try Some(api.getTable(ds, tbl)) catch { case _: BqNotFound => None }
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
    val (ds, tbl) = split(name)
    if (parityCommits && expectedVersion != 0)
      // the reference's exact behavior (bigquery_metastore.py:234)
      throw new UnsupportedOperationException(
        "commit_table is not implemented on the BigQuery catalog (parity mode)")
    val next = expectedVersion + 1
    val newLoc = s"${meta.location}/metadata/v$next-${UUID.randomUUID()}.metadata.json"
    Io.writeBytes(newLoc, MetadataJson.toJson(meta).getBytes("UTF-8"))

    if (expectedVersion == 0) {
      val rec = record(ds, tbl, meta, newLoc, etag = "")
      try api.createTable(rec)
      catch {
        case _: BqConflict =>
          Io.delete(newLoc)
          throw new CommitConflictException(name, next)
        case _: BqNotFound => // dataset missing: auto-create once
          api.createDataset(BqDataset(ds,
            Some(BqExternalDatasetOptions(datasetDir(ds), Map.empty))))
          try api.createTable(rec)
          catch { case _: BqConflict =>
            Io.delete(newLoc); throw new CommitConflictException(name, next) }
      }
    } else {
      val cur = recordOf(name).getOrElse {
        Io.delete(newLoc)
        throw new CommitConflictException(name, next)
      }
      if (versionOf(metadataLocationOf(cur)) != expectedVersion) {
        Io.delete(newLoc)
        throw new CommitConflictException(name, next)
      }
      try api.updateTable(record(ds, tbl, meta, newLoc, cur.etag), cur.etag)
      catch {
        case _: BqPreconditionFailed =>
          Io.delete(newLoc)
          throw new CommitConflictException(name, next)
      }
    }
    next
  }

  private def record(ds: String, tbl: String, meta: TableMetadata,
      loc: String, etag: String): BqTableRecord =
    BqTableRecord(ds, tbl,
      BqExternalTableOptions(
        BqStorageDescriptor(meta.location),
        parameters(loc, meta)),
      etag)

  def dropTable(name: String): Unit = {
    forgetTable(name)
    if (Io.exists(tableDir(name))) Io.delete(tableDir(name), recursive = true)
  }

  protected def forgetTable(name: String): Unit = {
    val (ds, tbl) = split(name)
    try api.deleteTable(ds, tbl)
    catch { case _: BqNotFound =>
      throw new IllegalArgumentException(s"Table $name not found") }
  }

  /** ref :240 — BigQuery has no table rename; the reference raises. */
  override def renameTable(from: String, to: String): Unit =
    throw new UnsupportedOperationException(
      "rename_table is not implemented on the BigQuery catalog")

  // ---- namespaces = BigQuery datasets ------------------------------------

  def createNamespace(ns: String): Unit =
    try api.createDataset(BqDataset(ns,
      Some(BqExternalDatasetOptions(datasetDir(ns), Map.empty))))
    catch { case _: BqConflict =>
      throw new IllegalArgumentException(s"Namespace $ns already exists") }

  def dropNamespace(ns: String): Unit =
    try api.deleteDataset(ns)
    catch {
      case _: BqNotFound =>
        throw new IllegalArgumentException(s"Namespace $ns does not exist")
      case e: BqConflict =>
        throw new IllegalStateException(e.getMessage)
    }

  def listNamespaces(): Seq[String] =
    api.listDatasets().map(_.datasetId).filter(_ != DefaultDs)

  def listTables(ns: String = ""): Seq[String] = {
    val ds = if (ns.isEmpty) DefaultDs else ns
    try api.listTables(ds).map(t => if (ds == DefaultDs) t else s"$ds.$t")
    catch { case _: BqNotFound => Nil }
  }

  /** ref :337 load_namespace_properties returns the dataset's external
    * options (default storage root + parameters). */
  override def loadNamespaceProperties(ns: String): Map[String, String] = {
    val d = try api.getDataset(ns)
      catch { case _: BqNotFound =>
        throw new IllegalArgumentException(s"Namespace $ns does not exist") }
    d.options.map(o =>
      o.parameters + ("default_storage_location_uri" -> o.defaultStorageLocationUri))
      .getOrElse(Map.empty)
  }

  override def updateNamespaceProperties(ns: String, updates: Map[String, String],
      removals: Set[String] = Set.empty): Unit = {
    // the reference raises NotImplementedError (:350); dataset options ARE
    // mutable in BigQuery, so this engine supports it as an extension
    val d = try api.getDataset(ns)
      catch { case _: BqNotFound =>
        throw new IllegalArgumentException(s"Namespace $ns does not exist") }
    val cur = d.options.map(_.parameters).getOrElse(Map.empty)
    val loc = d.options.map(_.defaultStorageLocationUri).getOrElse(datasetDir(ns))
    val merged = (cur -- removals) ++ updates
    api.updateDataset(BqDataset(ns, Some(BqExternalDatasetOptions(loc, merged))))
  }

  // ---- views: not in the reference's BigQuery catalog (:321–:333 all
  // raise NotImplementedError) ----------------------------------------------
  protected def viewLocation(name: String): Option[String] = None
  protected def storeView(name: String, version: Int, expected: Option[String],
      json: String, location: String): String =
    throw new UnsupportedOperationException(
      "Views are not supported on the BigQuery catalog")
  protected def linkView(name: String, metadataLocation: String): Unit =
    throw new UnsupportedOperationException(
      "Views are not supported on the BigQuery catalog")
  protected def forgetView(name: String): Unit =
    throw new UnsupportedOperationException(
      "Views are not supported on the BigQuery catalog")
  def listViews(ns: String = ""): Seq[String] = Nil
}

object BigQueryCatalog {
  val TableTypeKey = "table_type"
  val MetadataLocationKey = "metadata_location"

  /** ref :411 _create_table_parameters: iceberg properties + uuid +
    * pointer + EXTERNAL, plus hive-style basic statistics from the
    * current snapshot summary. */
  def parameters(metadataLocation: String, meta: TableMetadata): Map[String, String] = {
    val stats = meta.currentSnapshot.map(_.summary).map { s =>
      Seq(
        s.get("total-data-files").map("numFiles" -> _),
        s.get("total-records").map("numRows" -> _),
        s.get("total-files-size").map("totalSize" -> _)).flatten.toMap
    }.getOrElse(Map.empty)
    meta.properties ++ stats ++ Map(
      "uuid" -> meta.tableUuid,
      MetadataLocationKey -> metadataLocation,
      TableTypeKey -> "iceberg",
      "EXTERNAL" -> "true")
  }
}
