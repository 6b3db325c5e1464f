package graft.catalog

import java.util.UUID

import graft.core._
import graft.meta._
import graft.table.IceTable
import org.apache.spark.sql.SparkSession

// ---------------------------------------------------------------------------
// DynamoDB-shaped catalog (ref: catalog/dynamodb.py). One key-value table
// holds every catalog entity: table entries keyed
// (identifier="db.tbl", namespace="db") and namespace entries keyed
// (identifier="NAMESPACE", namespace="db"), with string attributes only —
// properties prefixed "p." (ref :73 column constants,
// :657 _convert_dynamo_table_item_to_iceberg_table). All writes are
// conditional puts; a failed condition is the service's
// ConditionalCheckFailedException.
// ---------------------------------------------------------------------------

/** The three condition-expression forms the catalog uses, as a typed ADT
  * instead of an expression string (each maps 1:1 onto a DynamoDB
  * ConditionExpression + ExpressionAttributeValues pair). */
sealed trait DynamoCondition
final case class AttributeNotExists(attr: String) extends DynamoCondition
final case class AttributeExists(attr: String) extends DynamoCondition
final case class AttributeEquals(attr: String, value: String) extends DynamoCondition

final class DynamoConditionalCheckFailed(msg: String) extends RuntimeException(msg)

/** Injectable client seam — the operations dynamodb.py issues
  * (get_item/put_item/delete_item with conditions, plus the two query
  * shapes: by-namespace via the GSI, by-identifier for namespace
  * listing). Production wires the AWS SDK DynamoDbClient behind it. */
trait DynamoApi {
  def getItem(identifier: String, namespace: String): Option[Map[String, String]]
  def putItem(item: Map[String, String], condition: DynamoCondition): Unit
  def deleteItem(identifier: String, namespace: String, condition: DynamoCondition): Unit
  def queryByNamespace(namespace: String): Seq[Map[String, String]]
  def queryByIdentifier(identifier: String): Seq[Map[String, String]]
}

/** In-memory fake with DynamoDB's exact conditional-put semantics. */
final class InMemoryDynamoApi extends DynamoApi {
  private val lock = new Object
  private var items = Map.empty[(String, String), Map[String, String]]

  private def check(cur: Option[Map[String, String]], c: DynamoCondition): Boolean =
    c match {
      case AttributeNotExists(a) => cur.forall(!_.contains(a))
      case AttributeExists(a) => cur.exists(_.contains(a))
      case AttributeEquals(a, v) => cur.exists(_.get(a).contains(v))
    }

  def getItem(identifier: String, namespace: String): Option[Map[String, String]] =
    lock.synchronized(items.get((identifier, namespace)))

  def putItem(item: Map[String, String], condition: DynamoCondition): Unit =
    lock.synchronized {
      val key = (item("identifier"), item("namespace"))
      val cur = items.get(key)
      if (!check(cur, condition))
        throw new DynamoConditionalCheckFailed(
          s"Condition expression check failed: $condition - ${key._1}")
      items += key -> item
    }

  def deleteItem(identifier: String, namespace: String,
      condition: DynamoCondition): Unit = lock.synchronized {
    val cur = items.get((identifier, namespace))
    if (!check(cur, condition))
      throw new DynamoConditionalCheckFailed(
        s"Condition expression check failed: $condition - $identifier")
    items -= ((identifier, namespace))
  }

  def queryByNamespace(namespace: String): Seq[Map[String, String]] =
    lock.synchronized(
      items.collect { case ((_, ns), it) if ns == namespace => it }
        .toSeq.sortBy(_("identifier")))

  def queryByIdentifier(identifier: String): Seq[Map[String, String]] =
    lock.synchronized(
      items.collect { case ((id, _), it) if id == identifier => it }
        .toSeq.sortBy(_("namespace")))
}

/** DynamoDB-backed catalog (ref: catalog/dynamodb.py:86 DynamoDbCatalog).
  *
  * The item model, key layout, condition-guarded entity lifecycle
  * (create = put-if-absent, drop = delete-if-present, rename =
  * put-new + delete-old) and property prefixing all mirror the
  * reference. One deliberate EXTENSION: the reference's `commit_table`
  * is `NotImplementedError` (dynamodb.py:233–250) — here commits work,
  * as a conditional put guarded on the PREVIOUS metadata_location
  * (DynamoDB's native compare-and-swap), so the catalog is read-write
  * with the same optimistic-concurrency contract as every other backend.
  */
class DynamoCatalog(
    val warehouse: String,
    val spark: SparkSession,
    val api: DynamoApi = new InMemoryDynamoApi,
    val catalogName: String = "dynamodb") extends Catalog {

  import DynamoCatalog._

  Io.register(warehouse, () => spark.sessionState.newHadoopConf())
  Io.confFactory = () => spark.sessionState.newHadoopConf()

  private val DefaultDb = "default"
  ensureNamespace(DefaultDb)

  private def ensureNamespace(ns: String): Unit =
    try api.putItem(namespaceItem(ns, Map.empty), AttributeNotExists(IdentifierCol))
    catch { case _: DynamoConditionalCheckFailed => }

  private def split(name: String): (String, String) = {
    val i = name.lastIndexOf('.')
    if (i < 0) (DefaultDb, name) else (name.substring(0, i), name.substring(i + 1))
  }
  private def tableDir(name: String) = s"$warehouse/${name.replace('.', '/')}"
  private def identOf(name: String): (String, String) = {
    val (db, tbl) = split(name); (s"$db.$tbl", db)
  }

  private val VersionRe = """.*/v(\d+)-[^/]*\.metadata\.json""".r
  private def versionOf(location: String): Int = location match {
    case VersionRe(v) => v.toInt
    case _ => throw new IllegalStateException(s"Unparseable metadata location $location")
  }

  private def itemOf(name: String): Option[Map[String, String]] = {
    val (id, ns) = identOf(name)
    api.getItem(id, ns)
  }

  /** ref dynamodb.py:657 — required attrs checked, non-iceberg rejected. */
  private def metadataLocationOf(item: Map[String, String]): String = {
    Seq(PropPrefix + TableTypeKey, PropPrefix + MetadataLocationKey,
        IdentifierCol, NamespaceCol, CreatedAtCol).foreach { k =>
      require(item.contains(k), s"Iceberg required property $k is missing: $item")
    }
    val tt = item(PropPrefix + TableTypeKey)
    require(tt.equalsIgnoreCase("ICEBERG"),
      s"Property table_type is $tt, expected ICEBERG: ${item(IdentifierCol)}")
    item(PropPrefix + MetadataLocationKey)
  }

  def tableExists(name: String): Boolean = itemOf(name).isDefined
  def currentVersion(name: String): Option[Int] =
    itemOf(name).map(i => versionOf(metadataLocationOf(i)))

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
    val item = itemOf(name).getOrElse(
      throw new IllegalArgumentException(s"Table $name not found"))
    val loc = metadataLocationOf(item)
    // uuid-named metadata files are immutable: parse is path-cache-served
    new IceTable(this, name, MetadataCache.read(loc), versionOf(loc))
  }

  def commit(name: String, expectedVersion: Int, meta: TableMetadata): Int = {
    val (id, ns) = identOf(name)
    ensureNamespace(ns)
    val next = expectedVersion + 1
    val newLoc = s"${meta.location}/metadata/v$next-${UUID.randomUUID()}.metadata.json"
    Io.writeBytes(newLoc, MetadataJson.toJson(meta).getBytes("UTF-8"))
    val now = System.currentTimeMillis().toString

    if (expectedVersion == 0) {
      val item = tableItem(id, ns, newLoc, prev = None, meta, created = now)
      try api.putItem(item, AttributeNotExists(IdentifierCol))
      catch { case _: DynamoConditionalCheckFailed =>
        Io.delete(newLoc)
        throw new CommitConflictException(name, next)
      }
    } else {
      val cur = itemOf(name).getOrElse {
        Io.delete(newLoc)
        throw new CommitConflictException(name, next)
      }
      val curLoc = metadataLocationOf(cur)
      if (versionOf(curLoc) != expectedVersion) {
        Io.delete(newLoc)
        throw new CommitConflictException(name, next)
      }
      // DynamoDB-native CAS: the put lands only if the pointer is still
      // the one this committer planned against (extension — the
      // reference leaves commit_table unimplemented, dynamodb.py:250)
      val item = tableItem(id, ns, newLoc, prev = Some(curLoc), meta,
        created = cur.getOrElse(CreatedAtCol, now))
      try api.putItem(item, AttributeEquals(PropPrefix + MetadataLocationKey, curLoc))
      catch { case _: DynamoConditionalCheckFailed =>
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
    val (id, ns) = identOf(name)
    try api.deleteItem(id, ns, AttributeExists(IdentifierCol))
    catch { case _: DynamoConditionalCheckFailed =>
      throw new IllegalArgumentException(s"Table $name not found") }
  }

  // ---- namespaces --------------------------------------------------------

  def createNamespace(ns: String): Unit =
    try api.putItem(namespaceItem(ns, Map.empty), AttributeNotExists(IdentifierCol))
    catch { case _: DynamoConditionalCheckFailed =>
      throw new IllegalArgumentException(s"Namespace $ns already exists") }

  def dropNamespace(ns: String): Unit = {
    if (listTables(ns).nonEmpty)
      throw new IllegalStateException(s"Namespace $ns is not empty")
    try api.deleteItem(NamespaceMarker, ns, AttributeExists(IdentifierCol))
    catch { case _: DynamoConditionalCheckFailed =>
      throw new IllegalArgumentException(s"Namespace $ns does not exist") }
  }

  def listNamespaces(): Seq[String] =
    api.queryByIdentifier(NamespaceMarker).map(_(NamespaceCol)).filter(_ != DefaultDb)

  def listTables(ns: String = ""): Seq[String] = {
    val db = if (ns.isEmpty) DefaultDb else ns
    api.queryByNamespace(db)
      .filter(_(IdentifierCol) != NamespaceMarker)
      .map(i => if (db == DefaultDb) i(IdentifierCol).stripPrefix(s"$DefaultDb.")
        else i(IdentifierCol))
  }

  override def loadNamespaceProperties(ns: String): Map[String, String] = {
    val item = api.getItem(NamespaceMarker, ns).getOrElse(
      throw new IllegalArgumentException(s"Namespace $ns does not exist"))
    item.collect { case (k, v) if k.startsWith(PropPrefix) =>
      k.stripPrefix(PropPrefix) -> v }
  }

  override def updateNamespaceProperties(ns: String, updates: Map[String, String],
      removals: Set[String] = Set.empty): Unit = {
    val merged = (loadNamespaceProperties(ns) -- removals) ++ updates
    api.putItem(namespaceItem(ns, merged), AttributeExists(NamespaceCol))
  }

  /** Rename = put the new identifier item carrying the SAME pointer,
    * then delete the old (ref dynamodb.py:295). */
  override def renameTable(from: String, to: String): Unit = {
    val item = itemOf(from).getOrElse(
      throw new IllegalArgumentException(s"Table $from not found"))
    require(!tableExists(to), s"Table $to already exists")
    val (toId, toNs) = identOf(to)
    ensureNamespace(toNs)
    val moved = item + (IdentifierCol -> toId) + (NamespaceCol -> toNs) +
      (UpdatedAtCol -> System.currentTimeMillis().toString)
    api.putItem(moved, AttributeNotExists(IdentifierCol))
    try forgetTable(from)
    catch { case e: Exception =>
      api.deleteItem(toId, toNs, AttributeExists(IdentifierCol))
      throw e
    }
  }

  // ---- views: the reference's DynamoDB catalog raises
  // NotImplementedError for every view op (dynamodb.py:557–:584) --------
  protected def viewLocation(name: String): Option[String] = None
  protected def storeView(name: String, version: Int, expected: Option[String],
      json: String, location: String): String =
    throw new UnsupportedOperationException(
      "DynamoDB catalog does not support views (ref dynamodb.py:557)")
  protected def linkView(name: String, metadataLocation: String): Unit =
    throw new UnsupportedOperationException(
      "DynamoDB catalog does not support views (ref dynamodb.py:557)")
  protected def forgetView(name: String): Unit =
    throw new UnsupportedOperationException(
      "DynamoDB catalog does not support views (ref dynamodb.py:557)")
  def listViews(ns: String = ""): Seq[String] = Nil
}

object DynamoCatalog {
  /** ref dynamodb.py:73–:77 column constants; :71 property prefix. */
  val IdentifierCol = "identifier"
  val NamespaceCol = "namespace"
  val VersionCol = "v"
  val CreatedAtCol = "created_at"
  val UpdatedAtCol = "updated_at"
  val NamespaceMarker = "NAMESPACE"
  val PropPrefix = "p."
  val TableTypeKey = "table_type"
  val MetadataLocationKey = "metadata_location"
  val PrevMetadataLocationKey = "previous_metadata_location"

  def tableItem(identifier: String, namespace: String, metadataLocation: String,
      prev: Option[String], meta: TableMetadata, created: String): Map[String, String] = {
    val now = System.currentTimeMillis().toString
    Map(
      IdentifierCol -> identifier,
      NamespaceCol -> namespace,
      VersionCol -> UUID.randomUUID().toString,
      CreatedAtCol -> created,
      UpdatedAtCol -> now,
      PropPrefix + TableTypeKey -> "ICEBERG",
      PropPrefix + MetadataLocationKey -> metadataLocation) ++
      prev.map(PropPrefix + PrevMetadataLocationKey -> _) ++
      meta.properties.map { case (k, v) => (PropPrefix + k) -> v }
  }

  def namespaceItem(ns: String, properties: Map[String, String]): Map[String, String] = {
    val now = System.currentTimeMillis().toString
    Map(
      IdentifierCol -> NamespaceMarker,
      NamespaceCol -> ns,
      VersionCol -> UUID.randomUUID().toString,
      CreatedAtCol -> now,
      UpdatedAtCol -> now) ++
      properties.map { case (k, v) => (PropPrefix + k) -> v }
  }
}
