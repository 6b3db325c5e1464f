package graft.spark

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions => SparkX, FieldReference, Literal => SparkLiteral, NamedReference, Transform => SparkTransform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.{HadoopCatalog, RestCatalog, SqlCatalog}
import graft.core._
import graft.meta.{PartitionSpec}

/** Spark catalog plugin: the full SQL face over a graft catalog
  * (SURVEY §7 step 10, the catalog-routing half of VERDICT r5 item 1).
  *
  * ```
  * spark.sql.catalog.g          = graft.spark.GraftCatalog
  * spark.sql.catalog.g.warehouse= /wh
  * spark.sql.catalog.g.uri      = jdbc:derby:...   (optional → SqlCatalog)
  * ```
  *
  * gives `CREATE TABLE g.db.t (...) PARTITIONED BY (days(ts), bucket(4, id))`,
  * `INSERT INTO` / `INSERT OVERWRITE`, `DELETE FROM … WHERE`, `SELECT … FROM
  * g.db.t VERSION AS OF <snapshot-id|ref>` / `TIMESTAMP AS OF`, `ALTER TABLE`
  * (add/drop/rename/retype columns, properties), `DROP/SHOW TABLES`, and
  * namespace DDL — all backed by the library's commit machinery (optimistic
  * metadata swap, manifest merge, fan-out parquet writes with field ids).
  *
  * The reference exposes the same operations only through its Python API
  * (catalog/__init__.py Catalog ABC: create_table :335, load_table :443,
  * drop_table :490, rename_table :538, list_tables :589, namespaces :470+);
  * this plugin is the Spark-native equivalent surface.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces with FunctionCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var catalog: graft.catalog.Catalog = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = options.get("warehouse")
    val spark = org.apache.spark.sql.SparkSession.active
    // SQL DML against this catalog benefits from the UPDATE-assignment
    // capture (prunes the CoW lineage diff to assigned columns)
    AssignedColumnsRule.install(spark)
    catalog = Option(options.get("uri")) match {
      case Some(http) if http.startsWith("http://") || http.startsWith("https://") =>
        // REST catalog: warehouse comes from the server's config handshake.
        // ALL spark.sql.catalog.<name>.* options flow through (token,
        // credential, scan-planning-mode, …) — filtering to a known set
        // would silently disable documented client properties
        new RestCatalog(http, spark, options.asScala.toMap - "uri")
      case Some(jdbc) =>
        require(wh != null, s"spark.sql.catalog.$name.warehouse is required")
        new SqlCatalog(jdbc, wh, spark)
      case None =>
        require(wh != null, s"spark.sql.catalog.$name.warehouse is required")
        new HadoopCatalog(wh, spark)
    }
  }

  override def name(): String = catalogName

  private def fullName(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  private def toIdent(full: String): Identifier = {
    val parts = full.split('.')
    Identifier.of(parts.dropRight(1), parts.last)
  }

  // ---- tables -----------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = namespace.mkString(".")
    if (ns.nonEmpty && !namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    catalog.listTables(ns).map(toIdent).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    catalog.tableExists(fullName(ident))

  override def loadTable(ident: Identifier): Table = {
    if (tableExists(ident)) return new GraftSparkTable(catalog.loadTable(fullName(ident)))
    refTableOf(ident).orElse(metadataTableOf(ident))
      .getOrElse(throw new NoSuchTableException(ident))
  }

  /** `cat.db.t.branch_x` / `cat.db.t.tag_x` — the ref-suffix table names
    * of the Iceberg Spark runtime. A branch table reads at the branch
    * head AND accepts INSERT/INSERT OVERWRITE/DELETE targeting that
    * branch (SQL write-audit-publish); a tag table is read-only. Branch
    * tables report the table's CURRENT schema (one schema across refs —
    * Iceberg semantics; the id-based projection maps it onto the branch
    * head's files); tags report their snapshot's schema like time
    * travel. */
  private def refTableOf(ident: Identifier): Option[Table] = {
    if (ident.namespace().isEmpty) return None
    // cheap name test FIRST: every metadata-table load routes through
    // here, and tableExists is a filesystem/JDBC round-trip
    val n = ident.name()
    val (refName, wantType) =
      if (n.startsWith("branch_")) (n.stripPrefix("branch_"), "branch")
      else if (n.startsWith("tag_")) (n.stripPrefix("tag_"), "tag")
      else return None
    val baseIdent = Identifier.of(ident.namespace().dropRight(1), ident.namespace().last)
    if (!tableExists(baseIdent)) return None
    val t = catalog.loadTable(fullName(baseIdent))
    t.metadata.refs.get(refName).filter(_.refType == wantType).map { r =>
      new GraftSparkTable(t, Some(r.snapshotId),
        branch = if (wantType == "branch") Some(refName) else None)
    }
  }

  /** `SELECT * FROM g.db.t.snapshots` — the reference's inspect API
    * (table/inspect.py) on the SQL face: a trailing metadata-table name
    * after an existing table resolves to a read-only relation of that
    * inspect frame (snapshots/refs/history/manifests/files/partitions/…). */
  private def metadataTableOf(ident: Identifier,
      snapshotId: Option[Long] = None): Option[Table] = {
    if (ident.namespace().isEmpty) return None
    val baseIdent = Identifier.of(ident.namespace().dropRight(1), ident.namespace().last)
    if (!tableExists(baseIdent)) return None
    def noTravel[A](v: A): A = {
      require(snapshotId.isEmpty,
        s"VERSION/TIMESTAMP AS OF is not supported for metadata table '${ident.name()}'")
      v
    }
    val snap = snapshotId
    val build: Option[graft.table.IceTable => org.apache.spark.sql.DataFrame] =
      ident.name().toLowerCase match {
        case "snapshots" => noTravel(Some(_.inspect.snapshots()))
        case "refs" => noTravel(Some(_.inspect.refs()))
        case "history" => noTravel(Some(_.inspect.history()))
        case "metadata_log_entries" => noTravel(Some(_.inspect.metadataLogEntries()))
        case "manifests" => noTravel(Some(_.inspect.manifests()))
        case "all_manifests" => noTravel(Some(_.inspect.allManifests()))
        // snapshot-aware tables honor VERSION/TIMESTAMP AS OF, like the
        // reference's inspect(snapshot_id) parameters
        case "entries" => Some(_.inspect.entries(snap))
        case "files" => Some(_.inspect.files(snapshotId = snap))
        case "data_files" => Some(_.inspect.dataFiles(snap))
        case "delete_files" => Some(_.inspect.deleteFiles(snap))
        case "all_files" => noTravel(Some(_.inspect.allFiles()))
        case "all_data_files" => noTravel(Some(_.inspect.allDataFiles()))
        case "all_delete_files" => noTravel(Some(_.inspect.allDeleteFiles()))
        case "position_deletes" => Some(_.inspect.positionDeletes(snap))
        case "partitions" => Some(_.inspect.partitions(snap))
        // full change feed (table start → current), the SQL face of the
        // incremental append scan; bounded ranges ride the
        // spark.read.format("graft") change-range-from/-to options
        case "changes" => noTravel(Some(t => graft.streaming.TableChanges.poll(t, None)._1))
        // row-level CDC: inserts AND deletes with _change_type/_change_ordinal;
        // VERSION AS OF bounds the range end
        case "changelog" =>
          Some(t => graft.streaming.TableChanges.changelog(t, None, snap))
        case _ => None
      }
    build.map { fn =>
      val t = catalog.loadTable(fullName(baseIdent))
      new GraftMetadataTable(s"${fullName(baseIdent)}.${ident.name()}", fn(t))
    }
  }

  private def resolveVersion(t: graft.table.IceTable, version: String,
      name: String): Long =
    version.toLongOption
      .filter(v => t.metadata.snapshotById(v).isDefined)
      .orElse(t.metadata.snapshotByName(version).map(_.snapshotId))
      .getOrElse(throw new IllegalArgumentException(
        s"Cannot find snapshot or ref '$version' in table $name"))

  /** Base table of a metadata-table ident, when it is one. */
  private def metadataBaseOf(ident: Identifier): Option[graft.table.IceTable] =
    if (ident.namespace().isEmpty) None
    else {
      val baseIdent = Identifier.of(ident.namespace().dropRight(1), ident.namespace().last)
      if (tableExists(baseIdent)) Some(catalog.loadTable(fullName(baseIdent))) else None
    }

  /** `VERSION AS OF x` — a snapshot id, or a branch/tag name; also valid
    * on snapshot-aware metadata tables (`t.files VERSION AS OF s`,
    * matching the reference's inspect(snapshot_id) parameters). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) {
      val mt = metadataBaseOf(ident).flatMap(base => metadataTableOf(ident,
        Some(resolveVersion(base, version, fullName(ident)))))
      return mt.getOrElse(throw new NoSuchTableException(ident))
    }
    val table = catalog.loadTable(fullName(ident))
    new GraftSparkTable(table, Some(resolveVersion(table, version, fullName(ident))))
  }

  /** `TIMESTAMP AS OF t` — Spark passes MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    def asOf(t: graft.table.IceTable): Long =
      t.metadata.snapshotAsOf(timestampMicros / 1000L).map(_.snapshotId).getOrElse(
        throw new IllegalArgumentException(
          s"No snapshot in ${fullName(ident)} as of $timestampMicros"))
    if (!tableExists(ident)) {
      val mt = metadataBaseOf(ident).flatMap(base =>
        metadataTableOf(ident, Some(asOf(base))))
      return mt.getOrElse(throw new NoSuchTableException(ident))
    }
    val table = catalog.loadTable(fullName(ident))
    new GraftSparkTable(table, Some(asOf(table)))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[SparkTransform], properties: JMap[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val iceSchema = Schema.fromSpark(schema)
    val spec = GraftCatalog.toSpec(iceSchema, partitions)
    // Spark-managed entries (provider/owner/location) are not table
    // properties; `option.`-prefixed read options don't persist either
    val reserved = Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_LOCATION, TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_TABLE_TYPE)
    val props = properties.asScala.toMap
      .filterNot { case (k, _) => reserved.contains(k) || k.startsWith(TableCatalog.OPTION_PREFIX) }
    new GraftSparkTable(catalog.createTable(fullName(ident), iceSchema, spec, props))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val table = catalog.loadTable(fullName(ident))
    // properties first (cheap metadata swaps), then one schema transaction
    val schemaChanges = changes.filter {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => false
      case _ => true
    }
    changes.foreach {
      case p: TableChange.SetProperty => table.setProperties(p.property -> p.value)
      case p: TableChange.RemoveProperty => table.removeProperties(p.property)
      case _ => ()
    }
    if (schemaChanges.nonEmpty) {
      val up = table.updateSchema
      schemaChanges.foreach {
        case c: TableChange.AddColumn =>
          // added columns must be optional (Iceberg evolution rule — old
          // files have no value for them); dotted names add inside structs
          require(c.isNullable,
            s"Added column ${c.fieldNames.mkString(".")} must be nullable")
          up.addColumn(c.fieldNames.mkString("."),
            SchemaConv.fromSpark(c.dataType, () => 0), Option(c.comment))
        case c: TableChange.DeleteColumn => up.dropColumn(c.fieldNames.mkString("."))
        case c: TableChange.RenameColumn =>
          up.renameColumn(c.fieldNames.mkString("."), c.newName)
        case c: TableChange.UpdateColumnType =>
          up.updateColumnType(c.fieldNames.mkString("."),
            SchemaConv.fromSpark(c.newDataType, () => 0))
        case c: TableChange.UpdateColumnNullability =>
          require(c.nullable, s"Cannot make ${c.fieldNames.mkString(".")} required")
          up.makeColumnOptional(c.fieldNames.mkString("."))
        case c: TableChange.UpdateColumnComment =>
          up.updateColumnDoc(c.fieldNames.mkString("."), c.newComment)
        case other => throw new UnsupportedOperationException(
          s"ALTER TABLE change not supported: $other")
      }
      up.commit()
    }
    new GraftSparkTable(table.refresh())
  }

  override def dropTable(ident: Identifier): Boolean =
    if (tableExists(ident)) { catalog.dropTable(fullName(ident)); true } else false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    catalog.renameTable(fullName(oldIdent), fullName(newIdent))
  }

  // ---- functions --------------------------------------------------------
  // The partition-transform functions (bucket/truncate/years/…) live in
  // every namespace incl. the root: Spark resolves the functions named by
  // a scan's KeyGroupedPartitioning through the TABLE's catalog, which is
  // what lets two co-partitioned graft tables join shuffle-free
  // (storage-partitioned joins; GraftFunctions).

  override def listFunctions(namespace: Array[String])
      : Array[Identifier] =
    GraftFunctions.names.map(n => Identifier.of(namespace, n)).toArray

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    GraftFunctions.load(ident.name()).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident))

  // ---- namespaces -------------------------------------------------------

  private def nsName(namespace: Array[String]): String = namespace.mkString(".")

  override def namespaceExists(namespace: Array[String]): Boolean =
    catalog.listNamespaces().contains(nsName(namespace)) ||
      catalog.listTables(nsName(namespace)).nonEmpty

  override def listNamespaces(): Array[Array[String]] =
    catalog.listNamespaces().map(_.split('.')).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val prefix = nsName(namespace) + "."
    catalog.listNamespaces().filter(_.startsWith(prefix)).map(_.split('.')).toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit =
    catalog.createNamespace(nsName(namespace))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val ns = nsName(namespace)
    if (!namespaceExists(namespace)) return false
    val tables = catalog.listTables(ns)
    if (tables.nonEmpty) {
      if (!cascade) throw new NonEmptyNamespaceException(namespace)
      tables.foreach(catalog.dropTable)
    }
    catalog.dropNamespace(ns)
    true
  }

  // ---- maintenance procedures (CALL g.system.<name>(...)) ---------------

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"Procedures live in the 'system' namespace: $ident")
    GraftProcedures.byName(catalog).getOrElse(ident.name().toLowerCase,
      throw new IllegalArgumentException(
        s"Unknown procedure ${ident.name()}; known: ${GraftProcedures.names.mkString(", ")}"))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (!namespace.sameElements(Array("system"))) Array.empty
    else GraftProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray
}

object GraftCatalog {
  /** Spark partition transforms → engine PartitionSpec, with Iceberg's
    * conventional field names (ref partitioning.py PartitionField naming). */
  def toSpec(schema: Schema, partitions: Array[SparkTransform]): PartitionSpec = {
    if (partitions.isEmpty) return PartitionSpec.Unpartitioned
    val fields = partitions.toSeq.map { t =>
      def ref: String = t.references() match {
        case Array(r: NamedReference) => r.fieldNames.mkString(".")
        case other => throw new UnsupportedOperationException(
          s"Partition transform needs one column reference: $t (${other.mkString(",")})")
      }
      def intArg: Int = t.arguments().collectFirst {
        case l: SparkLiteral[_] => l.value() match {
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long => l.intValue()
        }
      }.getOrElse(throw new IllegalArgumentException(s"Transform $t needs an int argument"))
      t.name() match {
        case "identity" => (ref, IdentityTransform: Transform, ref)
        case "bucket" => (ref, BucketTransform(intArg): Transform, s"${ref}_bucket")
        case "truncate" => (ref, TruncateTransform(intArg): Transform, s"${ref}_trunc")
        case "years" | "year" => (ref, YearTransform: Transform, s"${ref}_year")
        case "months" | "month" => (ref, MonthTransform: Transform, s"${ref}_month")
        case "days" | "day" => (ref, DayTransform: Transform, s"${ref}_day")
        case "hours" | "hour" => (ref, HourTransform: Transform, s"${ref}_hour")
        case other => throw new UnsupportedOperationException(
          s"Partition transform not supported: $other")
      }
    }
    PartitionSpec.build(schema, 0, fields: _*)
  }
}
