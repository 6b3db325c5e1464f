package graft.catalog

import java.sql.{Connection, DriverManager, SQLException}
import java.util.UUID

import graft.core.Schema
import graft.meta._
import graft.table.IceTable
import org.apache.spark.sql.SparkSession

/** JDBC-backed catalog (ref: pyiceberg/catalog/sql.py — the reference's
  * default shared catalog).
  *
  * Layout mirrors the reference exactly: an `iceberg_tables` row per table
  * holding the current `metadata_location`; metadata JSON lives as files
  * under each table's own location. Commits are optimistic compare-and-swap
  * in SQL — `UPDATE … SET metadata_location = new WHERE metadata_location
  * = old` (ref sql.py:500–516): the row-count tells the loser it lost, no
  * table locks, any ACID JDBC backend works (tested on embedded Derby;
  * the SQL is deliberately vanilla so server-backed databases give true
  * multi-process metastore semantics).
  *
  * Metadata files are named `v<N>-<uuid>.metadata.json` — BOTH racers at
  * version N may write a candidate file; only the SQL swap picks the
  * winner, so file creation can never collide or clobber.
  */
class SqlCatalog(
    val jdbcUrl: String,
    val warehouse: String,
    val spark: SparkSession,
    val catalogName: String = "graft") extends Catalog {

  // Derby writes its log relative to CWD unless told otherwise; keep test
  // droppings out of the repo. Harmless for non-Derby URLs.
  if (System.getProperty("derby.stream.error.file") == null)
    System.setProperty("derby.stream.error.file",
      s"${System.getProperty("java.io.tmpdir")}/derby.log")

  // metadata IO must see spark.hadoop.* (custom schemes, s3a credentials);
  // scheme-registered so other-scheme catalogs stay isolated (ADVICE r5)
  Io.register(warehouse, () => spark.sessionState.newHadoopConf())
  Io.confFactory = () => spark.sessionState.newHadoopConf()

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(jdbcUrl)
    try f(c) finally c.close()
  }

  /** ref sql.py:93 IcebergTables / :104 IcebergNamespaceProperties. */
  private def ensureTables(): Unit = withConn { c =>
    // "already exists" SQLStates differ per backend (Derby X0Y32, Postgres
    // 42P07, MySQL 42S01, SQLite none) — probe instead of matching states:
    // skip the DDL when the table answers a query, and after a failed
    // CREATE re-probe (a concurrent creator racing us is success too)
    def probe(table: String): Boolean = {
      val st = c.createStatement()
      try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1 = 0").close(); true }
      catch { case _: SQLException => false }
      finally st.close()
    }
    def createQuietly(table: String, ddl: String): Unit = {
      if (probe(table)) return
      val st = c.createStatement()
      try st.executeUpdate(ddl)
      catch { case e: SQLException => if (!probe(table)) throw e }
      finally st.close()
    }
    createQuietly("iceberg_tables",
      """CREATE TABLE iceberg_tables (
        |  catalog_name VARCHAR(255) NOT NULL,
        |  table_namespace VARCHAR(255) NOT NULL,
        |  table_name VARCHAR(255) NOT NULL,
        |  metadata_location VARCHAR(1000),
        |  previous_metadata_location VARCHAR(1000),
        |  iceberg_type VARCHAR(16),
        |  PRIMARY KEY (catalog_name, table_namespace, table_name)
        |)""".stripMargin)
    // migrate a pre-view metastore in place (ref sql.py:144 — "new
    // catalogs always get v1 schema with view support"; here the older
    // layout is upgraded instead of degrading to tables-only). NULL
    // iceberg_type stays readable as TABLE everywhere below.
    def hasColumn(table: String, col: String): Boolean = {
      val st = c.createStatement()
      try { st.executeQuery(s"SELECT $col FROM $table WHERE 1 = 0").close(); true }
      catch { case _: SQLException => false }
      finally st.close()
    }
    if (!hasColumn("iceberg_tables", "iceberg_type")) {
      val st = c.createStatement()
      try st.executeUpdate("ALTER TABLE iceberg_tables ADD COLUMN iceberg_type VARCHAR(16)")
      catch { case e: SQLException =>
        if (!hasColumn("iceberg_tables", "iceberg_type")) throw e }
      finally st.close()
    }
    createQuietly("iceberg_namespace_properties",
      """CREATE TABLE iceberg_namespace_properties (
        |  catalog_name VARCHAR(255) NOT NULL,
        |  namespace VARCHAR(255) NOT NULL,
        |  property_key VARCHAR(255) NOT NULL,
        |  property_value VARCHAR(1000),
        |  PRIMARY KEY (catalog_name, namespace, property_key)
        |)""".stripMargin)
  }
  ensureTables()

  private def split(name: String): (String, String) = {
    val i = name.lastIndexOf('.')
    if (i < 0) ("", name) else (name.substring(0, i), name.substring(i + 1))
  }
  private def tableDir(name: String) = s"$warehouse/${name.replace('.', '/')}"

  private val VersionRe = """.*/v(\d+)-[^/]*\.metadata\.json""".r

  private def versionOf(location: String): Int = location match {
    case VersionRe(v) => v.toInt
    case _ => throw new IllegalStateException(s"Unparseable metadata location $location")
  }

  /** ref sql.py:659 — NULL iceberg_type predates views and means TABLE. */
  private def locationOf(name: String, viewKind: Boolean): Option[String] = withConn { c =>
    val (ns, tbl) = split(name)
    val typeCond =
      if (viewKind) "iceberg_type = 'VIEW'"
      else "(iceberg_type = 'TABLE' OR iceberg_type IS NULL)"
    val ps = c.prepareStatement(
      "SELECT metadata_location FROM iceberg_tables " +
        s"WHERE catalog_name = ? AND table_namespace = ? AND table_name = ? AND $typeCond")
    try {
      ps.setString(1, catalogName); ps.setString(2, ns); ps.setString(3, tbl)
      val rs = ps.executeQuery()
      if (rs.next()) Option(rs.getString(1)) else None
    } finally ps.close()
  }

  private def currentLocation(name: String): Option[String] =
    locationOf(name, viewKind = false)

  def tableExists(name: String): Boolean = currentLocation(name).isDefined
  def currentVersion(name: String): Option[Int] = currentLocation(name).map(versionOf)

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
    val loc = currentLocation(name).getOrElse(
      throw new IllegalArgumentException(s"Table $name not found"))
    // uuid-named metadata files are immutable: parse is path-cache-served
    new IceTable(this, name, MetadataCache.read(loc), versionOf(loc))
  }

  /** Write the candidate metadata file, then CAS the catalog row
    * (ref: commit_table sql.py:459 — UPDATE guarded by the OLD
    * metadata_location; rowcount < 1 means a concurrent winner). */
  def commit(name: String, expectedVersion: Int, meta: TableMetadata): Int = {
    val (ns, tbl) = split(name)
    val next = expectedVersion + 1
    val metaDir = s"${meta.location}/metadata"
    val newLoc = s"$metaDir/v$next-${UUID.randomUUID()}.metadata.json"
    Io.writeBytes(newLoc, MetadataJson.toJson(meta).getBytes("UTF-8"))

    val won: Boolean =
      if (expectedVersion == 0) withConn { c =>
        val ps = c.prepareStatement(
          "INSERT INTO iceberg_tables (catalog_name, table_namespace, table_name, " +
            "metadata_location, previous_metadata_location, iceberg_type) " +
            "VALUES (?, ?, ?, ?, NULL, 'TABLE')")
        try {
          ps.setString(1, catalogName); ps.setString(2, ns); ps.setString(3, tbl)
          ps.setString(4, newLoc)
          try { ps.executeUpdate(); true }
          catch { case e: SQLException if isDuplicateKey(e) => false }
        } finally ps.close()
      } else {
        val oldLoc = currentLocation(name).getOrElse {
          Io.delete(newLoc) // concurrent drop: don't leave the candidate
          throw new CommitConflictException(name, next)
        }
        if (versionOf(oldLoc) != expectedVersion) {
          Io.delete(newLoc)
          throw new CommitConflictException(name, next)
        }
        withConn { c =>
          val ps = c.prepareStatement(
            "UPDATE iceberg_tables SET metadata_location = ?, previous_metadata_location = ? " +
              "WHERE catalog_name = ? AND table_namespace = ? AND table_name = ? " +
              "AND metadata_location = ?")
          try {
            ps.setString(1, newLoc); ps.setString(2, oldLoc)
            ps.setString(3, catalogName); ps.setString(4, ns); ps.setString(5, tbl)
            ps.setString(6, oldLoc)
            ps.executeUpdate() == 1
          } finally ps.close()
        }
      }
    if (!won) {
      Io.delete(newLoc) // orphaned candidate
      throw new CommitConflictException(name, next)
    }
    next
  }

  private def isDuplicateKey(e: SQLException): Boolean =
    e.getSQLState != null && e.getSQLState.startsWith("23") // integrity violation

  def dropTable(name: String): Unit = {
    forgetTable(name)
    if (Io.exists(tableDir(name))) Io.delete(tableDir(name), recursive = true)
  }

  protected def forgetTable(name: String): Unit = forgetEntry(name, viewKind = false)

  private def forgetEntry(name: String, viewKind: Boolean): Unit = withConn { c =>
    val (ns, tbl) = split(name)
    val typeCond =
      if (viewKind) "iceberg_type = 'VIEW'"
      else "(iceberg_type = 'TABLE' OR iceberg_type IS NULL)"
    val ps = c.prepareStatement(
      "DELETE FROM iceberg_tables " +
        s"WHERE catalog_name = ? AND table_namespace = ? AND table_name = ? AND $typeCond")
    try {
      ps.setString(1, catalogName); ps.setString(2, ns); ps.setString(3, tbl)
      ps.executeUpdate()
    } finally ps.close()
  }

  /** ref sql.py:582 — a namespace exists when it has a marker row. */
  def createNamespace(ns: String): Unit = withConn { c =>
    val ps = c.prepareStatement(
      "INSERT INTO iceberg_namespace_properties " +
        "(catalog_name, namespace, property_key, property_value) VALUES (?, ?, ?, ?)")
    try {
      ps.setString(1, catalogName); ps.setString(2, ns)
      ps.setString(3, "exists"); ps.setString(4, "true")
      try ps.executeUpdate()
      catch { case e: SQLException if isDuplicateKey(e) => () }
    } finally ps.close()
  }

  def dropNamespace(ns: String): Unit = {
    require(listTables(ns).isEmpty, s"Namespace $ns is not empty")
    withConn { c =>
      val ps = c.prepareStatement(
        "DELETE FROM iceberg_namespace_properties WHERE catalog_name = ? AND namespace = ?")
      try { ps.setString(1, catalogName); ps.setString(2, ns); ps.executeUpdate() }
      finally ps.close()
    }
  }

  def listNamespaces(): Seq[String] = withConn { c =>
    val ps = c.prepareStatement(
      "SELECT namespace FROM iceberg_namespace_properties WHERE catalog_name = ? " +
        "UNION SELECT table_namespace FROM iceberg_tables " +
        "WHERE catalog_name = ? AND table_namespace <> ''")
    try {
      ps.setString(1, catalogName); ps.setString(2, catalogName)
      val rs = ps.executeQuery()
      val b = Seq.newBuilder[String]
      while (rs.next()) b += rs.getString(1)
      b.result().sorted
    } finally ps.close()
  }

  def listTables(ns: String = ""): Seq[String] = listEntries(ns, viewKind = false)

  private def listEntries(ns: String, viewKind: Boolean): Seq[String] = withConn { c =>
    val typeCond =
      if (viewKind) "iceberg_type = 'VIEW'"
      else "(iceberg_type = 'TABLE' OR iceberg_type IS NULL)"
    val ps = c.prepareStatement(
      "SELECT table_name FROM iceberg_tables " +
        s"WHERE catalog_name = ? AND table_namespace = ? AND $typeCond ORDER BY table_name")
    try {
      ps.setString(1, catalogName); ps.setString(2, ns)
      val rs = ps.executeQuery()
      val b = Seq.newBuilder[String]
      while (rs.next()) b += (if (ns.isEmpty) rs.getString(1) else s"$ns.${rs.getString(1)}")
      b.result()
    } finally ps.close()
  }

  // ---- views: rows in iceberg_tables with iceberg_type = 'VIEW' (the
  // reference's v1 sql layout, sql.py:144, :659); metadata JSON files live
  // under the view's own location, commits CAS on metadata_location ------

  protected def viewLocation(name: String): Option[String] =
    locationOf(name, viewKind = true)

  protected def storeView(name: String, version: Int, expected: Option[String],
      json: String, location: String): String = {
    val (ns, tbl) = split(name)
    val newLoc = s"$location/metadata/v$version-${UUID.randomUUID()}.view-metadata.json"
    Io.writeBytes(newLoc, json.getBytes("UTF-8"))
    val won: Boolean = expected match {
      case None => withConn { c =>
        val ps = c.prepareStatement(
          "INSERT INTO iceberg_tables (catalog_name, table_namespace, table_name, " +
            "metadata_location, previous_metadata_location, iceberg_type) " +
            "VALUES (?, ?, ?, ?, NULL, 'VIEW')")
        try {
          ps.setString(1, catalogName); ps.setString(2, ns); ps.setString(3, tbl)
          ps.setString(4, newLoc)
          try { ps.executeUpdate(); true }
          catch { case e: SQLException if isDuplicateKey(e) => false }
        } finally ps.close()
      }
      case Some(oldLoc) => withConn { c =>
        val ps = c.prepareStatement(
          "UPDATE iceberg_tables SET metadata_location = ?, previous_metadata_location = ? " +
            "WHERE catalog_name = ? AND table_namespace = ? AND table_name = ? " +
            "AND metadata_location = ? AND iceberg_type = 'VIEW'")
        try {
          ps.setString(1, newLoc); ps.setString(2, oldLoc)
          ps.setString(3, catalogName); ps.setString(4, ns); ps.setString(5, tbl)
          ps.setString(6, oldLoc)
          ps.executeUpdate() == 1
        } finally ps.close()
      }
    }
    if (!won) {
      Io.delete(newLoc)
      throw new CommitConflictException(name, version)
    }
    newLoc
  }

  protected def linkView(name: String, metadataLocation: String): Unit = withConn { c =>
    val (ns, tbl) = split(name)
    val ps = c.prepareStatement(
      "INSERT INTO iceberg_tables (catalog_name, table_namespace, table_name, " +
        "metadata_location, previous_metadata_location, iceberg_type) " +
        "VALUES (?, ?, ?, ?, NULL, 'VIEW')")
    try {
      ps.setString(1, catalogName); ps.setString(2, ns); ps.setString(3, tbl)
      ps.setString(4, metadataLocation)
      ps.executeUpdate()
    } finally ps.close()
  }

  protected def forgetView(name: String): Unit = forgetEntry(name, viewKind = true)

  def listViews(ns: String = ""): Seq[String] = listEntries(ns, viewKind = true)
}
