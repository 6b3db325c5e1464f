package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.core._
import graft.meta._

/** Glue-shaped catalog over the injectable client seam (ref:
  * catalog/glue.py). The in-memory fake implements the real service
  * contract — entity CRUD, typed exceptions, VersionId optimistic
  * locking — so commit-retry, pointer mapping, and the record shapes the
  * reference constructs (TableInput Parameters / StorageDescriptor
  * columns) are all exercised, the same pattern the REST loopback uses
  * for the network-free build. */
class GlueSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warehouse: String = Files.createTempDirectory("graft-gluewh").toString
  lazy val api = new InMemoryGlueApi
  lazy val catalog = new GlueCatalog(warehouse, spark, api)

  override def afterAll(): Unit = spark.stop()

  def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("create + append + scan round-trips; record carries the Glue shape") {
    catalog.createNamespace("db1")
    val t = catalog.createTable("db1.t_glue", Schema.fromSpark(orders.schema),
      properties = Map("owner" -> "graft"))
    t.append(orders)
    assert(catalog.loadTable("db1.t_glue").scan.toDF.count() === orders.count())
    assert(catalog.currentVersion("db1.t_glue") === Some(2))

    // the stored record has the reference's exact parameter/column shape
    // (glue.py:145 _construct_parameters, :204 _to_columns)
    val rec = api.getTable("db1", "t_glue")
    assert(rec.tableType === "EXTERNAL_TABLE")
    assert(rec.parameters("table_type") === "ICEBERG")
    assert(rec.parameters(GlueCatalog.MetadataLocationKey).endsWith(".metadata.json"))
    assert(rec.parameters.contains(GlueCatalog.PrevMetadataLocationKey))
    assert(rec.parameters("owner") === "graft")
    assert(rec.storageDescriptor.location === t.location)
    val keyCol = rec.storageDescriptor.columns.find(_.name == "o_orderkey").get
    assert(keyCol.colType === "bigint")
    assert(keyCol.parameters("iceberg.field.id") === "1")
    assert(keyCol.parameters("iceberg.field.current") === "true")
  }

  test("glue type strings cover nested and decimal shapes") {
    import GlueCatalog.glueType
    assert(glueType(IDecimal(12, 2)) === "decimal(12,2)")
    assert(glueType(IList(3, IString, elementRequired = false)) === "array<string>")
    assert(glueType(IStruct(Seq(
      NestedField(1, "a", IInt), NestedField(2, "b", IList(4, IDouble, false)))))
      === "struct<a:int,b:array<double>>")
    assert(glueType(IMap(5, IString, 6, ILong, false)) === "map<string,bigint>")
    assert(glueType(ITimestampNs) === "timestamp_ns") // str(type) fallback
  }

  test("optimistic locking: stale VersionId loses, winner survives") {
    val t0 = catalog.createTable("t_glue_race", Schema.fromSpark(orders.schema))
    t0.append(orders.limit(100))
    val v = catalog.currentVersion("t_glue_race").get
    catalog.commit("t_glue_race", v, t0.metadata.copy(properties = Map("writer" -> "A")))
    intercept[CommitConflictException] {
      catalog.commit("t_glue_race", v, t0.metadata.copy(properties = Map("writer" -> "B")))
    }
    assert(catalog.loadTable("t_glue_race").metadata.properties("writer") === "A")
  }

  test("concurrent appends: loser retries through the commit loop, no lost update") {
    val t0 = catalog.createTable("t_glue_retry", Schema.fromSpark(orders.schema))
    t0.append(orders.filter(col("o_orderkey") <= 5000))
    val a = catalog.loadTable("t_glue_retry")
    val b = catalog.loadTable("t_glue_retry")
    b.append(orders.filter(col("o_orderkey") > 10000))
    a.append(orders.filter(col("o_orderkey") > 5000 && col("o_orderkey") <= 10000))
    val after = catalog.loadTable("t_glue_retry")
    assert(after.metadata.snapshots.size === 3, "all three snapshots must survive")
    assert(after.scan.toDF.count() === orders.count())
  }

  test("MoR deletes and upsert work over the Glue catalog") {
    val t = catalog.createTable("t_glue_mor", Schema.fromSpark(orders.schema))
    t.append(orders.limit(1000))
    t.deletePositional("o_orderkey <= 250")
    val rel = catalog.loadTable("t_glue_mor")
    assert(rel.scan.toDF.count() ===
      orders.limit(1000).filter(col("o_orderkey") > 250).count())
  }

  test("non-iceberg and pointer-less records are rejected with the reference's errors") {
    api.createDatabase(GlueDatabaseInput("ext"))
    api.createTable("ext", GlueTableInput("hive_t", "EXTERNAL_TABLE",
      Map("table_type" -> "HIVE"), GlueStorageDescriptor(Nil, "/x")))
    val e1 = intercept[IllegalArgumentException](catalog.loadTable("ext.hive_t"))
    assert(e1.getMessage.contains("expected ICEBERG"))
    api.createTable("ext", GlueTableInput("broken_t", "EXTERNAL_TABLE",
      Map("table_type" -> "ICEBERG"), GlueStorageDescriptor(Nil, "/x")))
    val e2 = intercept[IllegalArgumentException](catalog.loadTable("ext.broken_t"))
    assert(e2.getMessage.contains("metadata_location"))
  }

  test("namespaces map to databases; properties live on the record") {
    catalog.createNamespace("nsp")
    intercept[IllegalArgumentException](catalog.createNamespace("nsp"))
    assert(catalog.listNamespaces().contains("nsp"))
    catalog.updateNamespaceProperties("nsp", Map("owner" -> "team-x"))
    assert(catalog.loadNamespaceProperties("nsp")("owner") === "team-x")
    catalog.updateNamespaceProperties("nsp", Map.empty, removals = Set("owner"))
    assert(!catalog.loadNamespaceProperties("nsp").contains("owner"))
    // non-empty database refuses to drop
    catalog.createTable("nsp.keep", Schema.fromSpark(orders.schema))
    intercept[IllegalStateException](catalog.dropNamespace("nsp"))
    catalog.dropTable("nsp.keep")
    catalog.dropNamespace("nsp")
    assert(!catalog.listNamespaces().contains("nsp"))
  }

  test("rename is copy-then-delete keeping the same metadata pointer") {
    val t = catalog.createTable("t_glue_ren", Schema.fromSpark(orders.schema))
    t.append(orders.limit(50))
    val pointerBefore =
      api.getTable("default", "t_glue_ren").parameters(GlueCatalog.MetadataLocationKey)
    catalog.renameTable("t_glue_ren", "t_glue_ren2")
    assert(!catalog.tableExists("t_glue_ren"))
    val rec = api.getTable("default", "t_glue_ren2")
    assert(rec.parameters(GlueCatalog.MetadataLocationKey) === pointerBefore)
    assert(catalog.loadTable("t_glue_ren2").scan.toDF.count() === 50)
  }

  test("drop removes the record; listTables scopes by database") {
    catalog.createNamespace("db2")
    catalog.createTable("db2.a", Schema.fromSpark(orders.schema))
    catalog.createTable("db2.b", Schema.fromSpark(orders.schema))
    assert(catalog.listTables("db2").toSet === Set("db2.a", "db2.b"))
    catalog.dropTable("db2.a")
    assert(catalog.listTables("db2") === Seq("db2.b"))
    intercept[IllegalArgumentException](catalog.dropTable("db2.a"))
  }

  test("views are rejected the way the reference rejects them") {
    intercept[UnsupportedOperationException] {
      catalog.createView("v1", Schema(Seq(NestedField(1, "x", IInt)), 0), "SELECT 1")
    }
    assert(catalog.listViews() === Nil)
  }
}
