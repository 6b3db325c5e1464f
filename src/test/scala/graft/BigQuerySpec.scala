package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.core._
import graft.meta._

/** BigQuery-metastore-shaped catalog over the injectable client seam
  * (ref: catalog/bigquery_metastore.py). The in-memory fake implements
  * the service contract — dataset/table CRUD, Conflict/NotFound shapes,
  * etag preconditions — so pointer mapping, the hive-shaped
  * ExternalCatalogTableOptions envelope, and both commit modes (the
  * reference's create-only parity and the etag-CAS extension) are
  * exercised. */
class BigQuerySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warehouse: String = Files.createTempDirectory("graft-bqwh").toString
  lazy val api = new InMemoryBqApi
  lazy val catalog = new BigQueryCatalog(warehouse, spark, api)

  override def afterAll(): Unit = spark.stop()

  def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("create + append + scan round-trips; record carries the BQ shape") {
    catalog.createNamespace("ds1")
    val t = catalog.createTable("ds1.t_bq", Schema.fromSpark(orders.schema))
    t.append(orders.limit(400))
    assert(catalog.loadTable("ds1.t_bq").scan.toDF.count() === 400)

    val rec = api.getTable("ds1", "t_bq")
    val p = rec.options.parameters
    assert(p("table_type") === "iceberg")
    assert(p("EXTERNAL") === "true")
    assert(p("metadata_location").endsWith(".metadata.json"))
    assert(p.contains("uuid"))
    // hive-style basic statistics from the snapshot summary (ref :421)
    assert(p("numRows") === "400")
    assert(p.contains("numFiles") && p.contains("totalSize"))
    // dataset default storage root is <warehouse>/<db>.db (ref :444)
    assert(api.getDataset("ds1").options.get.defaultStorageLocationUri
      === s"$warehouse/ds1.db")
    assert(rec.options.storageDescriptor.serdeLib
      === "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe")
  }

  test("etag CAS: stale etag loses, winner survives") {
    val t0 = catalog.createTable("t_bq_race", Schema.fromSpark(orders.schema))
    t0.append(orders.limit(100))
    val v = catalog.currentVersion("t_bq_race").get
    catalog.commit("t_bq_race", v, t0.metadata.copy(properties = Map("writer" -> "A")))
    intercept[CommitConflictException] {
      catalog.commit("t_bq_race", v, t0.metadata.copy(properties = Map("writer" -> "B")))
    }
    assert(catalog.loadTable("t_bq_race").metadata.properties("writer") === "A")
  }

  test("concurrent appends: loser retries through the commit loop, no lost update") {
    val t0 = catalog.createTable("t_bq_retry", Schema.fromSpark(orders.schema))
    t0.append(orders.filter(col("o_orderkey") <= 5000))
    val a = catalog.loadTable("t_bq_retry")
    val b = catalog.loadTable("t_bq_retry")
    b.append(orders.filter(col("o_orderkey") > 10000))
    a.append(orders.filter(col("o_orderkey") > 5000 && col("o_orderkey") <= 10000))
    val after = catalog.loadTable("t_bq_retry")
    assert(after.metadata.snapshots.size === 3)
    assert(after.scan.toDF.count() === orders.count())
  }

  test("parity mode matches the reference: commits beyond create raise") {
    val cat = new BigQueryCatalog(warehouse, spark, api, parityCommits = true)
    val t = cat.createTable("t_bq_parity", Schema.fromSpark(orders.schema))
    val e = intercept[UnsupportedOperationException](t.append(orders.limit(10)))
    assert(e.getMessage.contains("not implemented"))
    // rename raises in BOTH modes (ref bigquery_metastore.py:240)
    intercept[UnsupportedOperationException](
      catalog.renameTable("t_bq_parity", "t_bq_parity2"))
  }

  test("non-iceberg and pointer-less records are rejected") {
    api.createDataset(BqDataset("ext", None))
    api.createTable(BqTableRecord("ext", "plain_t",
      BqExternalTableOptions(BqStorageDescriptor("/x"), Map("table_type" -> "HIVE")), ""))
    intercept[IllegalArgumentException](catalog.loadTable("ext.plain_t"))
    api.createTable(BqTableRecord("ext", "broken_t",
      BqExternalTableOptions(BqStorageDescriptor("/x"), Map("table_type" -> "iceberg")), ""))
    val e = intercept[IllegalArgumentException](catalog.loadTable("ext.broken_t"))
    assert(e.getMessage.contains("metadata_location"))
  }

  test("namespaces: dataset options carry properties; drop guards non-empty") {
    catalog.createNamespace("ns_bq")
    catalog.updateNamespaceProperties("ns_bq", Map("k" -> "v"))
    val props = catalog.loadNamespaceProperties("ns_bq")
    assert(props("k") === "v")
    assert(props("default_storage_location_uri") === s"$warehouse/ns_bq.db")
    intercept[IllegalArgumentException](catalog.createNamespace("ns_bq"))
    catalog.createTable("ns_bq.t", Schema.fromSpark(orders.schema))
    intercept[IllegalStateException](catalog.dropNamespace("ns_bq"))
    assert(catalog.listTables("ns_bq") === Seq("ns_bq.t"))
    assert(catalog.listNamespaces().contains("ns_bq"))
  }

  test("drop removes the record; factory constructs by type") {
    val t = catalog.createTable("t_bq_drop", Schema.fromSpark(orders.schema))
    t.append(orders.limit(10))
    catalog.dropTable("t_bq_drop")
    assert(!catalog.tableExists("t_bq_drop"))
    val c = CatalogFactory.loadCatalog("bqcat", spark,
      Map("type" -> "bigquery", "warehouse" -> Files.createTempDirectory("fbq").toString))
    assert(c.isInstanceOf[BigQueryCatalog])
  }

  test("views are rejected the way the reference rejects them") {
    intercept[UnsupportedOperationException] {
      catalog.createView("v1", Schema(Seq(NestedField(1, "x", IInt))), "SELECT 1")
    }
  }
}
