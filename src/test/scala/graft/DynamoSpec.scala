package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.core._
import graft.meta._

/** DynamoDB-shaped catalog over the injectable client seam (ref:
  * catalog/dynamodb.py). The fake implements the service's exact
  * conditional-put semantics, so entity lifecycle and the commit CAS
  * (our extension — the reference leaves commit_table unimplemented)
  * are exercised for real. */
class DynamoSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warehouse: String = Files.createTempDirectory("graft-ddbwh").toString
  lazy val api = new InMemoryDynamoApi
  lazy val catalog = new DynamoCatalog(warehouse, spark, api)

  override def afterAll(): Unit = spark.stop()

  def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("create + append + scan round-trips; item carries the reference's shape") {
    catalog.createNamespace("db1")
    val t = catalog.createTable("db1.t_ddb", Schema.fromSpark(orders.schema),
      properties = Map("owner" -> "graft"))
    t.append(orders.limit(500))
    assert(catalog.loadTable("db1.t_ddb").scan.toDF.count() === 500)
    assert(catalog.currentVersion("db1.t_ddb") === Some(2))

    val item = api.getItem("db1.t_ddb", "db1").get
    assert(item("p.table_type") === "ICEBERG")
    assert(item("p.metadata_location").endsWith(".metadata.json"))
    assert(item.contains("p.previous_metadata_location"))
    assert(item("p.owner") === "graft")
    assert(item.contains("created_at") && item.contains("updated_at") && item.contains("v"))
  }

  test("commit CAS via conditional put: stale pointer loses, winner survives") {
    val t0 = catalog.createTable("t_ddb_race", Schema.fromSpark(orders.schema))
    t0.append(orders.limit(100))
    val v = catalog.currentVersion("t_ddb_race").get
    catalog.commit("t_ddb_race", v, t0.metadata.copy(properties = Map("writer" -> "A")))
    intercept[CommitConflictException] {
      catalog.commit("t_ddb_race", v, t0.metadata.copy(properties = Map("writer" -> "B")))
    }
    assert(catalog.loadTable("t_ddb_race").metadata.properties("writer") === "A")
  }

  test("concurrent appends: loser retries through the commit loop, no lost update") {
    val t0 = catalog.createTable("t_ddb_retry", Schema.fromSpark(orders.schema))
    t0.append(orders.filter(col("o_orderkey") <= 5000))
    val a = catalog.loadTable("t_ddb_retry")
    val b = catalog.loadTable("t_ddb_retry")
    b.append(orders.filter(col("o_orderkey") > 10000))
    a.append(orders.filter(col("o_orderkey") > 5000 && col("o_orderkey") <= 10000))
    val after = catalog.loadTable("t_ddb_retry")
    assert(after.metadata.snapshots.size === 3)
    assert(after.scan.toDF.count() === orders.count())
  }

  test("create-if-absent: double create of table and namespace fail typed") {
    catalog.createTable("t_ddb_dup", Schema.fromSpark(orders.schema))
    intercept[IllegalArgumentException](
      catalog.createTable("t_ddb_dup", Schema.fromSpark(orders.schema)))
    catalog.createNamespace("nsd")
    intercept[IllegalArgumentException](catalog.createNamespace("nsd"))
  }

  test("non-iceberg items are rejected with the reference's error") {
    api.putItem(Map("identifier" -> "ext.h", "namespace" -> "ext",
      "v" -> "1", "created_at" -> "0", "updated_at" -> "0",
      "p.table_type" -> "HIVE", "p.metadata_location" -> "/x"),
      AttributeNotExists("identifier"))
    val e = intercept[IllegalArgumentException](catalog.loadTable("ext.h"))
    assert(e.getMessage.contains("expected ICEBERG"))
  }

  test("namespaces, properties, listTables, rename, drop") {
    catalog.createNamespace("nsp2")
    assert(catalog.listNamespaces().contains("nsp2"))
    catalog.updateNamespaceProperties("nsp2", Map("owner" -> "t"))
    assert(catalog.loadNamespaceProperties("nsp2")("owner") === "t")
    catalog.createTable("nsp2.x", Schema.fromSpark(orders.schema))
    assert(catalog.listTables("nsp2") === Seq("nsp2.x"))
    intercept[IllegalStateException](catalog.dropNamespace("nsp2"))

    val pointer = api.getItem("nsp2.x", "nsp2").get("p.metadata_location")
    catalog.renameTable("nsp2.x", "nsp2.y")
    assert(!catalog.tableExists("nsp2.x"))
    assert(api.getItem("nsp2.y", "nsp2").get("p.metadata_location") === pointer)
    catalog.dropTable("nsp2.y")
    catalog.dropNamespace("nsp2")
    assert(!catalog.listNamespaces().contains("nsp2"))
    intercept[UnsupportedOperationException](
      catalog.createView("v1", Schema(Seq(NestedField(1, "x", IInt)), 0), "SELECT 1"))
  }
}
