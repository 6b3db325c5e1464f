package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{HadoopCatalog, MemoryCatalog, SqlCatalog}
import graft.core.Schema
import graft.view.ViewMetadataJson

/** Iceberg views: spec-correct view-metadata.json, catalog CRUD on all
  * three backends, version evolution, and Spark-native execution. */
class ViewSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warehouse: String = Files.createTempDirectory("view-wh").toString
  lazy val catalog = new HadoopCatalog(warehouse, spark)

  override def afterAll(): Unit = spark.stop()

  def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("create + load round-trips spec metadata") {
    val schema = Schema.fromSpark(orders.select("o_orderkey", "o_totalprice").schema)
    val v = catalog.createView("db.big_orders", schema,
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000",
      properties = Map("comment" -> "expensive orders"))
    assert(catalog.viewExists("db.big_orders"))
    val loaded = catalog.loadView("db.big_orders")
    assert(loaded.uuid === v.uuid)
    assert(loaded.schema.fields.map(_.name) === Seq("o_orderkey", "o_totalprice"))
    assert(loaded.currentVersion.versionId === 1)
    assert(loaded.currentVersion.defaultNamespace === Seq("db"))
    assert(loaded.sqlFor("spark").map(_.sql).exists(_.contains("o_totalprice > 100000")))
    assert(loaded.sqlFor("trino").isEmpty)
    assert(loaded.history.map(_.versionId) === Seq(1))
    assert(loaded.properties("comment") === "expensive orders")
    // the metadata file itself carries the spec field names
    val json = new String(graft.meta.Io.readBytes(loaded.metadataLocation), "UTF-8")
    assert(json.contains("\"view-uuid\"") && json.contains("\"current-version-id\"")
      && json.contains("\"version-log\"") && json.contains("\"dialect\""))
  }

  test("metadata JSON round-trips exactly") {
    val m = catalog.loadView("db.big_orders").metadata
    assert(ViewMetadataJson.fromJson(ViewMetadataJson.toJson(m)) === m)
  }

  test("replace appends an immutable version and bumps current") {
    val schema2 = Schema.fromSpark(orders.select("o_orderkey").schema)
    catalog.replaceView("db.big_orders", schema2,
      "SELECT o_orderkey FROM orders WHERE o_totalprice > 200000")
    val v = catalog.loadView("db.big_orders")
    assert(v.currentVersion.versionId === 2)
    assert(v.versions.map(_.versionId) === Seq(1, 2))
    assert(v.history.map(_.versionId) === Seq(1, 2))
    // version 1 and its schema remain readable
    assert(v.version(1).exists(_.representations.head.sql.contains("100000")))
    assert(v.schemas.keySet === Set(0, 1))
    assert(v.schema.fields.map(_.name) === Seq("o_orderkey"))
    assert(v.currentVersion.summary("operation") === "replace")
  }

  test("toDataFrame executes the spark representation over a graft table") {
    spark.conf.set("spark.sql.catalog.vcat", "graft.spark.GraftCatalog")
    spark.conf.set("spark.sql.catalog.vcat.warehouse", warehouse)
    val t = catalog.createTable("db.orders_v", Schema.fromSpark(orders.schema))
    t.append(orders)
    val schema = Schema.fromSpark(orders.select("o_orderstatus").schema)
    catalog.createView("db.status_counts", schema,
      """SELECT o_orderstatus, count(*) AS cnt FROM vcat.db.orders_v
        |GROUP BY o_orderstatus""".stripMargin)
    val df = catalog.loadView("db.status_counts").toDataFrame(spark)
    val want = orders.groupBy("o_orderstatus").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === want)
  }

  test("tables and views are disjoint namespaces") {
    // a view cannot shadow a table, nor a table a view
    val s = Schema.fromSpark(orders.select("o_orderkey").schema)
    intercept[IllegalArgumentException] {
      catalog.createView("db.orders_v", s, "SELECT 1")
    }
    assert(catalog.listTables("db").contains("db.orders_v"))
    assert(!catalog.listTables("db").contains("db.big_orders"))
    assert(catalog.listViews("db").sorted === Seq("db.big_orders", "db.status_counts"))
    // namespaces listing skips view dirs
    assert(!catalog.listNamespaces().contains("db/big_orders"))
  }

  test("register adopts an existing metadata file; drop removes the entry") {
    val loc = catalog.loadView("db.big_orders").metadataLocation
    val v = catalog.registerView("db.big_orders_copy", loc)
    assert(v.schema.fields.map(_.name) === Seq("o_orderkey"))
    catalog.dropView("db.big_orders_copy")
    assert(!catalog.viewExists("db.big_orders_copy"))
    // the original is untouched
    assert(catalog.viewExists("db.big_orders"))
    intercept[IllegalArgumentException] { catalog.dropView("db.big_orders_copy") }
  }

  test("SqlCatalog stores views as typed rows next to tables") {
    val dbDir = Files.createTempDirectory("view-jdbc").toString
    val wh2 = Files.createTempDirectory("view-wh2").toString
    val sql = new SqlCatalog(s"jdbc:derby:$dbDir/meta;create=true", wh2, spark)
    val schema = Schema.fromSpark(orders.select("o_orderkey").schema)
    sql.createTable("db.t", schema)
    sql.createView("db.v", schema, "SELECT o_orderkey FROM orders")
    assert(sql.listTables("db") === Seq("db.t"))
    assert(sql.listViews("db") === Seq("db.v"))
    assert(sql.loadView("db.v").sqlFor("spark").isDefined)
    // a second catalog instance on the same metastore sees the view
    val sql2 = new SqlCatalog(s"jdbc:derby:$dbDir/meta", wh2, spark)
    assert(sql2.viewExists("db.v"))
    sql2.replaceView("db.v", schema, "SELECT o_orderkey + 1 FROM orders")
    assert(sql.loadView("db.v").currentVersion.versionId === 2)
    sql.dropView("db.v")
    assert(!sql2.viewExists("db.v"))
    assert(sql2.tableExists("db.t")) // dropping the view never touches the table
  }

  test("MemoryCatalog supports the same view surface") {
    val mem = new MemoryCatalog(Files.createTempDirectory("view-mem").toString, spark)
    val schema = Schema.fromSpark(orders.select("o_orderkey").schema)
    mem.createView("mv", schema, "SELECT 1 AS one", dialect = "trino")
    assert(mem.listViews() === Seq("mv"))
    val v = mem.loadView("mv")
    assert(v.sqlFor("SPARK").isEmpty && v.sqlFor("Trino").isDefined)
    // sole non-spark representation still executes via the fallback
    assert(v.toDataFrame(spark).collect().head.getInt(0) === 1)
    mem.dropView("mv")
    assert(mem.listViews().isEmpty)
  }
}
