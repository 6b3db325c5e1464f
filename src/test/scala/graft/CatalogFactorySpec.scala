package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.core.Schema

/** Config-driven catalog loading (ref: catalog/__init__.py:233
  * load_catalog + infer_catalog_type + utils/config.py env parsing). */
class CatalogFactorySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("explicit type routes to each implementation") {
    val wh = Files.createTempDirectory("cf-wh").toString
    assert(CatalogFactory.loadCatalog("a", spark,
      Map("type" -> "hadoop", "warehouse" -> wh)).isInstanceOf[HadoopCatalog])
    assert(CatalogFactory.loadCatalog("b", spark,
      Map("type" -> "in-memory", "warehouse" -> wh)).isInstanceOf[MemoryCatalog])
    val jdbc = s"jdbc:derby:${Files.createTempDirectory("cf-db")}/cat;create=true"
    assert(CatalogFactory.loadCatalog("c", spark,
      Map("type" -> "sql", "uri" -> jdbc, "warehouse" -> wh)).isInstanceOf[SqlCatalog])
    // ref catalog/noop.py: a structural double — loads, but every op raises
    val noop = CatalogFactory.loadCatalog("n", spark, Map("type" -> "noop"))
    assert(noop.isInstanceOf[NoopCatalog])
    intercept[UnsupportedOperationException](noop.loadTable("db.t"))
    intercept[UnsupportedOperationException](noop.listNamespaces())
  }

  test("uri scheme infers the type; unknown scheme is an error") {
    val wh = Files.createTempDirectory("cf-wh2").toString
    val jdbc = s"jdbc:derby:${Files.createTempDirectory("cf-db2")}/cat;create=true"
    assert(CatalogFactory.loadCatalog("s", spark,
      Map("uri" -> jdbc, "warehouse" -> wh)).isInstanceOf[SqlCatalog])
    // warehouse alone = filesystem catalog
    assert(CatalogFactory.loadCatalog("h", spark,
      Map("warehouse" -> wh)).isInstanceOf[HadoopCatalog])
    intercept[IllegalArgumentException] {
      CatalogFactory.loadCatalog("x", spark,
        Map("uri" -> "thrift://metastore:9083"))
    }
    intercept[IllegalArgumentException] {
      CatalogFactory.loadCatalog("none", spark, Map.empty)
    }
  }

  test("environment variables configure a catalog by name") {
    val wh = Files.createTempDirectory("cf-wh3").toString
    val env = Map(
      "GRAFT_CATALOG__PROD__TYPE" -> "hadoop",
      "GRAFT_CATALOG__PROD__WAREHOUSE" -> wh,
      "GRAFT_CATALOG__OTHER__TYPE" -> "rest")
    val cat = CatalogFactory.loadCatalog("prod", spark, env = env)
    assert(cat.isInstanceOf[HadoopCatalog])
    assert(cat.warehouse === wh)
    // explicit props override env
    val wh2 = Files.createTempDirectory("cf-wh4").toString
    val cat2 = CatalogFactory.loadCatalog("prod", spark,
      props = Map("warehouse" -> wh2), env = env)
    assert(cat2.warehouse === wh2)
    // underscore props map to dashes
    val parsed = CatalogFactory.envCatalogConfig("p",
      Map("GRAFT_CATALOG__P__SCAN_PLANNING_MODE" -> "server"))
    assert(parsed === Map("scan-planning-mode" -> "server"))
    // nested double underscores map to '.' (ref config.py:130): an env-set
    // s3 credential must land under its component prefix, not be mangled
    val nested = CatalogFactory.envCatalogConfig("p",
      Map("GRAFT_CATALOG__P__S3__ACCESS_KEY_ID" -> "k"))
    assert(nested === Map("s3.access-key-id" -> "k"))
  }

  test("a rest catalog loads end-to-end through the factory") {
    val wh = Files.createTempDirectory("cf-rest").toString
    val server = new RestCatalogServer(wh, token = Some("tok")).start()
    try {
      val cat = CatalogFactory.loadCatalog("svc", spark, Map(
        "uri" -> server.uri, "token" -> "tok"))
      assert(cat.isInstanceOf[RestCatalog])
      cat.createNamespace("db")
      val t = cat.createTable("db.t", Schema.fromSpark(lineitem.schema))
      t.append(lineitem.limit(12))
      assert(cat.loadTable("db.t").scan.toDF.count() === 12)
    } finally server.stop()
  }
}
