package graft

import java.io.ByteArrayOutputStream
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HadoopCatalog
import graft.core.Schema

/** The console face (ref: cli/console.py) over a Hadoop catalog. */
class CliSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warehouse: String = Files.createTempDirectory("cli-wh").toString
  lazy val catalog = new HadoopCatalog(warehouse, spark)

  override def afterAll(): Unit = spark.stop()

  private def cli(json: Boolean, cmd: String*): String = {
    val bos = new ByteArrayOutputStream()
    Console.withOut(bos) {
      Cli.run(catalog, Cli.Args(warehouse = warehouse, json = json, cmd = cmd))
    }
    bos.toString("UTF-8")
  }

  test("list / describe / schema / uuid / location / refs / files round-trip") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    catalog.createNamespace("db")
    val t = catalog.createTable("db.ords", Schema.fromSpark(orders.schema))
    t.append(orders.limit(100))
    t.manageSnapshots.createTag("v1", t.metadata.currentSnapshotId.get)

    assert(cli(json = false, "list").linesIterator.contains("db"))
    assert(cli(json = false, "list", "db").linesIterator.contains("db.ords"))
    val desc = cli(json = false, "describe", "db.ords")
    assert(desc.contains("format-version") && desc.contains("o_orderkey"))
    assert(cli(json = false, "schema", "db.ords").contains("o_totalprice"))
    assert(cli(json = false, "uuid", "db.ords").trim.length === 36)
    assert(cli(json = false, "location", "db.ords").trim.endsWith("db/ords"))
    assert(cli(json = false, "list-refs", "db.ords").contains("v1"))
    val files = cli(json = true, "files", "db.ords")
    assert(files.contains("\"records\": 100"))
    // json list output parses as a flat array
    assert(cli(json = true, "list", "db").trim.startsWith("["))
  }

  test("properties set/get/remove and rename/drop") {
    catalog.createTable("db.p", Schema.fromSpark(
      spark.read.parquet("/root/testdata/sf0.001/region.parquet").schema))
    cli(json = false, "properties-set", "db.p", "owner", "cli-test")
    assert(cli(json = false, "properties-get", "db.p", "owner").trim === "cli-test")
    cli(json = false, "properties-remove", "db.p", "owner")
    assert(!cli(json = false, "properties-get", "db.p").contains("owner"))
    cli(json = false, "rename-table", "db.p", "db.p2")
    assert(catalog.tableExists("db.p2") && !catalog.tableExists("db.p"))
    cli(json = false, "drop-table", "db.p2")
    assert(!catalog.tableExists("db.p2"))
  }

  test("namespace properties set/get/remove and version") {
    catalog.createNamespace("nsp")
    cli(json = false, "properties-set-ns", "nsp", "owner", "data-eng")
    cli(json = false, "properties-set-ns", "nsp", "retention", "30d")
    assert(cli(json = false, "properties-get-ns", "nsp", "owner").trim === "data-eng")
    val all = cli(json = false, "properties-get-ns", "nsp")
    assert(all.contains("owner") && all.contains("retention"))
    cli(json = false, "properties-remove-ns", "nsp", "owner")
    assert(!cli(json = false, "properties-get-ns", "nsp").contains("owner"))
    assert(cli(json = false, "properties-get-ns", "nsp", "retention").trim === "30d")
    intercept[IllegalArgumentException](
      cli(json = false, "properties-get-ns", "nsp", "owner"))
    assert(cli(json = false, "version").trim.nonEmpty)
  }
}
