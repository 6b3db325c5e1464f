package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{CommitConflictException, SqlCatalog}
import graft.core._
import graft.meta._

/** The JDBC catalog must behave exactly like the Hadoop catalog under
  * every table operation, plus give true compare-and-swap semantics over
  * SQL (ref: pyiceberg/catalog/sql.py + tests/catalog/test_sql.py). */
class SqlCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warehouse: String = Files.createTempDirectory("graft-sqlwh").toString
  lazy val catalog = new SqlCatalog(s"jdbc:derby:$warehouse/catalog;create=true", warehouse, spark)

  override def afterAll(): Unit = spark.stop()

  def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("create + append + scan round-trips through the SQL catalog") {
    val t = catalog.createTable("ns1.t_sql", Schema.fromSpark(orders.schema))
    t.append(orders)
    assert(t.scan.toDF.count() === orders.count())
    // reload through a fresh handle — the DB row is the source of truth
    val t2 = catalog.loadTable("ns1.t_sql")
    assert(t2.scan.toDF.count() === orders.count())
    assert(catalog.currentVersion("ns1.t_sql") === Some(2)) // create + append
  }

  test("a second catalog instance on the same database sees the same tables") {
    // second construction re-runs ensureTables against a database whose
    // tables exist — the probe must skip the DDL on ANY backend (SQLStates
    // for "already exists" differ per vendor), and the new instance must
    // read tables committed through the first
    val again = new SqlCatalog(s"jdbc:derby:$warehouse/catalog;create=true", warehouse, spark)
    assert(again.tableExists("ns1.t_sql"))
    assert(again.loadTable("ns1.t_sql").scan.toDF.count() === orders.count())
  }

  test("optimistic CAS: losing concurrent writer throws, winner survives") {
    val t0 = catalog.createTable("t_sql_race", Schema.fromSpark(orders.schema))
    t0.append(orders.limit(100))
    val v = catalog.currentVersion("t_sql_race").get
    val winner = t0.metadata.copy(properties = Map("writer" -> "A"))
    catalog.commit("t_sql_race", v, winner)
    intercept[CommitConflictException] {
      catalog.commit("t_sql_race", v, t0.metadata.copy(properties = Map("writer" -> "B")))
    }
    assert(catalog.loadTable("t_sql_race").metadata.properties("writer") === "A")
  }

  test("concurrent appends: loser retries through the commit loop, no lost update") {
    val t0 = catalog.createTable("t_sql_retry", Schema.fromSpark(orders.schema))
    t0.append(orders.filter(col("o_orderkey") <= 5000))
    val a = catalog.loadTable("t_sql_retry")
    val b = catalog.loadTable("t_sql_retry")
    b.append(orders.filter(col("o_orderkey") > 10000))
    a.append(orders.filter(col("o_orderkey") > 5000 && col("o_orderkey") <= 10000))
    val after = catalog.loadTable("t_sql_retry")
    assert(after.metadata.snapshots.size === 3, "all three snapshots must survive")
    assert(after.scan.toDF.count() === orders.count())
  }

  test("MoR position deletes + upsert work over the SQL catalog") {
    val t = catalog.createTable("t_sql_mor", Schema.fromSpark(orders.schema))
    t.append(orders)
    t.deletePositional("o_orderkey <= 300")
    val want = orders.filter(col("o_orderkey") > 300).count()
    assert(t.scan.toDF.count() === want)
    val src = orders.filter(col("o_orderkey") > 300 && col("o_orderkey") <= 400)
      .withColumn("o_orderstatus", lit("X"))
    val (updated, inserted) = t.upsert(src, Seq("o_orderkey"))
    assert(updated === src.count())
    assert(inserted === 0)
    assert(t.scan.toDF.count() === want)
  }

  test("time travel via snapshot ids") {
    val t = catalog.createTable("t_sql_tt", Schema.fromSpark(orders.schema))
    t.append(orders.filter(col("o_orderkey") <= 1000))
    val firstSnap = t.metadata.currentSnapshot.get.snapshotId
    t.append(orders.filter(col("o_orderkey") > 1000))
    assert(t.scan.useSnapshot(firstSnap).toDF.count() ===
      orders.filter(col("o_orderkey") <= 1000).count())
    assert(t.scan.toDF.count() === orders.count())
  }

  test("namespaces, listTables, rename, drop") {
    catalog.createNamespace("ns2")
    assert(catalog.listNamespaces().contains("ns2"))
    assert(catalog.listTables("ns1") === Seq("ns1.t_sql"))
    catalog.renameTable("ns1.t_sql", "ns2.t_renamed")
    assert(!catalog.tableExists("ns1.t_sql"))
    assert(catalog.listTables("ns2") === Seq("ns2.t_renamed"))
    // data survives the rename (metadata-only operation)
    assert(catalog.loadTable("ns2.t_renamed").scan.toDF.count() === orders.count())
    catalog.dropTable("ns2.t_renamed")
    assert(!catalog.tableExists("ns2.t_renamed"))
    intercept[IllegalArgumentException](catalog.loadTable("ns2.t_renamed"))
    // ns1 is now table-less and can be dropped
    catalog.dropNamespace("ns2")
    assert(!catalog.listNamespaces().contains("ns2"))
  }

  test("schema evolution commits land in the SQL catalog") {
    val t = catalog.createTable("t_sql_evo", Schema.fromSpark(
      orders.select(col("o_orderkey"), col("o_totalprice")).schema))
    t.append(orders.select(col("o_orderkey"), col("o_totalprice")))
    t.updateSchema.renameColumn("o_totalprice", "price").commit()
    val reloaded = catalog.loadTable("t_sql_evo")
    assert(reloaded.schema.fields.map(_.name).contains("price"))
    assert(reloaded.scan.toDF.columns.toSeq.contains("price"))
    assert(reloaded.scan.toDF.count() === orders.count())
  }
}
