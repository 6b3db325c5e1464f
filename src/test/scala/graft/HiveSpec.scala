package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.core._
import graft.meta._

/** Hive-metastore-shaped catalog over the injectable thrift seam (ref:
  * catalog/hive.py). The in-memory fake implements the real metastore
  * contract — entity CRUD, typed exceptions, and the EXCLUSIVE
  * table-lock queue — so the reference's lock-based commit protocol
  * (lock → wait → re-read → alter_table → unlock, hive.py:523) is
  * genuinely exercised, including the WAITING→poll→ACQUIRED promotion
  * and the retries-exhausted failure. */
class HiveSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warehouse: String = Files.createTempDirectory("graft-hivewh").toString
  lazy val api = new InMemoryHmsApi
  lazy val catalog = new HiveCatalog(warehouse, spark, api)

  override def afterAll(): Unit = spark.stop()

  def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("create + append + scan round-trips; record carries the HMS shape") {
    catalog.createNamespace("db1")
    val t = catalog.createTable("db1.t_hive", Schema.fromSpark(orders.schema),
      properties = Map("owner" -> "alice"))
    t.append(orders.limit(500))
    assert(catalog.loadTable("db1.t_hive").scan.toDF.count() === 500)

    val rec = api.getTable("db1", "t_hive")
    assert(rec.tableType === "EXTERNAL_TABLE")
    assert(rec.owner === "alice")
    assert(rec.parameters("EXTERNAL") === "TRUE")
    assert(rec.parameters("table_type") === "ICEBERG")
    assert(rec.parameters("metadata_location").endsWith(".metadata.json"))
    assert(rec.parameters.contains("previous_metadata_location"),
      "second commit must record the previous pointer")
    // hive-typed column listing for HiveQL consoles
    val byName = rec.sd.cols.map(c => c.name -> c.hiveType).toMap
    assert(byName("o_orderkey") === "bigint")
    assert(byName("o_orderdate") === "timestamp")
    assert(rec.sd.serdeLib === "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe")
  }

  test("hive type strings cover nested shapes and the hive2 compat flag") {
    import HiveCatalog.hiveTypeOf
    assert(hiveTypeOf(IDecimal(12, 2), false) === "decimal(12,2)")
    assert(hiveTypeOf(ITimestamptz, false) === "timestamp with local time zone")
    assert(hiveTypeOf(ITimestamptz, true) === "timestamp") // hive.py:288
    assert(hiveTypeOf(ITime, false) === "string")
    assert(hiveTypeOf(IUnknown, false) === "void")
    assert(hiveTypeOf(IStruct(Seq(
      NestedField(1, "a", IInt), NestedField(2, "b", IList(4, IDouble, false)))), false)
      === "struct<a:int,b:array<double>>")
    assert(hiveTypeOf(IMap(5, IString, 6, ILong, false), false) === "map<string,bigint>")
  }

  test("version check under the lock: stale expected version loses") {
    val t0 = catalog.createTable("t_hive_race", Schema.fromSpark(orders.schema))
    t0.append(orders.limit(100))
    val v = catalog.currentVersion("t_hive_race").get
    catalog.commit("t_hive_race", v, t0.metadata.copy(properties = Map("writer" -> "A")))
    intercept[CommitConflictException] {
      catalog.commit("t_hive_race", v, t0.metadata.copy(properties = Map("writer" -> "B")))
    }
    assert(catalog.loadTable("t_hive_race").metadata.properties("writer") === "A")
  }

  test("concurrent appends: loser retries through the commit loop, no lost update") {
    val t0 = catalog.createTable("t_hive_retry", Schema.fromSpark(orders.schema))
    t0.append(orders.filter(col("o_orderkey") <= 5000))
    val a = catalog.loadTable("t_hive_retry")
    val b = catalog.loadTable("t_hive_retry")
    b.append(orders.filter(col("o_orderkey") > 10000))
    a.append(orders.filter(col("o_orderkey") > 5000 && col("o_orderkey") <= 10000))
    val after = catalog.loadTable("t_hive_retry")
    assert(after.metadata.snapshots.size === 3, "all three snapshots must survive")
    assert(after.scan.toDF.count() === orders.count())
  }

  test("WAITING lock is polled with exponential backoff and promotes to ACQUIRED") {
    val waits = scala.collection.mutable.ArrayBuffer[Long]()
    var blocker: Option[HmsLockResponse] = None
    val cat = new HiveCatalog(warehouse, spark, api, "hive",
      sleeper = { ms =>
        waits += ms
        // the competing holder releases after our SECOND poll interval,
        // exercising WAITING → WAITING → ACQUIRED
        if (waits.size == 2) blocker.foreach(b => api.unlock(b.lockId))
      })
    val t0 = cat.createTable("t_hive_lock", Schema.fromSpark(orders.schema))
    val v = cat.currentVersion("t_hive_lock").get
    blocker = Some(api.lock("default", "t_hive_lock"))
    assert(blocker.get.state === HmsLockState.Acquired)
    cat.commit("t_hive_lock", v, t0.metadata.copy(properties = Map("k" -> "v")))
    assert(waits.take(2) === Seq(100L, 200L), "exponential backoff ×2 from min wait")
    assert(cat.loadTable("t_hive_lock").metadata.properties("k") === "v")
    // everything unlocked: a fresh lock acquires immediately
    val fresh = api.lock("default", "t_hive_lock")
    assert(fresh.state === HmsLockState.Acquired)
    api.unlock(fresh.lockId)
  }

  test("lock retries exhausted fails typed and releases the waiter") {
    val cat = new HiveCatalog(warehouse, spark, api, "hive",
      lockCheckRetries = 3, sleeper = _ => ())
    val t0 = cat.createTable("t_hive_stuck", Schema.fromSpark(orders.schema))
    val v = cat.currentVersion("t_hive_stuck").get
    val blocker = api.lock("default", "t_hive_stuck")
    val e = intercept[IllegalStateException] {
      cat.commit("t_hive_stuck", v, t0.metadata.copy(properties = Map("k" -> "v")))
    }
    assert(e.getMessage.contains("lock"))
    assert(!cat.loadTable("t_hive_stuck").metadata.properties.contains("k"),
      "the commit must not have been applied")
    api.unlock(blocker.lockId)
    // the failed committer's WAITING entry is gone: retry succeeds now
    cat.commit("t_hive_stuck", v, t0.metadata.copy(properties = Map("k" -> "v2")))
    assert(cat.loadTable("t_hive_stuck").metadata.properties("k") === "v2")
  }

  test("HMS-native parameters survive commits; dropped iceberg props are removed") {
    val t0 = catalog.createTable("t_hive_props", Schema.fromSpark(orders.schema),
      properties = Map("ice.keep" -> "1", "ice.drop" -> "2"))
    // an external system (Hive/Spark) sets a native parameter directly
    val rec = api.getTable("default", "t_hive_props")
    api.alterTable("default", "t_hive_props",
      rec.copy(parameters = rec.parameters + ("hms.native" -> "external")))
    // iceberg commit removes one property, keeps the other
    val v = catalog.currentVersion("t_hive_props").get
    catalog.commit("t_hive_props", v,
      catalog.loadTable("t_hive_props").metadata
        .copy(properties = Map("ice.keep" -> "1")))
    val after = api.getTable("default", "t_hive_props").parameters
    assert(after("hms.native") === "external", "HMS-native parameter preserved")
    assert(after("ice.keep") === "1")
    assert(!after.contains("ice.drop"), "removed iceberg property dropped from HMS")
  }

  test("non-iceberg and pointer-less records are rejected with the reference's errors") {
    api.createDatabase(HiveDatabase("ext"))
    api.createTable(HiveTableRecord("ext", "hive_t", "x", 0,
      HiveStorageDescriptor(Nil, "/x"), "EXTERNAL_TABLE", Map("table_type" -> "HIVE")))
    val e1 = intercept[IllegalArgumentException](catalog.loadTable("ext.hive_t"))
    assert(e1.getMessage.contains("expected iceberg"))
    api.createTable(HiveTableRecord("ext", "broken_t", "x", 0,
      HiveStorageDescriptor(Nil, "/x"), "EXTERNAL_TABLE", Map("table_type" -> "ICEBERG")))
    val e2 = intercept[IllegalArgumentException](catalog.loadTable("ext.broken_t"))
    assert(e2.getMessage.contains("metadata_location"))
  }

  test("rename is a native alter_table keeping the same metadata pointer") {
    catalog.createNamespace("db2")
    val t = catalog.createTable("db2.t_from", Schema.fromSpark(orders.schema))
    t.append(orders.limit(50))
    val loc = api.getTable("db2", "t_from").parameters("metadata_location")
    catalog.renameTable("db2.t_from", "db2.t_to")
    assert(!catalog.tableExists("db2.t_from"))
    assert(api.getTable("db2", "t_to").parameters("metadata_location") === loc)
    assert(catalog.loadTable("db2.t_to").scan.toDF.count() === 50)
    // rename into a missing namespace fails typed
    intercept[IllegalArgumentException](catalog.renameTable("db2.t_to", "nodb.t"))
  }

  test("namespaces map to databases; comment/location are first-class") {
    catalog.createNamespace("ns_props")
    catalog.updateNamespaceProperties("ns_props",
      Map("comment" -> "hello", "k" -> "v"))
    val props = catalog.loadNamespaceProperties("ns_props")
    assert(props("comment") === "hello")
    assert(props("k") === "v")
    assert(props("location").contains("ns_props"))
    assert(api.getDatabase("ns_props").description === Some("hello"))
    intercept[IllegalArgumentException](catalog.createNamespace("ns_props"))
    intercept[IllegalStateException] {
      catalog.createTable("ns_props.t", Schema.fromSpark(orders.schema))
      catalog.dropNamespace("ns_props")
    }
  }

  test("factory: type=hive and thrift:// inference construct the catalog") {
    val c = CatalogFactory.loadCatalog("hivecat", spark,
      Map("type" -> "hive", "warehouse" -> Files.createTempDirectory("fhw").toString))
    assert(c.isInstanceOf[HiveCatalog])
    val c2 = CatalogFactory.loadCatalog("hivecat2", spark,
      Map("uri" -> "thrift://metastore:9083",
        "warehouse" -> Files.createTempDirectory("fhw2").toString))
    assert(c2.isInstanceOf[HiveCatalog])
  }

  test("views are rejected the way the reference rejects them") {
    intercept[UnsupportedOperationException] {
      catalog.createView("v1", Schema(Seq(NestedField(1, "x", IInt))), "SELECT 1")
    }
  }
}
