package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.core._
import graft.meta._

/** REST catalog e2e: [[RestCatalog]] client against the loopback
  * [[RestCatalogServer]] (127.0.0.1 only — no egress), plus unit coverage
  * of the diff→updates→apply commit protocol. */
class RestCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warehouse: String = Files.createTempDirectory("graft-rest-wh").toString
  lazy val server: RestCatalogServer =
    new RestCatalogServer(warehouse, token = Some("s3cret"),
      credential = Some("client-id:client-secret"), prefix = "main").start()
  lazy val catalog: RestCatalog =
    new RestCatalog(server.uri, spark, Map("token" -> "s3cret"))

  override def afterAll(): Unit = { server.stop(); spark.stop() }

  def lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
  def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  // ---- protocol unit tests ----------------------------------------------

  /** Round-trip equality modulo the server-maintained bits. */
  private def normalize(m: TableMetadata): TableMetadata = m.copy(
    lastUpdatedMs = 0,
    metadataLog = Nil,
    snapshotLog = m.snapshotLog.map(_.copy(timestampMs = 0)))

  test("diff/apply reproduces a full table lifecycle") {
    val wh = Files.createTempDirectory("graft-rt").toString
    val hc = new HadoopCatalog(wh, spark)
    val states = Seq.newBuilder[TableMetadata]
    val t = hc.createTable("rt", Schema.fromSpark(lineitem.schema),
      properties = Map("owner" -> "spec"))
    states += t.metadata
    t.append(lineitem.limit(100)); states += t.metadata
    t.append(lineitem.limit(50)); states += t.metadata
    t.manageSnapshots.createTag("v1", t.metadata.currentSnapshotId.get)
    t.refresh(); states += t.metadata
    t.updateSchema.addColumn("extra", IString).commit()
    t.refresh(); states += t.metadata
    t.setProperties("a" -> "1"); states += t.metadata
    t.removeProperties("owner"); states += t.metadata
    // rollback: set-snapshot-ref to an EXISTING snapshot (no add-snapshot
    // pairing — the applier must keep the snapshot-log monotonic)
    t.manageSnapshots.setCurrentSnapshot(t.metadata.snapshots.head.snapshotId)
    t.refresh(); states += t.metadata
    val all = states.result()
    // create transition
    val created = RestUpdates.applyUpdates(None, RestUpdates.diff(None, all.head), 1L)
    assert(normalize(created) === normalize(all.head))
    // each subsequent transition
    all.sliding(2).foreach { case Seq(base, target) =>
      val updates = RestUpdates.diff(Some(base), target)
      val applied = RestUpdates.applyUpdates(Some(base), updates, target.lastUpdatedMs)
      assert(normalize(applied) === normalize(target),
        s"transition failed with updates: $updates")
    }
  }

  test("requirements catch concurrent interference") {
    import TableRequirement._
    val m = TableMetadata(tableUuid = "u-1", location = "/x",
      schemas = Seq(Schema(Seq(NestedField(1, "a", ILong, required = false)), 0, Nil)),
      refs = Map("main" -> SnapshotRef(7L, "branch")))
    assert(AssertCreate.check(Some(m)).isDefined)
    assert(AssertCreate.check(None).isEmpty)
    assert(AssertTableUuid("u-1").check(Some(m)).isEmpty)
    assert(AssertTableUuid("u-2").check(Some(m)).isDefined)
    assert(AssertRefSnapshotId("main", Some(7L)).check(Some(m)).isEmpty)
    assert(AssertRefSnapshotId("main", Some(8L)).check(Some(m)).isDefined)
    assert(AssertRefSnapshotId("other", None).check(Some(m)).isEmpty)
    assert(AssertRefSnapshotId("other", Some(1L)).check(Some(m)).isDefined)
  }

  // ---- e2e over loopback HTTP -------------------------------------------

  test("namespace CRUD and properties") {
    catalog.createNamespace("db")
    assert(catalog.listNamespaces().contains("db"))
    catalog.updateNamespaceProperties("db", Map("loc" -> "here"))
    assert(catalog.namespaceProperties("db") === Map("loc" -> "here"))
    catalog.createNamespace("tmp")
    catalog.dropNamespace("tmp")
    assert(!catalog.listNamespaces().contains("tmp"))
  }

  test("create + append + scan through REST") {
    val t = catalog.createTable("db.li", Schema.fromSpark(lineitem.schema))
    t.append(lineitem)
    assert(t.scan.toDF.count() === lineitem.count())
    assert(t.scan.count() === lineitem.count()) // metadata count short-circuit
    val got = t.scan("l_quantity > 45").toDF.count()
    assert(got === lineitem.filter(col("l_quantity") > 45).count())
    assert(catalog.listTables("db") === Seq("db.li"))
    assert(catalog.tableExists("db.li"))
    assert(!catalog.tableExists("db.nope"))
  }

  test("multi-snapshot lifecycle: evolution, tag, time travel, expiry") {
    val t = catalog.createTable("db.life", Schema.fromSpark(orders.schema))
    t.append(orders.limit(100))
    val snap1 = t.metadata.currentSnapshotId.get
    t.manageSnapshots.createTag("first", snap1)
    t.append(orders.limit(200))
    t.updateSchema.addColumn("note", IString).commit()
    val fresh = catalog.loadTable("db.life")
    assert(fresh.metadata.snapshots.size === 2)
    assert(fresh.metadata.refs.contains("first"))
    assert(fresh.schema.fields.map(_.name).contains("note"))
    assert(fresh.scan.useSnapshot(snap1).toDF.count() === 100)
    assert(fresh.scan.toDF.count() === 300)
    // expiry flows through remove-snapshots (+ tag protection)
    fresh.expireSnapshots().olderThan(System.currentTimeMillis() + 1000).commit()
    val after = catalog.loadTable("db.life")
    assert(after.metadata.snapshots.map(_.snapshotId).contains(snap1),
      "tag-protected snapshot must survive expiry")
  }

  test("concurrent commit: stale handle retries and lands") {
    val t1 = catalog.createTable("db.conc", Schema.fromSpark(lineitem.schema))
    val t2 = catalog.loadTable("db.conc")
    t1.append(lineitem.limit(10))
    // t2 is stale now; its commit loop must conflict, refresh, retry
    t2.append(lineitem.limit(20))
    assert(catalog.loadTable("db.conc").scan.toDF.count() === 30)
  }

  test("stale snapshot commit is rejected by assert-ref-snapshot-id (409)") {
    val t = catalog.createTable("db.guard", Schema.fromSpark(lineitem.schema))
    t.append(lineitem.limit(10))
    // a second client instance with its own cache goes stale
    val other = new RestCatalog(server.uri, spark, Map("token" -> "s3cret"))
    val stale = other.loadTable("db.guard")
    t.append(lineitem.limit(5)) // main advances; `stale` doesn't see it
    val cur = stale.metadata.currentSnapshot.get
    val fake = cur.copy(snapshotId = 999L,
      parentSnapshotId = Some(cur.snapshotId),
      sequenceNumber = cur.sequenceNumber + 1)
    val target = stale.metadata.copy(
      snapshots = stale.metadata.snapshots :+ fake,
      currentSnapshotId = Some(999L),
      refs = stale.metadata.refs + ("main" -> SnapshotRef(999L, "branch")))
    intercept[CommitConflictException] {
      other.commit("db.guard", stale.version, target)
    }
    // and the winning lineage is intact
    assert(catalog.loadTable("db.guard").scan.toDF.count() === 15)
  }

  test("rename and register") {
    val t = catalog.createTable("db.old", Schema.fromSpark(lineitem.schema))
    t.append(lineitem.limit(5))
    catalog.renameTable("db.old", "db.newer")
    assert(!catalog.tableExists("db.old"))
    assert(catalog.loadTable("db.newer").scan.toDF.count() === 5)

    // register: adopt a Hadoop-catalog table's metadata file by pointer
    val wh2 = Files.createTempDirectory("graft-reg").toString
    val hc = new HadoopCatalog(wh2, spark)
    val src = hc.createTable("src", Schema.fromSpark(orders.schema))
    src.append(orders.limit(7))
    val metaLoc = s"$wh2/src/metadata/v${src.version}.metadata.json"
    val reg = catalog.registerTable("db.adopted", metaLoc)
    assert(reg.scan.toDF.count() === 7)
  }

  test("views over REST: create, read, replace, drop") {
    val schema = Schema(Seq(NestedField(1, "n", ILong, required = false)), 0, Nil)
    catalog.createView("db.v1", schema, "SELECT 1 AS n")
    val v = catalog.loadView("db.v1")
    assert(v.sqlFor("spark").map(_.sql) === Some("SELECT 1 AS n"))
    assert(v.toDataFrame(spark).collect().map(_.getInt(0)).toSeq === Seq(1))
    catalog.replaceView("db.v1", schema, "SELECT 2 AS n")
    val v2 = catalog.loadView("db.v1")
    assert(v2.sqlFor("spark").map(_.sql) === Some("SELECT 2 AS n"))
    assert(v2.metadata.versions.size === 2, "replace appends an immutable version")
    assert(catalog.listViews("db") === Seq("db.v1"))
    catalog.dropView("db.v1")
    assert(!catalog.viewExists("db.v1"))
  }

  test("auth: bad token is rejected; oauth validates client credentials") {
    intercept[Exception] {
      new RestCatalog(server.uri, spark, Map("token" -> "wrong"))
    }
    // the token endpoint must NOT hand the bearer to made-up credentials
    intercept[Exception] {
      new RestCatalog(server.uri, spark, Map("credential" -> "intruder:guess"))
    }
    val viaOauth = new RestCatalog(server.uri, spark,
      Map("credential" -> "client-id:client-secret"))
    assert(viaOauth.listNamespaces().contains("db"))
  }

  test("purge deletes the table location through the server") {
    val t = catalog.createTable("db.purged", Schema.fromSpark(lineitem.schema))
    t.append(lineitem.limit(3))
    val loc = t.metadata.location
    assert(Io.exists(loc))
    catalog.purgeTable("db.purged")
    assert(!catalog.tableExists("db.purged"))
    assert(!Io.exists(loc), "purgeRequested=true must remove the location")
  }

  test("server-side scan planning matches local planning exactly") {
    val t = catalog.createTable("db.plan", Schema.fromSpark(orders.schema))
    t.append(orders)
    t.delete("o_orderkey <= 500") // leave some position/rewrite artifacts
    val fresh = catalog.loadTable("db.plan")
    val filter = ExprParser.parse("o_totalprice > 100000.0 and o_orderstatus = 'O'")
    val local = fresh.scan.filter(filter).planFiles()
    val remote = catalog.planScan("db.plan", filter)
    assert(remote.map(_.file.filePath).sorted === local.map(_.file.filePath).sorted)
    val byPath = local.map(ft => ft.file.filePath -> ft).toMap
    remote.foreach { rt =>
      val lt = byPath(rt.file.filePath)
      assert(rt.residual === lt.residual, s"residual for ${rt.file.filePath}")
      assert(rt.deletes.map(_.filePath).sorted === lt.deletes.map(_.filePath).sorted)
      assert(rt.file.recordCount === lt.file.recordCount)
      assert(rt.file.lowerBounds === lt.file.lowerBounds)
      assert(rt.file.partition === lt.file.partition)
    }
  }

  test("scan-planning-mode=server routes scans through the service and paginates") {
    // tiny page size forces the plan-tasks token path
    val smallPages = new RestCatalogServer(
      Files.createTempDirectory("graft-rest-pg").toString,
      token = None, prefix = "pg", planPageSize = 2).start()
    try {
      val cat = new RestCatalog(smallPages.uri, spark,
        Map("scan-planning-mode" -> "server"))
      cat.createNamespace("db")
      val schema = Schema.fromSpark(orders.schema)
      val spec = PartitionSpec.build(schema, 0,
        ("o_orderstatus", IdentityTransform, "o_orderstatus"))
      val t = cat.createTable("db.po", schema, spec)
      t.append(orders)
      // 3 partitions → 3+ files > page size 2 → token pagination
      val all = t.scan.planFiles()
      assert(all.size > 2)
      // scans execute through server-planned tasks: counts must agree
      assert(t.scan.toDF.count() === orders.count())
      val want = orders.filter(col("o_orderstatus") === "F").count()
      assert(t.scan("o_orderstatus = 'F'").toDF.count() === want)
      // partition pruning happened on the SERVER
      assert(t.scan("o_orderstatus = 'F'").planFiles().size < all.size)
      // schema evolution: a CURRENT scan must bind against the CURRENT
      // schema, not the latest snapshot's (regression: sending the
      // resolved snapshot id froze the schema at write time)
      t.updateSchema.addColumn("note", graft.core.IString).commit()
      assert(t.scan("note = 'x'").planFiles().isEmpty
        || t.scan("note = 'x'").toDF.count() === 0)
      // an explicit time-travel pin still uses the snapshot's own schema
      val snap = t.metadata.currentSnapshotId.get
      assert(t.scan.useSnapshot(snap).planFiles().size === all.size)
    } finally smallPages.stop()
  }

  test("independent changes on one base MERGE server-side without a retry") {
    // the update-protocol advantage over CAS catalogs: a property change
    // and an append diffed from the SAME base both land — the property
    // commit carries no ref requirement, so the server merges it onto
    // the advanced state instead of failing it
    val t = catalog.createTable("db.merge2", Schema.fromSpark(lineitem.schema))
    t.append(lineitem.limit(10))
    val a = new RestCatalog(server.uri, spark, Map("token" -> "s3cret"))
    val b = new RestCatalog(server.uri, spark, Map("token" -> "s3cret"))
    val ta = a.loadTable("db.merge2")
    val tb = b.loadTable("db.merge2")
    ta.append(lineitem.limit(5)) // advances main
    tb.setProperties("owner" -> "curation") // stale base, no ref change
    val merged = catalog.loadTable("db.merge2")
    assert(merged.scan.toDF.count() === 15, "append must survive the merge")
    assert(merged.metadata.properties.get("owner") === Some("curation"))
  }

  test("many concurrent committers through separate clients all land") {
    // 6 racers can cost a loser 5+ conflicts — raise the retry budget the
    // way a real deployment would (commit.retry.num-retries, default 4)
    val t = catalog.createTable("db.race", Schema.fromSpark(lineitem.schema),
      properties = Map("commit.retry.num-retries" -> "20"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 6).map { i =>
      new Thread(() => {
        try {
          val c = new RestCatalog(server.uri, spark, Map("token" -> "s3cret"))
          c.loadTable("db.race").append(lineitem.limit(i * 10))
        } catch { case e: Throwable => failures.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"committer failed: ${failures.peek()}")
    val after = catalog.loadTable("db.race")
    assert(after.scan.toDF.count() === (1 to 6).map(_ * 10).sum)
    assert(after.metadata.snapshots.size === 6)
  }

  test("DSv2 options face and streaming source resolve through REST") {
    import org.apache.spark.sql.streaming.Trigger
    val t = catalog.createTable("db.dsv2", Schema.fromSpark(lineitem.schema))
    t.append(lineitem.limit(30))
    val df = spark.read.format("graft")
      .option("catalog", server.uri).option("token", "s3cret")
      .option("table", "db.dsv2").load()
    assert(df.count() === 30)
    // incremental source: one AvailableNow drain through the REST catalog
    val out = Files.createTempDirectory("graft-rest-sink").toString
    val q = spark.readStream.format("graft")
      .option("catalog", server.uri).option("token", "s3cret")
      .option("table", "db.dsv2").load()
      .writeStream.format("parquet").option("path", out)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-rest-ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(out).count() === 30)
  }

  test("durable server: a restarted service resumes from pointer files") {
    val wh = Files.createTempDirectory("graft-rest-dur").toString
    val s1 = new RestCatalogServer(wh, token = None, prefix = "d", persist = true).start()
    try {
      val c1 = new RestCatalog(s1.uri, spark)
      c1.createNamespace("db")
      val t = c1.createTable("db.t", Schema.fromSpark(lineitem.schema))
      t.append(lineitem.limit(40))
      c1.createView("db.v", Schema(Seq(NestedField(1, "n", ILong, false)), 0, Nil),
        "SELECT 1 AS n")
    } finally s1.stop()
    // a brand-new server process on the same warehouse serves the state
    val s2 = new RestCatalogServer(wh, token = None, prefix = "d", persist = true).start()
    try {
      val c2 = new RestCatalog(s2.uri, spark)
      assert(c2.listNamespaces().contains("db"))
      val t2 = c2.loadTable("db.t")
      assert(t2.scan.toDF.count() === 40)
      t2.append(lineitem.limit(10)) // commits keep working after recovery
      assert(c2.loadTable("db.t").scan.toDF.count() === 50)
      assert(c2.loadView("db.v").sqlFor("spark").map(_.sql) === Some("SELECT 1 AS n"))
    } finally s2.stop()
  }

  test("MERGE/upsert and row-level delete run through a REST-backed table") {
    val t = catalog.createTable("db.dml", Schema.fromSpark(orders.schema),
      properties = Map("format-version" -> "2"))
    t.append(orders.limit(100))
    t.delete("o_orderkey <= 100")
    val left = catalog.loadTable("db.dml").scan.toDF
    assert(left.filter(col("o_orderkey") <= 100).count() === 0)
  }

  test("rename cannot silently discard a concurrent commit") {
    // the r8 atomicity fix: rename holds BOTH name monitors, so a commit
    // to the source either completes before the move (its rows travel)
    // or fails 404 — an acknowledged commit is NEVER lost. Hammer both
    // operations and reconcile acknowledged-commit count vs rows.
    catalog.createNamespace("race")
    val t0 = catalog.createTable("race.a", Schema.fromSpark(orders.schema))
    t0.append(orders.limit(1))
    val acknowledged = new java.util.concurrent.atomic.AtomicLong(1L)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writer = new Thread(() => {
      var i = 0
      while (i < 30) {
        val name = if (catalog.tableExists("race.a")) "race.a" else "race.b"
        try {
          catalog.loadTable(name).append(orders.limit(1))
          acknowledged.incrementAndGet()
        } catch { case _: Exception => () } // 404/409 mid-rename: not acked
        i += 1
      }
      stop.set(true)
    })
    val renamer = new Thread(() => {
      var flip = false
      while (!stop.get()) {
        try {
          if (!flip) catalog.renameTable("race.a", "race.b")
          else catalog.renameTable("race.b", "race.a")
          flip = !flip
        } catch { case _: Exception => () } // 404 when racing the writer's view
        Thread.sleep(3)
      }
    })
    writer.start(); renamer.start()
    writer.join(120000); renamer.join(120000)
    val finalName = if (catalog.tableExists("race.a")) "race.a" else "race.b"
    val rows = catalog.loadTable(finalName).scan.toDF.count()
    assert(rows === acknowledged.get(),
      s"acknowledged ${acknowledged.get()} appends but table holds $rows rows — a commit was lost")
  }

  test("oauth token refreshes proactively near expiry") {
    // a 31s-lifetime token refreshes 30s early => every-1s re-exchange;
    // a constructor-cached token would freeze the exchange count at 1
    val wh = Files.createTempDirectory("graft-oauth").toString
    val sv = new RestCatalogServer(wh, token = Some("tk"),
      credential = Some("cid:csec"), tokenExpiresInSec = 31).start()
    try {
      val cat = new RestCatalog(sv.uri, spark, Map("credential" -> "cid:csec"))
      cat.createNamespace("db")
      val after1 = sv.tokenExchanges.get()
      assert(after1 >= 1L)
      Thread.sleep(1200)
      cat.listNamespaces()
      assert(sv.tokenExchanges.get() > after1,
        "client never re-exchanged after the token lifetime elapsed")
    } finally sv.stop()
  }

  test("graft-cdc streams a REST-catalog v3 table (refresh through the protocol)") {
    // the streaming source's per-trigger table.refresh() goes through the
    // REST load-table round trip; offsets and the pruned diff must behave
    // exactly as on a filesystem catalog
    catalog.createNamespace("cdcdb")
    val t = catalog.createTable("cdcdb.cdc_stream",
      Schema.fromSpark(orders.schema),
      properties = Map("format-version" -> "3"))
    t.append(orders.filter(org.apache.spark.sql.functions.col("o_orderkey") % 2 === 1))
    val q = spark.readStream.format("graft-cdc")
      .option("catalog", server.uri).option("token", "s3cret")
      .option("table", "cdcdb.cdc_stream").load()
      .writeStream.format("memory").queryName("cdc_rest_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val oddCount = orders.filter(
        org.apache.spark.sql.functions.col("o_orderkey") % 2 === 1).count()
      assert(spark.table("cdc_rest_sink").count() === oddCount)
      // a commit AFTER the stream started: the next trigger must see it
      // through a REST refresh and stream exactly the new range
      t.append(orders.filter(org.apache.spark.sql.functions.col("o_orderkey") % 2 === 0))
      q.processAllAvailable()
      assert(spark.table("cdc_rest_sink").count() === orders.count())
      assert(spark.table("cdc_rest_sink")
        .filter(org.apache.spark.sql.functions.col("_change_type") =!= "insert")
        .count() === 0)
    } finally q.stop()
    spark.sql("DROP VIEW IF EXISTS cdc_rest_sink")
  }
  test("pluggable auth managers: basic, custom class, config validation") {
    val wh2 = Files.createTempDirectory("graft-rest-basic").toString
    val srv = new RestCatalogServer(wh2, basic = Some(("alice", "s3cr3t"))).start()
    try {
      // basic: the manager emits `Basic base64(user:password)` and the
      // construction-time config handshake itself is the authed round-trip
      val cat = new RestCatalog(srv.uri, spark, Map(
        "auth.type" -> "basic",
        "auth.basic.username" -> "alice", "auth.basic.password" -> "s3cr3t"))
      cat.createNamespace("authns")
      assert(cat.listNamespaces().contains("authns"))
      // wrong password → 401 surfaces at the handshake
      val bad = intercept[Exception](new RestCatalog(srv.uri, spark, Map(
        "auth.type" -> "basic",
        "auth.basic.username" -> "alice", "auth.basic.password" -> "wrong")))
      assert(bad.getMessage.toLowerCase.contains("config"))
      // missing config fails typed, naming the property
      val miss = intercept[IllegalArgumentException](new RestCatalog(srv.uri, spark,
        Map("auth.type" -> "basic", "auth.basic.username" -> "alice")))
      assert(miss.getMessage.contains("auth.basic.password"))
      // custom class path (the factory's reflective arm)
      val hdr = "Basic " + java.util.Base64.getEncoder
        .encodeToString("alice:s3cr3t".getBytes("UTF-8"))
      val viaCustom = new RestCatalog(srv.uri, spark, Map(
        "auth.type" -> "custom",
        "auth.impl" -> classOf[FixedHeaderAuthManager].getName,
        "auth.custom.header" -> hdr))
      assert(viaCustom.listNamespaces().contains("authns"))
      // custom demands impl; impl only valid with custom (ref :451/:454)
      assert(intercept[IllegalArgumentException](new RestCatalog(srv.uri, spark,
        Map("auth.type" -> "custom"))).getMessage.contains("auth.impl"))
      assert(intercept[IllegalArgumentException](new RestCatalog(srv.uri, spark,
        Map("auth.type" -> "basic", "auth.impl" -> "x",
          "auth.basic.username" -> "alice", "auth.basic.password" -> "s3cr3t")))
        .getMessage.contains("auth.impl"))
      // unknown name fails typed
      assert(intercept[IllegalArgumentException](new RestCatalog(srv.uri, spark,
        Map("auth.type" -> "nope"))).getMessage.contains("nope"))
    } finally srv.stop()
  }

}

/** Custom-class path for the AuthManagerFactory test: emits whatever
  * header the config supplies (reflective `(Map[String, String])` ctor). */
class FixedHeaderAuthManager(cfg: Map[String, String])
    extends graft.catalog.RestAuthManager {
  override def authHeader(): Option[String] = cfg.get("header")
}
