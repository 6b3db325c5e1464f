package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HadoopCatalog
import graft.core._

/** Write-side interop conformance: the metadata JSON our engine commits
  * must satisfy every REQUIRED field of the reference's pydantic models —
  * a foreign client (pyiceberg, Java, Trino) validates exactly these on
  * load, so a missing/mistyped field means our tables don't open there.
  *
  * Field inventory: table/metadata.py:128 TableMetadataCommonFields +
  * :491 TableMetadataV2 (format-version, last-sequence-number);
  * snapshots.py:241 Snapshot, :290 SnapshotLogEntry; summary keys
  * snapshots.py:37-58. pyiceberg can't execute in this sandbox, so the
  * models' requirements are encoded as asserts over the raw JSON.
  */
class ConformanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val warehouse: String = Files.createTempDirectory("graft-conform").toString
  lazy val catalog = new HadoopCatalog(warehouse, spark)

  override def afterAll(): Unit = spark.stop()

  private val mapper = new ObjectMapper()

  private def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  /** Latest vN.metadata.json of a hadoop-layout table. */
  private def currentMetadataJson(tableDir: String): JsonNode = {
    val dir = Paths.get(tableDir, "metadata")
    val latest = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".metadata.json"))
      .maxBy(n => n.stripPrefix("v").stripSuffix(".metadata.json").toInt)
    mapper.readTree(Files.readAllBytes(dir.resolve(latest)))
  }

  private def req(n: JsonNode, field: String): JsonNode = {
    val v = n.get(field)
    assert(v != null && !v.isNull, s"required metadata field '$field' is missing")
    v
  }

  test("committed v2 metadata JSON satisfies the reference models' required fields") {
    val t = catalog.createTable("conform_t", Schema.fromSpark(orders.schema))
    t.updateSpec.addField("o_orderstatus", IdentityTransform, "o_orderstatus").commit()
    val reloaded = catalog.loadTable("conform_t")
    reloaded.append(orders.limit(500))
    reloaded.append(orders.limit(300))
    catalog.loadTable("conform_t").delete("o_orderkey < 100")

    val m = currentMetadataJson(s"$warehouse/conform_t")

    // --- TableMetadataV2 scalar requireds (metadata.py:128/:491) ---
    assert(req(m, "format-version").asInt() === 2)
    java.util.UUID.fromString(req(m, "table-uuid").asText()) // must parse
    assert(req(m, "location").asText().nonEmpty)
    assert(req(m, "last-sequence-number").asLong() >= 1L)
    assert(req(m, "last-updated-ms").asLong() > 0L)
    assert(req(m, "last-column-id").asInt() >= orders.schema.size)
    assert(req(m, "last-partition-id").asInt() >= 1000)

    // --- schemas: objects with schema-id; current-schema-id resolves ---
    val schemas = req(m, "schemas").elements().asScala.toSeq
    assert(schemas.nonEmpty)
    val schemaIds = schemas.map { s =>
      assert(req(s, "type").asText() === "struct")
      req(s, "fields").elements().asScala.foreach { f =>
        req(f, "id"); req(f, "name"); req(f, "required"); req(f, "type")
      }
      req(s, "schema-id").asInt()
    }
    assert(schemaIds.contains(req(m, "current-schema-id").asInt()),
      "current-schema-id must reference a schema (metadata.py check_schemas)")

    // --- partition specs: full objects; default-spec-id resolves ---
    val specs = req(m, "partition-specs").elements().asScala.toSeq
    val specIds = specs.map { s =>
      req(s, "fields").elements().asScala.foreach { f =>
        req(f, "name"); req(f, "transform"); req(f, "source-id")
        assert(req(f, "field-id").asInt() >= 1000)
      }
      req(s, "spec-id").asInt()
    }
    assert(specIds.contains(req(m, "default-spec-id").asInt()),
      "default-spec-id must reference a spec (metadata.py check_partition_specs)")

    // --- sort orders: default-sort-order-id resolves ---
    val orderIds = req(m, "sort-orders").elements().asScala.toSeq
      .map(o => req(o, "order-id").asInt())
    assert(orderIds.contains(req(m, "default-sort-order-id").asInt()),
      "default-sort-order-id must reference an order (metadata.py check_sort_orders)")

    // --- snapshots (snapshots.py:241): ids, lists, summaries ---
    val snaps = req(m, "snapshots").elements().asScala.toSeq
    assert(snaps.size === 3, "two appends + one delete")
    val snapIds = snaps.map { s =>
      assert(req(s, "timestamp-ms").asLong() > 0L)
      assert(req(s, "sequence-number").asLong() >= 1L)
      assert(req(s, "manifest-list").asText().endsWith(".avro"))
      req(s, "schema-id")
      val summary = req(s, "summary")
      val op = req(summary, "operation").asText()
      assert(Set("append", "replace", "overwrite", "delete").contains(op),
        s"unknown snapshot operation '$op' (snapshots.py:76 Operation)")
      // totals every client reads to answer count()/size() (snapshots.py:53-58)
      Seq("total-records", "total-files-size", "total-data-files",
        "total-delete-files", "total-position-deletes", "total-equality-deletes")
        .foreach(k => assert(summary.get(k) != null, s"summary key '$k' missing"))
      req(s, "snapshot-id").asLong()
    }
    assert(snapIds.distinct.size === snapIds.size)
    assert(snapIds.contains(req(m, "current-snapshot-id").asLong()))

    // append summaries carry the added-* keys (snapshots.py:37-43)
    val appendSummary = snaps.head.get("summary")
    Seq("added-data-files", "added-records", "added-files-size")
      .foreach(k => assert(appendSummary.get(k) != null, s"append summary '$k' missing"))

    // --- logs + refs ---
    req(m, "snapshot-log").elements().asScala.foreach { e =>
      req(e, "snapshot-id"); assert(req(e, "timestamp-ms").asLong() > 0L)
    }
    req(m, "metadata-log").elements().asScala.foreach { e =>
      req(e, "metadata-file"); assert(req(e, "timestamp-ms").asLong() > 0L)
    }
    val main = req(req(m, "refs"), "main")
    assert(req(main, "snapshot-id").asLong() === snapIds.last)
    assert(req(main, "type").asText() === "branch")

    // properties must be a string->string object (metadata.py properties)
    val props = m.get("properties")
    if (props != null) props.properties().asScala.foreach { e =>
      assert(e.getValue.isTextual, s"property ${e.getKey} must be a string")
    }
  }
}
