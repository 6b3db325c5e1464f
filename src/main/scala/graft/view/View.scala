package graft.view

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Schema
import graft.meta.MetadataJson

/** Iceberg VIEW metadata — the public view spec's `view-metadata.json`
  * model (ref: pyiceberg/view/metadata.py — SQLViewRepresentation :30,
  * ViewVersion :45, ViewHistoryEntry :64, ViewMetadata :73). A view is a
  * versioned SQL definition: each version records its schema, one or more
  * dialect representations, and the namespace context; the version log is
  * the full change history. */
final case class SqlViewRepresentation(sql: String, dialect: String)

final case class ViewVersion(
    versionId: Int,
    schemaId: Int,
    timestampMs: Long,
    summary: Map[String, String],
    representations: Seq[SqlViewRepresentation],
    defaultCatalog: Option[String] = None,
    defaultNamespace: Seq[String] = Nil)

final case class ViewHistoryEntry(timestampMs: Long, versionId: Int)

final case class ViewMetadata(
    viewUuid: String,
    formatVersion: Int, // must be 1 (ref metadata.py:78 ge=1 le=1)
    location: String,
    schemas: Seq[Schema],
    currentVersionId: Int,
    versions: Seq[ViewVersion],
    versionLog: Seq[ViewHistoryEntry],
    properties: Map[String, String] = Map.empty) {
  require(formatVersion == 1, s"View format-version must be 1, got $formatVersion")
}

/** A loaded Iceberg view (ref: pyiceberg/view/__init__.py:27 View).
  * Metadata accessors mirror the reference one-for-one; `toDataFrame` is
  * the Spark-native extra — it executes the Spark-dialect representation
  * against the active session (where the reference hands the SQL text to
  * whatever engine the user drives). */
final class View(val name: String, val metadata: ViewMetadata,
    val metadataLocation: String) {

  /** ref :53 current_version. */
  def currentVersion: ViewVersion =
    metadata.versions.find(_.versionId == metadata.currentVersionId).getOrElse(
      throw new IllegalStateException(
        s"View $name: current-version-id ${metadata.currentVersionId} not in versions"))

  /** ref :45 schema — the CURRENT version's schema. */
  def schema: Schema =
    metadata.schemas.find(_.schemaId == currentVersion.schemaId).getOrElse(
      throw new IllegalStateException(
        s"View $name: schema-id ${currentVersion.schemaId} not in schemas"))

  /** ref :49 schemas. */
  def schemas: Map[Int, Schema] = metadata.schemas.map(s => s.schemaId -> s).toMap

  /** ref :58 versions. */
  def versions: Seq[ViewVersion] = metadata.versions

  /** ref :62 version(id). */
  def version(versionId: Int): Option[ViewVersion] =
    metadata.versions.find(_.versionId == versionId)

  /** ref :66 history. */
  def history: Seq[ViewHistoryEntry] = metadata.versionLog

  /** ref :71 properties. */
  def properties: Map[String, String] = metadata.properties

  /** ref :75 location. */
  def location: String = metadata.location

  /** ref :79 uuid. */
  def uuid: java.util.UUID = java.util.UUID.fromString(metadata.viewUuid)

  /** ref :83 sql_for — case-insensitive dialect match. */
  def sqlFor(dialect: String): Option[SqlViewRepresentation] =
    currentVersion.representations.find(_.dialect.equalsIgnoreCase(dialect))

  /** Spark-native execution: run the view's Spark-dialect SQL (falling
    * back to a sole representation of any dialect) on the session. Table
    * references inside the SQL resolve through the session's catalogs —
    * pair with [[graft.spark.GraftCatalog]] for fully-qualified graft
    * tables. */
  def toDataFrame(spark: SparkSession): DataFrame = {
    val rep = sqlFor("spark").orElse(
      if (currentVersion.representations.size == 1) currentVersion.representations.headOption
      else None).getOrElse(throw new IllegalArgumentException(
        s"View $name has no spark-dialect representation " +
          s"(available: ${currentVersion.representations.map(_.dialect).mkString(", ")})"))
    spark.sql(rep.sql)
  }
}

/** view-metadata.json serde, spec field names exactly (the same JSON the
  * reference's pydantic model emits). */
object ViewMetadataJson {
  private val mapper = new ObjectMapper()

  def toJson(m: ViewMetadata): String = {
    val root = mapper.createObjectNode()
    root.put("view-uuid", m.viewUuid)
    root.put("format-version", m.formatVersion)
    root.put("location", m.location)
    val schemas = root.putArray("schemas")
    m.schemas.foreach(s => schemas.add(MetadataJson.schemaToJson(s)))
    root.put("current-version-id", m.currentVersionId)
    val versions = root.putArray("versions")
    m.versions.foreach { v =>
      val n = versions.addObject()
      n.put("version-id", v.versionId)
      n.put("schema-id", v.schemaId)
      n.put("timestamp-ms", v.timestampMs)
      val sum = n.putObject("summary")
      v.summary.foreach { case (k, value) => sum.put(k, value) }
      val reps = n.putArray("representations")
      v.representations.foreach { r =>
        val rn = reps.addObject()
        rn.put("type", "sql")
        rn.put("sql", r.sql)
        rn.put("dialect", r.dialect)
      }
      v.defaultCatalog.foreach(n.put("default-catalog", _))
      val ns = n.putArray("default-namespace")
      v.defaultNamespace.foreach(ns.add)
    }
    val log = root.putArray("version-log")
    m.versionLog.foreach { e =>
      val n = log.addObject()
      n.put("timestamp-ms", e.timestampMs)
      n.put("version-id", e.versionId)
    }
    val props = root.putObject("properties")
    m.properties.foreach { case (k, v) => props.put(k, v) }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromJson(json: String): ViewMetadata = {
    import scala.jdk.CollectionConverters._
    val root = mapper.readTree(json)
    def strMap(n: JsonNode): Map[String, String] =
      if (n == null) Map.empty
      else n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    def arr(n: JsonNode): Seq[JsonNode] =
      if (n == null) Nil else n.elements().asScala.toSeq
    ViewMetadata(
      viewUuid = root.get("view-uuid").asText(),
      formatVersion = root.get("format-version").asInt(),
      location = root.get("location").asText(),
      schemas = arr(root.get("schemas")).map(MetadataJson.schemaFromJson),
      currentVersionId = root.get("current-version-id").asInt(),
      versions = arr(root.get("versions")).map { n =>
        ViewVersion(
          versionId = n.get("version-id").asInt(),
          schemaId = n.get("schema-id").asInt(),
          timestampMs = n.get("timestamp-ms").asLong(),
          summary = strMap(n.get("summary")),
          representations = arr(n.get("representations")).flatMap { r =>
            // unknown representation types are skipped, not fatal (the
            // spec allows engines to add non-sql representations)
            if (r.get("type").asText() == "sql")
              Some(SqlViewRepresentation(r.get("sql").asText(), r.get("dialect").asText()))
            else None
          },
          defaultCatalog = Option(n.get("default-catalog")).map(_.asText()),
          defaultNamespace = arr(n.get("default-namespace")).map(_.asText()))
      },
      versionLog = arr(root.get("version-log")).map(n =>
        ViewHistoryEntry(n.get("timestamp-ms").asLong(), n.get("version-id").asInt())),
      properties = strMap(root.get("properties")))
  }
}
