package graft.catalog

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.core.Schema
import graft.meta.PartitionSpec
import graft.meta.{Io, MetadataJson, SortOrder, TableMetadata}
import graft.table.IceTable
import graft.view.{SqlViewRepresentation, View, ViewMetadata, ViewMetadataJson, ViewVersion}
import org.apache.spark.sql.SparkSession

/** Iceberg REST catalog CLIENT (ref: pyiceberg/catalog/rest/__init__.py:412
  * RestCatalog — the reference's primary catalog backend).
  *
  * Speaks the public REST catalog OpenAPI protocol over JDK HttpClient:
  * `GET /v1/config` at startup (defaults ++ client props ++ overrides,
  * ref :707 `_fetch_config`), namespace/table/view CRUD, and
  * requirement-guarded commits. Our engine produces full
  * [[TableMetadata]] trees rather than accumulated update lists, so
  * [[Catalog.commit]] is bridged onto the wire protocol by DIFFING the
  * base metadata against the target ([[RestUpdates.diff]]) and sending
  * the spec's `CommitTableRequest {identifier, requirements, updates}` —
  * byte-compatible with what the reference's Transaction emits for the
  * same logical change. A 409 maps to [[CommitConflictException]], which
  * the engine's commit-retry loop handles exactly like the other
  * catalogs' CAS losses.
  *
  * Auth: static bearer (`token` property) or OAuth2 client-credentials
  * (`credential` = "id:secret" — POSTs the spec's `/v1/oauth/tokens`
  * form, ref :603). Versioning: REST has no integer table version, so
  * the client keeps a monotonic per-name counter aligned with the
  * server's metadata-location (the engine only compares versions for
  * optimistic CAS staleness).
  */
class RestCatalog(
    val uri: String,
    val spark: SparkSession,
    props: Map[String, String] = Map.empty) extends Catalog {

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()

  /** OAuth2 token lifecycle: client-credentials tokens carry `expires_in`
    * — a long-lived catalog plugin must re-run the exchange near expiry
    * (proactively) and on a 401 (reactively), like the reference's auth
    * managers (rest/auth.py OAuth2AuthManager) — a constructor-cached
    * token would fail permanently once it expires. Static `token` props
    * never refresh. */
  private object auth {
    private val credential: Option[(String, String)] = props.get("credential").map { cred =>
      require(cred.contains(":"),
        s"'credential' must be 'client-id:client-secret' (got a bare value)")
      val Array(id, secret) = cred.split(":", 2)
      (id, secret)
    }
    @volatile private var current: Option[String] = None
    @volatile private var expiresAtMs: Long = 0L

    private def fetch(): Unit = credential.foreach { case (id, secret) =>
      val form = s"grant_type=client_credentials&client_id=${enc(id)}" +
        s"&client_secret=${enc(secret)}&scope=catalog"
      val resp = rawRequest("POST", s"$uri/v1/oauth/tokens", Some(form),
        contentType = "application/x-www-form-urlencoded", auth = None)
      if (resp.statusCode() != 200)
        throw new IllegalStateException(s"OAuth token fetch failed: ${resp.body()}")
      val n = mapper.readTree(resp.body())
      current = Some(n.get("access_token").asText())
      // refresh 30s before the server-side expiry; no expires_in => static
      expiresAtMs = Option(n.get("expires_in")).filterNot(_.isNull)
        .map(e => System.currentTimeMillis() + (e.asLong() - 30L).max(1L) * 1000L)
        .getOrElse(Long.MaxValue)
    }

    def token: Option[String] = {
      if (credential.isDefined &&
          (current.isEmpty || System.currentTimeMillis() >= expiresAtMs))
        synchronized {
          if (current.isEmpty || System.currentTimeMillis() >= expiresAtMs) fetch()
        }
      current.orElse(props.get("token"))
    }

    /** Force a re-exchange on the next request (called after a 401). */
    def invalidate(): Unit = { current = None; expiresAtMs = 0L }
    def canRefresh: Boolean = credential.isDefined
  }

  private def token: Option[String] = auth.token

  /** Pluggable managers (ref rest/__init__.py:444): `auth.type` names a
    * registered manager (noop | basic | an extension), `custom` requires
    * `auth.impl` (class path), per-type config rides `auth.<type>.*`.
    * oauth2/legacyoauth2 — and no `auth.type` at all — keep the built-in
    * token lifecycle above. */
  private val authManager: Option[RestAuthManager] = props.get("auth.type").flatMap {
    case "oauth2" | "legacyoauth2" => None
    case tpe =>
      val cfgPrefix = s"auth.$tpe."
      val cfg = props.collect {
        case (k, v) if k.startsWith(cfgPrefix) => k.drop(cfgPrefix.length) -> v
      }
      val implName =
        if (tpe == "custom") props.getOrElse("auth.impl",
          throw new IllegalArgumentException(
            "auth.impl must be specified when using custom auth.type"))
        else {
          require(!props.contains("auth.impl"),
            "auth.impl can only be specified when using custom auth.type")
          tpe
        }
      Some(RestAuthManagers.create(implName, cfg))
  }

  /** The Authorization header value for the next request. */
  private def authHeaderValue: Option[String] = authManager match {
    case Some(m) => m.authHeader()
    case None => token.map("Bearer " + _)
  }

  private def authRefreshable: Boolean =
    authManager.map(_.canRefresh).getOrElse(auth.canRefresh)

  private def authInvalidate(): Unit = authManager match {
    case Some(m) => m.invalidate()
    case None => auth.invalidate()
  }

  // config handshake: defaults ++ client props ++ overrides (ref :707)
  private val config: Map[String, String] = {
    val q = props.get("warehouse").map(w => s"?warehouse=${enc(w)}").getOrElse("")
    val resp = rawRequest("GET", s"$uri/v1/config$q", None, auth = authHeaderValue)
    if (resp.statusCode() != 200)
      throw new IllegalStateException(s"REST config fetch failed: ${resp.body()}")
    val n = mapper.readTree(resp.body())
    strMap(n.get("defaults")) ++ props ++ strMap(n.get("overrides"))
  }

  private val prefix: String = config.getOrElse("prefix", "")
  val warehouse: String = config.getOrElse("warehouse",
    throw new IllegalStateException("REST catalog returned no warehouse location"))

  // metadata IO for table locations under this warehouse
  Io.register(warehouse, () => spark.sessionState.newHadoopConf())

  /** Client-side table state: (version counter, server metadata-location,
    * server-applied metadata) — the diff base for the next commit. */
  private final case class Cached(version: Int, metadataLocation: String,
      metadata: TableMetadata)
  private val cache = new ConcurrentHashMap[String, Cached]()

  // ---- HTTP --------------------------------------------------------------

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")

  /** Namespace wire form: parts joined by 0x1F, URL-encoded as ONE path
    * segment (ref :697 `_encode_namespace_path`). */
  private def nsSeg(ns: String): String = {
    require(ns.nonEmpty, "REST catalog identifiers need a namespace (use ns.table)")
    enc(ns.split('.').mkString("\u001f"))
  }

  private def url(path: String): String = {
    val p = if (prefix.nonEmpty) s"${enc(prefix)}/" else ""
    s"$uri/v1/$p$path"
  }

  private def rawRequest(method: String, fullUrl: String, body: Option[String],
      contentType: String = "application/json",
      auth: Option[String]): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(fullUrl))
    auth.foreach(h => b.header("Authorization", h))
    val withBody = method match {
      case "GET" => b.GET()
      case "HEAD" => b.method("HEAD", HttpRequest.BodyPublishers.noBody())
      case "DELETE" => b.DELETE()
      case "POST" => b.header("Content-Type", contentType)
        .POST(HttpRequest.BodyPublishers.ofString(body.getOrElse("")))
      case other => throw new IllegalArgumentException(s"Unsupported method $other")
    }
    http.send(withBody.build(), HttpResponse.BodyHandlers.ofString())
  }

  /** Issue a request; non-2xx raises with the server's error payload
    * (ref: response.py `_handle_non_200_response`). */
  private def request(method: String, path: String, body: Option[JsonNode] = None,
      query: String = ""): JsonNode = {
    var resp = rawRequest(method, url(path) + query,
      body.map(mapper.writeValueAsString), auth = authHeaderValue)
    // expired/revoked credentials: invalidate + retry once
    if (resp.statusCode() == 401 && authRefreshable) {
      authInvalidate()
      resp = rawRequest(method, url(path) + query,
        body.map(mapper.writeValueAsString), auth = authHeaderValue)
    }
    val code = resp.statusCode()
    if (code >= 200 && code < 300) {
      if (resp.body() == null || resp.body().isEmpty) mapper.createObjectNode()
      else mapper.readTree(resp.body())
    } else {
      val (msg, tpe) =
        try {
          val err = mapper.readTree(resp.body()).get("error")
          (err.get("message").asText(), err.get("type").asText())
        } catch { case _: Exception => (s"HTTP $code", "RESTError") }
      code match {
        case 404 => throw new NoSuchElementException(s"$tpe: $msg")
        case 409 => throw new IllegalStateException(s"$tpe: $msg")
        case _ => throw new RuntimeException(s"$tpe (HTTP $code): $msg")
      }
    }
  }

  private def exists(path: String): Boolean =
    rawRequest("HEAD", url(path), None, auth = authHeaderValue).statusCode() < 300

  private def split(name: String): (String, String) = {
    val i = name.lastIndexOf('.')
    if (i < 0) ("", name) else (name.take(i), name.drop(i + 1))
  }

  private def tablePath(name: String): String = {
    val (ns, t) = split(name)
    s"namespaces/${nsSeg(ns)}/tables/${enc(t)}"
  }

  private def identifierNode(name: String): ObjectNode = {
    val (ns, t) = split(name)
    val n = mapper.createObjectNode()
    val a = n.putArray("namespace"); ns.split('.').filter(_.nonEmpty).foreach(a.add)
    n.put("name", t)
    n
  }

  private def strMap(p: JsonNode): Map[String, String] =
    if (p == null) Map.empty
    else p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap

  // ---- tables ------------------------------------------------------------

  /** Record a LoadTableResult in the client cache, bumping the version
    * counter only when the server's metadata-location moved. */
  private def absorb(name: String, resp: JsonNode): Cached = {
    val loc = resp.get("metadata-location").asText()
    val meta = MetadataJson.fromJson(mapper.writeValueAsString(resp.get("metadata")))
    cache.compute(name, (_, old) => {
      if (old != null && old.metadataLocation == loc) old
      else Cached(if (old == null) 1 else old.version + 1, loc, meta)
    })
  }

  def createTable(name: String, schema: Schema,
      spec: PartitionSpec = PartitionSpec.Unpartitioned,
      properties: Map[String, String] = Map.empty): IceTable = {
    val (ns, t) = split(name)
    val body = mapper.createObjectNode()
    body.put("name", t)
    body.set[JsonNode]("schema", MetadataJson.schemaToJson(schema))
    body.set[JsonNode]("partition-spec", MetadataJson.specToJson(spec))
    body.set[JsonNode]("write-order", MetadataJson.sortOrderToJson(SortOrder(0, Nil)))
    body.put("stage-create", false)
    val p = body.putObject("properties")
    properties.foreach { case (k, v) => p.put(k, v) }
    val resp = request("POST", s"namespaces/${nsSeg(ns)}/tables", Some(body))
    val c = absorb(name, resp)
    new IceTable(this, name, c.metadata, c.version)
  }

  def loadTable(name: String): IceTable = {
    val resp =
      try request("GET", tablePath(name))
      catch { case e: NoSuchElementException =>
        throw new IllegalArgumentException(s"Table $name not found", e) }
    val c = absorb(name, resp)
    new IceTable(this, name, c.metadata, c.version)
  }

  def dropTable(name: String): Unit = {
    request("DELETE", tablePath(name))
    cache.remove(name)
  }

  /** REST purge delegates physical deletion to the SERVER
    * (`purgeRequested=true`, ref :1096 — the service owns the data it
    * purges and only removes paths under the table location, so the
    * client cannot honor a request to also delete externally-registered
    * add_files paths — that must fail loudly, not silently keep them). */
  override def purgeTable(name: String, deleteExternalFiles: Boolean = false): Unit = {
    if (deleteExternalFiles) throw new UnsupportedOperationException(
      "REST purge is server-side and scoped to the table location; " +
        "externally-registered files are never deleted through this catalog")
    request("DELETE", tablePath(name), query = "?purgeRequested=true")
    cache.remove(name)
  }

  def tableExists(name: String): Boolean = exists(tablePath(name))

  def currentVersion(name: String): Option[Int] =
    // one GET, 404 → None (a HEAD-then-GET pair would race a concurrent drop)
    try Some(absorb(name, request("GET", tablePath(name))).version)
    catch { case _: NoSuchElementException => None }

  def commit(name: String, expectedVersion: Int, meta: TableMetadata): Int = {
    val base: Option[Cached] =
      if (expectedVersion == 0) None
      else {
        val c = Option(cache.get(name)).getOrElse {
          val resp = request("GET", tablePath(name))
          absorb(name, resp)
        }
        // stale local version: the engine must refresh and re-derive
        if (c.version != expectedVersion) throw new CommitConflictException(name, expectedVersion + 1)
        Some(c)
      }
    val baseMeta = base.map(_.metadata)
    val body = mapper.createObjectNode()
    body.set[JsonNode]("identifier", identifierNode(name))
    val reqArr = body.putArray("requirements")
    RestUpdates.requirements(baseMeta, meta)
      .foreach(r => reqArr.add(RestUpdates.requirementToJson(r)))
    val upArr = body.putArray("updates")
    RestUpdates.diff(baseMeta, meta).foreach(u => upArr.add(RestUpdates.updateToJson(u)))
    val resp =
      try request("POST", tablePath(name), Some(body))
      catch {
        case _: IllegalStateException => // 409
          cache.remove(name) // force a fresh GET on the retry's refresh
          throw new CommitConflictException(name, expectedVersion + 1)
      }
    absorb(name, resp).version
  }

  override def registerTable(name: String, metadataPath: String): IceTable = {
    val (ns, t) = split(name)
    val body = mapper.createObjectNode()
    body.put("name", t)
    body.put("metadata-location", metadataPath)
    val resp = request("POST", s"namespaces/${nsSeg(ns)}/register", Some(body))
    val c = absorb(name, resp)
    new IceTable(this, name, c.metadata, c.version)
  }

  override def renameTable(from: String, to: String): Unit = {
    val body = mapper.createObjectNode()
    body.set[JsonNode]("source", identifierNode(from))
    body.set[JsonNode]("destination", identifierNode(to))
    request("POST", "tables/rename", Some(body))
    cache.remove(from)
  }

  protected def forgetTable(name: String): Unit = cache.remove(name)

  // ---- server-side scan planning ----------------------------------------

  /** `scan-planning-mode=server` delegates manifest pruning to the catalog
    * service (ref rest/__init__.py:265 SCAN_PLANNING_MODE; default client —
    * matching the reference's ScanPlanningMode.CLIENT default). */
  def serverSidePlanning: Boolean =
    config.get("scan-planning-mode").exists(_.equalsIgnoreCase("server"))

  /** Plan a scan on the server (ref rest/__init__.py:502 `_plan_table_scan`
    * + :528 `_fetch_scan_tasks`, paging through plan-task tokens). Returns
    * the engine's FileScanTasks — delete files resolved by reference index,
    * residuals re-bound against the scan schema. */
  def planScan(name: String, filter: graft.core.Expr = graft.core.AlwaysTrue,
      snapshotId: Option[Long] = None,
      caseSensitive: Boolean = true): Seq[graft.table.FileScanTask] = {
    // a pinned snapshot MUST resolve (refresh once in case the cache is
    // stale; then fail like the local path's "No snapshot $id" — binding
    // residuals against the wrong schema would mis-filter silently).
    // An UNPINNED scan refreshes unconditionally: the server plans ITS
    // current snapshot, so planning from a stale cached handle would bind
    // residuals/specById against older metadata than the data served. A
    // commit in the remaining load→plan window is caught below via the
    // unknown-spec-id rebind.
    val meta = snapshotId match {
      case Some(id) =>
        val cached = Option(cache.get(name)).map(_.metadata)
          .getOrElse(loadTable(name).metadata)
        if (cached.snapshotById(id).isEmpty) loadTable(name).metadata else cached
      case None => loadTable(name).metadata
    }
    val schema = snapshotId match {
      case Some(id) => meta.snapshotById(id)
        .map(s => meta.schemaById(s.schemaId))
        .getOrElse(throw new IllegalArgumentException(s"No snapshot $id"))
      case None => meta.schema
    }
    val body = mapper.createObjectNode()
    snapshotId.foreach(body.put("snapshot-id", _))
    if (filter != graft.core.AlwaysTrue)
      body.set[JsonNode]("filter", RestScanJson.exprToJson(filter))
    body.put("case-sensitive", caseSensitive)
    // spec resolver that survives the load→plan race: a partition-evolution
    // commit in the window makes the response reference a spec id the
    // cached metadata doesn't know — refresh once and re-resolve instead
    // of failing the scan
    lazy val refreshed = loadTable(name).metadata
    val specById: Int => graft.meta.PartitionSpec = id =>
      try meta.specById(id) catch { case _: IllegalStateException => refreshed.specById(id) }
    val resp = request("POST", s"${tablePath(name)}/plan", Some(body))
    resp.get("status").asText() match {
      case "completed" =>
        val inline = RestScanJson.tasksFromJson(resp, schema, specById, caseSensitive)
        val pages = Option(resp.get("plan-tasks"))
          .map(_.elements().asScala.toSeq.map(_.asText())).getOrElse(Nil)
        inline ++ pages.flatMap { tok =>
          val b = mapper.createObjectNode(); b.put("plan-task", tok)
          RestScanJson.tasksFromJson(
            request("POST", s"${tablePath(name)}/tasks", Some(b)),
            schema, specById, caseSensitive)
        }
      case "cancelled" => throw new IllegalStateException("Scan planning was cancelled")
      case other => throw new IllegalStateException(s"Scan planning $other: " +
        Option(resp.get("error")).map(_.toString).getOrElse(""))
    }
  }

  // ---- namespaces --------------------------------------------------------

  def createNamespace(ns: String): Unit = {
    val body = mapper.createObjectNode()
    val a = body.putArray("namespace"); ns.split('.').foreach(a.add)
    body.putObject("properties")
    request("POST", "namespaces", Some(body))
  }

  def dropNamespace(ns: String): Unit = request("DELETE", s"namespaces/${nsSeg(ns)}")

  def listNamespaces(): Seq[String] = {
    val resp = request("GET", "namespaces")
    resp.get("namespaces").elements().asScala.toSeq
      .map(_.elements().asScala.map(_.asText()).mkString("."))
  }

  def listTables(ns: String = ""): Seq[String] = {
    val resp = request("GET", s"namespaces/${nsSeg(ns)}/tables")
    resp.get("identifiers").elements().asScala.toSeq.map { id =>
      val parts = id.get("namespace").elements().asScala.map(_.asText()).toSeq
      (parts :+ id.get("name").asText()).mkString(".")
    }
  }

  /** Namespace properties over the protocol's endpoints (ref
    * load_namespace_metadata + update_namespace_properties). */
  def namespaceProperties(ns: String): Map[String, String] =
    strMap(request("GET", s"namespaces/${nsSeg(ns)}").get("properties"))

  override def loadNamespaceProperties(ns: String): Map[String, String] =
    namespaceProperties(ns)

  override def updateNamespaceProperties(ns: String, updates: Map[String, String],
      removals: Set[String] = Set.empty): Unit = {
    val body = mapper.createObjectNode()
    val rm = body.putArray("removals"); removals.foreach(rm.add)
    val up = body.putObject("updates"); updates.foreach { case (k, v) => up.put(k, v) }
    request("POST", s"namespaces/${nsSeg(ns)}/properties", Some(body))
  }

  // ---- views -------------------------------------------------------------

  private def viewPath(name: String): String = {
    val (ns, v) = split(name)
    s"namespaces/${nsSeg(ns)}/views/${enc(v)}"
  }

  protected def viewLocation(name: String): Option[String] =
    if (!exists(viewPath(name))) None
    else Some(request("GET", viewPath(name)).get("metadata-location").asText())

  /** Unused: create/replace go through the REST view endpoints below. */
  protected def storeView(name: String, version: Int, expected: Option[String],
      json: String, location: String): String =
    throw new UnsupportedOperationException(
      "RestCatalog views commit through the REST protocol")

  protected def linkView(name: String, metadataLocation: String): Unit = {
    val (ns, v) = split(name)
    val body = mapper.createObjectNode()
    body.put("name", v)
    body.put("metadata-location", metadataLocation)
    request("POST", s"namespaces/${nsSeg(ns)}/register-view", Some(body))
  }

  protected def forgetView(name: String): Unit = request("DELETE", viewPath(name))

  def listViews(ns: String = ""): Seq[String] = {
    val resp = request("GET", s"namespaces/${nsSeg(ns)}/views")
    resp.get("identifiers").elements().asScala.toSeq.map { id =>
      val parts = id.get("namespace").elements().asScala.map(_.asText()).toSeq
      (parts :+ id.get("name").asText()).mkString(".")
    }
  }

  override def loadView(name: String): View = {
    val resp =
      try request("GET", viewPath(name))
      catch { case e: NoSuchElementException =>
        throw new IllegalArgumentException(s"View $name not found", e) }
    new View(name,
      ViewMetadataJson.fromJson(mapper.writeValueAsString(resp.get("metadata"))),
      resp.get("metadata-location").asText())
  }

  private def viewVersionNode(v: ViewVersion): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("version-id", v.versionId)
    n.put("schema-id", v.schemaId)
    n.put("timestamp-ms", v.timestampMs)
    val sum = n.putObject("summary"); v.summary.foreach { case (k, s) => sum.put(k, s) }
    val reps = n.putArray("representations")
    v.representations.foreach { r =>
      val rn = reps.addObject()
      rn.put("type", "sql"); rn.put("sql", r.sql); rn.put("dialect", r.dialect)
    }
    v.defaultCatalog.foreach(n.put("default-catalog", _))
    val ns = n.putArray("default-namespace"); v.defaultNamespace.foreach(ns.add)
    n
  }

  /** ref create_view rest/__init__.py:972 — the SERVER builds the view
    * metadata from a CreateViewRequest. */
  override def createView(name: String, schema: Schema, sql: String,
      dialect: String = "spark",
      properties: Map[String, String] = Map.empty): View = {
    val (ns, v) = split(name)
    val version = ViewVersion(
      versionId = 1, schemaId = schema.schemaId,
      timestampMs = System.currentTimeMillis(),
      summary = Map("engine-name" -> "graft", "operation" -> "create"),
      representations = Seq(SqlViewRepresentation(sql, dialect)),
      defaultNamespace = ns.split('.').filter(_.nonEmpty).toSeq)
    val body = mapper.createObjectNode()
    body.put("name", v)
    body.set[JsonNode]("schema", MetadataJson.schemaToJson(schema))
    body.set[JsonNode]("view-version", viewVersionNode(version))
    val p = body.putObject("properties")
    properties.foreach { case (k, value) => p.put(k, value) }
    val resp = request("POST", s"namespaces/${nsSeg(ns)}/views", Some(body))
    new View(name,
      ViewMetadataJson.fromJson(mapper.writeValueAsString(resp.get("metadata"))),
      resp.get("metadata-location").asText())
  }

  /** CREATE OR REPLACE over the spec's UpdateViewRequest: add-schema +
    * add-view-version + set-current-view-version. */
  override def replaceView(name: String, schema: Schema, sql: String,
      dialect: String = "spark"): View = {
    val old = loadView(name)
    val newSchemaId = old.metadata.schemas.map(_.schemaId).max + 1
    val newVersionId = old.metadata.versions.map(_.versionId).max + 1
    val (ns, _) = split(name)
    val version = ViewVersion(
      versionId = newVersionId, schemaId = newSchemaId,
      timestampMs = System.currentTimeMillis(),
      summary = Map("engine-name" -> "graft", "operation" -> "replace"),
      representations = Seq(SqlViewRepresentation(sql, dialect)),
      defaultNamespace = ns.split('.').filter(_.nonEmpty).toSeq)
    val body = mapper.createObjectNode()
    body.set[JsonNode]("identifier", identifierNode(name))
    body.putArray("requirements")
    val ups = body.putArray("updates")
    val addSchema = ups.addObject()
    addSchema.put("action", "add-schema")
    addSchema.set[JsonNode]("schema",
      MetadataJson.schemaToJson(Schema(schema.fields, newSchemaId, schema.identifierFieldIds)))
    val addVersion = ups.addObject()
    addVersion.put("action", "add-view-version")
    addVersion.set[JsonNode]("view-version", viewVersionNode(version))
    val setCurrent = ups.addObject()
    setCurrent.put("action", "set-current-view-version")
    setCurrent.put("view-version-id", -1)
    val resp = request("POST", viewPath(name), Some(body))
    new View(name,
      ViewMetadataJson.fromJson(mapper.writeValueAsString(resp.get("metadata"))),
      resp.get("metadata-location").asText())
  }
}
