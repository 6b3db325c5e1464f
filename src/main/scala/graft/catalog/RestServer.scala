package graft.catalog

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.core.Schema
import graft.meta.{Io, MetadataCache, MetadataJson, TableMetadata}
import graft.view.{SqlViewRepresentation, ViewHistoryEntry, ViewMetadata, ViewMetadataJson, ViewVersion}

/** In-process Iceberg REST catalog server, bound to 127.0.0.1 only.
  *
  * Speaks the public REST catalog OpenAPI surface the reference client
  * drives (ref: pyiceberg/catalog/rest/__init__.py:138 Endpoints — config,
  * oauth/tokens, namespace CRUD + properties, table CRUD + commit +
  * register + rename, view CRUD + commit + register-view). Commits are
  * requirement-checked update lists applied under a per-table lock
  * ([[RestUpdates.applyUpdates]]); metadata JSON files are written through
  * [[Io]] under each table's location, exactly like a standalone REST
  * catalog service in front of an object store.
  *
  * This is a real catalog implementation (useful as a shared metastore
  * for many engines on one host), and the loopback test double for
  * [[RestCatalog]] — the sandbox has no egress, so every e2e test runs
  * client and server in one JVM over 127.0.0.1.
  */
final class RestCatalogServer(
    val warehouse: String,
    token: Option[String] = None,
    /** HTTP Basic mode: when set, every route (there is no token
      * endpoint to exempt) requires `Basic base64(user:password)` — the
      * server face of the client's `auth.type = basic` manager. */
    basic: Option[(String, String)] = None,
    /** OAuth2 client credentials ("id:secret") allowed to EXCHANGE for
      * the bearer via /v1/oauth/tokens. Without this, the token endpoint
      * refuses when a bearer is configured — otherwise any caller could
      * fetch the real token with made-up credentials and the bearer
      * check would be decorative. */
    credential: Option[String] = None,
    prefix: String = "graft",
    /** Token lifetime advertised in exchange responses; short values let
      * tests exercise the client's proactive refresh. */
    tokenExpiresInSec: Int = 3600,
    /** Max file-scan-tasks inlined in one plan response; larger plans
      * paginate through `plan-tasks` tokens + the fetch-tasks endpoint
      * (ref scan_planning.py ScanTasks.plan_tasks) so a 10⁶-file plan
      * never materializes as one HTTP body. */
    planPageSize: Int = 1000,
    /** Durable mode: every catalog mutation also writes a pointer file
      * under `<warehouse>/_rest_catalog/`, and construction replays them
      * — a restarted service resumes serving the same tables (the
      * metadata/manifest/data files were always on shared storage; only
      * the POINTERS need recovering). Off by default for tests. */
    persist: Boolean = false) {

  private val mapper = new ObjectMapper()
  private final case class TableState(version: Int, metadataLocation: String,
      metadata: TableMetadata)
  private final case class ViewState(metadataLocation: String, metadata: ViewMetadata)

  private val tables = new ConcurrentHashMap[String, TableState]()
  private val views = new ConcurrentHashMap[String, ViewState]()

  /** Per-table-name monitors. Every structural or committing op on a table
    * name runs under its monitor; rename takes BOTH names in sorted order
    * (deadlock-free) so a commit to the source can neither be discarded by
    * the move nor land while the table is visible under two names. Commits
    * to different tables still run in parallel. */
  private val nameLocks = new ConcurrentHashMap[String, Object]()
  private def withTableLock[A](name: String)(f: => A): A =
    nameLocks.computeIfAbsent(name, _ => new Object).synchronized(f)
  private def withTableLocks[A](a: String, b: String)(f: => A): A = {
    val (l1, l2) = if (a <= b) (a, b) else (b, a)
    withTableLock(l1)(withTableLock(l2)(f))
  }
  private val namespaces = new ConcurrentHashMap[String, Map[String, String]]()
  /** Outstanding plan-task pages, keyed by opaque token. Bounded: tokens
    * are single-use (dropped when fetched), and abandoned plans — a
    * client that crashed mid-pagination — are evicted oldest-first past
    * [[maxPlanPages]] so a long-lived service can't leak page buffers. */
  private val planPages = new ConcurrentHashMap[String, ObjectNode]()
  private val planPageOrder = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val maxPlanPages = 256

  private def storePlanPage(tok: String, page: ObjectNode): Unit = {
    planPages.put(tok, page)
    planPageOrder.add(tok)
    while (planPages.size > maxPlanPages) {
      val oldest = planPageOrder.poll()
      if (oldest == null) return
      planPages.remove(oldest)
    }
  }

  // ---- durable pointers --------------------------------------------------

  private def pointerDir = s"$warehouse/_rest_catalog"

  private def persistTable(name: String, st: TableState): Unit = if (persist) {
    val n = mapper.createObjectNode()
    n.put("metadata-location", st.metadataLocation)
    n.put("version", st.version)
    Io.writeBytes(s"$pointerDir/$name.table.json",
      mapper.writeValueAsString(n).getBytes(UTF_8))
  }
  private def persistView(name: String, st: ViewState): Unit = if (persist) {
    val n = mapper.createObjectNode()
    n.put("metadata-location", st.metadataLocation)
    Io.writeBytes(s"$pointerDir/$name.view.json",
      mapper.writeValueAsString(n).getBytes(UTF_8))
  }
  private def persistNamespaces(): Unit = if (persist) {
    val n = mapper.createObjectNode()
    namespaces.asScala.foreach { case (ns, props) =>
      val p = n.putObject(ns); props.foreach { case (k, v) => p.put(k, v) }
    }
    Io.writeBytes(s"$pointerDir/_namespaces.json",
      mapper.writeValueAsString(n).getBytes(UTF_8))
  }
  private def dropPointer(name: String, kind: String): Unit = if (persist) {
    try Io.delete(s"$pointerDir/$name.$kind.json") catch { case _: Exception => }
  }

  if (persist && Io.exists(pointerDir)) {
    Io.list(pointerDir).foreach {
      case (f, false) if f == "_namespaces.json" =>
        val n = mapper.readTree(new String(Io.readBytes(s"$pointerDir/$f"), UTF_8))
        val it = n.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          namespaces.put(e.getKey, {
            val b = Map.newBuilder[String, String]
            val pit = e.getValue.properties().iterator()
            while (pit.hasNext) { val p = pit.next(); b += p.getKey -> p.getValue.asText() }
            b.result()
          })
        }
      case (f, false) if f.endsWith(".table.json") =>
        val name = f.stripSuffix(".table.json")
        val n = mapper.readTree(new String(Io.readBytes(s"$pointerDir/$f"), UTF_8))
        val loc = n.get("metadata-location").asText()
        tables.put(name, TableState(n.get("version").asInt(), loc,
          MetadataCache.read(loc)))
      case (f, false) if f.endsWith(".view.json") =>
        val name = f.stripSuffix(".view.json")
        val n = mapper.readTree(new String(Io.readBytes(s"$pointerDir/$f"), UTF_8))
        val loc = n.get("metadata-location").asText()
        views.put(name, ViewState(loc,
          ViewMetadataJson.fromJson(new String(Io.readBytes(loc), UTF_8))))
      case _ =>
    }
  }

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(null) // synchronous dispatch; per-table locks serialize commits

  def start(): RestCatalogServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
  def port: Int = server.getAddress.getPort
  def uri: String = s"http://127.0.0.1:$port"

  // ---- HTTP plumbing -----------------------------------------------------

  private final class HttpError(val code: Int, val errType: String, msg: String)
      extends RuntimeException(msg)

  private def fail(code: Int, errType: String, msg: String): Nothing =
    throw new HttpError(code, errType, msg)

  private def handle(ex: HttpExchange): Unit = {
    try {
      val path = ex.getRequestURI.getPath
      val segs = path.split("/").filter(_.nonEmpty).toSeq
        .map(s => java.net.URLDecoder.decode(s, "UTF-8"))
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      if (segs.headOption != Some("v1")) fail(404, "NotFoundException", s"No route: $path")
      val route = segs.tail
      // auth: everything except the token endpoint requires the bearer
      // (or, in basic mode, every route requires the Basic credentials)
      val authHdr = Option(ex.getRequestHeaders.getFirst("Authorization"))
      basic match {
        case Some((u, pw)) =>
          val want = "Basic " + java.util.Base64.getEncoder
            .encodeToString(s"$u:$pw".getBytes(UTF_8))
          if (!authHdr.contains(want))
            fail(401, "NotAuthorizedException", "Missing or invalid basic credentials")
        case None => if (route != Seq("oauth", "tokens")) token.foreach { t =>
          if (!authHdr.contains(s"Bearer $t"))
            fail(401, "NotAuthorizedException", "Missing or invalid token")
        }
      }
      val method = ex.getRequestMethod
      val out: (Int, Option[JsonNode]) = route match {
        case Seq("config") => (200, Some(configResponse()))
        case Seq("oauth", "tokens") => (200, Some(tokenResponse(body)))
        case p if p.headOption == Some(prefix) => dispatch(method, p.tail, body, ex)
        case _ => fail(404, "NotFoundException", s"Unknown prefix in: $path")
      }
      respond(ex, out._1, out._2)
    } catch {
      case e: HttpError =>
        val n = mapper.createObjectNode()
        val err = n.putObject("error")
        err.put("message", e.getMessage); err.put("type", e.errType); err.put("code", e.code)
        respond(ex, e.code, Some(n))
      case e: Exception =>
        val n = mapper.createObjectNode()
        val err = n.putObject("error")
        err.put("message", String.valueOf(e.getMessage))
        err.put("type", "InternalServerError"); err.put("code", 500)
        respond(ex, 500, Some(n))
    } finally ex.close()
  }

  private def respond(ex: HttpExchange, code: Int, body: Option[JsonNode]): Unit = {
    val bytes = body.map(b => mapper.writeValueAsString(b).getBytes(UTF_8))
    // HEAD/204 responses carry no body
    if (ex.getRequestMethod == "HEAD" || bytes.isEmpty) {
      ex.sendResponseHeaders(if (bytes.isEmpty && code == 200) 204 else code, -1)
    } else {
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.get.length.toLong)
      ex.getResponseBody.write(bytes.get)
    }
  }

  private def configResponse(): ObjectNode = {
    val n = mapper.createObjectNode()
    val d = n.putObject("defaults"); d.put("warehouse", warehouse)
    val o = n.putObject("overrides"); o.put("prefix", prefix)
    n
  }

  /** Client-credentials exchange: the posted id:secret must match the
    * configured [[credential]] before the bearer is issued. */
  private def tokenResponse(formBody: String): ObjectNode = {
    val form = formBody.split("&").flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
        case _ => None
      }
    }.toMap
    if (token.isDefined) {
      val allowed = credential.getOrElse(
        fail(401, "NotAuthorizedException",
          "Token exchange is not enabled on this catalog"))
      val posted = s"${form.getOrElse("client_id", "")}:${form.getOrElse("client_secret", "")}"
      if (posted != allowed)
        fail(401, "NotAuthorizedException", "Invalid client credentials")
    }
    val n = mapper.createObjectNode()
    tokenExchanges.incrementAndGet()
    n.put("access_token", token.getOrElse("anonymous"))
    n.put("token_type", "bearer")
    n.put("expires_in", tokenExpiresInSec)
    n
  }

  /** Exchange counter (visible to tests asserting client refresh). */
  val tokenExchanges = new java.util.concurrent.atomic.AtomicLong(0L)

  // ---- routing -----------------------------------------------------------

  /** Namespace wire form: one path segment, parts joined by 0x1F
    * (ref: rest/__init__.py:275 DEFAULT_NAMESPACE_SEPARATOR). */
  private def nsOf(seg: String): String = seg.split('\u001f').mkString(".")

  private def dispatch(method: String, route: Seq[String], body: String,
      ex: HttpExchange): (Int, Option[JsonNode]) = route match {
    case Seq("namespaces") if method == "GET" => listNamespacesR()
    case Seq("namespaces") if method == "POST" => createNamespaceR(body)
    case Seq("namespaces", ns) if method == "GET" || method == "HEAD" => loadNamespaceR(nsOf(ns))
    case Seq("namespaces", ns) if method == "DELETE" => dropNamespaceR(nsOf(ns))
    case Seq("namespaces", ns, "properties") if method == "POST" =>
      updateNamespacePropsR(nsOf(ns), body)
    case Seq("namespaces", ns, "tables") if method == "GET" => listTablesR(nsOf(ns))
    case Seq("namespaces", ns, "tables") if method == "POST" => createTableR(nsOf(ns), body)
    case Seq("namespaces", ns, "register") if method == "POST" => registerTableR(nsOf(ns), body)
    case Seq("namespaces", ns, "tables", t, "plan") if method == "POST" =>
      planTableR(fullName(nsOf(ns), t), body)
    case Seq("namespaces", ns, "tables", t, "tasks") if method == "POST" =>
      fetchTasksR(body)
    case Seq("namespaces", ns, "tables", t) if method == "GET" || method == "HEAD" =>
      loadTableR(fullName(nsOf(ns), t))
    case Seq("namespaces", ns, "tables", t) if method == "POST" =>
      commitTableR(fullName(nsOf(ns), t), body)
    case Seq("namespaces", ns, "tables", t) if method == "DELETE" =>
      dropTableR(fullName(nsOf(ns), t),
        Option(ex.getRequestURI.getQuery).exists(_.contains("purgeRequested=true")))
    case Seq("tables", "rename") if method == "POST" => renameTableR(body)
    case Seq("namespaces", ns, "views") if method == "GET" => listViewsR(nsOf(ns))
    case Seq("namespaces", ns, "views") if method == "POST" => createViewR(nsOf(ns), body)
    case Seq("namespaces", ns, "register-view") if method == "POST" =>
      registerViewR(nsOf(ns), body)
    case Seq("namespaces", ns, "views", v) if method == "GET" || method == "HEAD" =>
      loadViewR(fullName(nsOf(ns), v))
    case Seq("namespaces", ns, "views", v) if method == "POST" =>
      commitViewR(fullName(nsOf(ns), v), body)
    case Seq("namespaces", ns, "views", v) if method == "DELETE" =>
      dropViewR(fullName(nsOf(ns), v))
    case other => fail(404, "NotFoundException", s"No route: $method /${other.mkString("/")}")
  }

  private def fullName(ns: String, t: String): String = if (ns.isEmpty) t else s"$ns.$t"

  private def identifierNode(name: String): ObjectNode = {
    val parts = name.split('.')
    val n = mapper.createObjectNode()
    val nsArr = n.putArray("namespace"); parts.dropRight(1).foreach(nsArr.add)
    n.put("name", parts.last)
    n
  }

  // ---- namespaces --------------------------------------------------------

  private def listNamespacesR(): (Int, Option[JsonNode]) = {
    val n = mapper.createObjectNode()
    val arr = n.putArray("namespaces")
    namespaces.keySet().asScala.toSeq.sorted.foreach { ns =>
      val a = arr.addArray(); ns.split('.').foreach(a.add)
    }
    (200, Some(n))
  }

  private def createNamespaceR(body: String): (Int, Option[JsonNode]) = {
    val req = mapper.readTree(body)
    val ns = req.get("namespace").elements().asScala.map(_.asText()).mkString(".")
    val props = Option(req.get("properties")).map(strMap).getOrElse(Map.empty)
    if (namespaces.putIfAbsent(ns, props) != null)
      fail(409, "AlreadyExistsException", s"Namespace $ns already exists")
    persistNamespaces()
    val n = mapper.createObjectNode()
    val a = n.putArray("namespace"); ns.split('.').foreach(a.add)
    val p = n.putObject("properties"); props.foreach { case (k, v) => p.put(k, v) }
    (200, Some(n))
  }

  private def loadNamespaceR(ns: String): (Int, Option[JsonNode]) = {
    val props = Option(namespaces.get(ns)).getOrElse(
      fail(404, "NoSuchNamespaceException", s"Namespace $ns not found"))
    val n = mapper.createObjectNode()
    val a = n.putArray("namespace"); ns.split('.').foreach(a.add)
    val p = n.putObject("properties"); props.foreach { case (k, v) => p.put(k, v) }
    (200, Some(n))
  }

  private def dropNamespaceR(ns: String): (Int, Option[JsonNode]) = {
    if (!namespaces.containsKey(ns))
      fail(404, "NoSuchNamespaceException", s"Namespace $ns not found")
    val hasChildren = tables.keySet().asScala.exists(_.startsWith(ns + ".")) ||
      views.keySet().asScala.exists(_.startsWith(ns + "."))
    if (hasChildren) fail(409, "NamespaceNotEmptyException", s"Namespace $ns is not empty")
    namespaces.remove(ns)
    persistNamespaces()
    (204, None)
  }

  private def updateNamespacePropsR(ns: String, body: String): (Int, Option[JsonNode]) = {
    val cur = Option(namespaces.get(ns)).getOrElse(
      fail(404, "NoSuchNamespaceException", s"Namespace $ns not found"))
    val req = mapper.readTree(body)
    val removals = Option(req.get("removals"))
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
    val updates = Option(req.get("updates")).map(strMap).getOrElse(Map.empty)
    val missing = removals.filterNot(cur.contains)
    namespaces.put(ns, cur -- removals ++ updates)
    persistNamespaces()
    val n = mapper.createObjectNode()
    val rm = n.putArray("removed"); removals.filter(cur.contains).foreach(rm.add)
    val up = n.putArray("updated"); updates.keys.foreach(up.add)
    val ms = n.putArray("missing"); missing.foreach(ms.add)
    (200, Some(n))
  }

  // ---- tables ------------------------------------------------------------

  private def listTablesR(ns: String): (Int, Option[JsonNode]) = {
    val n = mapper.createObjectNode()
    val arr = n.putArray("identifiers")
    tables.keySet().asScala.toSeq.sorted
      .filter(t => t.take(t.lastIndexOf('.') max 0) == ns)
      .foreach(t => arr.add(identifierNode(t)))
    (200, Some(n))
  }

  private def loadTableResult(st: TableState): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("metadata-location", st.metadataLocation)
    n.set[JsonNode]("metadata", mapper.readTree(MetadataJson.toJson(st.metadata)))
    n.putObject("config")
    n
  }

  private def writeMetadataFile(name: String, version: Int, m: TableMetadata): String = {
    val path = s"${m.location}/metadata/rest-v$version-${UUID.randomUUID()}.metadata.json"
    Io.writeBytes(path, MetadataJson.toJson(m).getBytes(UTF_8))
    path
  }

  private def createTableR(ns: String, body: String): (Int, Option[JsonNode]) = {
    if (!namespaces.containsKey(ns))
      fail(404, "NoSuchNamespaceException", s"Namespace $ns not found")
    val req = mapper.readTree(body)
    val name = fullName(ns, req.get("name").asText())
    val schema = MetadataJson.schemaFromJson(req.get("schema"))
    val spec = Option(req.get("partition-spec")).filterNot(_.isNull)
      .map(MetadataJson.specFromJson).getOrElse(graft.meta.PartitionSpec.Unpartitioned)
    val order = Option(req.get("write-order")).filterNot(_.isNull)
      .map(MetadataJson.sortOrderFromJson).getOrElse(graft.meta.SortOrder(0, Nil))
    val props = Option(req.get("properties")).map(strMap).getOrElse(Map.empty)
    val stageCreate = Option(req.get("stage-create")).exists(_.asBoolean())
    val location = Option(req.get("location")).filterNot(_.isNull).map(_.asText())
      .getOrElse(s"$warehouse/${name.replace('.', '/')}")
    val fv = props.get("format-version").map(_.toInt).getOrElse(2)
    // mirror Catalog.applyFormatVersion: bound the version and reject user
    // columns shadowing the v3 lineage metadata names — a REST create must
    // not be a back door around the create/upgrade/evolution guard
    if (fv < 1 || fv > 3) fail(400, "ValidationException", s"Unsupported format version $fv")
    if (fv >= 3) try graft.core.RowLineage.requireNoReservedNames(schema) catch {
      case e: IllegalArgumentException => fail(400, "ValidationException", e.getMessage)
    }
    val meta = TableMetadata(
      formatVersion = fv,
      // v3 spec requires next-row-id from creation (row lineage starts at
      // 0), mirroring Catalog.applyFormatVersion — without it the
      // serialized metadata omits the field until the first append
      nextRowId = if (fv >= 3) Some(0L) else None,
      tableUuid = UUID.randomUUID().toString,
      location = location,
      lastUpdatedMs = System.currentTimeMillis(),
      lastColumnId = schema.highestFieldId,
      schemas = Seq(schema),
      currentSchemaId = schema.schemaId,
      partitionSpecs = Seq(spec),
      defaultSpecId = spec.specId,
      lastPartitionId = if (spec.fields.isEmpty) graft.meta.PartitionSpec.StartFieldId - 1
        else spec.fields.map(_.fieldId).max,
      sortOrders = Seq(order),
      defaultSortOrderId = order.orderId,
      properties = props - "format-version")
    if (stageCreate) {
      // staged: return the intended metadata without creating the entry
      // (the follow-up commit carries assert-create)
      val n = mapper.createObjectNode()
      n.set[JsonNode]("metadata", mapper.readTree(MetadataJson.toJson(meta)))
      n.putObject("config")
      return (200, Some(n))
    }
    val loc = writeMetadataFile(name, 1, meta)
    val st = TableState(1, loc, meta)
    withTableLock(name) {
      if (tables.putIfAbsent(name, st) != null)
        fail(409, "AlreadyExistsException", s"Table $name already exists")
      persistTable(name, st)
    }
    (200, Some(loadTableResult(st)))
  }

  private def loadTableR(name: String): (Int, Option[JsonNode]) = {
    val st = withTableLock(name)(Option(tables.get(name)).getOrElse(
      fail(404, "NoSuchTableException", s"Table $name not found")))
    (200, Some(loadTableResult(st)))
  }

  private def registerTableR(ns: String, body: String): (Int, Option[JsonNode]) = {
    val req = mapper.readTree(body)
    val name = fullName(ns, req.get("name").asText())
    val loc = req.get("metadata-location").asText()
    val meta = MetadataCache.read(loc)
    val st = TableState(1, loc, meta)
    withTableLock(name) {
      if (tables.putIfAbsent(name, st) != null)
        fail(409, "AlreadyExistsException", s"Table $name already exists")
      persistTable(name, st)
    }
    (200, Some(loadTableResult(st)))
  }

  private def commitTableR(name: String, body: String): (Int, Option[JsonNode]) = {
    val req = mapper.readTree(body)
    val reqs = Option(req.get("requirements"))
      .map(_.elements().asScala.toSeq.map(RestUpdates.requirementFromJson)).getOrElse(Nil)
    val updates = Option(req.get("updates"))
      .map(_.elements().asScala.toSeq.map(RestUpdates.updateFromJson)).getOrElse(Nil)
    var result: TableState = null
    // per-table atomicity: the name monitor serializes this commit against
    // renames (which hold both names' monitors) and other commits; the
    // compute() additionally holds the map's bin lock for this key
    withTableLock(name)(tables.compute(name, (_, cur) => {
      val base = Option(cur).map(_.metadata)
      reqs.foreach { r =>
        r.check(base).foreach(msg => fail(409, "CommitFailedException", msg))
      }
      if (base.isEmpty && !reqs.contains(TableRequirement.AssertCreate))
        fail(404, "NoSuchTableException", s"Table $name not found")
      val applied =
        try RestUpdates.applyUpdates(base, updates, System.currentTimeMillis())
        catch { case e: IllegalArgumentException =>
          fail(409, "CommitFailedException", String.valueOf(e.getMessage)) }
      // server-maintained metadata log: append the previous location
      val withLog = Option(cur) match {
        case Some(c) => applied.copy(metadataLog = applied.metadataLog :+
          graft.meta.MetadataLogEntry(c.metadata.lastUpdatedMs, c.metadataLocation))
        case None => applied
      }
      val version = Option(cur).map(_.version + 1).getOrElse(1)
      val loc = writeMetadataFile(name, version, withLog)
      result = TableState(version, loc, withLog)
      // pointer write INSIDE the per-table lock: two racing committers
      // otherwise interleave pointer writes and a restart could resume
      // an older version (the in-memory map would be right, the durable
      // state wrong)
      persistTable(name, result)
      result
    }))
    (200, Some {
      val n = mapper.createObjectNode()
      n.put("metadata-location", result.metadataLocation)
      n.set[JsonNode]("metadata", mapper.readTree(MetadataJson.toJson(result.metadata)))
      n
    })
  }

  // ---- server-side scan planning ----------------------------------------

  /** `POST …/tables/{t}/plan` — run manifest pruning ON THE SERVICE and
    * return pruned content files + residuals (ref scan_planning.py
    * PlanTableScanRequest / PlanCompleted; client side rest/__init__.py:502
    * `_plan_table_scan`). Pages beyond [[planPageSize]] return `plan-tasks`
    * tokens served by the fetch endpoint. */
  private def planTableR(name: String, body: String): (Int, Option[JsonNode]) = {
    val st = Option(tables.get(name)).getOrElse(
      fail(404, "NoSuchTableException", s"Table $name not found"))
    val req = mapper.readTree(body)
    val spark = org.apache.spark.sql.SparkSession.active
    val ro = new HadoopCatalog(st.metadata.location, spark) {
      override def commit(n: String, v: Int, m: TableMetadata): Int =
        throw new UnsupportedOperationException("Planning tables are read-only")
    }
    val table = new graft.table.IceTable(ro, name, st.metadata)
    var scan = table.scan
    Option(req.get("snapshot-id")).foreach(id => scan = scan.useSnapshot(id.asLong()))
    Option(req.get("filter")).foreach(f =>
      scan = scan.filter(RestScanJson.exprFromJson(f)))
    val cs = Option(req.get("case-sensitive")).forall(_.asBoolean())
    scan = scan.withCaseSensitive(cs)
    val tasks =
      try scan.planFiles()
      catch { case e: IllegalArgumentException =>
        fail(400, "BadRequestException", String.valueOf(e.getMessage)) }
    val m = st.metadata
    val planId = UUID.randomUUID().toString
    if (tasks.size <= planPageSize) {
      val n = RestScanJson.tasksToJson(tasks, scanSchemaOf(m, req), m.specById)
      n.put("status", "completed")
      n.put("plan-id", planId)
      (200, Some(n))
    } else {
      val n = mapper.createObjectNode()
      n.put("status", "completed")
      n.put("plan-id", planId)
      val toks = n.putArray("plan-tasks")
      tasks.grouped(planPageSize).zipWithIndex.foreach { case (page, i) =>
        val tok = s"$planId-$i"
        storePlanPage(tok,
          RestScanJson.tasksToJson(page, scanSchemaOf(m, req), m.specById))
        toks.add(tok)
      }
      (200, Some(n))
    }
  }

  /** Must mirror IceScan.scanSchema: an explicit snapshot scan plans
    * (and therefore serializes residuals) against the snapshot's own
    * schema; a current scan against the table's. */
  private def scanSchemaOf(m: TableMetadata, req: JsonNode): Schema =
    Option(req.get("snapshot-id"))
      .flatMap(id => m.snapshotById(id.asLong()))
      .map(s => m.schemaById(s.schemaId))
      .getOrElse(m.schema)

  /** `POST …/tables/{t}/tasks` body `{"plan-task": tok}` (ref
    * rest/__init__.py:528 `_fetch_scan_tasks`). Tokens are single-use:
    * the page is dropped once served, bounding service memory. */
  private def fetchTasksR(body: String): (Int, Option[JsonNode]) = {
    val tok = mapper.readTree(body).get("plan-task").asText()
    val page = Option(planPages.remove(tok)).getOrElse(
      fail(404, "NoSuchPlanTaskException", s"Unknown plan task: $tok"))
    (200, Some(page))
  }

  private def dropTableR(name: String, purge: Boolean): (Int, Option[JsonNode]) = {
    val st = withTableLock(name) {
      val removed = Option(tables.remove(name)).getOrElse(
        fail(404, "NoSuchTableException", s"Table $name not found"))
      dropPointer(name, "table")
      removed
    }
    if (purge) {
      try Io.delete(st.metadata.location, recursive = true)
      catch { case e: Exception =>
        System.err.println(s"[rest-server] purge $name: ${e.getMessage}") }
    }
    (204, None)
  }

  private def renameTableR(body: String): (Int, Option[JsonNode]) = {
    val req = mapper.readTree(body)
    def nameOf(n: JsonNode): String = fullName(
      n.get("namespace").elements().asScala.map(_.asText()).mkString("."),
      n.get("name").asText())
    val from = nameOf(req.get("source"))
    val to = nameOf(req.get("destination"))
    // Atomic move: both name monitors held, so a concurrent commit to
    // `from` either completes before the move (its state is what moves) or
    // observes the table gone (404) — never silently discarded — and no
    // request ever sees the table under both names.
    withTableLocks(from, to) {
      val st = Option(tables.get(from)).getOrElse(
        fail(404, "NoSuchTableException", s"Table $from not found"))
      if (tables.containsKey(to) || from == to)
        fail(409, "AlreadyExistsException", s"Table $to already exists")
      tables.put(to, st)
      tables.remove(from)
      persistTable(to, st); dropPointer(from, "table")
    }
    (204, None)
  }

  // ---- views -------------------------------------------------------------

  private def viewResult(st: ViewState): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("metadata-location", st.metadataLocation)
    n.set[JsonNode]("metadata", mapper.readTree(ViewMetadataJson.toJson(st.metadata)))
    n
  }

  private def writeViewFile(m: ViewMetadata, version: Int): String = {
    val path = s"${m.location}/metadata/rest-view-v$version-${UUID.randomUUID()}.metadata.json"
    Io.writeBytes(path, ViewMetadataJson.toJson(m).getBytes(UTF_8))
    path
  }

  private def listViewsR(ns: String): (Int, Option[JsonNode]) = {
    val n = mapper.createObjectNode()
    val arr = n.putArray("identifiers")
    views.keySet().asScala.toSeq.sorted
      .filter(v => v.take(v.lastIndexOf('.') max 0) == ns)
      .foreach(v => arr.add(identifierNode(v)))
    (200, Some(n))
  }

  private def viewVersionFromJson(n: JsonNode): ViewVersion =
    ViewVersion(
      versionId = n.get("version-id").asInt(),
      schemaId = n.get("schema-id").asInt(),
      timestampMs = n.get("timestamp-ms").asLong(),
      summary = Option(n.get("summary")).map(strMap).getOrElse(Map.empty),
      representations = n.get("representations").elements().asScala.toSeq.flatMap { r =>
        if (r.get("type").asText() == "sql")
          Some(SqlViewRepresentation(r.get("sql").asText(), r.get("dialect").asText()))
        else None
      },
      defaultCatalog = Option(n.get("default-catalog")).map(_.asText()),
      defaultNamespace = Option(n.get("default-namespace"))
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil))

  private def createViewR(ns: String, body: String): (Int, Option[JsonNode]) = {
    if (!namespaces.containsKey(ns))
      fail(404, "NoSuchNamespaceException", s"Namespace $ns not found")
    val req = mapper.readTree(body)
    val name = fullName(ns, req.get("name").asText())
    if (views.containsKey(name) || tables.containsKey(name))
      fail(409, "AlreadyExistsException", s"View $name already exists")
    val schema = MetadataJson.schemaFromJson(req.get("schema"))
    val version = viewVersionFromJson(req.get("view-version")).copy(schemaId = schema.schemaId)
    val props = Option(req.get("properties")).map(strMap).getOrElse(Map.empty)
    val location = Option(req.get("location")).filterNot(_.isNull).map(_.asText())
      .getOrElse(s"$warehouse/${name.replace('.', '/')}")
    val meta = ViewMetadata(UUID.randomUUID().toString, 1, location, Seq(schema),
      version.versionId, Seq(version),
      Seq(ViewHistoryEntry(version.timestampMs, version.versionId)), props)
    val loc = writeViewFile(meta, 1)
    views.put(name, ViewState(loc, meta))
    persistView(name, views.get(name))
    (200, Some(viewResult(views.get(name))))
  }

  private def loadViewR(name: String): (Int, Option[JsonNode]) = {
    val st = Option(views.get(name)).getOrElse(
      fail(404, "NoSuchViewException", s"View $name not found"))
    (200, Some(viewResult(st)))
  }

  private def registerViewR(ns: String, body: String): (Int, Option[JsonNode]) = {
    val req = mapper.readTree(body)
    val name = fullName(ns, req.get("name").asText())
    val loc = req.get("metadata-location").asText()
    val meta = ViewMetadataJson.fromJson(new String(Io.readBytes(loc), UTF_8))
    if (views.putIfAbsent(name, ViewState(loc, meta)) != null)
      fail(409, "AlreadyExistsException", s"View $name already exists")
    persistView(name, views.get(name))
    (200, Some(viewResult(views.get(name))))
  }

  /** View commit: the spec's UpdateViewRequest — view-metadata updates
    * (add-schema / add-view-version / set-current-view-version /
    * set-properties / set-location / assign-uuid). */
  private def commitViewR(name: String, body: String): (Int, Option[JsonNode]) = {
    val req = mapper.readTree(body)
    var result: ViewState = null
    views.compute(name, (_, cur) => {
      if (cur == null) fail(404, "NoSuchViewException", s"View $name not found")
      var m = cur.metadata
      var lastAddedVersion = -1
      // concurrent replaces both diff from the same base, so ids in the
      // request may collide with ids another commit just added — the
      // SERVER owns id assignment (iceberg-java AddViewVersion semantics):
      // colliding schema/version ids are reassigned fresh and the
      // version's schema-id follows the remap. This runs under the
      // per-view compute() lock, so both racers land as distinct versions.
      var schemaRemap = Map.empty[Int, Int]
      Option(req.get("updates")).map(_.elements().asScala.toSeq).getOrElse(Nil).foreach { u =>
        u.get("action").asText() match {
          case "assign-uuid" => m = m.copy(viewUuid = u.get("uuid").asText())
          case "set-location" => m = m.copy(location = u.get("location").asText())
          case "set-properties" => m = m.copy(properties = m.properties ++ strMap(u.get("updates")))
          case "remove-properties" => m = m.copy(properties = m.properties --
            u.get("removals").elements().asScala.map(_.asText()).toSeq)
          case "add-schema" =>
            val s = MetadataJson.schemaFromJson(u.get("schema"))
            if (m.schemas.exists(_.schemaId == s.schemaId)) {
              val fresh = m.schemas.map(_.schemaId).max + 1
              schemaRemap += s.schemaId -> fresh
              m = m.copy(schemas = m.schemas :+ Schema(s.fields, fresh, s.identifierFieldIds))
            } else m = m.copy(schemas = m.schemas :+ s)
          case "add-view-version" =>
            val raw = viewVersionFromJson(u.get("view-version"))
            val v0 = schemaRemap.get(raw.schemaId)
              .map(id => raw.copy(schemaId = id)).getOrElse(raw)
            val v =
              if (m.versions.exists(_.versionId == v0.versionId))
                v0.copy(versionId = m.versions.map(_.versionId).max + 1)
              else v0
            lastAddedVersion = v.versionId
            m = m.copy(versions = m.versions :+ v)
          case "set-current-view-version" =>
            val raw = u.get("view-version-id").asInt()
            val id = if (raw == -1) lastAddedVersion else raw
            require(m.versions.exists(_.versionId == id), s"No view version $id")
            m = m.copy(currentVersionId = id, versionLog = m.versionLog :+
              ViewHistoryEntry(System.currentTimeMillis(), id))
          case other => fail(400, "BadRequestException", s"Unknown view update: $other")
        }
      }
      val loc = writeViewFile(m, m.versions.size)
      result = ViewState(loc, m)
      persistView(name, result) // inside the lock, same as table commits
      result
    })
    (200, Some(viewResult(result)))
  }

  private def dropViewR(name: String): (Int, Option[JsonNode]) = {
    if (views.remove(name) == null)
      fail(404, "NoSuchViewException", s"View $name not found")
    dropPointer(name, "view")
    (204, None)
  }

  private def strMap(p: JsonNode): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    val it = p.properties().iterator()
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
    b.result()
  }
}
