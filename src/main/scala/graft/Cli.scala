package graft

import org.apache.spark.sql.SparkSession

import graft.catalog.{Catalog, HadoopCatalog, RestCatalog, SqlCatalog}
import graft.core.JsonText.{quote => q}

/** Console face of the library — the reference ships one as the
  * `pyiceberg` entry point (ref: cli/console.py): list / describe /
  * schema / spec / uuid / location / files / list-refs read commands,
  * create/drop namespace, drop/rename table, and properties
  * get/set/remove, each with text or JSON output (cli/output.py).
  *
  * Usage:
  *   graft.Cli [--warehouse DIR | --uri JDBC_URL --warehouse DIR]
  *             [--json] <command> [args…]
  *
  * Commands (mirroring the reference's):
  *   list [namespace]              namespaces, or tables+views in one
  *   describe <table>              full metadata summary
  *   schema <table>                Iceberg schema, one field per line
  *   spec <table>                  partition spec
  *   uuid <table>                  table uuid
  *   location <table>              table base location
  *   files <table>                 current data files (path, records, bytes)
  *   list-refs <table>             branches and tags with head ids
  *   snapshots <table>             snapshot log (id, op, timestamp)
  *   create-namespace <ns>
  *   drop-namespace <ns>
  *   drop-table <table>
  *   rename-table <from> <to>
  *   properties-get <table> [key]
  *   properties-set <table> <key> <value>
  *   properties-remove <table> <key>
  *
  * Runs on a local SparkSession only for catalog IO (no jobs for the
  * metadata commands — `files` walks manifests on the driver, which is
  * fine at CLI scale; use the `files` METADATA TABLE through SQL for
  * million-file tables).
  */
object Cli {

  private[graft] case class Args(warehouse: String = "", uri: Option[String] = None,
      json: Boolean = false, cmd: Seq[String] = Nil)

  def main(argv: Array[String]): Unit = {
    val a = parse(argv.toList, Args())
    // `version` needs no catalog at all (ref cli/console.py:238)
    if (a.cmd == Seq("version")) { println(BuildVersion); return }
    // --warehouse is optional for a REST uri (the service's config
    // handshake supplies it)
    val isRest = a.uri.exists(u => u.startsWith("http://") || u.startsWith("https://"))
    if ((a.warehouse.isEmpty && !isRest) || a.cmd.isEmpty) {
      System.err.println(usage); sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cat: Catalog = a.uri match {
      case Some(u) if u.startsWith("http://") || u.startsWith("https://") =>
        // REST: warehouse comes from the service's config handshake
        new RestCatalog(u, spark,
          if (a.warehouse.nonEmpty) Map("warehouse" -> a.warehouse) else Map.empty)
      case Some(u) => new SqlCatalog(u, a.warehouse, spark)
      case None => new HadoopCatalog(a.warehouse, spark)
    }
    try run(cat, a)
    catch {
      case e: Exception => System.err.println(s"error: ${e.getMessage}"); sys.exit(1)
    } finally spark.stop()
  }

  @annotation.tailrec
  private def parse(argv: List[String], acc: Args): Args = argv match {
    case "--warehouse" :: v :: rest => parse(rest, acc.copy(warehouse = v))
    case "--uri" :: v :: rest => parse(rest, acc.copy(uri = Some(v)))
    case "--json" :: rest => parse(rest, acc.copy(json = true))
    case rest => acc.copy(cmd = rest)
  }

  private[graft] def run(cat: Catalog, a: Args): Unit = {
    def out(pairs: Seq[(String, String)]): Unit =
      if (a.json)
        println(pairs.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}"))
      else pairs.foreach { case (k, v) => println(f"$k%-18s $v") }
    def outList(items: Seq[String]): Unit =
      if (a.json) println(items.map(q).mkString("[", ", ", "]"))
      else items.foreach(println)

    a.cmd.toList match {
      case "list" :: Nil => outList(cat.listNamespaces())
      case "list" :: ns :: Nil => outList(cat.listTables(ns) ++ cat.listViews(ns))
      case "describe" :: t :: Nil =>
        val tab = cat.loadTable(t)
        val m = tab.metadata
        out(Seq(
          "table" -> t,
          "uuid" -> m.tableUuid,
          "location" -> m.location,
          "format-version" -> m.formatVersion.toString,
          "current-snapshot" -> m.currentSnapshotId.map(_.toString).getOrElse("-"),
          "snapshots" -> m.snapshots.size.toString,
          "schema" -> tab.schema.fields.map(f =>
            s"${f.name}: ${f.fieldType}${if (f.required) "" else "?"}").mkString(", "),
          "partition-spec" -> specString(tab),
          "properties" -> m.properties.map { case (k, v) => s"$k=$v" }.mkString(", ")))
      case "schema" :: t :: Nil =>
        val tab = cat.loadTable(t)
        out(tab.schema.fields.map(f =>
          f.name -> s"${f.fieldType}${if (f.required) " (required)" else ""} (id=${f.id})"))
      case "spec" :: t :: Nil => println(specString(cat.loadTable(t)))
      case "uuid" :: t :: Nil => println(cat.loadTable(t).metadata.tableUuid)
      case "location" :: t :: Nil => println(cat.loadTable(t).metadata.location)
      case "files" :: t :: Nil =>
        val tasks = cat.loadTable(t).scan.planFiles()
        if (a.json)
          println(tasks.map(ts => s"{${q("path")}: ${q(ts.file.filePath)}, " +
            s"${q("records")}: ${ts.file.recordCount}, " +
            s"${q("bytes")}: ${ts.file.fileSizeInBytes}}").mkString("[", ", ", "]"))
        else tasks.foreach(ts =>
          println(f"${ts.file.recordCount}%10d rows ${ts.file.fileSizeInBytes}%12d B  ${ts.file.filePath}"))
      case "list-refs" :: t :: Nil =>
        out(cat.loadTable(t).metadata.refs.toSeq.sortBy(_._1).map { case (n, r) =>
          n -> s"${r.refType} @ ${r.snapshotId}" })
      case "snapshots" :: t :: Nil =>
        out(cat.loadTable(t).metadata.snapshots.map(s =>
          s.snapshotId.toString -> s"${s.operation} @ ${
            java.time.Instant.ofEpochMilli(s.timestampMs)}"))
      case "create-namespace" :: ns :: Nil => cat.createNamespace(ns)
      case "drop-namespace" :: ns :: Nil => cat.dropNamespace(ns)
      case "drop-table" :: t :: Nil => cat.dropTable(t)
      case "rename-table" :: from :: to :: Nil => cat.renameTable(from, to)
      case "properties-get" :: t :: Nil =>
        out(cat.loadTable(t).metadata.properties.toSeq.sortBy(_._1))
      case "properties-get" :: t :: k :: Nil =>
        cat.loadTable(t).metadata.properties.get(k) match {
          case Some(v) => println(v)
          // throw, don't sys.exit: run() is also called in-process (tests,
          // embedding JVMs); main() maps exceptions to exit codes
          case None => throw new IllegalArgumentException(s"no property $k")
        }
      case "properties-set" :: t :: k :: v :: Nil =>
        cat.loadTable(t).setProperties(k -> v)
      case "properties-remove" :: t :: k :: Nil =>
        cat.loadTable(t).removeProperties(k)
      // namespace properties (ref cli/console.py:323 properties get
      // namespace / :378 set / :413 remove)
      case "properties-get-ns" :: ns :: Nil =>
        out(cat.loadNamespaceProperties(ns).toSeq.sortBy(_._1))
      case "properties-get-ns" :: ns :: k :: Nil =>
        cat.loadNamespaceProperties(ns).get(k) match {
          case Some(v) => println(v)
          case None => throw new IllegalArgumentException(s"no property $k")
        }
      case "properties-set-ns" :: ns :: k :: v :: Nil =>
        cat.updateNamespaceProperties(ns, Map(k -> v))
      case "properties-remove-ns" :: ns :: k :: Nil =>
        cat.updateNamespaceProperties(ns, Map.empty, Set(k))
      // ref cli/console.py:238 version
      case "version" :: Nil => println(BuildVersion)
      case other =>
        throw new IllegalArgumentException(s"unknown command: ${other.mkString(" ")}\n$usage")
    }
  }

  private def specString(tab: graft.table.IceTable): String =
    if (tab.spec.isUnpartitioned) "unpartitioned"
    else tab.spec.fields.map { pf =>
      val src = tab.schema.byId(pf.sourceId).name
      s"${pf.name}=${pf.transform}($src)"
    }.mkString(", ")

  private val usage =
    """usage: graft.Cli --warehouse DIR [--uri JDBC_OR_HTTP_URL] [--json] <command> [args…]
      |commands: list [ns] | describe T | schema T | spec T | uuid T | location T
      |          files T | list-refs T | snapshots T | create-namespace NS
      |          drop-namespace NS | drop-table T | rename-table FROM TO
      |          properties-get T [K] | properties-set T K V | properties-remove T K
      |          properties-get-ns NS [K] | properties-set-ns NS K V
      |          properties-remove-ns NS K | version""".stripMargin

  /** Engine version, printed by `version` (ref cli/console.py:238). */
  private[graft] val BuildVersion = "0.1.0"
}
