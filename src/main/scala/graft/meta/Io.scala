package graft.meta

import java.io.{InputStream, OutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.core.PathUtil

/** Warehouse file IO (the reference's FileIO seam, pyiceberg/io/__init__.py):
  * every metadata read/write goes through the Hadoop FileSystem API so a
  * warehouse can live on hdfs/s3a/any registered scheme, with a java.nio
  * fast path for local paths (Hadoop's RawLocalFileSystem builds each
  * FileStatus by forking `ls`, minutes over thousands of files).
  *
  * The active Configuration is installed per session by the catalog
  * (spark.sessionState.newHadoopConf()), so `spark.hadoop.*` settings —
  * custom schemes, s3a credentials — reach metadata IO. Executor-side
  * callers that cannot see the session (stats harvest) ship the session
  * conf entries into their tasks explicitly.
  */
object Io {

  /** Fallback for paths under no registered scheme — kept as a var so
    * tests can simulate a bare executor JVM. Catalogs both set this AND
    * register under their warehouse scheme (below), so the var only
    * decides for scheme-less/unregistered paths. */
  @volatile var confFactory: () => Configuration = () => new Configuration()
  def conf: Configuration = confFactory()

  /** Per-scheme(+authority) Configuration registry (ADVICE r5: one global
    * last-writer-wins factory contaminated catalogs on different schemes
    * in one JVM). Driver-side metadata IO resolves the factory by the
    * PATH being accessed, so an s3a catalog and a mockfs catalog coexist;
    * two catalogs on the SAME scheme+authority still share (last wins) —
    * same-bucket-different-credentials is not a supported layout.
    * Executor-side paths are unaffected: they ship explicit confEntries. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, () => Configuration]()

  private def keyOf(path: String): Option[String] = {
    val uri = try new java.net.URI(path) catch { case _: Exception => return None }
    Option(uri.getScheme).filter(_ != "file").map(s =>
      s + Option(uri.getAuthority).map("://" + _).getOrElse(""))
  }

  def register(pathOrUri: String, f: () => Configuration): Unit =
    keyOf(pathOrUri).foreach(registry.put(_, f))
  /** Test seam: drop a registration (simulating a fresh executor JVM). */
  def deregister(pathOrUri: String): Unit =
    keyOf(pathOrUri).foreach(registry.remove(_))

  /** The Configuration governing `path`: its scheme's registered factory,
    * else the process fallback. */
  def confFor(path: String): Configuration =
    keyOf(path).flatMap(k => Option(registry.get(k))).map(_()).getOrElse(conf)

  /** Session Hadoop conf flattened to serializable entries — the one way
    * executor-side tasks (stats harvest, DSv2 readers, DV blob reads) see
    * `spark.hadoop.*` (custom schemes, s3a creds): a bare Configuration()
    * built on an executor has none of it. */
  def confEntries(spark: org.apache.spark.sql.SparkSession): Array[(String, String)] = {
    import scala.jdk.CollectionConverters._
    spark.sessionState.newHadoopConf().iterator().asScala
      .map(e => e.getKey -> e.getValue).toArray
  }

  /** Rebuild a Configuration from shipped entries. `new Configuration(false)`
    * skips the XML-resource parse (~6ms), which dominates when tasks build
    * one per partition. */
  def confFrom(entries: Array[(String, String)]): Configuration =
    if (entries == null || entries.isEmpty) new Configuration()
    else {
      val c = new Configuration(false)
      entries.foreach { case (k, v) => c.set(k, v) }
      c
    }

  def isLocal(path: String): Boolean = !path.contains(":") || path.startsWith("file:")
  private def local(p: String): java.nio.file.Path =
    java.nio.file.Paths.get(PathUtil.canon(p))
  private def fs(p: String): FileSystem = new Path(p).getFileSystem(confFor(p))

  def exists(path: String): Boolean =
    if (isLocal(path)) java.nio.file.Files.exists(local(path))
    else fs(path).exists(new Path(path))

  def size(path: String): Long =
    if (isLocal(path)) java.nio.file.Files.size(local(path))
    else fs(path).getFileStatus(new Path(path)).getLen

  def readBytes(path: String): Array[Byte] =
    if (isLocal(path)) java.nio.file.Files.readAllBytes(local(path))
    else {
      val in = fs(path).open(new Path(path))
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    }

  /** Ranged read (puffin blob loads): one seek + one bounded read. */
  def readRange(path: String, offset: Long, length: Long,
      c: Configuration = null): Array[Byte] = {
    val out = new Array[Byte](length.toInt)
    if (isLocal(path)) {
      val ch = java.nio.channels.FileChannel.open(local(path))
      try {
        val buf = java.nio.ByteBuffer.wrap(out)
        ch.position(offset)
        var n = 0
        while (n < length && ch.read(buf) >= 0) n = buf.position()
      } finally ch.close()
    } else {
      val cc = if (c != null) c else confFor(path)
      val in = new Path(path).getFileSystem(cc).open(new Path(path))
      try in.readFully(offset, out) finally in.close()
    }
    out
  }

  /** Overwriting write, parent dirs created. `confOverride` lets
    * EXECUTOR-side writers (DV puffin assembly) supply a shipped conf —
    * the process-global confFactory is only installed on the driver. */
  def writeBytes(path: String, bytes: Array[Byte],
      confOverride: Configuration = null): Unit =
    if (isLocal(path)) {
      val p = local(path)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, bytes)
      ()
    } else {
      val c = if (confOverride != null) confOverride else confFor(path)
      val out = new Path(path).getFileSystem(c).create(new Path(path), true)
      try out.write(bytes) finally out.close()
    }

  /** Atomic last-writer-wins publish of a small file (version hints):
    * concurrent readers must never observe a half-written payload — a
    * streaming source refreshing the table while a commit republishes the
    * hint would read "" and fail version parsing. Local: unique temp
    * sibling + ATOMIC_MOVE replace. Remote: Hadoop create+close (contents
    * become visible on close for HDFS-like stores); the hint READERS also
    * tolerate a torn value by falling back to the newest version file. */
  def writeBytesAtomic(path: String, bytes: Array[Byte]): Unit =
    if (isLocal(path)) {
      val p = local(path)
      java.nio.file.Files.createDirectories(p.getParent)
      val tmp = p.resolveSibling(
        p.getFileName.toString + ".tmp-" + java.util.UUID.randomUUID())
      java.nio.file.Files.write(tmp, bytes)
      try java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      catch {
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          java.nio.file.Files.move(tmp, p,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } else writeBytes(path, bytes)

  /** Atomic-create-new commit write: fails (returns false) when the target
    * already exists. Local uses link(2) (a true atomic CREATE_NEW — rename
    * silently replaces there); Hadoop writes a uniquely-named sibling and
    * renames, which HDFS specifies as atomic AND failing when the target
    * exists — a crashed writer leaves only an orphan tmp, never a partial
    * target that would poison every later read of that version. */
  def writeBytesIfAbsent(path: String, bytes: Array[Byte]): Boolean =
    if (isLocal(path)) {
      val target = local(path)
      java.nio.file.Files.createDirectories(target.getParent)
      val tmp = java.nio.file.Files.createTempFile(target.getParent,
        "." + target.getFileName.toString, ".tmp")
      java.nio.file.Files.write(tmp, bytes)
      try { java.nio.file.Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      val f = fs(path)
      val target = new Path(path)
      if (f.exists(target)) return false // cheap pre-check; rename decides
      val tmp = new Path(path + ".tmp-" + java.util.UUID.randomUUID())
      val out = f.create(tmp, false)
      try out.write(bytes) finally out.close()
      // FileContext.rename without OVERWRITE fails when the target exists —
      // HDFS enforces this atomically server-side. FileSystem.rename does
      // NOT: RawLocalFileSystem (and schemes like it) map to rename(2),
      // which silently REPLACES the target, so two racers would both
      // "win" and one snapshot would be lost. Schemes registered only at
      // the FileSystem layer fall back to exists+rename (the pre-check
      // above keeps the race window to the rename call itself).
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(target.toUri, confFor(path))
        try { fc.rename(tmp, target); true }
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
            f.delete(tmp, false); false
          case e: java.io.IOException =>
            f.delete(tmp, false)
            if (f.exists(target)) false else throw e
        }
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // no AbstractFileSystem binding for this scheme
          try {
            if (!f.exists(target) && f.rename(tmp, target)) true
            else { f.delete(tmp, false); false }
          } catch {
            case e: java.io.IOException =>
              f.delete(tmp, false)
              if (f.exists(target)) false else throw e
          }
      }
    }

  /** Buffered output stream, parent dirs created (avro manifest writes). */
  def create(path: String): OutputStream =
    if (isLocal(path)) {
      val p = local(path)
      java.nio.file.Files.createDirectories(p.getParent)
      new java.io.BufferedOutputStream(java.nio.file.Files.newOutputStream(p))
    } else fs(path).create(new Path(path), true)

  def open(path: String): InputStream =
    if (isLocal(path)) new java.io.BufferedInputStream(
      java.nio.file.Files.newInputStream(local(path)))
    else fs(path).open(new Path(path))

  def delete(path: String, recursive: Boolean = false): Unit =
    if (isLocal(path)) {
      val p = local(path)
      if (recursive && java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
        finally s.close()
      } else java.nio.file.Files.deleteIfExists(p)
      ()
    } else { fs(path).delete(new Path(path), recursive); () }

  def mkdirs(path: String): Unit =
    if (isLocal(path)) { java.nio.file.Files.createDirectories(local(path)); () }
    else { fs(path).mkdirs(new Path(path)); () }

  /** Immediate children as (name, isDirectory); Nil when absent. */
  def list(path: String): Seq[(String, Boolean)] =
    if (isLocal(path)) {
      val p = local(path)
      if (!java.nio.file.Files.isDirectory(p)) return Nil
      val s = java.nio.file.Files.list(p)
      try {
        val b = Seq.newBuilder[(String, Boolean)]
        s.forEach(q => b += q.getFileName.toString -> java.nio.file.Files.isDirectory(q))
        b.result()
      } finally s.close()
    } else {
      val f = fs(path)
      val target = new Path(path)
      if (!f.exists(target)) return Nil
      f.listStatus(target).toSeq.map(st => st.getPath.getName -> st.isDirectory)
    }
}
