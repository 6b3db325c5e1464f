package graft.meta

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

/** Puffin statistics-file container (ref: pyiceberg/puffin.py:48; format:
  * Iceberg Puffin spec — `Magic • blobs • Magic • footer-payload(JSON) •
  * payload-size(i32 LE) • flags(4B) • Magic`).
  *
  * Blobs are opaque byte ranges described by the JSON footer. We write
  * uncompressed payloads (flags = 0); reads accept both uncompressed and
  * zstd-compressed blobs (zstd-jni ships with Spark) and, like the
  * reference (puffin.py:62), reject compressed footers. Offsets are
  * absolute, so blob reads are a single ranged read — at 100 TB a stats
  * consumer never streams the whole file.
  */
object Puffin {

  val Magic: Array[Byte] = Array('P', 'F', 'A', '1').map(_.toByte)

  final case class Blob(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      data: Array[Byte],
      properties: Map[String, String] = Map.empty)

  final case class BlobInfo(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      offset: Long,
      length: Long,
      properties: Map[String, String],
      compressionCodec: Option[String] = None)

  /** Full footer: blob directory + file-level properties
    * (ref: puffin.py:44 Footer). */
  final case class Footer(blobs: Seq[BlobInfo], properties: Map[String, String])

  final case class PuffinFile(
      path: String,
      fileSizeInBytes: Long,
      footerSizeInBytes: Long,
      blobs: Seq[BlobInfo])

  private val mapper = new ObjectMapper()

  /** Write a puffin file; returns sizes + blob metadata for the
    * `statistics` metadata entry. */
  def write(path: String, blobs: Seq[Blob],
      fileProperties: Map[String, String] = Map.empty,
      confOverride: org.apache.hadoop.conf.Configuration = null): PuffinFile = {
    val out = new ByteArrayOutputStream()
    out.write(Magic)
    val infos = blobs.map { b =>
      val offset = out.size().toLong
      out.write(b.data)
      BlobInfo(b.blobType, b.fields, b.snapshotId, b.sequenceNumber,
        offset, b.data.length.toLong, b.properties)
    }
    // footer
    val footerStart = out.size()
    out.write(Magic)
    val payload = footerJson(infos, fileProperties)
    out.write(payload)
    val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(payload.length)
    tail.putInt(0) // flags: uncompressed footer
    out.write(tail.array())
    out.write(Magic)
    val bytes = out.toByteArray
    Io.writeBytes(path, bytes, confOverride)
    PuffinFile(path, bytes.length.toLong, (bytes.length - footerStart).toLong, infos)
  }

  private def footerJson(infos: Seq[BlobInfo], props: Map[String, String]): Array[Byte] = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("blobs")
    infos.foreach { b =>
      val n = mapper.createObjectNode()
      n.put("type", b.blobType)
      val f = n.putArray("fields"); b.fields.foreach(f.add)
      n.put("snapshot-id", b.snapshotId)
      n.put("sequence-number", b.sequenceNumber)
      n.put("offset", b.offset)
      n.put("length", b.length)
      if (b.properties.nonEmpty) {
        val pn = n.putObject("properties")
        b.properties.foreach { case (k, v) => pn.put(k, v) }
      }
      arr.add(n)
    }
    if (props.nonEmpty) {
      val pn = root.putObject("properties")
      props.foreach { case (k, v) => pn.put(k, v) }
    }
    mapper.writeValueAsBytes(root)
  }

  /** Read the footer's blob directory. */
  def readFooter(path: String): Seq[BlobInfo] = readFile(path).blobs

  /** Read the full footer (blobs + file properties) from a path. */
  def readFile(path: String): Footer = parseFooter(Io.readBytes(path), path)

  /** Parse a complete in-memory puffin file's footer
    * (ref: puffin.py:55 PuffinFile.__init__). */
  def parseFooter(bytes: Array[Byte], path: String = "<bytes>"): Footer = {
    require(bytes.length >= 20 && bytes.startsWith(Magic), s"Not a puffin file: $path")
    require(bytes.slice(bytes.length - 4, bytes.length).sameElements(Magic),
      s"Corrupt puffin trailer: $path")
    val tail = ByteBuffer.wrap(bytes, bytes.length - 12, 8).order(ByteOrder.LITTLE_ENDIAN)
    val payloadSize = tail.getInt
    val flags = tail.getInt
    require((flags & 1) == 0, "Compressed puffin footers are not supported")
    val payloadStart = bytes.length - 12 - payloadSize
    require(payloadStart >= 8 &&
      bytes.slice(payloadStart - 4, payloadStart).sameElements(Magic),
      s"Corrupt puffin footer: $path")
    val node = mapper.readTree(bytes, payloadStart, payloadSize)
    val b = Seq.newBuilder[BlobInfo]
    val it = node.get("blobs").elements()
    while (it.hasNext) {
      val n = it.next()
      val fields = Option(n.get("fields")).map { fa =>
        val fb = Seq.newBuilder[Int]
        val fit = fa.elements(); while (fit.hasNext) fb += fit.next().asInt()
        fb.result()
      }.getOrElse(Nil)
      val props = Option(n.get("properties")).map { p =>
        val pb = Map.newBuilder[String, String]
        val pit = p.properties().iterator()
        while (pit.hasNext) { val e = pit.next(); pb += e.getKey -> e.getValue.asText() }
        pb.result()
      }.getOrElse(Map.empty[String, String])
      b += BlobInfo(n.get("type").asText(), fields,
        n.get("snapshot-id").asLong(), n.get("sequence-number").asLong(),
        n.get("offset").asLong(), n.get("length").asLong(), props,
        Option(n.get("compression-codec")).filterNot(_.isNull).map(_.asText()))
    }
    val fileProps = Option(node.get("properties")).map { p =>
      val pb = Map.newBuilder[String, String]
      val pit = p.properties().iterator()
      while (pit.hasNext) { val e = pit.next(); pb += e.getKey -> e.getValue.asText() }
      pb.result()
    }.getOrElse(Map.empty[String, String])
    Footer(b.result(), fileProps)
  }

  /** Decompress a blob payload per its declared codec
    * (ref: puffin.py:72 get_blob_payload — None and zstd only). */
  def decodePayload(raw: Array[Byte], info: BlobInfo): Array[Byte] =
    info.compressionCodec match {
      case None => raw
      case Some("zstd") =>
        // zstd-jni ships with Spark; frame header carries the content size
        val size = com.github.luben.zstd.Zstd.getFrameContentSize(raw)
        require(size >= 0 && size <= Int.MaxValue, s"Bad zstd frame size: $size")
        com.github.luben.zstd.Zstd.decompress(raw, size.toInt)
      case Some(other) =>
        throw new IllegalArgumentException(s"Unsupported puffin compression codec: $other")
    }

  /** Ranged read of one blob's bytes (decompressed). */
  def readBlob(path: String, info: BlobInfo): Array[Byte] =
    decodePayload(Io.readRange(path, info.offset, info.length), info)
}
