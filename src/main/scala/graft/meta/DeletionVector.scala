package graft.meta

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

/** Iceberg v3 deletion vectors: per-data-file deleted row positions stored
  * as a 64-bit "portable" roaring bitmap inside a Puffin
  * `deletion-vector-v1` blob (ref: pyiceberg/table/deletion_vector.py:32;
  * format: Iceberg spec §Delete Formats + the public RoaringFormatSpec).
  *
  * Blob framing: `len(magic+vector) i32 BE • magic D1 D3 39 64 • vector •
  * crc32(magic+vector) i32 BE`. Vector: `n-bitmaps i64 LE`, then per
  * 32-bit bitmap `key i32 LE • standard roaring serialization`; position =
  * (key << 32) | low32.
  *
  * The codec is allocation-lean and executor-safe: scans deserialize blobs
  * with a ranged read per task (offset/length come from the manifest), so
  * DV volume never funnels through the driver.
  */
object DeletionVector {

  val Magic: Array[Byte] = Array(0xD1, 0xD3, 0x39, 0x64).map(_.toByte)

  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4
  private val ArrayMaxCardinality = 4096

  // ---- 32-bit roaring (one key's bitmap) ----------------------------------

  /** Serialize sorted distinct low-32 values (as Ints, unsigned order) in
    * the no-run-container portable layout — always valid, readable by every
    * roaring implementation. */
  private def serialize32(values: Array[Int]): Array[Byte] = {
    // group by high-16 container key
    val containers = scala.collection.mutable.LinkedHashMap[Int, scala.collection.mutable.ArrayBuffer[Int]]()
    values.foreach { v =>
      containers.getOrElseUpdate(v >>> 16, new scala.collection.mutable.ArrayBuffer[Int]) += (v & 0xFFFF)
    }
    val n = containers.size
    val dataSizes = containers.map { case (_, vs) =>
      if (vs.length <= ArrayMaxCardinality) vs.length * 2 else 8192
    }.toArray
    val total = 4 + 4 + n * 4 + n * 4 + dataSizes.sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(SerialCookieNoRun)
    buf.putInt(n)
    containers.foreach { case (key, vs) =>
      buf.putShort(key.toShort)
      buf.putShort((vs.length - 1).toShort)
    }
    var offset = 4 + 4 + n * 4 + n * 4
    dataSizes.foreach { sz => buf.putInt(offset); offset += sz }
    containers.foreach { case (_, vs) =>
      if (vs.length <= ArrayMaxCardinality) vs.foreach(v => buf.putShort(v.toShort))
      else {
        val words = new Array[Long](1024)
        vs.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
        words.foreach(buf.putLong)
      }
    }
    buf.array()
  }

  /** Read one 32-bit roaring bitmap at buf's position (advances it);
    * returns sorted unsigned-int values. */
  private def deserialize32(buf: ByteBuffer): Array[Int] = {
    val cookie = buf.getInt
    val (size, runFlags) =
      if ((cookie & 0xFFFF) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        buf.get(flags)
        (n, flags)
      } else {
        require(cookie == SerialCookieNoRun, s"Unknown roaring cookie: $cookie")
        (buf.getInt, null)
      }
    def isRun(i: Int): Boolean =
      runFlags != null && (runFlags(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) {
      keys(i) = buf.getShort & 0xFFFF
      cards(i) = (buf.getShort & 0xFFFF) + 1
      i += 1
    }
    // offset header: always present for the no-run cookie; for the run
    // cookie only when size >= threshold (values unused — containers are
    // contiguous after the headers)
    if (runFlags == null || size >= NoOffsetThreshold) buf.position(buf.position() + size * 4)
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    i = 0
    while (i < size) {
      val hb = keys(i) << 16
      if (isRun(i)) {
        val nRuns = buf.getShort & 0xFFFF
        var r = 0
        while (r < nRuns) {
          val start = buf.getShort & 0xFFFF
          val len = buf.getShort & 0xFFFF // stored as length - 1
          var v = start
          while (v <= start + len) { out += (hb | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= ArrayMaxCardinality) {
        var c = 0
        while (c < cards(i)) { out += (hb | (buf.getShort & 0xFFFF)); c += 1 }
      } else {
        var w = 0
        while (w < 1024) {
          val word = buf.getLong
          if (word != 0L) {
            var b = 0
            while (b < 64) {
              if ((word & (1L << b)) != 0L) out += (hb | (w * 64 + b))
              b += 1
            }
          }
          w += 1
        }
      }
      i += 1
    }
    out.toArray
  }

  // ---- 64-bit portable vector ---------------------------------------------

  /** Serialize sorted distinct positions into the portable 64-bit layout. */
  def serializeVector(positions: Array[Long]): Array[Byte] = {
    val byKey = scala.collection.mutable.LinkedHashMap[Int, scala.collection.mutable.ArrayBuffer[Int]]()
    positions.foreach { p =>
      require(p >= 0, s"Negative position: $p")
      val key = (p >>> 32).toInt
      require(key >= 0, s"Position key exceeds Int.MaxValue: $p")
      byKey.getOrElseUpdate(key, new scala.collection.mutable.ArrayBuffer[Int]) += p.toInt
    }
    val parts = byKey.toSeq.map { case (k, vs) => k -> serialize32(vs.toArray) }
    val buf = ByteBuffer.allocate(8 + parts.map(4 + _._2.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(parts.size.toLong)
    parts.foreach { case (k, bytes) => buf.putInt(k); buf.put(bytes) }
    buf.array()
  }

  def deserializeVector(vector: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(vector).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getLong
    val out = Array.newBuilder[Long]
    var i = 0L
    var lastKey = -1
    while (i < n) {
      val key = buf.getInt
      // Java-impl compatibility: bitmap keys above Int.MaxValue are invalid
      // (ref: deletion_vector.py:53 — same bound, same failure mode)
      require(key >= 0, s"Key ${key.toLong & 0xFFFFFFFFL} is too large, " +
        s"max ${Int.MaxValue} to maintain compatibility with Java impl")
      require(key > lastKey, s"Bitmap keys must ascend: $key after $lastKey")
      lastKey = key
      deserialize32(buf).foreach(v => out += (key.toLong << 32) | (v.toLong & 0xFFFFFFFFL))
      i += 1
    }
    out.result()
  }

  // ---- deletion-vector-v1 blob framing -------------------------------------

  /** Frame a serialized vector as a `deletion-vector-v1` blob payload. */
  def frameBlob(positions: Array[Long]): Array[Byte] = {
    val vector = serializeVector(positions)
    val buf = ByteBuffer.allocate(4 + 4 + vector.length + 4) // BE by default
    buf.putInt(4 + vector.length)
    buf.put(Magic)
    buf.put(vector)
    val crc = new CRC32()
    crc.update(Magic)
    crc.update(vector)
    buf.putInt(crc.getValue.toInt)
    buf.array()
  }

  /** Positions from a framed blob payload (ref: deletion_vector.py:80
    * _extract_vector_payload). */
  def readBlob(payload: Array[Byte]): Array[Long] = {
    require(payload.length >= 12, "deletion-vector-v1 blob too short")
    val buf = ByteBuffer.wrap(payload)
    val prefix = buf.getInt
    require(prefix >= 4 && prefix + 8 <= payload.length,
      s"Bad deletion-vector length prefix: $prefix")
    val magic = new Array[Byte](4); buf.get(magic)
    require(magic.sameElements(Magic),
      s"Bad deletion-vector magic: ${magic.map(b => f"$b%02X").mkString(" ")}")
    deserializeVector(java.util.Arrays.copyOfRange(payload, 8, 4 + prefix))
  }

  /** Ranged read of one DV's positions straight from a puffin file —
    * executor-safe (no driver state, one seek + one read). Callers running
    * in executor tasks must pass the SHIPPED session conf: the default
    * `Io.conf` on an executor JVM is a bare Configuration without
    * `spark.hadoop.*` (creds, custom schemes). */
  def readPositions(puffinPath: String, offset: Long, length: Long,
      c: org.apache.hadoop.conf.Configuration = null): Array[Long] =
    readBlob(Io.readRange(puffinPath, offset, length,
      if (c != null) c else Io.confFor(puffinPath)))
}
