package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads are opaque `binary` columns
  * with a typed metadata struct; decode/feature-extraction runs as a
  * batched per-partition pass (the Spark-side plumbing — schema, batch
  * shape, partitioning — is real; the codec itself is a deterministic
  * STUB because no image/audio libraries exist in this environment).
  */
object Multimodal {

  final case class MediaRow(media_id: Long, mime: String, content: Array[Byte])
  final case class MediaFeatures(media_id: Long, n_bytes: Long, n_frames: Long,
      checksum: Long, features: Array[Float])

  /** STUB decoder: a real implementation would decode the image/audio and
    * run a feature extractor per batch. The stub derives deterministic
    * pseudo-features from the bytes so the pipeline (batching, schema,
    * shuffle boundaries) is exercised end-to-end. */
  def decodeAndExtract(bytes: Array[Byte]): Array[Float] = {
    val feats = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      feats(i % 8) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    feats
  }

  /** Batched feature extraction over a media Dataset: one decoder init per
    * partition (the expensive part for a real codec), streaming rows
    * through it (ref pattern: ArrowScan batch pipeline). */
  def extractFeatures(ds: Dataset[MediaRow], frameBytes: Int = 256): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decoder/session init would go here
      rows.map { r =>
        val feats = decodeAndExtract(r.content)
        MediaFeatures(
          r.media_id,
          n_bytes = r.content.length.toLong,
          n_frames = (r.content.length.toLong + frameBytes - 1) / frameBytes,
          checksum = r.content.foldLeft(0L)((a, b) => a * 31 + (b & 0xff)),
          features = feats)
      }
    }
  }

  /** Wrap a text table as a media table (binary payload + metadata struct)
    * — stands in for real image/audio ingestion in this environment. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("application/octet-stream").as("mime"),
      col("text").cast("binary").as("content"))

  final case class MediaHash(media_id: Long, dhash: Long)

  /** STUB perceptual hash with the dHash SHAPE: a real implementation
    * decodes the image, resizes to a 9×8 grayscale grid, and emits one
    * bit per horizontal neighbour comparison (64 bits total) — identical
    * payloads hash identically, small luminance changes flip few bits.
    * The stub derives the 9×8 grid deterministically from the payload
    * (byte-stripe luminance sums) so the hash's bit layout, its
    * stability under byte-local edits, and the banded hamming join built
    * on top are all exercised end-to-end with integer-exact math. */
  def dHash64(bytes: Array[Byte]): Long = {
    val grid = new Array[Long](72) // 8 rows × 9 columns of "luminance"
    var i = 0
    while (i < bytes.length) {
      grid(i % 72) += (bytes(i) & 0xff)
      i += 1
    }
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        h = (h << 1) | (if (grid(r * 9 + c) > grid(r * 9 + c + 1)) 1L else 0L)
        c += 1
      }
      r += 1
    }
    h
  }

  /** Batched perceptual hashing (one decoder init per partition, same
    * contract as [[extractFeatures]]): media_id → 64-bit dHash. */
  def perceptualHashes(ds: Dataset[MediaRow]): Dataset[MediaHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decoder/session init would go here
      rows.map(r => MediaHash(r.media_id, dHash64(r.content)))
    }
  }
}
