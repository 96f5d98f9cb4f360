package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` plus a typed metadata
  * struct, with per-partition batch decode/feature-extract.
  *
  * The Spark-side plumbing — schema, partitioning, the mapPartitions batch
  * shape an image/audio codec would plug into — is real and tested; the
  * codec itself is a clearly marked deterministic STUB (this container has
  * no image/audio libraries). Swapping `decodeStub` for a real decoder
  * changes no plan shape: the operator stays a narrow per-partition map, no
  * shuffle, executed where the bytes already live — exactly how a 100 TB
  * media table should be processed.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int,
      checksum: Long)

  /** ======= STUB =======
    * Stands in for an image/audio decoder (e.g. libjpeg / ffmpeg bindings).
    * Deterministic fake: "dimensions" derive from a byte checksum, so tests
    * can assert exact values and re-runs are stable. A real implementation
    * would decode `bytes` and return true dimensions/duration.
    */
  def decodeStub(kind: String, bytes: Array[Byte]): (String, Int, Int) = {
    val checksum = bytes.foldLeft(1469598103934665603L)((h, b) =>
      (h ^ (b & 0xff)) * 1099511628211L) // FNV-1a, pure JVM, deterministic
    val w = 64 + math.floorMod(checksum, 1024L).toInt
    val h = 64 + math.floorMod(checksum >> 10, 1024L).toInt
    (s"fake/$kind", w, h)
  }

  private def checksum64(bytes: Array[Byte]): Long =
    bytes.foldLeft(1469598103934665603L)((h, b) =>
      (h ^ (b & 0xff)) * 1099511628211L)

  /** Batch feature extraction: one decoder invocation per row, batched per
    * partition (the shape a vectorized codec or model runtime needs — the
    * iterator boundary is where a real implementation would group rows into
    * fixed-size device batches).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (format, w, h) = decodeStub(r.kind, r.bytes)
        MediaFeatures(r.media_id, r.kind, r.bytes.length, format, w, h,
          checksum64(r.bytes))
      }
    }
  }

  final case class ResizedMedia(
      media_id: Long, kind: String, width: Int, height: Int,
      bytes: Array[Byte])

  /** ======= STUB =======
    * Resize: a real implementation decodes, scales, re-encodes. The fake
    * deterministically truncates the payload in proportion to the area
    * ratio so output sizes are assertable; the plumbing (typed Dataset in,
    * typed Dataset out, narrow per-partition map) is the real shape.
    */
  def resize(media: Dataset[MediaRow], maxSide: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (_, w, h) = decodeStub(r.kind, r.bytes)
        val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
        val (nw, nh) = (math.max(1, (w * scale).toInt),
          math.max(1, (h * scale).toInt))
        val nBytes = math.max(1, (r.bytes.length * scale * scale).toInt)
        ResizedMedia(r.media_id, r.kind, nw, nh, r.bytes.take(nBytes))
      }
    }
  }

  final case class Frame(media_id: Long, frame_idx: Int, offset_bytes: Long)

  /** ======= STUB =======
    * Frame sampling for video payloads: emits `n` evenly spaced frame
    * offsets per video (a real decoder would emit decoded frames). One
    * input row fans out to n output rows inside the same partition — the
    * flatMap shape a real frame sampler has, still shuffle-free.
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val len = math.max(1L, r.bytes.length.toLong)
      (0 until n).map(i => Frame(r.media_id, i, i * len / n))
    }
  }

  /** Build a media table from the documents corpus: text bytes standing in
    * for encoded media payloads (UTF-8 is as opaque to the plumbing as JPEG).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        pmod(col("doc_id"), lit(3)).cast("int") + 1).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaRow]
  }
}
