package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` plus a typed metadata
  * struct, with per-partition batch decode/feature-extract.
  *
  * The Spark-side plumbing — schema, partitioning, the mapPartitions batch
  * shape a codec plugs into — is real and tested, and so is decoding for
  * THREE real payload families: RawMedia's uncompressed GRIM/GRVD
  * containers (header parse, nearest-neighbor resample, frame
  * extraction), COMPRESSED images through the pure-JDK `javax.imageio`
  * codecs (PNG/JPEG/BMP/GIF, including animated-GIF frame enumeration),
  * audio containers through pure-JDK `javax.sound.sampled` (WAV/AIFF/AU —
  * see CompressedMedia.scala), and mp3/mp4 container METADATA through
  * pure-Scala header parsers (MediaHeaders — MPEG frame chains, ISO-BMFF
  * box trees). The clearly marked deterministic STUB remains only for (a)
  * bytes in no recognizable container and (b) frame-DATA decode of
  * mp3/mp4, whose codecs need native libraries this image does not ship.
  * Swapping the stub for a real decoder changes no plan shape: every
  * operator stays a narrow per-partition map, no shuffle, executed where
  * the bytes already live — exactly how a 100 TB media table should be
  * processed.
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
    * Stands in for the codecs the JDK does NOT ship (compressed audio /
    * video — mp3/H.264-style bytes), used only when neither RawMedia nor
    * CompressedMedia (javax.imageio) can parse the payload.
    * Deterministic fake: "dimensions" derive from a byte checksum, so tests
    * can assert exact values and re-runs are stable. A real implementation
    * would decode `bytes` and return true dimensions/duration.
    */
  def decodeStub(kind: String, bytes: Array[Byte]): (String, Int, Int) = {
    val checksum = checksum64(bytes)
    val w = 64 + math.floorMod(checksum, 1024L).toInt
    val h = 64 + math.floorMod(checksum >> 10, 1024L).toInt
    (s"fake/$kind", w, h)
  }

  private def checksum64(bytes: Array[Byte]): Long =
    bytes.foldLeft(1469598103934665603L)((h, b) =>
      (h ^ (b & 0xff)) * 1099511628211L) // FNV-1a, pure JVM, deterministic

  /** Real header decode for raw containers, compressed images (javax
    * .imageio header-only probe — no pixel decode on the feature path),
    * JDK-supported audio containers (javax.sound.sampled probe; for
    * audio, width carries the frame count and height the channel count),
    * and — via pure-Scala container parsers (MediaHeaders) — MPEG audio
    * frame chains and ISO-BMFF (mp4) box trees. The stub is the terminal
    * fallback only for bytes in NO recognizable container; for mp3/mp4 the
    * remaining honest gap is frame DATA decode, not metadata.
    */
  private def decodeAny(kind: String,
                        bytes: Array[Byte]): (String, Int, Int) =
    RawMedia.decodeImage(bytes)
      .map(img => (s"raw/image-${img.channels}ch", img.width, img.height))
      .orElse(RawMedia.decodeVideoInfo(bytes)
        .map(v => (s"raw/video-${v.nFrames}f", v.width, v.height)))
      .orElse(CompressedMedia.sniff(bytes))
      .orElse(CompressedMedia.sniffAudio(bytes))
      .orElse(MediaHeaders.sniffMp3(bytes))
      .orElse(MediaHeaders.sniffMp4(bytes))
      .getOrElse(decodeStub(kind, bytes))

  /** Batch feature extraction: one decoder invocation per row, batched per
    * partition (the shape a vectorized codec or model runtime needs — the
    * iterator boundary is where a real implementation would group rows into
    * fixed-size device batches).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (format, w, h) = decodeAny(r.kind, r.bytes)
        MediaFeatures(r.media_id, r.kind, r.bytes.length, format, w, h,
          checksum64(r.bytes))
      }
    }
  }

  final case class ResizedMedia(
      media_id: Long, kind: String, width: Int, height: Int,
      bytes: Array[Byte])

  /** Resize to fit `maxSide`. Raw images get a REAL nearest-neighbor
    * resample + re-encode (RawMedia.resizeNearest); raw videos resample
    * every frame; undecodable (compressed) payloads fall back to the stub
    * behavior of truncating proportionally to the area ratio, which keeps
    * output sizes assertable. Typed Dataset in/out, narrow per-partition
    * map — the real shape at any scale.
    */
  def resize(media: Dataset[MediaRow], maxSide: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        RawMedia.decodeImage(r.bytes) match {
          case Some(img) =>
            val scale = math.min(1.0, maxSide.toDouble /
              math.max(img.width, img.height))
            val (nw, nh) = (math.max(1, (img.width * scale).toInt),
              math.max(1, (img.height * scale).toInt))
            val out = if (scale >= 1.0) img
              else RawMedia.resizeNearest(img, nw, nh)
            ResizedMedia(r.media_id, r.kind, out.width, out.height,
              RawMedia.encodeImage(out))
          case None => RawMedia.decodeVideoInfo(r.bytes) match {
            case Some(v) =>
              val scale = math.min(1.0, maxSide.toDouble /
                math.max(v.width, v.height))
              val (nw, nh) = (math.max(1, (v.width * scale).toInt),
                math.max(1, (v.height * scale).toInt))
              val frames = (0 until v.nFrames).map { i =>
                RawMedia.resizeNearest(RawMedia.frameAt(r.bytes, v, i),
                  nw, nh).pixels
              }
              val info = RawMedia.VideoInfo(v.nFrames, nw, nh, v.channels)
              ResizedMedia(r.media_id, r.kind, nw, nh,
                RawMedia.encodeVideo(info, frames))
            case None => CompressedMedia.decode(r.bytes) match {
              case Some(img) => // REAL compressed-image path (javax.imageio)
                val scale = math.min(1.0, maxSide.toDouble /
                  math.max(img.width, img.height))
                val (nw, nh) = (math.max(1, (img.width * scale).toInt),
                  math.max(1, (img.height * scale).toInt))
                val out = if (scale >= 1.0) img
                  else RawMedia.resizeNearest(img, nw, nh)
                ResizedMedia(r.media_id, r.kind, out.width, out.height,
                  CompressedMedia.encodePng(out))
              case None => // ==== STUB fallback (no JDK codec: audio) ====
                val (_, w, h) = decodeStub(r.kind, r.bytes)
                val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
                val (nw, nh) = (math.max(1, (w * scale).toInt),
                  math.max(1, (h * scale).toInt))
                val nBytes = math.max(1, (r.bytes.length * scale * scale).toInt)
                ResizedMedia(r.media_id, r.kind, nw, nh, r.bytes.take(nBytes))
            }
          }
        }
      }
    }
  }

  final case class Frame(media_id: Long, frame_idx: Int, offset_bytes: Long,
                         n_bytes: Int)

  /** Frame sampling: `n` evenly spaced REAL frames per multi-frame
    * container — indices spread over the container's actual frame count,
    * offsets computed from the real container layout. Two real container
    * families: raw GRVD video (RawMedia.frameOffset — fixed-stride layout)
    * and animated GIF (CompressedMedia.gifFrameRanges — a pure-Scala walk
    * of the GIF block structure yielding each frame's true byte extent; the
    * one compressed multi-frame container the JDK can also decode
    * pixel-level, asserted in MultimodalSpec). One input row fans out to n
    * output rows inside the same partition — still shuffle-free. Payloads
    * in neither family (compressed video — no JDK codec) are skipped.
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      def sampleIdx(nFrames: Int): Seq[Int] =
        (0 until n).map(i => (i.toLong * nFrames / n).toInt).distinct
      RawMedia.decodeVideoInfo(r.bytes) match {
        case Some(v) =>
          sampleIdx(v.nFrames).map(i =>
            Frame(r.media_id, i, v.frameOffset(i), v.frameBytes))
        case None => CompressedMedia.gifFrameRanges(r.bytes) match {
          case Some(ranges) if ranges.nonEmpty =>
            sampleIdx(ranges.size).map { i =>
              val (off, len) = ranges(i)
              Frame(r.media_id, i, off, len)
            }
          case _ => Seq.empty
        }
      }
    }
  }

  final case class FrameHash(media_id: Long, frame_idx: Int, dhash: Long)

  /** Per-slot perceptual hashes of `n` container-spread frames of every
    * video row (raw GRVD frame slices and per-frame-decoded animated
    * GIFs — the same two real container families sampleFrames walks).
    * `frame_idx` is the SAMPLE SLOT (0..n-1), not the container frame
    * number, so videos of different lengths compare position-wise.
    * Narrow per-partition map, no shuffle.
    */
  def videoFrameHashes(media: Dataset[MediaRow], n: Int = 4)
      : Dataset[FrameHash] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      def sampleIdx(nFrames: Int): Seq[Int] =
        (0 until n).map(i => (i.toLong * nFrames / n).toInt).distinct
      RawMedia.decodeVideoInfo(r.bytes) match {
        case Some(v) =>
          sampleIdx(v.nFrames).zipWithIndex.map { case (fi, slot) =>
            val off = v.frameOffset(fi).toInt
            val img = RawMedia.Image(v.width, v.height, v.channels,
              java.util.Arrays.copyOfRange(r.bytes, off, off + v.frameBytes))
            FrameHash(r.media_id, slot, dHash64(img))
          }
        case None => CompressedMedia.gifFrameRanges(r.bytes) match {
          case Some(ranges) if ranges.nonEmpty =>
            sampleIdx(ranges.size).zipWithIndex.flatMap { case (fi, slot) =>
              CompressedMedia.decodeFrame(r.bytes, fi)
                .map(img => FrameHash(r.media_id, slot, dHash64(img)))
            }
          case _ => Seq.empty
        }
      }
    }
  }

  /** Video near-dup detection: per SAMPLE SLOT the image pigeonhole
    * banding (hamming <= 7 over 64 bits must agree on one byte chunk),
    * candidates equi-joined on (slot, band, chunk) — position-wise, so a
    * re-cut / reversed video does NOT collide — then a pair survives
    * when at least `minMatching` slots verify within `maxHamming`. Same
    * no-all-pairs shape as every other dedup here; the per-slot join
    * adds one key column, nothing else.
    */
  def videoNearDups(frameHashes: DataFrame, maxHamming: Int = 6,
                    minMatching: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 8,
      "pigeonhole banding over 8 chunks guarantees recall only below 8")
    require(minMatching >= 1)
    val chunks = frameHashes.select(col("media_id"), col("frame_idx"),
      col("dhash"),
      explode(array((0 until 8).map(c =>
        struct(lit(c).as("band"),
          shiftright(col("dhash"), c * 8).bitwiseAND(lit(255L)).as("sig")))
        : _*)).as("bc"))
      .select(col("media_id"), col("frame_idx"), col("dhash"),
        col("bc.band").as("band"), col("bc.sig").as("sig"))
    val slotPairs = chunks
      .toDF("id_a", "frame_idx", "h_a", "band", "sig")
      .join(chunks.toDF("id_b", "frame_idx", "h_b", "band", "sig"),
        Seq("frame_idx", "band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "frame_idx", "h_a", "h_b").distinct()
      .filter(bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= maxHamming)
    slotPairs.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_matching"))
      .filter(col("n_matching") >= minMatching)
  }

  final case class AudioFeatures(
      media_id: Long, format: String, frames: Int, channels: Int,
      sample_rate: Float, duration_ms: Double,
      rms: Option[Double], peak: Option[Double])

  /** REAL PCM signal stats (RMS / absolute peak, samples normalized to
    * [-1, 1]) for every JDK-decodable audio row — the loudness/silence
    * signals an audio training-data filter keys on — plus honest
    * container metadata (frames, channels, sample rate, duration_ms) for
    * the no-codec mp3 family via the MediaHeaders frame-chain walk
    * (1152 samples per MPEG-1 Layer III frame). Signal stats for mp3 are
    * None, never faked: the row is as rich as WAV's METADATA while the
    * frame-data boundary stays labeled. Unparseable bytes are dropped.
    * Narrow per-partition map, no shuffle.
    */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").flatMap { r =>
      CompressedMedia.audioStats(r.bytes).map(s =>
        AudioFeatures(r.media_id, s.format, s.frames, s.channels,
          s.sampleRate, s.frames * 1000.0 / s.sampleRate,
          Some(s.rms), Some(s.peak)))
        .orElse(MediaHeaders.sniffMp3Info(r.bytes).map(i =>
          AudioFeatures(r.media_id, "audio/mpeg", i.frames, i.channels,
            i.sampleRate.toFloat, i.durationMs, None, None)))
    }
  }

  /** Build a media table from the documents corpus. Raw-image rows carry
    * REAL RawMedia payloads synthesized from the text bytes (pixels = UTF-8
    * bytes cycled to fill the plane); every fourth row is a REAL PNG
    * (CompressedMedia.encodePng over the same plane) exercising the
    * javax.imageio decode path; video rows alternate between raw GRVD
    * containers and REAL animated GIFs (JDK GIF writer) so both frame-
    * sampling container parsers get real input; audio rows are REAL
    * RIFF/WAVE containers decoded by the javax.sound stack. Empty documents
    * get a single zero byte so plane synthesis never divides by zero.
    */
  final case class ImageHash(media_id: Long, format: String, dhash: Long)

  /** 64-bit difference hash (dHash) of decoded pixels — the standard
    * perceptual fingerprint for image near-dup detection: average-pool
    * the grayscale image onto a 9×8 grid, emit one bit per horizontally
    * adjacent cell pair (left < right). Container-INVARIANT: the same
    * pixels stored as a raw GRIM container or a PNG hash identically
    * (PNG is lossless; asserted in MultimodalSpec), which is the actual
    * dedup scenario — one image crawled in two encodings. Integer-only
    * arithmetic (sum/count pooling, 299/587/114 luma weights), so the
    * hash is deterministic across platforms.
    */
  def dHash64(img: RawMedia.Image): Long = {
    val gw = 9; val gh = 8
    val g = Array.ofDim[Int](gh, gw)
    var y = 0
    while (y < gh) {
      val y0 = y * img.height / gh
      val y1 = math.max(y0 + 1, (y + 1) * img.height / gh)
      var x = 0
      while (x < gw) {
        val x0 = x * img.width / gw
        val x1 = math.max(x0 + 1, (x + 1) * img.width / gw)
        var sum = 0L; var n = 0
        var yy = y0
        while (yy < y1 && yy < img.height) {
          var xx = x0
          while (xx < x1 && xx < img.width) {
            val i = (yy * img.width + xx) * img.channels
            val gray =
              if (img.channels >= 3)
                (299 * (img.pixels(i) & 0xff) +
                  587 * (img.pixels(i + 1) & 0xff) +
                  114 * (img.pixels(i + 2) & 0xff)) / 1000
              else img.pixels(i) & 0xff
            sum += gray; n += 1
            xx += 1
          }
          yy += 1
        }
        g(y)(x) = (sum / n).toInt
        x += 1
      }
      y += 1
    }
    var h = 0L; var b = 0; var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        if (g(yy)(xx) < g(yy)(xx + 1)) h |= (1L << b)
        b += 1; xx += 1
      }
      yy += 1
    }
    h
  }

  /** 64-bit DCT perceptual hash (pHash) — the frequency-domain
    * fingerprint that survives RESAMPLING: average-pool the grayscale
    * image onto a 32×32 grid, 2-D DCT-II (separable, precomputed cosine
    * table), keep the 8×8 lowest-frequency block, one bit per
    * coefficient vs the block's median. Because the low-frequency
    * spectrum is what resampling preserves, a rescaled copy hashes
    * within a few bits — the robustness dHash's local-gradient bits
    * don't have (asserted in MultimodalSpec on a smooth gradient image).
    * All double math is a fixed sequential loop — deterministic across
    * partitionings; the hash compare downstream is pure integer.
    *
    * Same banding/dedup path as dHash: feed [[hammingNearDups]].
    */
  def pHash64(img: RawMedia.Image): Long = {
    val N = 32
    val g = Array.ofDim[Double](N, N)
    var y = 0
    while (y < N) {
      val y0 = y * img.height / N
      val y1 = math.max(y0 + 1, (y + 1) * img.height / N)
      var x = 0
      while (x < N) {
        val x0 = x * img.width / N
        val x1 = math.max(x0 + 1, (x + 1) * img.width / N)
        var sum = 0L; var n = 0
        var yy = y0
        while (yy < y1 && yy < img.height) {
          var xx = x0
          while (xx < x1 && xx < img.width) {
            val i = (yy * img.width + xx) * img.channels
            val gray =
              if (img.channels >= 3)
                (299 * (img.pixels(i) & 0xff) +
                  587 * (img.pixels(i + 1) & 0xff) +
                  114 * (img.pixels(i + 2) & 0xff)) / 1000
              else img.pixels(i) & 0xff
            sum += gray; n += 1
            xx += 1
          }
          yy += 1
        }
        g(y)(x) = sum.toDouble / n
        x += 1
      }
      y += 1
    }
    // separable DCT-II restricted to the 8x8 output block
    val cosT = Array.tabulate(8, N)((u, i) =>
      math.cos((2 * i + 1) * u * math.Pi / (2 * N)))
    val coef = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < N) {
          var xx = 0
          while (xx < N) {
            acc += g(yy)(xx) * cosT(u)(yy) * cosT(v)(xx)
            xx += 1
          }
          yy += 1
        }
        coef(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    val sorted = coef.clone(); java.util.Arrays.sort(sorted)
    val median = (sorted(31) + sorted(32)) / 2.0
    var h = 0L; var b = 0
    while (b < 64) {
      if (coef(b) > median) h |= (1L << b)
      b += 1
    }
    h
  }

  /** Per-partition pixel decode + dHash of every image row (raw container
    * or any javax.imageio codec). Narrow map, no shuffle — the hash is
    * ~1e7x smaller than the pixels, so at 100 TB this is the projection
    * you run ONCE and store.
    */
  def imageHashes(media: Dataset[MediaRow],
                  hashFn: RawMedia.Image => Long = dHash64)
      : Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "image").flatMap { r =>
        RawMedia.decodeImage(r.bytes).map(("raw", _))
          .orElse(CompressedMedia.decode(r.bytes).map(("compressed", _)))
          .map { case (fmt, img) => ImageHash(r.media_id, fmt, hashFn(img)) }
      }
    }
  }

  final case class AudioHash(media_id: Long, format: String, dhash: Long)

  /** 64-bit loudness-envelope hash of decoded audio: the PCM stream is
    * pooled into 65 equal RMS frames and each bit records whether the
    * envelope RISES between consecutive frames — the audio analog of the
    * image dHash. Comparisons make it AMPLITUDE-invariant (the same
    * recording at half volume hashes identically) and the decode
    * normalization makes it container-invariant (WAV/AIFF/AU of the same
    * samples agree; asserted in MultimodalSpec). Like any envelope
    * fingerprint, audio with an identical loudness contour collides —
    * this is loudness-SHAPE identity, the cheap first pass before
    * spectral fingerprinting.
    */
  def audioHash64(samples: Array[Double]): Long = {
    val frames = 65
    val n = samples.length
    if (n == 0) return 0L
    val env = new Array[Double](frames)
    var f = 0
    while (f < frames) {
      val lo = f.toLong * n / frames
      val hi = math.max(lo + 1, (f + 1).toLong * n / frames)
      var s = 0.0
      var i = lo
      while (i < hi && i < n) { s += samples(i.toInt) * samples(i.toInt); i += 1 }
      env(f) = math.sqrt(s / (hi - lo))
      f += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (env(b + 1) > env(b)) h |= (1L << b)
      b += 1
    }
    h
  }

  /** Per-partition decode + envelope hash of every audio row the JDK can
    * decode (WAV/AIFF/AU; mp3 rows are skipped — no pure-JDK codec).
    * Narrow map, no shuffle, same projection-once-store-forever shape as
    * imageHashes.
    */
  def audioHashes(media: Dataset[MediaRow]): Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "audio").flatMap { r =>
        CompressedMedia.decodeSamples(r.bytes)
          .map(s => AudioHash(r.media_id, "pcm", audioHash64(s)))
      }
    }
  }

  /** Near-dup pairs of any 64-bit perceptual hash with hamming distance ≤
    * `maxHamming` (must be < 8): the same 8×8-bit pigeonhole banding as
    * SimHash text dedup — two 64-bit hashes within hamming 7 must agree
    * exactly on at least one byte chunk, so candidates come from an
    * equi-join on (band, chunk), never an all-pairs compare; the exact
    * hamming verify is one codegen'd bit_count(xor). Shared by the image
    * dHash and audio envelope-hash dedup. Same 100 TB shape as every
    * other dedup operator here: banding join + cheap verify, no
    * cartesian.
    */
  def hammingNearDups(hashes: DataFrame, maxHamming: Int = 6): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 8,
      "pigeonhole banding over 8 chunks guarantees recall only below 8")
    val chunks = hashes.select(col("media_id"), col("dhash"),
      explode(array((0 until 8).map(c =>
        struct(lit(c).as("band"),
          shiftright(col("dhash"), c * 8).bitwiseAND(lit(255L)).as("sig")))
        : _*)).as("bc"))
      .select(col("media_id"), col("dhash"),
        col("bc.band").as("band"), col("bc.sig").as("sig"))
    chunks.toDF("id_a", "h_a", "band", "sig")
      .join(chunks.toDF("id_b", "h_b", "band", "sig"), Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  def imageNearDups(hashes: DataFrame, maxHamming: Int = 6): DataFrame =
    hammingNearDups(hashes, maxHamming)

  def mediaFromDocuments(spark: SparkSession,
                         docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val utf8 = text.getBytes("UTF-8")
          val raw = if (utf8.isEmpty) Array[Byte](0) else utf8
          def plane(w: Int, h: Int, c: Int, phase: Int): Array[Byte] = {
            val out = new Array[Byte](w * h * c)
            var i = 0
            while (i < out.length) {
              out(i) = raw((i + phase) % raw.length)
              i += 1
            }
            out
          }
          id % 4 match {
            case 0 => // raw image: dims derived from the text, payload real
              val w = 8 + (raw.length % 24)
              val h = 8 + ((raw.length / 2) % 24)
              MediaRow(id, "image",
                RawMedia.encodeImage(RawMedia.Image(w, h, 3, plane(w, h, 3, 0))))
            case 1 => // compressed image: a REAL PNG of the same plane
              val w = 8 + (raw.length % 24)
              val h = 8 + ((raw.length / 2) % 24)
              MediaRow(id, "image",
                CompressedMedia.encodePng(RawMedia.Image(w, h, 3, plane(w, h, 3, 0))))
            case 2 => // video: 4-11 frames of a small plane. Every other
              // video row is a REAL animated GIF (JDK GIF writer sequence
              // API) so the compressed-container frame path is exercised;
              // the rest are raw GRVD containers.
              val nf = 4 + (raw.length % 8)
              val (w, h) = (12, 8)
              val frames = (0 until nf).map(f => plane(w, h, 3, f))
              val payload =
                if (id % 8 == 2)
                  RawMedia.encodeVideo(RawMedia.VideoInfo(nf, w, h, 3), frames)
                else
                  CompressedMedia.encodeGifAnimation(
                    frames.map(RawMedia.Image(w, h, 3, _)))
              MediaRow(id, "video", payload)
            case _ => // audio: alternating REAL RIFF/WAVE containers (8-bit
              // PCM mono from the text bytes, javax.sound-decodable) and
              // MPEG-audio frame chains (real headers, silence payload —
              // the mp3 header-sniff path)
              if (id % 8 == 3)
                MediaRow(id, "audio", CompressedMedia.encodeWav(raw))
              else
                MediaRow(id, "audio",
                  MediaHeaders.encodeMp3Silence(2 + (raw.length % 6)))
          }
        }
      }
  }
}
