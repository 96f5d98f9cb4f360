package graft.llm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.mediaFromDocuments(spark,
    graft.Tables.documents(spark, "/root/testdata/sf0.001"))

  test("media table: binary payload + kind metadata from documents") {
    val m = media
    assert(m.schema("bytes").dataType.typeName == "binary")
    val row = m.filter(_.media_id == 0L).head()
    assert(row.kind == "image")
    assert(RawMedia.decodeImage(row.bytes).nonEmpty) // a REAL raw payload
  }

  test("raw image codec round-trips and resizes with exact pixel math") {
    // 2x2 single-channel image: nearest-neighbor to 1x1 keeps pixel (0,0)
    val img = RawMedia.Image(2, 2, 1, Array[Byte](10, 20, 30, 40))
    val decoded = RawMedia.decodeImage(RawMedia.encodeImage(img)).get
    assert(decoded == img.copy(pixels = decoded.pixels) &&
      decoded.pixels.toSeq == img.pixels.toSeq)
    val small = RawMedia.resizeNearest(img, 1, 1)
    assert(small.pixels.toSeq == Seq(10.toByte))
    // upscale 1x1 -> 2x2 replicates the pixel
    val up = RawMedia.resizeNearest(small, 2, 2)
    assert(up.pixels.toSeq == Seq.fill(4)(10.toByte))
  }

  test("feature extraction: real header decode for raw media, real " +
       "javax.imageio probe for PNG rows, stub only for opaque payloads; " +
       "stable checksums") {
    val m = media
    val f1 = Multimodal.extractFeatures(m).collect().sortBy(_.media_id)
    assert(f1.length == m.count())
    // raw images and PNGs both decode for real; audio (no JDK codec) stubs
    assert(f1.filter(f => f.kind == "image" && f.media_id % 4 == 0).forall(f =>
      f.format == "raw/image-3ch" && f.width >= 8 && f.width < 32))
    assert(f1.filter(f => f.kind == "image" && f.media_id % 4 == 1).forall(f =>
      f.format == "image/png" && f.width >= 8 && f.width < 32))
    assert(f1.exists(_.format == "image/png"))
    // video rows alternate raw GRVD (id%8==2) and animated GIF (id%8==6);
    // both decode for real (GIF via the javax.imageio sniff)
    assert(f1.filter(f => f.kind == "video" && f.media_id % 8 == 2)
      .forall(_.format.startsWith("raw/video-")))
    assert(f1.filter(f => f.kind == "video" && f.media_id % 8 == 6)
      .forall(_.format == "image/gif"))
    // audio rows alternate REAL WAV containers (frame count == source byte
    // count) and MPEG frame chains parsed by the pure-Scala header walker
    assert(f1.filter(f => f.kind == "audio" && f.media_id % 8 == 3).forall(f =>
      f.format == "audio/wav" && f.width > 0 && f.height == 1))
    assert(f1.filter(f => f.kind == "audio" && f.media_id % 8 == 7).forall(f =>
      f.format == "audio/mpeg" && f.width >= 2 && f.height == 1))
    // deterministic across repartitionings
    val f2 = Multimodal.extractFeatures(m.repartition(7)).collect()
      .sortBy(_.media_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    // the decoded image dims equal the synthesis formula's dims
    val bytes0 = m.filter(_.media_id == 0L).head().bytes
    val img0 = RawMedia.decodeImage(bytes0).get
    assert(f1.head.width == img0.width && f1.head.height == img0.height)
  }

  test("resize really resamples raw payloads (output re-decodes at the " +
       "capped size) and caps stub payloads") {
    val m = media
    val resized = Multimodal.resize(m, maxSide = 16).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(r => r.width <= 16 && r.height <= 16))
    resized.filter(r => r.kind == "image" && r.media_id % 4 == 0).foreach { r =>
      val img = RawMedia.decodeImage(r.bytes).get // still a valid container
      assert(img.width == r.width && img.height == r.height)
    }
    resized.filter(r => r.kind == "image" && r.media_id % 4 == 1).foreach { r =>
      val img = CompressedMedia.decode(r.bytes).get // still a valid PNG
      assert(img.width == r.width && img.height == r.height)
    }
    resized.filter(r => r.kind == "video" && r.media_id % 8 == 2).foreach { r =>
      val v = RawMedia.decodeVideoInfo(r.bytes).get
      assert(v.width == r.width && v.height == r.height)
    }
    // GIF videos resize through the compressed-image path (first frame)
    resized.filter(r => r.kind == "video" && r.media_id % 8 == 6).foreach { r =>
      val img = CompressedMedia.decode(r.bytes).get
      assert(img.width == r.width && img.height == r.height)
    }
  }

  test("CompressedMedia: PNG encode/decode round-trips pixels exactly; " +
       "sniff reads true dimensions from the header alone") {
    val img = RawMedia.Image(5, 3, 3,
      Array.tabulate(5 * 3 * 3)(i => (i * 17 % 251).toByte))
    val png = CompressedMedia.encodePng(img)
    // real PNG magic bytes
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' &&
      png(3) == 'G')
    val (fmt, w, h) = CompressedMedia.sniff(png).get
    assert(fmt == "image/png" && w == 5 && h == 3)
    val back = CompressedMedia.decode(png).get
    assert(back.width == 5 && back.height == 3 && back.channels == 3)
    assert(back.pixels.toSeq == img.pixels.toSeq) // PNG is lossless
    // non-image bytes are rejected, not crashed on
    assert(CompressedMedia.sniff("not an image".getBytes).isEmpty)
    assert(CompressedMedia.decode("not an image".getBytes).isEmpty)
  }

  test("WAV audio: real RIFF container round-trips through the " +
       "javax.sound header probe; opaque bytes still hit the stub") {
    val samples = Array.tabulate(100)(i => (i * 7 % 251).toByte)
    val wav = CompressedMedia.encodeWav(samples)
    assert(new String(wav.take(4)) == "RIFF" &&
      new String(wav.slice(8, 12)) == "WAVE")
    val (fmt, frames, channels) = CompressedMedia.sniffAudio(wav).get
    assert(fmt == "audio/wav" && frames == 100 && channels == 1)
    assert(CompressedMedia.sniffAudio("not audio at all".getBytes).isEmpty)
    // the stub remains the terminal fallback for undecodable payloads
    val (sf, _, _) = Multimodal.decodeStub("audio", "opaque".getBytes)
    assert(sf == "fake/audio")
  }

  test("empty documents synthesize media without crashing (zero-byte guard)") {
    import spark.implicits._
    val docs = Seq((0L, ""), (1L, ""), (2L, ""), (3L, ""))
      .toDF("doc_id", "text")
    val rows = Multimodal.mediaFromDocuments(spark, docs).collect()
    assert(rows.length == 4)
    val f = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, docs)).collect()
    assert(f.length == 4)
    assert(f.find(_.media_id == 1L).get.format == "image/png")
  }

  test("frame sampling: n evenly spaced real frames with container-true " +
       "offsets, videos only — raw GRVD and animated GIF containers") {
    val m = media
    val frames = Multimodal.sampleFrames(m, n = 4).collect()
    val videos = m.filter(_.kind == "video").collect()
      .map(r => r.media_id -> r.bytes).toMap
    assert(frames.map(_.media_id).toSet == videos.keySet)
    assert(frames.length == videos.size * 4)
    frames.groupBy(_.media_id).foreach { case (id, fs) =>
      RawMedia.decodeVideoInfo(videos(id)) match {
        case Some(v) => // raw container: fixed-stride layout
          fs.foreach { f =>
            assert(f.offset_bytes == v.frameOffset(f.frame_idx))
            assert(f.n_bytes == v.frameBytes)
            assert(f.frame_idx >= 0 && f.frame_idx < v.nFrames)
          }
        case None => // animated GIF: offsets from the block-structure walk
          val ranges = CompressedMedia.gifFrameRanges(videos(id)).get
          fs.foreach { f =>
            assert((f.offset_bytes, f.n_bytes.toLong) ==
              (ranges(f.frame_idx)._1, ranges(f.frame_idx)._2.toLong))
            // each frame extent starts at a real GIF image descriptor
            assert((videos(id)(f.offset_bytes.toInt) & 0xff) == 0x2c)
          }
      }
      assert(fs.map(_.frame_idx).distinct.length == 4)
    }
  }

  test("animated GIF: JDK-encoded multi-frame container round-trips " +
       "frame count, byte extents, and exact pixels per frame") {
    // 3 solid-color frames from a tiny palette: GIF quantization is exact
    val colors = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255))
    val frames = colors.map { case (r, g, b) =>
      RawMedia.Image(6, 4, 3, Array.tabulate(6 * 4 * 3)(i => (i % 3 match {
        case 0 => r; case 1 => g; case _ => b
      }).toByte))
    }
    val gif = CompressedMedia.encodeGifAnimation(frames)
    assert(new String(gif.take(6), "US-ASCII").startsWith("GIF8"))
    val ranges = CompressedMedia.gifFrameRanges(gif).get
    assert(ranges.size == 3)
    // extents are disjoint, in order, and each starts at an image descriptor
    ranges.sliding(2).foreach { case Vector((o1, l1), (o2, _)) =>
      assert(o1 + l1 <= o2)
    case _ => ()
    }
    ranges.foreach { case (off, len) =>
      assert((gif(off.toInt) & 0xff) == 0x2c && len > 10)
    }
    // pixel-exact per-frame decode via the JDK GIF reader
    colors.zipWithIndex.foreach { case ((r, g, b), i) =>
      val img = CompressedMedia.decodeFrame(gif, i).get
      assert(img.width == 6 && img.height == 4)
      assert(img.pixels.grouped(3).forall(px =>
        (px(0) & 0xff) == r && (px(1) & 0xff) == g && (px(2) & 0xff) == b))
    }
    assert(CompressedMedia.decodeFrame(gif, 3).isEmpty) // out of range
    assert(CompressedMedia.gifFrameRanges("not a gif".getBytes).isEmpty)
    // sampleFrames over a 1-row dataset lands on the GIF path end-to-end
    import spark.implicits._
    val ds = Seq(Multimodal.MediaRow(7L, "video", gif)).toDS()
    val sampled = Multimodal.sampleFrames(ds, n = 2).collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq == Seq(0, 1))
    assert(sampled.map(f => (f.offset_bytes, f.n_bytes.toLong)).toSeq ==
      Seq(ranges(0), ranges(1)).map { case (o, l) => (o, l) })
  }

  test("mp3 header walk: frame chain counted through an ID3v2 tag; " +
       "sync-lookalike bytes rejected") {
    val mp3 = MediaHeaders.encodeMp3Silence(5, mono = true, id3Padding = 40)
    val (fmt, frames, ch) = MediaHeaders.sniffMp3(mp3).get
    assert(fmt == "audio/mpeg" && frames == 5 && ch == 1)
    // header-derived duration: 5 frames x 1152 samples at 44.1 kHz
    val info = MediaHeaders.sniffMp3Info(mp3).get
    assert(info.sampleRate == 44100 &&
      math.abs(info.durationMs - 5 * 1152.0 * 1000 / 44100) < 1e-9)
    val stereo = MediaHeaders.encodeMp3Silence(3, mono = false)
    assert(MediaHeaders.sniffMp3(stereo).get == (("audio/mpeg", 3, 2)))
    // a lone sync word is not an mp3 (needs >= 2 chained valid frames)
    assert(MediaHeaders.sniffMp3(
      Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00)).isEmpty)
    // a WAV container must not be claimed as mp3
    val wav = CompressedMedia.encodeWav(Array.fill(64)(1.toByte))
    assert(MediaHeaders.sniffMp3(wav).isEmpty)
    // truncating mid-chain breaks the walk -> rejected
    assert(MediaHeaders.sniffMp3(mp3.take(mp3.length - 500)).isEmpty ||
      MediaHeaders.sniffMp3(mp3.take(mp3.length - 500)).get._2 < 5)
  }

  test("mp4 box walk: tkhd dimensions read from a well-formed ISO-BMFF " +
       "shell; malformed trees rejected") {
    val mp4 = MediaHeaders.encodeMp4Shell(640, 360)
    assert(new String(mp4.slice(4, 8), "US-ASCII") == "ftyp")
    assert(MediaHeaders.sniffMp4(mp4).get == (("video/mp4", 640, 360)))
    // no ftyp -> not claimed
    assert(MediaHeaders.sniffMp4(mp4.drop(16)).isEmpty)
    assert(MediaHeaders.sniffMp4("random junk bytes".getBytes).isEmpty)
    // the features path picks the mp4 sniff up end-to-end
    import spark.implicits._
    val ds = Seq(Multimodal.MediaRow(1L, "video", mp4)).toDS()
    val f = Multimodal.extractFeatures(ds).head()
    assert(f.format == "video/mp4" && f.width == 640 && f.height == 360)
    // mvhd duration: default shell is 1000/1000 -> 1000 ms; a custom
    // timescale/duration replays duration/timescale exactly
    assert(MediaHeaders.mp4DurationMs(mp4).get == 1000L)
    val long = MediaHeaders.encodeMp4Shell(320, 240,
      timescale = 600, duration = 1800)
    assert(MediaHeaders.mp4DurationMs(long).get == 3000L)
    assert(MediaHeaders.mp4DurationMs("random junk bytes".getBytes).isEmpty)
  }

  test("audio stats: REAL PCM decode — RMS of a synthesized sine wave " +
       "matches amplitude/sqrt(2), silence is 0, peak is the amplitude") {
    // 8-bit unsigned mono sine, amplitude 100/128 full scale, many periods
    val n = 8000
    val amp = 100.0
    val sine = Array.tabulate(n)(i =>
      (128 + amp * math.sin(2 * math.Pi * 440 * i / 8000.0)).round.toByte)
    val wav = CompressedMedia.encodeWav(sine)
    val s = CompressedMedia.audioStats(wav).get
    assert(s.format == "audio/wav" && s.channels == 1 && s.frames == n)
    val expectedRms = (amp / 128.0) / math.sqrt(2.0)
    assert(math.abs(s.rms - expectedRms) < 0.01, s"rms=${s.rms}")
    assert(math.abs(s.peak - amp / 128.0) < 0.02, s"peak=${s.peak}")
    // silence
    val silent = CompressedMedia.audioStats(
      CompressedMedia.encodeWav(Array.fill(100)(128.toByte))).get
    assert(silent.rms < 0.005 && silent.peak < 0.005)
    // undecodable bytes are dropped, not faked
    assert(CompressedMedia.audioStats("not audio".getBytes).isEmpty)
    // the Dataset operator: WAV rows get PCM stats + duration, mp3 rows
    // get honest header metadata (duration from the frame chain) with
    // None stats, unparseable bytes are dropped, non-audio kinds ignored
    import spark.implicits._
    val mp3 = MediaHeaders.encodeMp3Silence(5)
    val ds = Seq(
      Multimodal.MediaRow(1L, "audio", wav),
      Multimodal.MediaRow(2L, "audio", "opaque-junk".getBytes),
      Multimodal.MediaRow(3L, "video", wav),
      Multimodal.MediaRow(4L, "audio", mp3)).toDS()
    val feats = Multimodal.audioFeatures(ds).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 4L))
    assert(math.abs(feats(0).rms.get - expectedRms) < 0.01)
    // 8000 frames at 8 kHz = exactly one second
    assert(math.abs(feats(0).duration_ms - 1000.0) < 1e-9)
    assert(feats(1).format == "audio/mpeg" && feats(1).frames == 5 &&
      feats(1).rms.isEmpty && feats(1).peak.isEmpty &&
      math.abs(feats(1).duration_ms - 5 * 1152.0 * 1000 / 44100) < 1e-9)
  }

  test("dHash: container-invariant, stable under tiny perturbation, far " +
       "for opposite gradients") {
    def gradient(w: Int, h: Int, reversed: Boolean): RawMedia.Image = {
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val v = (if (reversed) (w - 1 - x) else x) * 255 / (w - 1)
        px((y * w + x) * 3 + c) = v.toByte
      }
      RawMedia.Image(w, h, 3, px)
    }
    val img = gradient(32, 32, reversed = false)
    val hRaw = Multimodal.dHash64(img)
    // PNG round-trip is lossless -> identical hash across containers
    val hPng = Multimodal.dHash64(
      CompressedMedia.decode(CompressedMedia.encodePng(img)).get)
    assert(hRaw == hPng)
    // a left->right gradient brightens at every adjacent step: all 64 bits
    assert(hRaw == -1L)
    assert(Multimodal.dHash64(gradient(32, 32, reversed = true)) == 0L)
    // one slightly-altered pixel moves the hash by at most a couple bits
    val perturbed = img.pixels.clone()
    perturbed(3 * (5 * 32 + 7)) = (perturbed(3 * (5 * 32 + 7)) + 9).toByte
    val hNear = Multimodal.dHash64(RawMedia.Image(32, 32, 3, perturbed))
    assert(java.lang.Long.bitCount(hRaw ^ hNear) <= 2)
  }

  test("imageNearDups: banded join finds the near pair, not the far one, " +
       "with no cartesian") {
    import spark.implicits._
    val hashes = Seq(
      (1L, "raw", -1L),                  // all-ones
      (2L, "compressed", -1L ^ 3L),      // hamming 2 from id 1
      (3L, "raw", 0L)                    // hamming 64/62 from 1/2
    ).toDF("media_id", "format", "dhash")
    val out = Multimodal.imageNearDups(hashes, maxHamming = 6)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 2)), pairs)
  }

  test("audio envelope hash: amplitude- and container-invariant, far for " +
       "a reversed envelope") {
    // AM-modulated tone over a monotone loudness ramp (asymmetric, so the
    // reversed contour is a genuinely different envelope)
    def am(reversed: Boolean): Array[Double] = {
      val n = 8000
      Array.tabulate(n) { i =>
        val t = i.toDouble / n
        val env = if (reversed) 1.0 - t else t
        env * math.sin(2 * math.Pi * 440 * i / 8000.0)
      }
    }
    val up = am(reversed = false)
    val h = Multimodal.audioHash64(up)
    // half volume: comparisons unchanged -> identical hash
    assert(Multimodal.audioHash64(up.map(_ * 0.5)) == h)
    // container invariance: the same 8-bit samples through a real WAV
    // encode/decode round-trip hash identically
    val bytes8 = up.map(v => (v * 127 + 128).toInt.max(0).min(255).toByte)
    val viaWav = CompressedMedia.decodeSamples(
      CompressedMedia.encodeWav(bytes8)).get
    val direct8 = bytes8.map(b => ((b & 0xff) - 128) / 128.0)
    assert(Multimodal.audioHash64(viaWav) == Multimodal.audioHash64(direct8))
    // a reversed loudness contour flips most envelope comparisons
    val hRev = Multimodal.audioHash64(am(reversed = true))
    assert(java.lang.Long.bitCount(h ^ hRev) > 20,
      s"hamming=${java.lang.Long.bitCount(h ^ hRev)}")
  }

  test("the audio-dedup driver entry pairs every decodable row with its " +
       "half-volume twin") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val twins = media.filter(_.kind == "audio")
      .flatMap { m =>
        CompressedMedia.decodeSamples(m.bytes).map { samples =>
          val scaled = samples.map(v =>
            (v * 0.5 * 128 + 128).toInt.max(0).min(255).toByte)
          Multimodal.MediaRow(m.media_id + 1000000L, "audio",
            CompressedMedia.encodeWav(scaled))
        }
      }
    val nDecodable = twins.count()
    assert(nDecodable > 0)
    val pairs = Multimodal.hammingNearDups(
      Multimodal.audioHashes(media.union(twins)).toDF()).collect()
    val twinPairs = pairs.filter(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(twinPairs.length == nDecodable,
      s"found ${twinPairs.length} of $nDecodable twin pairs")
  }

  test("the image-dedup driver entry surfaces every planted PNG twin at " +
       "hamming 0") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    import spark.implicits._
    val twins = media.filter(m => m.kind == "image" && m.media_id % 4 == 0)
      .map(m => Multimodal.MediaRow(m.media_id + 1000000L, "image",
        CompressedMedia.encodePng(RawMedia.decodeImage(m.bytes).get)))
    val nRaw = twins.count()
    val pairs = Multimodal.imageNearDups(
      Multimodal.imageHashes(media.union(twins)).toDF()).collect()
    val twinPairs = pairs.filter(r =>
      r.getLong(1) == r.getLong(0) + 1000000L).map(r => r.getInt(2))
    assert(twinPairs.length == nRaw && twinPairs.forall(_ == 0))
  }

  test("video dedup: byte twins match on every sampled slot; a REVERSED " +
       "cut does not survive the position-wise join") {
    import spark.implicits._
    def frame(seed: Int): RawMedia.Image = {
      // distinct smooth frames: a ramp whose slope direction flips with
      // the seed, so frame hashes differ strongly across the sequence
      val (w, h) = (32, 32)
      val px = new Array[Byte](w * h * 3)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = seed match {
            case 0 => 255 * x / w
            case 1 => 255 * y / h
            case 2 => 255 - 255 * x / w
            case _ => 255 - 255 * y / h
          }
          px(i) = v.toByte; px(i + 1) = v.toByte; px(i + 2) = v.toByte
          i += 3; x += 1
        }
        y += 1
      }
      RawMedia.Image(w, h, 3, px)
    }
    val frames = (0 until 4).map(frame)
    val fwd = CompressedMedia.encodeGifAnimation(frames)
    val fwdCopy = CompressedMedia.encodeGifAnimation(frames)
    val rev = CompressedMedia.encodeGifAnimation(frames.reverse)
    val media = Seq(
      Multimodal.MediaRow(1L, "video", fwd),
      Multimodal.MediaRow(2L, "video", fwdCopy),
      Multimodal.MediaRow(3L, "video", rev)).toDS()
    val pairs = Multimodal.videoNearDups(
        Multimodal.videoFrameHashes(media, n = 4).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 4L)),
      s"only the same-order pair may survive: ${pairs.mkString(",")}")
  }

  test("pHash: survives resampling on smooth content (the dHash gap), " +
       "identical pixels hash identically, distinct content stays far") {
    def smooth(w: Int, h: Int): RawMedia.Image = {
      val px = new Array[Byte](w * h * 3)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // smooth 2-D ramp + a broad diagonal wave: real low-frequency
          // content, which is exactly what pHash fingerprints
          val v = (96 + 64.0 * x / w + 48.0 * y / h +
            32 * math.sin((x + 2.0 * y) / 17.0)).toInt.min(255).max(0)
          px(i) = v.toByte; px(i + 1) = v.toByte; px(i + 2) = v.toByte
          i += 3; x += 1
        }
        y += 1
      }
      RawMedia.Image(w, h, 3, px)
    }
    val img = smooth(96, 64)
    val hOrig = Multimodal.pHash64(img)
    // nearest-neighbor downscale to 3/4 — a resample, not a re-encode
    val hResized = Multimodal.pHash64(RawMedia.resizeNearest(img, 72, 48))
    val d = java.lang.Long.bitCount(hOrig ^ hResized)
    assert(d <= 6, s"pHash must survive resampling: hamming $d")
    // identical pixels -> identical hash (PNG round trip)
    assert(Multimodal.pHash64(
      CompressedMedia.decode(CompressedMedia.encodePng(img)).get) == hOrig)
    // genuinely different low-frequency content stays far away
    val other = smooth(96, 64)
    val px2 = other.pixels.clone()
    var i = 0
    while (i < px2.length) { px2(i) = (255 - (px2(i) & 0xff)).toByte; i += 1 }
    val hInv = Multimodal.pHash64(RawMedia.Image(96, 64, 3, px2))
    assert(java.lang.Long.bitCount(hOrig ^ hInv) >= 20,
      "inverted ramp must not collide")
  }

  test("metadata round-trip: the decode chain recovers exactly the " +
       "synthesis-formula metadata for every id-mod case (the " +
       "multimodal_features_meta oracle contract)") {
    import spark.implicits._
    // ids 0..7 cover all 8 container branches; text lengths vary dims
    val docs = (0L to 7L).map(i =>
      (i, "x" * (3 + 7 * i.toInt), "en", "src0", (3 + 7 * i).toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, docs)).collect()
      .map(f => f.media_id -> f).toMap
    for (i <- 0L to 7L) {
      val rl = 3 + 7 * i.toInt
      val f = feats(i)
      (i % 4, i % 8) match {
        case (0, _) =>
          assert(f.kind == "image" && f.format == "raw/image-3ch" &&
            f.width == 8 + rl % 24 && f.height == 8 + (rl / 2) % 24)
        case (1, _) =>
          assert(f.kind == "image" && f.format == "image/png" &&
            f.width == 8 + rl % 24 && f.height == 8 + (rl / 2) % 24)
        case (2, 2) =>
          assert(f.kind == "video" &&
            f.format == s"raw/video-${4 + rl % 8}f" &&
            f.width == 12 && f.height == 8)
        case (2, _) =>
          assert(f.kind == "video" && f.format == "image/gif" &&
            f.width == 12 && f.height == 8)
        case (3, 3) =>
          assert(f.kind == "audio" && f.format == "audio/wav" &&
            f.width == rl && f.height == 1)
        case _ =>
          assert(f.kind == "audio" && f.format == "audio/mpeg" &&
            f.width == 2 + rl % 6 && f.height == 1)
      }
    }
  }
}
