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
    assert(f1.filter(_.kind == "video").forall(_.format.startsWith("raw/video-")))
    // audio rows are REAL WAV containers: frame count == source byte count
    assert(f1.filter(_.kind == "audio").forall(f =>
      f.format == "audio/wav" && f.width > 0 && f.height == 1))
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
    resized.filter(_.kind == "video").foreach { r =>
      val v = RawMedia.decodeVideoInfo(r.bytes).get
      assert(v.width == r.width && v.height == r.height)
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
       "offsets, videos only") {
    val m = media
    val frames = Multimodal.sampleFrames(m, n = 4).collect()
    val videos = m.filter(_.kind == "video").collect()
      .map(r => r.media_id -> r.bytes).toMap
    assert(frames.map(_.media_id).toSet == videos.keySet)
    assert(frames.length == videos.size * 4)
    frames.groupBy(_.media_id).foreach { case (id, fs) =>
      val v = RawMedia.decodeVideoInfo(videos(id)).get
      fs.foreach { f =>
        assert(f.offset_bytes == v.frameOffset(f.frame_idx)) // real layout
        assert(f.n_bytes == v.frameBytes)
        assert(f.frame_idx >= 0 && f.frame_idx < v.nFrames)
      }
      assert(fs.map(_.frame_idx).distinct.length == 4)
    }
  }
}
