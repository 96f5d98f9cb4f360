package graft.llm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("media table: binary payload + kind metadata from documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    assert(media.schema("bytes").dataType.typeName == "binary")
    val row = media.filter(_.media_id == 0L).head()
    assert(row.kind == "image")
    assert(new String(row.bytes, "UTF-8").nonEmpty)
  }

  test("feature extraction: deterministic stub decode, stable checksums") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val f1 = Multimodal.extractFeatures(media).collect()
      .sortBy(_.media_id)
    assert(f1.length == docs.count())
    assert(f1.forall(f => f.width >= 64 && f.height >= 64))
    assert(f1.forall(f => f.format == s"fake/${f.kind}"))
    // deterministic across repartitionings
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect()
      .sortBy(_.media_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    // checksum matches a local recomputation of the same bytes
    val bytes0 = media.filter(_.media_id == 0L).head().bytes
    val expected = bytes0.foldLeft(1469598103934665603L)((h, b) =>
      (h ^ (b & 0xff)) * 1099511628211L)
    assert(f1.head.checksum == expected)
  }

  test("resize caps the longest side and shrinks payload quadratically") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val resized = Multimodal.resize(media, maxSide = 128).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(r => r.width <= 128 && r.height <= 128))
    val orig = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    resized.foreach { r =>
      val o = orig(r.media_id)
      if (o.width <= 128 && o.height <= 128)
        assert(r.width == o.width && r.height == o.height)
    }
  }

  test("frame sampling: n evenly spaced offsets per video only") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val frames = Multimodal.sampleFrames(media, n = 4).collect()
    val nVideos = media.filter(_.kind == "video").count()
    assert(frames.length == nVideos * 4)
    val byMedia = frames.groupBy(_.media_id)
    byMedia.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
      assert(fs.sortBy(_.frame_idx).map(_.offset_bytes).toSeq ==
        fs.sortBy(_.frame_idx).map(_.offset_bytes).sorted.toSeq)
    }
  }
}
