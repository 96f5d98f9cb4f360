package graft.llm

import graft.SparkSpec

class ContentChunksSpec extends SparkSpec {

  private val base = ("the quick brown fox jumps over the lazy dog and " +
    "then runs far away into the deep dark woods where nobody goes ") * 8

  test("chunks cover the input exactly, respect min/max bounds, and are " +
       "deterministic") {
    val bytes = base.getBytes("UTF-8")
    val spans = ContentChunks.chunkSpans(bytes)
    assert(spans.head._1 == 0)
    assert(spans.map(_._2).sum == bytes.length, "spans must cover all bytes")
    spans.zip(spans.tail).foreach { case ((o1, l1), (o2, _)) =>
      assert(o1 + l1 == o2, "spans must be contiguous")
    }
    spans.dropRight(1).foreach { case (_, l) =>
      assert(l >= 16 && l <= 256, s"span length $l out of [16,256]")
    }
    assert(ContentChunks.chunkSpans(bytes) == spans)
  }

  test("shift resistance: a prefix insertion re-synchronizes — most chunk " +
       "hashes survive, where fixed-size blocking would lose them all") {
    def hashes(s: String): Seq[String] =
      ContentChunks.chunkSpans(s.getBytes("UTF-8")).map { case (o, l) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(s.getBytes("UTF-8"), o, l)
        md.digest().map(b => f"$b%02x").mkString
      }
    val orig = hashes(base)
    val shifted = hashes("INSERTED-PREFIX-BYTES " + base)
    val survived = shifted.count(orig.toSet)
    assert(survived >= orig.size * 2 / 3,
      s"only $survived of ${orig.size} chunks survived a prefix edit")
    // fixed-size blocking baseline: every 64-byte block changes
    val fixedOrig = base.getBytes("UTF-8").grouped(64).map(_.toSeq).toSet
    val fixedShift = ("INSERTED-PREFIX-BYTES " + base).getBytes("UTF-8")
      .grouped(64).map(_.toSeq).toSet
    assert(fixedShift.intersect(fixedOrig).size <= 1,
      "fixed blocking should lose (nearly) everything under a shift")
  }

  test("dedup stats: duplicated documents collapse to near-half storage") {
    import spark.implicits._
    val docs = ((1L to 10L).map(i => (i, base + i)) ++
      (11L to 20L).map(i => (i, base + (i - 10)))).toDF("doc_id", "text")
    val row = ContentChunks.dedupStats(docs).collect().head
    val stored = row.getDouble(4)
    assert(stored < 0.6, s"exact duplicate corpus should store < 60%: $stored")
    assert(row.getLong(0) > row.getLong(1), "total > distinct chunks")
    assert(row.getLong(2) > row.getLong(3), "total > distinct bytes")
  }
}
