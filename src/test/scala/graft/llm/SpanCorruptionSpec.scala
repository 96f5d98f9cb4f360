package graft.llm

import graft.SparkSpec

/** The denoising objective's core invariant: splicing each target span
  * back over its sentinel in the input reconstructs the original
  * normalized document exactly — corruption is lossless, mask rate is
  * near the nominal 15%, and span structure is consistent.
  */
class SpanCorruptionSpec extends SparkSpec {
  import spark.implicits._

  test("input + target reconstruct every sf0.001 document; mask rate " +
       "tracks 15%") {
    val sf = "/root/testdata/sf0.001"
    val orig = graft.Tables.documents(spark, sf)
      .select($"doc_id", TextFeatures.normalized($"text").as("norm"))
      .as[(Long, String)].collect().toMap
    val out = graft.SparkEntry.queries("llm_span_corruption")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.length == orig.size)
    var tokens = 0L
    var masked = 0L
    out.foreach { case (id, nSpans, input, target) =>
      // parse target into span-id -> tokens
      val spanRe = "<extra_id_(\\d+)>".r
      val parts = spanRe.split(target).toSeq.map(_.trim)
      val ids = spanRe.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      assert(ids == ids.indices.map(identity), s"doc $id sentinel order")
      assert(ids.length == nSpans, s"doc $id span count")
      val spans = ids.zip(parts.drop(1)).toMap
      val rebuilt = spanRe.replaceAllIn(input,
        m => java.util.regex.Matcher.quoteReplacement(
          spans(m.group(1).toInt)))
      assert(rebuilt == orig(id), s"doc $id reconstruction")
      val n = orig(id).split(" ", -1).length
      tokens += n
      masked += spans.values.map(s => if (s.isEmpty) 0 else
        s.split(" ", -1).length).sum
    }
    val rate = masked.toDouble / tokens
    assert(rate > 0.10 && rate < 0.20, s"mask rate $rate")
  }

  test("FIM: prefix + middle + suffix reassemble every document and " +
       "segment boundaries match the emitted cuts") {
    val sf = "/root/testdata/sf0.001"
    val orig = graft.Tables.documents(spark, sf)
      .select($"doc_id", TextFeatures.normalized($"text").as("norm"))
      .as[(Long, String)].collect().toMap
    val out = graft.SparkEntry.queries("llm_fim_transform")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.length == orig.size)
    out.foreach { case (id, lo, hi, fim) =>
      val toks = orig(id).split(" ", -1).toSeq
      assert(0 <= lo && lo <= hi && hi <= toks.length, s"doc $id cuts")
      val pre = fim.indexOf("<PRE>")
      val suf = fim.indexOf("<SUF>")
      val mid = fim.indexOf("<MID>")
      assert(pre == 0 && suf > pre && mid > suf, s"doc $id sentinel order")
      def seg(from: Int, until: Int) = {
        val raw = fim.substring(from, until).trim
        if (raw.isEmpty) Seq.empty[String] else raw.split(" ", -1).toSeq
      }
      val prefix = seg(pre + 5, suf)
      val suffix = seg(suf + 5, mid)
      val middle = seg(mid + 5, fim.length)
      assert(prefix ++ middle ++ suffix == toks, s"doc $id reassembly")
      assert(prefix.length == lo && middle.length == hi - lo,
        s"doc $id segment lengths vs cuts")
    }
  }
}
