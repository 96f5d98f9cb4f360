package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The winnowing guarantee (Schleimer et al. 2003, theorem 1): any
  * common substring of length >= w + k - 1 = 11 normalized chars leaves
  * at least one SHARED fingerprint; and with disjoint alphabets no
  * fingerprint can be shared.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def fps(rows: (Long, String)*): Map[Long, Set[String]] =
    TextFeatures.winnowFingerprints(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("a planted 15-char common substring forces a shared fingerprint; " +
       "disjoint alphabets share none") {
    val common = "the quick brown"
    val m = fps(
      1L -> s"aaaa bbbb $common cccc dddd eeee",
      2L -> s"zzzz yyyy xxxx $common wwww vvvv",
      3L -> "0123 4567 8901 2345 6789 0123 4567")
    assert((m(1L) & m(2L)).nonEmpty,
      "guarantee: >= w+k-1 char match must share a fingerprint")
    assert((m(1L) & m(3L)).isEmpty && (m(2L) & m(3L)).isEmpty,
      "no shared 8-gram -> no shared fingerprint")
  }

  test("density: fingerprints per doc land near 2/(w+1) of grams and " +
       "positions index real grams") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val out = TextFeatures.winnowFingerprints(docs, "doc_id", "text")
    val perDoc = out.groupBy($"doc_id").count()
      .join(docs.select($"doc_id",
        greatest(length(TextFeatures.normalized($"text")) - 7, lit(0))
          .as("ng")), Seq("doc_id"))
      .collect()
    perDoc.foreach { r =>
      val (n, ng) = (r.getLong(1), r.getAs[Int]("ng").toLong)
      assert(n <= ng - 3, s"cannot exceed window count: $n vs $ng")
      assert(n >= (ng - 3 + 3) / 4,
        s"each window contributes; distinct floor ng/(w)=$ng -> $n")
    }
    val bad = out.filter($"pos" < 1).count()
    assert(bad == 0)
  }

  test("native kernel replays the composed exploded-gram formulation " +
       "byte-for-byte, including ties, short docs, and non-BMP text") {
    val docs = Seq(
      1L -> "abababababababababab",           // max ties: 2 distinct grams
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "short",                          // < 8 chars -> empty
      4L -> "exactly11ch",                    // ng = 4: single window
      5L -> "exactly10c",                     // ng = 3 < w -> empty
      6L -> "héllo wörld çafé naïve résumé encore déjà vu",
      7L -> "日本語のテキストで窓を転がす実験です長さ十分",
      8L -> "emoji 😀😁😂🤣😃😄😅😆 in the stream 😀😁😂🤣",
      9L -> ""
    ).toDF("doc_id", "text")
    val kernel = TextFeatures
      .winnowFingerprints(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    // the pre-kernel formulation: explode gram md5s, 4-frame windowed
    // min over struct(h, -pos), rightmost tie, distinct
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .select($"doc_id", TextFeatures.normalized($"text").as("norm"))
      .select($"doc_id", posexplode(expr(
        "CASE WHEN length(norm) < 8 THEN array()" +
          " ELSE transform(sequence(1, length(norm) - 7)," +
          " i -> md5(substring(norm, i, 8))) END")))
      .select($"doc_id", ($"pos" + 1).cast("long").as("pos"),
        $"col".as("h"))
    val byDoc = Window.partitionBy($"doc_id")
    val frame = byDoc.orderBy($"pos").rowsBetween(Window.currentRow, 3)
    val composed = grams
      .withColumn("mn", min(struct($"h", (-$"pos").as("np"))).over(frame))
      .withColumn("ng", count(lit(1)).over(byDoc))
      .filter($"ng" >= 4 && $"pos" <= $"ng" - 3)
      .select($"doc_id", (-$"mn.np").as("pos"), $"mn.h".as("fp"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(kernel == composed)
    assert(!kernel.exists(t => t._1 == 3L || t._1 == 5L || t._1 == 9L))
    assert(kernel.count(_._1 == 4L) == 1)
  }
}
