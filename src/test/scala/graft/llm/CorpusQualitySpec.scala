package graft.llm

import graft.SparkSpec

class CorpusQualitySpec extends SparkSpec {

  test("repetition stats: exact top-bigram and duplicate-bigram mass") {
    import spark.implicits._
    val d = Seq(
      // bigrams: "a b" x3, "b a" x2 -> top 3/5, all 5 occurrences dup
      (1L, "a b a b a b"),
      // all bigrams distinct -> top 1/4, dup 0
      (2L, "v w x y z"),
      // single token -> no bigrams -> absent from output
      (3L, "solo"))
      .toDF("doc_id", "text")
    val out = CorpusQuality.repetitionStats(d).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((0.6, 1.0)))
    assert(out(2L) == ((0.25, 0.0)))
  }

  test("commonness: corpus-frequency means and rare mass are exact; a " +
       "gibberish doc scores rare, a stopword doc scores common") {
    import spark.implicits._
    val d = Seq(
      (1L, "the the the cat"),   // 'the' tf=6 (3+3 across docs), 'cat' tf=1
      (2L, "the the the dog"),
      (3L, "zxqj vwpk"))         // hapax gibberish
      .toDF("doc_id", "text")
    val out = CorpusQuality.commonness(d, rareBelow = 2L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // doc 1: tokens (the x3, cat): mean = (6+6+6+1)/4, rare (tf<2) = cat
    assert(out(1L) == ((4L, 19.0 / 4, 0.25)))
    assert(out(2L) == ((4L, 19.0 / 4, 0.25)))
    // gibberish: every token hapax
    assert(out(3L) == ((2L, 1.0, 1.0)))
  }

  test("a boilerplate-heavy doc scores far above a natural one (the " +
       "Gopher filter signal)") {
    import spark.implicits._
    val spam = (1 to 50).map(_ => "buy now").mkString(" ")
    val natural = (1 to 100).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, spam), (2L, natural)).toDF("doc_id", "text")
    val out = CorpusQuality.repetitionStats(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > 0.9 && out(2L) == 0.0)
  }
}
