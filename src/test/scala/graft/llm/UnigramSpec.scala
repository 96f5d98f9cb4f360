package graft.llm

import graft.SparkSpec

class UnigramSpec extends SparkSpec {

  test("viterbi picks the max-log-prob segmentation, ties prefer fewer " +
       "pieces, and segments always concatenate back to the word") {
    val m: Unigram.Model = Map(
      "a" -> math.log(0.1), "b" -> math.log(0.1), "ab" -> math.log(0.3),
      "ba" -> math.log(0.2), "aba" -> math.log(0.05))
    // "abab": ab+ab = ln .3*.3 = best (beats a+ba+b, aba+b, etc.)
    assert(Unigram.viterbi("abab", m) == List("ab", "ab"))
    // tie between {aa -> impossible}; check fewer-pieces preference:
    // "aba": aba (1 piece, ln .05 ≈ -3.0) vs ab+a (ln .3*.1 ≈ -3.5)
    // vs a+ba (ln .1*.2 ≈ -3.9) -> single piece wins on score
    assert(Unigram.viterbi("aba", m) == List("aba"))
    // round-trip property on arbitrary segmentable input
    val seg = Unigram.viterbi("abba", m)
    assert(seg.mkString == "abba")
    // unsegmentable (char not in model) -> Nil
    assert(Unigram.viterbi("abc", m) == Nil)
  }

  test("training keeps the alphabet, learns frequent multi-char pieces, " +
       "and is deterministic") {
    val hist = Map("the" -> 100L, "then" -> 40L, "there" -> 30L,
      "cat" -> 5L, "dog" -> 5L, "x" -> 1L)
    val m1 = Unigram.train(hist, vocabSize = 12)
    val m2 = Unigram.train(hist, vocabSize = 12)
    assert(m1 == m2, "EM over a sorted histogram must be deterministic")
    // every single character of the corpus survives as fallback
    val chars = hist.keys.flatMap(_.toSeq).map(_.toString).toSet
    chars.foreach(c => assert(m1.contains(c), s"alphabet piece '$c' lost"))
    // the dominant word is a single piece after training
    assert(m1.contains("the"), s"frequent word not a piece: ${m1.keys}")
    assert(Unigram.viterbi("the", m1) == List("the"))
    // probabilities normalize (sum of exp = 1 within fp tolerance)
    val mass = m1.values.map(math.exp).sum
    assert(math.abs(mass - 1.0) < 1e-9, s"model mass $mass")
  }

  test("corpus training + map-side encode: fewer pieces than characters, " +
       "log-probs finite and negative, partitioning-invariant") {
    import spark.implicits._
    val docs = ((1L to 30L).map(i => (i, "the quick brown fox and the dog")) :+
      (99L, "zzz qqq")).toDF("doc_id", "text")
    val model = Unigram.trainOnCorpus(docs, vocabSize = 64, topWords = 100)
    val out = Unigram.tokenCounts(docs, model).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val (n, lp) = out(1L)
    val nChars = "thequickbrownfoxandthedog".length
    assert(n < nChars, s"pieces $n should beat chars $nChars")
    assert(lp < 0 && !lp.isNegInfinity)
    val re = Unigram.tokenCounts(docs.repartition(7), model).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(re == out)
  }
}
