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

  test("codepoint walk (r13): astral chars are ONE position — seed " +
       "pieces never split a surrogate pair, Viterbi segments and " +
       "fallback pricing count codepoints") {
    val rocket = "🚀"            // U+1F680, 2 UTF-16 units
    val gothic = "𐌰𐌿" // 2 astral letters
    // seedVocab: every emitted piece is a whole-codepoint substring
    val seeds = Unigram.seedVocab(
      Map(s"a${rocket}b" -> 10L, gothic -> 5L), seedSize = 64)
    seeds.keys.foreach { p =>
      assert(!Character.isSurrogate(p.head) ||
             Character.isHighSurrogate(p.head) && p.length >= 2,
        s"piece ${p.map(_.toInt)} starts with a lone surrogate")
      assert(!Character.isLowSurrogate(p.head) &&
             !Character.isHighSurrogate(p.last),
        s"piece ${p.map(_.toInt)} splits a surrogate pair")
    }
    // the full 3-codepoint word must appear (maxPieceLen counts cps)
    assert(seeds.contains(s"a${rocket}b"))
    assert(seeds.contains(rocket), "astral char missing from alphabet")
    // train + viterbi on a surrogate corpus: round-trips, no lone halves
    val m = Unigram.train(Map(s"a${rocket}b" -> 10L, gothic -> 5L),
      vocabSize = 16)
    val seg = Unigram.viterbi(s"a${rocket}b", m)
    assert(seg.nonEmpty && seg.mkString == s"a${rocket}b", seg.toString)
    assert(seg.forall(p => p.codePointCount(0, p.length) >= 1 &&
      !Character.isLowSurrogate(p.head)), seg.toString)
    // a maxPieceLen-6 word of 6 astral cps (12 UTF-16 units) is one piece
    val six = rocket * 6
    val m6 = Unigram.train(Map(six -> 100L), vocabSize = 8)
    assert(Unigram.viterbi(six, m6).mkString == six)
    // fallback pricing: unsegmentable word priced per codepoint
    import spark.implicits._
    val docs = Seq((1L, gothic)).toDF("doc_id", "text")
    val asciiModel: Unigram.Model = Map("a" -> -1.0)
    val row = Unigram.tokenCounts(docs, asciiModel).collect().head
    assert(row.getInt(1) == 2, s"expected 2 codepoint pieces, got $row")
    assert(math.abs(row.getDouble(2) - (-2.0)) < 1e-12, row.toString)
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

  test("encodeFrozen: Viterbi picks the optimal segmentation under the " +
       "frozen scores, pieces round-trip, positions are contiguous") {
    import org.apache.spark.sql.functions._
    // driver-side: the DP beats the character spell-out where a
    // multi-char piece is priced to win, and round-trips exactly
    for (w <- Seq("join", "customer", "window", "aggregate", "zz9")) {
      val ps = Unigram.viterbi(w, Unigram.FrozenModel)
      assert(ps.mkString == w, s"$w -> $ps")
      val charScore = w.length * -700.0
      val score = ps.map(Unigram.FrozenModel).sum
      assert(score >= charScore, s"$w: $score < $charScore")
    }
    assert(Unigram.viterbi("join", Unigram.FrozenModel) ==
      List("jo", "in"))
    // a word the model cannot segment emits the empty path
    assert(Unigram.viterbi("naïve", Unigram.FrozenModel).isEmpty)

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val enc = Unigram.encodeFrozen(docs, Unigram.FrozenModel)
    val badPos = enc.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"), countDistinct(col("pos")).as("nd"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 ||
        col("nd") =!= col("n"))
      .count()
    assert(badPos == 0)
    assert(enc.filter(col("piece").isin("jo", "cust", "omer", "row"))
      .count() > 0)
  }
}
