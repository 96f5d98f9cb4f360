package graft.llm

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  test("train learns the classic merge sequence on a known histogram") {
    // "aaab" x10: pairs (a,a) count 20, (a,b) 10, (b,</w>) 10.
    // Round 1 merges (a,a) -> aa; round 2 pairs: (aa,a) 10, (a,b) 10,
    // (b,</w>) 10 -> lexicographic tie-break picks (a,b).
    val merges = Bpe.train(Map("aaab" -> 10L), numMerges = 2)
    assert(merges == Seq(("a", "a"), ("a", "b")))
  }

  test("train counts weighted by word frequency, ties break " +
       "lexicographically") {
    // (l,o) appears in both words -> 7; (w,</w>) only in "low" -> 5;
    // "lower": (e,r) 2 ... most frequent must be (l,o).
    val merges = Bpe.train(Map("low" -> 5L, "lower" -> 2L), numMerges = 1)
    assert(merges == Seq(("l", "o")))
  }

  test("encode applies merges by rank and respects the end-of-word " +
       "sentinel") {
    val merges = Seq(("a", "a"), ("aa", "b"), ("b", Bpe.EndOfWord))
    val ranks = merges.zipWithIndex.toMap
    // "aab" -> [a a b </w>] -> aa b </w> -> aab </w>
    assert(Bpe.encode("aab", ranks) == Vector("aab", Bpe.EndOfWord))
    // "ab": no (a,a) available; (b,</w>) rank 2 applies
    assert(Bpe.encode("ab", ranks) == Vector("a", "b" + Bpe.EndOfWord))
    // untouched word: one symbol per char + sentinel
    assert(Bpe.encode("xy", ranks) ==
      Vector("x", "y", Bpe.EndOfWord))
  }

  test("round-trip: concatenating encoded symbols recovers the word") {
    val words = Map("hello" -> 3L, "help" -> 2L, "hull" -> 1L)
    val merges = Bpe.train(words, numMerges = 10)
    val ranks = merges.zipWithIndex.toMap
    for (w <- words.keys) {
      val enc = Bpe.encode(w, ranks)
      assert(enc.mkString.stripSuffix(Bpe.EndOfWord) == w, s"$w -> $enc")
    }
  }

  test("trainOnCorpus is deterministic across partitionings and merges " +
       "compress the corpus's own text") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val m1 = Bpe.trainOnCorpus(docs, numMerges = 50, vocabWords = 1000)
    val m2 = Bpe.trainOnCorpus(docs.repartition(7), numMerges = 50,
      vocabWords = 1000)
    assert(m1 == m2)
    val counts = Bpe.tokenCounts(docs, m1).collect()
    assert(counts.length == docs.count())
    // trained merges must compress: fewer BPE tokens than characters,
    // and at least as many as whitespace words (a word never encodes
    // to zero symbols)
    for (r <- counts)
      assert(r.getLong(2) >= r.getLong(1), r.toString)
    val vocab = Bpe.topVocab(docs, m1, k = 10).collect()
    assert(vocab.length == 10 && vocab.forall(_.getLong(1) > 0))
  }
}
