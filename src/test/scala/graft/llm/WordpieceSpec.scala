package graft.llm

import graft.SparkSpec

class WordpieceSpec extends SparkSpec {

  test("likelihood score diverges from raw frequency: an always-together " +
       "rare pair beats a more frequent but incidental pair") {
    // pair (q, ##z) occurs 5 times and q/z occur ONLY there ->
    // score 5/(5*5) = 0.2. pair (a, ##b) occurs 8 times but a and b are
    // everywhere (a appears 20x, b 20x) -> score 8/400 = 0.02. BPE would
    // merge (a, ##b) first; WordPiece must merge (q, ##z) first.
    val hist = Map(
      "qz" -> 5L, // q+##z together, their only occurrences
      "ab" -> 8L, // a+##b together...
      "ac" -> 12L, // ...but a also precedes c
      "db" -> 12L) // ...and b also follows d
    val (merges, vocab) = Wordpiece.train(hist, numMerges = 1)
    assert(merges == Seq(("q", "##z")), s"got $merges")
    assert(vocab.contains("qz"))
    val bpeFirst = Bpe.train(hist, numMerges = 1)
    assert(bpeFirst.head != (("q", "##z")),
      "the fixture must actually separate the two criteria")
  }

  test("merging updates symbol counts: a merged symbol's parts lose mass " +
       "and chains can form") {
    val hist = Map("abc" -> 10L)
    val (merges, vocab) = Wordpiece.train(hist, numMerges = 2)
    // two merges must cover the whole word; continuations keep ##
    assert(merges.length == 2)
    assert(vocab.contains("abc") || vocab.contains("##bc"),
      s"chained merge must appear in vocab: $vocab")
    assert(Wordpiece.encodeWord("abc", vocab) == Vector("abc"))
  }

  test("encode: longest-match-first, ## continuations, whole-word UNK " +
       "degradation, empty word") {
    val vocab = Set("un", "##aff", "##able", "##a", "u", "##n", "##f",
      "##b", "##l", "##e")
    assert(Wordpiece.encodeWord("unaffable", vocab) ==
      Vector("un", "##aff", "##able"))
    // 'x' is not in the vocab anywhere -> the WHOLE word degrades
    assert(Wordpiece.encodeWord("unfixable", vocab) ==
      Vector(Wordpiece.Unk))
    assert(Wordpiece.encodeWord("", vocab).isEmpty)
  }

  test("corpus training: no UNK on the training corpus, token counts " +
       "bounded by characters, deterministic across partitionings") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val (merges, vocab) = Wordpiece.trainOnCorpus(docs, numMerges = 50)
    assert(merges.length == 50)
    val counts = Wordpiece.tokenCounts(docs, vocab).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the alphabet covers the training corpus -> zero UNK
    assert(counts.forall(_._4 == 0L), "training corpus must not UNK")
    // wordpiece never emits more tokens than characters, nor fewer than
    // words
    assert(counts.forall(c => c._3 >= c._2))
    val (merges2, _) = Wordpiece.trainOnCorpus(docs.repartition(13),
      numMerges = 50)
    assert(merges2 == merges, "training must be partitioning-invariant")
  }

  test("encodeFrozen: longest-match pieces reassemble each word, " +
       "multi-char pieces fire, positions are contiguous") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val enc = Wordpiece.encodeFrozen(docs, Wordpiece.FrozenVocab)
    // per-document positions are a contiguous 0..n-1 sequence
    val badPos = enc.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"), countDistinct(col("pos")).as("nd"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 ||
        col("nd") =!= col("n"))
      .count()
    assert(badPos == 0)
    // the frozen multi-char pieces actually fire on this corpus
    assert(enc.filter(col("piece").isin("jo", "##in", "cust", "##omer"))
      .count() > 0)
    // the full alnum alphabet is in the vocab -> no [UNK] on this corpus
    assert(enc.filter(col("piece") === Wordpiece.Unk).count() == 0)
    // driver-side replay: pieces reassemble each word under ##-stripping
    val vset = Wordpiece.FrozenVocab.toSet
    for (w <- Seq("customer", "join", "window", "aggregate", "x9z")) {
      val ps = Wordpiece.encodeWord(w, vset)
      assert(ps.head.take(2) != "##" &&
        ps.tail.forall(_.startsWith("##")), s"$w -> $ps")
      assert(ps.map(_.stripPrefix("##")).mkString == w, s"$w -> $ps")
    }
  }
}
