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

  test("byte-level: the byte<->char table is the published GPT-2 one and " +
       "is a bijection") {
    val t = Bpe.ByteLevel.byteToChar
    assert(t.length == 256 && t.toSet.size == 256)
    // printable latin-1 maps to itself
    assert(t('A'.toInt) == 'A' && t('~'.toInt) == '~' && t(0xff) == 'ÿ')
    // the 68 non-printable bytes shift to 256+n in byte order:
    // byte 0 is the first shifted, space (0x20) is the 33rd
    assert(t(0) == 256.toChar)
    assert(t(' '.toInt) == (256 + 32).toChar) // 'Ġ' in GPT-2's table
    assert(t(' '.toInt) == 'Ġ')
  }

  test("byte-level: GPT-2 pre-tokenization splits contractions, keeps " +
       "leading spaces on words, separates digit and punct runs") {
    assert(Bpe.ByteLevel.preTokenize("I'll say 42 things!") ==
      Seq("I", "'ll", " say", " 42", " things", "!"))
    // splits are a partition of the input: concat recovers it exactly
    val s = "  mixed\ttext, 3.14 élève 中文 😀!"
    assert(Bpe.ByteLevel.preTokenize(s).mkString == s)
  }

  test("byte-level: encode/decode round-trips accents, CJK, and emoji " +
       "byte-exactly, with and without merges") {
    val texts = Seq(
      "plain ascii text",
      "élève naïve résumé",            // accents
      "中文测试文本",                   // CJK
      "emoji 😀🎉 and ☃",              // emoji + BMP symbol
      "tabs\tnewlines\nand  spaces")
    val noMerges = Map.empty[(String, String), Int]
    val trained = Bpe.ByteLevel.train(
      texts.flatMap(Bpe.ByteLevel.preTokenize)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap,
      numMerges = 30).zipWithIndex.toMap
    for (t <- texts; ranks <- Seq(noMerges, trained)) {
      val enc = Bpe.ByteLevel.encodeText(t, ranks)
      assert(Bpe.ByteLevel.decode(enc) == t, s"$t -> $enc")
      // merges compress or preserve, never expand
      assert(enc.length <= t.getBytes("UTF-8").length)
    }
  }

  test("byte-level: reproduces the published Sennrich et al. (2016) merge " +
       "sequence prefix on the paper's histogram") {
    // The paper's worked example {low:5, lower:2, newest:6, widest:3}.
    // Byte-level has no </w> sentinel, so the published char-level prefix
    // (e,s), (es,t), (est,</w>), (l,o), (lo,w) loses its sentinel step:
    // (e,s) 9, (es,t) 9 -> lexicographic tie-break; then (l,o) 7 ties
    // (o,w) 7 -> (l,o); then (lo,w) 7.
    val hist = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.ByteLevel.train(hist, numMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("byte-level: frozen vocabulary assigns bytes 0..255 then merges at " +
       "256+rank, and token-id sequences round-trip byte-exactly") {
    val texts = Seq("the thermal theory", "élève 中文 😀", "  spaced  out ")
    val hist = texts.flatMap(Bpe.ByteLevel.preTokenize)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val merges = Bpe.ByteLevel.train(hist, numMerges = 20)
    val vocab = Bpe.ByteLevel.vocabulary(merges)
    val inv = Bpe.ByteLevel.inverse(vocab)
    // base alphabet ids are the raw byte values
    assert(vocab(Bpe.ByteLevel.byteToChar('a'.toInt).toString) == 'a'.toInt)
    assert(vocab("Ġ") == ' '.toInt)
    // merge products sit at 256+rank (no collisions in this corpus)
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      assert(vocab(a + b) == 256 + r, s"${a + b}")
    }
    val ranks = merges.zipWithIndex.toMap
    for (t <- texts) {
      val ids = Bpe.ByteLevel.encodeTextToIds(t, ranks, vocab)
      assert(ids.forall(i => i >= 0 && i < 256 + merges.length))
      assert(Bpe.ByteLevel.decodeIds(ids, inv) == t, s"$t -> $ids")
    }
    // duplicate-string merges keep the first id: a synthetic vocab where
    // two merges yield the same surface form stays a function
    val dupVocab = Bpe.ByteLevel.vocabulary(
      Seq(("a", "bc"), ("ab", "c"), ("x", "y")))
    assert(dupVocab("abc") == 256) // first wins
    assert(dupVocab("xy") == 258)  // later ranks keep their slots
  }

  test("byte-level: corpus encodeToIds is deterministic and id sequences " +
       "decode to the original documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.ByteLevel.trainOnCorpus(docs, numMerges = 50,
      vocabWords = 1000)
    val inv = Bpe.ByteLevel.inverse(Bpe.ByteLevel.vocabulary(merges))
    val out = Bpe.ByteLevel.encodeToIds(docs, merges).collect()
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == texts.size)
    for (r <- out) {
      val ids = r.getSeq[Int](2)
      assert(r.getLong(1) == ids.length.toLong)
      assert(Bpe.ByteLevel.decodeIds(ids, inv) == texts(r.getLong(0)))
    }
  }

  test("byte-level: a larger merge table never tokenizes a document into " +
       "MORE tokens (merge tables are prefixes, extra merges only merge)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val hist = Bpe.ByteLevel.pretokenHistogram(docs, "text", 1000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m50 = Bpe.train(hist, 50, Bpe.ByteLevel.symbols)
    val m150 = Bpe.train(hist, 150, Bpe.ByteLevel.symbols)
    assert(m150.take(50) == m50) // learned order is a prefix property
    def counts(m: Seq[(String, String)]) =
      Bpe.ByteLevel.tokenCounts(docs, m).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val c50 = counts(m50); val c150 = counts(m150)
    assert(c50.keySet == c150.keySet)
    c50.foreach { case (id, n) =>
      assert(c150(id) <= n, s"doc $id grew: ${c150(id)} > $n")
    }
  }

  test("byte-level: corpus training is deterministic across partitionings " +
       "and token counts bound bytes from below") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val m1 = Bpe.ByteLevel.trainOnCorpus(docs, numMerges = 50,
      vocabWords = 1000)
    val m2 = Bpe.ByteLevel.trainOnCorpus(docs.repartition(7), numMerges = 50,
      vocabWords = 1000)
    assert(m1 == m2)
    val counts = Bpe.ByteLevel.tokenCounts(docs, m1).collect()
    assert(counts.length == docs.count())
    for (r <- counts) {
      assert(r.getLong(2) <= r.getLong(1), r.toString)  // merged <= bytes
      assert(r.getLong(2) > 0, r.toString)
    }
  }

  test("encodeFrozen: pieces round-trip the normalized text and the " +
       "frozen merges actually fire") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val enc = Bpe.encodeFrozen(docs, Bpe.FrozenMerges)
    // positions are a contiguous 0..n-1 sequence per document
    val badPos = enc.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"), countDistinct(col("pos")).as("nd"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 ||
        col("nd") =!= col("n"))
      .count()
    assert(badPos == 0)
    // merges fire: multi-char merged pieces appear
    assert(enc.filter(col("piece").isin("er</w>", "jo", "row</w>", "an</w>"))
      .count() > 0)
    // concatenating pieces in pos order, with the sentinel as a word
    // boundary, reproduces the normalized text byte-exactly
    val rebuilt = enc
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("piece")))),
        s => s.getField("piece")), "").as("glued"))
      .select(col("doc_id"),
        rtrim(regexp_replace(col("glued"), Bpe.EndOfWord, " "))
          .as("rebuilt"))
    val diff = docs
      .select(col("doc_id"), TextFeatures.normalized(col("text")).as("nm"))
      .join(rebuilt, Seq("doc_id"))
      .filter(col("nm") =!= col("rebuilt"))
      .count()
    assert(diff == 0)
  }

  test("byte-level corpus entries RUN on non-ASCII text (the r12 full " +
       "byte-table oracle) and fail fast ONLY on U+000B — the one " +
       "Java-vs-RE2 \\s class divergence (requireOracleSafeText guard)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-vtab-guard").toString
    // non-ASCII (umlaut, 2-byte UTF-8) is now a SUPPORTED oracle input
    Seq((0L, "plain ascii doc", "en", "src0", 15L),
        (1L, "hat eine Umlaut-Zeile: größer", "de", "src0", 29L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("llm_bpe_byte_counts")(spark, dir)
      .collect()
    assert(rows.length == 2)
    // n_bytes is the UTF-8 OCTET count (ö and ß are 2 bytes each)
    val nBytes = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nBytes(1L) ==
      "hat eine Umlaut-Zeile: größer".getBytes("UTF-8").length.toLong)
    // ... but a vertical tab still fails fast: Java \s matches it, RE2
    // \s does not, so the pre-tokenizer replay could split differently
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-vtab-guard2").toString
    Seq((0L, "bad\u000Bdoc", "en", "src0", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.SparkEntry.queries("llm_bpe_byte_counts")(spark, dir2)
        .collect()
    }
    assert(e.getMessage.contains("U+000B"), e.getMessage)
    // the engine-side byte-level tokenizer itself is byte-agnostic: the
    // guard protects ORACLE PARITY, not the operator
    val merges = Bpe.ByteLevel.trainOnCorpus(
      graft.Tables.documents(spark, dir2), numMerges = 5, vocabWords = 100)
    assert(merges.nonEmpty)
  }
}
