package graft.llm

import graft.SparkSpec

class EvalsSpec extends SparkSpec {
  import spark.implicits._

  test("readability: exact counts and Flesch formulas on a known doc") {
    val docs = Seq(
      (1L, "The cat sat. It was happy!", "en", "s0", 26L),
      (2L, "", "en", "s0", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Evals.readability(docs).orderBy("doc_id").collect()

    val a = r(0)
    // tokens: the cat sat. it was happy! -> 6 words; sentences: 2 runs
    assert(a.getLong(1) == 6L, "n_words")
    assert(a.getLong(2) == 2L, "n_sents")
    // syllables (vowel-group runs, min 1/word):
    // the=1 cat=1 sat.=1 it=1 was=1 happy!=2  -> 7
    assert(a.getLong(3) == 7L, "n_syllables")
    val w = 6.0; val s = 2.0; val sy = 7.0
    assert(a.getDouble(4) == 206.835 - 1.015 * (w / s) - 84.6 * (sy / w))
    assert(a.getDouble(5) == 0.39 * (w / s) + 11.8 * (sy / w) - 15.59)

    val b = r(1) // empty doc: zero words, scores NULL, sentences clamp to 1
    assert(b.getLong(1) == 0L && b.getLong(2) == 1L && b.getLong(3) == 0L)
    assert(b.isNullAt(4) && b.isNullAt(5))
  }

  test("pass@k matches the binomial identity and clamps degenerate cases") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def mk(problem: Long, n: Int, c: Int) =
      (0 until n).map(i => (problem * 1000 + i, ts, problem,
        if (i < c) "purchase" else "view", 1.0, "{}"))
    val events =
      (mk(1L, 20, 5) ++ mk(2L, 12, 0) ++ mk(3L, 10, 8) ++ mk(4L, 5, 5))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val r = Evals.passAtK(events, k = 10, passType = "purchase")
      .orderBy("problem_id").collect()
    // problem 4 has n=5 < k and must be dropped
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))

    def binom(n: Int, k: Int): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (BigInt(n - k + 1) to BigInt(n)).product /
        (BigInt(1) to BigInt(k)).product
    def expected(n: Int, c: Int, k: Int): Double =
      1.0 - (BigDecimal(binom(n - c, k)) / BigDecimal(binom(n, k))).toDouble

    val byId = r.map(row => row.getLong(0) -> row).toMap
    assert(math.abs(byId(1L).getDouble(4) - expected(20, 5, 10)) < 1e-12)
    assert(byId(2L).getDouble(4) == 0.0, "c=0 -> pass@k exactly 0")
    // n-c=2 < k: some term hits 0 -> pass@k exactly 1, never negative/-0.0
    assert(byId(3L).getDouble(4) == 1.0)
    assert(byId(1L).getDouble(3) == 5.0 / 20.0, "pass@1 = c/n")
  }

  test("BLEU pairs: exact clipped counts, log-domain score, null at p=0") {
    val docs = Seq(
      (1L, "a b a c", "s0", "en"),
      (2L, "a b a d", "s0", "en"), // pair (1,2): shared unis a,a,b; bis "a b","b a"
      (3L, "x y", "s0", "en"),     // pair (2,3): no overlap -> NULL bleu
      (5L, "q", "s1", "en")        // id gap: no pair for 3 or 5
    ).toDF("doc_id", "text", "source", "lang")
      .select("doc_id", "text", "lang", "source")
    val r = Evals.bleuPairs(docs).orderBy("doc_id").collect()
    assert(r.length == 2)

    val p12 = r(0)
    assert(p12.getLong(2) == 3L && p12.getLong(3) == 4L, "p1 = 3/4")
    assert(p12.getLong(4) == 2L && p12.getLong(5) == 3L, "p2 = 2/3")
    // cand_len == ref_len -> log_bp = 0
    val want = 0.0 + 0.5 * math.log(3.0 / 4.0) + 0.5 * math.log(2.0 / 3.0)
    assert(p12.getDouble(6) == want)

    val p23 = r(1)
    assert(p23.getLong(2) == 0L && p23.getLong(4) == 0L)
    assert(p23.isNullAt(6), "zero precision -> NULL (log-domain -inf)")
  }

  test("ROUGE-L: native lcs_len matches a reference recursion; metrics exact") {
    def refLcs(a: Seq[String], b: Seq[String]): Int =
      if (a.isEmpty || b.isEmpty) 0
      else if (a.head == b.head) 1 + refLcs(a.tail, b.tail)
      else math.max(refLcs(a.tail, b), refLcs(a, b.tail))

    val texts = Seq(
      ("a b c d e", "a x c y e"), // lcs = a c e = 3
      ("a a b a", "a b a a"),     // repeated tokens
      ("x y z", "p q r"),         // lcs = 0
      ("a", "a")
    )
    val docs = texts.zipWithIndex.flatMap { case ((c, r), i) =>
      Seq((i * 10L, c, "en", s"s$i", 1L), (i * 10L + 1, r, "en", s"s$i", 1L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Evals.rougeL(docs).orderBy("doc_id").collect()
    assert(out.length == texts.length)
    texts.zipWithIndex.foreach { case ((c, r), i) =>
      val row = out(i)
      val want = refLcs(c.split(" ").toSeq, r.split(" ").toSeq).toLong
      assert(row.getLong(4) == want, s"lcs of pair $i")
      val m = row.getLong(2).toDouble; val n = row.getLong(3).toDouble
      assert(row.getDouble(5) == want / m && row.getDouble(6) == want / n)
      if (want > 0) {
        val p = want / m; val q = want / n
        assert(row.getDouble(7) == (2.0 * p * q) / (p + q))
      } else assert(row.getDouble(7) == 0.0)
    }
  }

  test("conformal interval: exact integer quantile at the split recipe") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // train (even ids): values 1,2,3 -> cents s=600, n_train=3, mean=2.00
    // calib (odd ids): values 1,2,3,4 -> resid |100c*3-600| = 300,0,300,600
    val rows = Seq(
      (0L, 1.0), (2L, 2.0), (4L, 3.0),
      (1L, 1.0), (3L, 2.0), (5L, 3.0), (7L, 4.0)
    ).map { case (id, v) => (id, ts, 1L, "t", v, "{}") }
    val events =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Evals.conformalInterval(events).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 3L && r.getLong(2) == 4L)
    // k = ceil(0.9*(4+1)) = 5 > n_calib -> clamps to 4 (max residual).
    // residuals sorted: 0,300,300,600 -> qhat = 600 (scaled by n_train=3)
    assert(r.getLong(3) == 4L, "k clamps to n_calib")
    assert(r.getLong(4) == 600L, "qhat = max residual under the clamp")
    assert(r.getDouble(5) == 2.0, "mean = 600 cents / 3 / 100")
    assert(r.getDouble(6) == 2.0, "half width = 600 / 3 / 100")
  }

  test("source ablation: leave-one-out means from exact integer sums") {
    val docs = Seq(
      (1L, "a b c", "en", "s0", 5L),
      (2L, "a b c d e", "en", "s0", 9L),
      (3L, "a b c d e f", "en", "s1", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Evals.sourceAblation(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val s0 = out("s0"); val s1 = out("s1")
    assert(s0.getLong(1) == 2L && s0.getLong(2) == 8L)
    assert(s1.getLong(1) == 1L && s1.getLong(2) == 6L)
    assert(s0.getDouble(3) == 8.0 / 14.0 && s1.getDouble(3) == 6.0 / 14.0)
    assert(s0.getDouble(4) == 6.0, "without s0: 6 tokens / 1 doc")
    assert(s1.getDouble(4) == 4.0, "without s1: 8 tokens / 2 docs")
    assert(s0.getDouble(5) == 6.0 - 14.0 / 3.0)
    assert(s1.getDouble(5) == 4.0 - 14.0 / 3.0)
  }

  test("DiD estimator: hand-computed 2x2 on a deterministic design") {
    def ev(id: Long, user: Long, day: Int, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"1970-01-0${day + 1}%d 00:00:00"),
        user, "t", v, "{}")
    // control = even user, treat = odd user; median day = 2 -> post day>2
    val events = Seq(
      ev(1, 2, 1, 1.00), ev(2, 2, 2, 3.00), // control pre: mean 200 cents
      ev(3, 2, 3, 2.00), ev(4, 2, 4, 4.00), // control post: mean 300
      ev(5, 1, 1, 1.00), ev(6, 1, 2, 1.00), // treat pre: mean 100
      ev(7, 1, 3, 5.00), ev(8, 1, 4, 7.00)  // treat post: mean 600
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.operators.Events.didEstimator(events).collect()
    assert(out.length == 1)
    val r = out(0)
    assert((1 to 4).forall(i => r.getLong(i) == 2L), "2 events per cell")
    assert(r.getDouble(5) == 200.0 && r.getDouble(6) == 300.0)
    assert(r.getDouble(7) == 100.0 && r.getDouble(8) == 600.0)
    assert(r.getDouble(9) == (600.0 - 100.0) - (300.0 - 200.0))
  }

  test("watermark detector: exact green census vs a JVM md5 replay") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val texts = Seq("a b c d e f g", "x y", "solo", "")
    val docs = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "s0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Evals.watermarkDetect(docs).orderBy("doc_id").collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      val bgs = toks.dropRight(1).zip(toks.drop(1)).map(p => s"${p._1} ${p._2}")
      val greens = bgs.count(b => "01234567".contains(md5hex(b).charAt(0)))
      val r = out(i)
      assert(r.getLong(1) == bgs.length.toLong, s"n_scored doc $i")
      assert(r.getLong(2) == greens.toLong, s"n_green doc $i")
      if (bgs.nonEmpty) {
        val z = (2.0 * greens - bgs.length) / math.sqrt(bgs.length.toDouble)
        assert(r.getDouble(3) == z &&
          r.getInt(4) == (if (z > 2.0) 1 else 0))
      } else assert(r.isNullAt(3) && r.isNullAt(4))
    }
  }

  test("greedy completion: argmax walk with ties and early termination") {
    val docs = Seq(
      (1L, "a b a b a c", "en", "s0", 11L), // a->b beats a->c; cycles
      (2L, "x y z", "en", "s1", 5L)         // chain ends at z
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Evals.greedyCompletion(docs, steps = 10)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    // start = most frequent token of the source ('a' x3); argmax(a)=b
    // (2 vs 1), argmax(b)=a -> alternates to 11 tokens
    assert(out("s0") == (("a b a b a b a b a b a", 11L)))
    // all-singleton counts: start ties break to 'x'; z has no
    // continuation so the walk stops after 3 tokens
    assert(out("s1") == (("x y z", 3L)))
  }

  test("AUC: rank formula equals the brute-force pairwise count exactly") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // scores with ties across and within classes
    val scored = Seq(
      (1.00, "purchase"), (2.00, "purchase"), (2.00, "view"),
      (3.00, "view"), (0.50, "view"), (2.00, "purchase"), (4.00, "purchase"))
    val rows = scored.zipWithIndex.map { case ((v, t), i) =>
      (i.toLong, ts, 1L, t, v, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("aucspec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = graft.operators.Profiling.ops
      .find(_.name == "f_auc_roc").get.query(spark, dir).collect()(0)

    val pos = scored.filter(_._2 == "purchase").map(_._1)
    val neg = scored.filter(_._2 != "purchase").map(_._1)
    val num = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val brute = num.toDouble / (2.0 * pos.size * neg.size)
    assert(row.getLong(0) == pos.size.toLong &&
      row.getLong(1) == neg.size.toLong)
    assert(row.getDouble(2) == brute, s"auc ${row.getDouble(2)} vs $brute")
  }

  test("BLEU brevity penalty kicks in when the candidate is shorter") {
    val docs = Seq(
      (1L, "a b", "s0", "en"),
      (2L, "a b c d", "s0", "en")
    ).toDF("doc_id", "text", "source", "lang")
      .select("doc_id", "text", "lang", "source")
    val r = Evals.bleuPairs(docs).collect()
    assert(r.length == 1)
    val row = r(0)
    // p1 = 2/2, p2 = 1/1, log_bp = 1 - 4/2 = -1
    assert(row.getLong(2) == 2L && row.getLong(3) == 2L)
    assert(row.getLong(4) == 1L && row.getLong(5) == 1L)
    assert(row.getDouble(6) ==
      (1.0 - 4.0 / 2.0) + 0.5 * math.log(1.0) + 0.5 * math.log(1.0))
  }
}
