package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {

  private lazy val docs =
    graft.Tables.documents(spark, "/root/testdata/sf0.01")

  test("stratified sample hits each stratum's rate within sampling error " +
       "and is deterministic across partitionings") {
    val rates = Map("src0" -> 0.75, "src1" -> 0.25)
    def run(df: org.apache.spark.sql.DataFrame) =
      Mixing.stratifiedSample(df, "doc_id", "source", rates, 0.1)
        .select("doc_id", "source").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    val got = run(docs)
    val bySource = got.groupBy(_._2).view.mapValues(_.size).toMap
    // 25 docs per source at sf0.01: expect ~19 of src0, ~6 of src1, ~2.5
    // elsewhere; allow binomial noise
    assert(bySource.getOrElse("src0", 0) >= 13, bySource)
    assert(bySource.getOrElse("src1", 0) <= 13, bySource)
    assert(run(docs.repartition(17)) == got) // hash-derived, not RNG
  }

  test("sample rejects rates outside [0, 1)") {
    intercept[IllegalArgumentException](
      Mixing.stratifiedSample(docs, "doc_id", "source", Map.empty, 1.0))
  }

  test("packing: packs fill sequentially and overflow by at most one doc") {
    val packed = Mixing.packSequences(docs, "doc_id", "text", "source", 512)
    val perPack = packed.groupBy("source", "pack_id")
      .agg(sum("n_tokens").as("tok"), max("n_tokens").as("maxdoc"))
      .collect()
    // sequential fill: every pack holds < capacity + its largest doc
    assert(perPack.forall(r => r.getLong(2) < 512 + r.getLong(3)),
      perPack.filterNot(r => r.getLong(2) < 512 + r.getLong(3)).mkString(";"))
    // pack ids per source are contiguous from 0
    val ids = packed.filter(col("source") === "src0")
      .select("pack_id").distinct().collect().map(_.getLong(0)).sorted
    assert(ids.head == 0L && ids.toSeq == (0L until ids.length).toSeq)
    // every doc is packed exactly once
    assert(packed.count() == docs.count())
  }

  test("temperature rates: alpha=1 reproduces the natural distribution " +
       "(uniform rate), alpha<1 upweights rare sources") {
    import spark.implicits._
    // skewed corpus: 160 docs of 'big', 40 of 'rare'
    val d = ((1L to 160L).map(i => (i, "big")) ++
      (161L to 200L).map(i => (i, "rare"))).toDF("doc_id", "source")
    val natural = Mixing.temperatureRates(d, "source",
      alpha = 1.0, targetFraction = 0.5)
    // alpha=1: every source keeps the same fraction (the target)
    assert(math.abs(natural("big") - 0.5) < 1e-12 &&
      math.abs(natural("rare") - 0.5) < 1e-12, natural)
    val sqrtT = Mixing.temperatureRates(d, "source",
      alpha = 0.5, targetFraction = 0.5)
    // sqrt temperature: the rare source's keep rate rises, the big one's
    // falls, and the expected total still hits the target budget (no
    // source clips at the cap with this skew)
    assert(sqrtT("rare") > 0.5 && sqrtT("big") < 0.5, sqrtT)
    val expected = 160 * sqrtT("big") + 40 * sqrtT("rare")
    assert(math.abs(expected - 100.0) < 1e-6, s"expected kept=$expected")
  }

  test("temperature sample: deterministic across partitionings and caps " +
       "rates below 1") {
    import spark.implicits._
    // tiny source whose uncapped rate would exceed 1 -> clipped to 0.9999
    val d = ((1L to 500L).map(i => (i, "big")) ++
      (501L to 502L).map(i => (i, "tiny"))).toDF("doc_id", "source")
    val rates = Mixing.temperatureRates(d, "source",
      alpha = 0.5, targetFraction = 0.8)
    assert(rates("tiny") == 0.9999, rates)
    def run(df: org.apache.spark.sql.DataFrame) =
      Mixing.temperatureSample(df, "doc_id", "source",
        alpha = 0.5, targetFraction = 0.8)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(run(d) == run(d.repartition(13)))
  }

  test("PII redaction: each family replaced with its tag, counts match, " +
       "clean text untouched") {
    import spark.implicits._
    val d = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org thanks"),
      (2L, "ssn 123-45-6789 phone 555-867-5309 ip 10.0.42.7"),
      (3L, "three point one four one five nine"),
      (4L, "overlap: bob@host.com twice bob@host.com")).toDF("doc_id", "text")
    val counts = TextFeatures.piiCounts(col("text"))
      .map { case (n, c) => c.as(s"n_$n") }
    val out = d.select(col("doc_id") +:
        TextFeatures.redactPii(col("text")).as("red") +: counts: _*)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "reach me at <EMAIL> thanks" &&
      out(0).getInt(2) == 1)
    assert(out(1).getString(1) == "ssn <SSN> phone <PHONE> ip <IP>")
    assert((out(1).getInt(3), out(1).getInt(4), out(1).getInt(5)) == ((1, 1, 1)))
    assert(out(2).getString(1) == "three point one four one five nine" &&
      (2 to 5).forall(i => out(2).getInt(i) == 0))
    assert(out(3).getString(1) == "overlap: <EMAIL> twice <EMAIL>" &&
      out(3).getInt(2) == 2)
  }

  test("chunking: full coverage with exact overlap, short docs emit one " +
       "chunk, final chunk never empty") {
    import spark.implicits._
    val toks = (1 to 25).map(i => s"t$i").mkString(" ")
    val df = Seq(
      (1L, toks),          // 25 tokens: chunk 10/overlap 2 -> starts 0,8,16
      (2L, "a b c"),       // shorter than one chunk
      (3L, "")             // empty text -> one chunk of the "" token
    ).toDF("doc_id", "text")
    val out = Mixing.chunkDocs(df, "doc_id", "text",
      chunkSize = 10, overlap = 2)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getInt(2)).toSeq == Seq(0, 8, 16)) // start_tok
    assert(d1.map(_.getInt(3)).toSeq == Seq(10, 10, 9)) // n_tokens
    // consecutive chunks share exactly `overlap` boundary tokens
    val c0 = d1(0).getString(4).split(" ")
    val c1 = d1(1).getString(4).split(" ")
    assert(c0.takeRight(2).sameElements(c1.take(2)))
    // every token of the doc appears in order when overlaps are dropped
    val reassembled =
      (c0 ++ c1.drop(2) ++ d1(2).getString(4).split(" ").drop(2)).mkString(" ")
    assert(reassembled == toks)
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getString(4) == "a b c" &&
      d2(0).getInt(3) == 3)
    val d3 = out.filter(_.getLong(0) == 3L)
    assert(d3.length == 1 && d3(0).getString(4) == "")
  }

  test("chunking is map-only: no shuffle exchange in the plan") {
    val plan = Mixing.chunkDocs(docs, "doc_id", "text", 64, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("token budget: every stratum lands within one document of the " +
       "budget, kept sets are prefixes of the draw order, and the result " +
       "is partitioning-invariant") {
    val budget = 700L
    def run(df: org.apache.spark.sql.DataFrame) =
      Mixing.tokenBudget(df, "doc_id", "text", "source", budget)
    val out = run(docs).collect()
    val bySource = out.groupBy(_.getString(1))
    val full = docs.groupBy(col("source"))
      .agg(sum(size(TextFeatures.tokens(col("text")))).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rows) =>
      val total = rows.map(_.getLong(2)).sum
      val maxDoc = rows.map(_.getLong(2)).max
      // crossed the budget by at most the crossing document
      assert(total < budget + maxDoc, s"$src: total=$total max=$maxDoc")
      // where the budget cut the stratum, the kept prefix reaches it: the
      // crossing document is kept, everything after it is dropped
      if (full(src) > budget)
        assert(rows.map(_.getLong(3)).max >= budget && total < full(src),
          s"$src: cum_max=${rows.map(_.getLong(3)).max} total=$total")
    }
    // every stratum with more tokens than the budget exists in this corpus
    assert(full.values.forall(_ > budget), full.toString)
    // deterministic under repartitioning (window order is md5-derived)
    val again = run(docs.repartition(17)).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getLong(3))).toSet)
  }

  test("shard manifest: shards cover every document exactly once, ids are " +
       "dense in [0, n), and assignment is value-derived (stable)") {
    val m = Mixing.shardManifest(docs, "doc_id", "text", nShards = 16)
      .collect()
    assert(m.map(_.getInt(0)).toSet.subsetOf((0 until 16).toSet))
    assert(m.map(_.getLong(1)).sum == docs.count())
    // balanced to binomial noise: 500 docs over 16 shards ~ 31 each
    val sizes = m.map(_.getLong(1))
    assert(sizes.min > 10 && sizes.max < 60, sizes.mkString(","))
    // stable across partitionings
    val again = Mixing.shardManifest(docs.repartition(13), "doc_id", "text",
      nShards = 16).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == m.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("assign ids: dense 0..n-1 in key order, stable across input " +
       "partitionings, no single-partition exchange on the data path") {
    val out = Mixing.assignContiguousIds(docs.select("doc_id"),
      md5(col("doc_id").cast("string")))
    val rows = out.select(col("doc_id"), col("seq_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = docs.count()
    assert(rows.map(_._2).sorted.toSeq == (0L until n))
    // seq order == md5-key order
    def key(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = rows.map(_._1).sortBy(key).zipWithIndex
      .map { case (id, i) => (id, i.toLong) }.toSet
    assert(rows.toSet == expect)
    // stable when the input arrives differently partitioned
    val again = Mixing.assignContiguousIds(
        docs.select("doc_id").repartition(17),
        md5(col("doc_id").cast("string")))
      .select(col("doc_id"), col("seq_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == rows.toSet)
    // the DATA side never collapses to one partition: the only
    // SinglePartition exchange feeds the <= #partitions-row offsets agg
    // (driver-sized metadata), which arrives via BroadcastExchange
    val plan = out.queryExecution.executedPlan.toString
    val dataWindows = plan.linesIterator
      .filter(_.contains("Window")).filterNot(_.contains("__off")).toSeq
    assert(dataWindows.forall(_.contains("__pid")), plan)
  }

  test("assign ids: deterministic under re-execution — identical output " +
       "twice and exactly-once equi-depth buckets at several partition " +
       "counts, AQE on and off") {
    // Regression guard for the double-executed range exchange: before the
    // ranged frame was materialized once, the offsets aggregate and the
    // rank join each re-ran `repartitionByRange` with independently
    // sampled boundaries, so broadcast offsets could disagree with the
    // partitioning the data rows actually got — observed as equi-depth
    // buckets of 1539..2292 rows where every bucket must hold n/k ± 1.
    val input = docs.select("doc_id")
    val n = input.count()
    val k = 8
    for (aqe <- Seq("true", "false"); parts <- Seq(4, 17, 32)) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      try {
        def run() = Mixing.assignContiguousIds(input,
            md5(col("doc_id").cast("string")), numParts = parts)
          .select(col("doc_id"), col("seq_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val a = run()
        val b = run()
        assert(a == b, s"nondeterministic at parts=$parts aqe=$aqe")
        assert(a.map(_._2) == (0L until n).toSet,
          s"ids not dense at parts=$parts aqe=$aqe")
        // equi-depth buckets derived from the ids: seq*k div n gives
        // populations that differ by at most 1 when ids are exactly-once
        val buckets = a.groupBy { case (_, seq) => seq * k / n }
          .view.mapValues(_.size).values.toSeq
        assert(buckets.size == k && buckets.max - buckets.min <= 1,
          s"buckets=$buckets at parts=$parts aqe=$aqe")
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("stride interleave: every prefix carries sources in weight " +
       "proportion (exact stride arithmetic), train_pos is a " +
       "permutation, deterministic under partitioning") {
    val weights = Map("src1" -> 3.0, "src2" -> 0.5)
    def run(df: org.apache.spark.sql.DataFrame) =
      Mixing.strideInterleave(df, "doc_id", "source", weights)
        .select("doc_id", "source", "src_rank", "train_pos").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val rows = run(docs)
    val n = rows.length
    assert(rows.map(_._4).sorted.toSeq == (0L until n))
    // sf0.01: 25 docs per source. Up to virtual time 8 every source is
    // still active, and the stride law fixes the exact prefix census:
    // src1 (w=3) emits 24, src2 (w=0.5) emits 4, the 18 unit sources 8
    // each -> prefix length 24 + 4 + 18*8 = 172
    val unitSources = rows.map(_._2).distinct.filterNot(weights.contains)
    val expected = Map("src1" -> 24, "src2" -> 4) ++
      unitSources.map(_ -> 8).toMap
    val prefixLen = expected.values.sum
    val census = rows.filter(_._4 < prefixLen).groupBy(_._2)
      .view.mapValues(_.length).toMap
    assert(census == expected,
      s"prefix $prefixLen census $census != $expected")
    // within each source the emission order is the src_rank order
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val byPos = rs.sortBy(_._4).map(_._3)
      assert(byPos.sorted.sameElements(byPos),
        "a source's docs must appear in stride-rank order")
    }
    assert(run(docs.repartition(19)).toSet == rows.toSet)
  }

  test("curriculum: gate is monotone in difficulty rank, cohorts unlock " +
       "sqrt-fast, train order is a shuffled permutation, deterministic " +
       "under partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Mixing.curriculum(df, "doc_id", "text")
        .select("doc_id", "difficulty", "diff_rank", "unlock_step",
          "train_pos")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
    val rows = run(docs)
    val n = rows.length.toLong
    // both ranks are permutations of 1..n
    assert(rows.map(_._3).sorted.toSeq == (1L to n))
    assert(rows.map(_._5).sorted.toSeq == (1L to n))
    val byRank = rows.sortBy(_._3)
    // difficulty nondecreasing in rank; gate nondecreasing; gate within
    // [1, 100]; exact sqrt-competence arithmetic
    assert(byRank.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    assert(byRank.map(_._4).sliding(2).forall(p => p(0) <= p(1)))
    assert(rows.forall(r => r._4 >= 1 && r._4 <= 100))
    assert(rows.forall(r =>
      r._4 == (100L * r._3 * r._3 + n * n - 1) / (n * n)))
    // sqrt pacing: the first half of training steps unlocks ~sqrt(1/2) ~
    // 71% of the corpus
    val early = rows.count(_._4 <= 50)
    assert(math.abs(early - 0.707 * n) < 0.02 * n + 3, s"early=$early n=$n")
    // within a cohort the train order is md5-shuffled, i.e. NOT the rank
    // order (some inversion exists)
    val trainSorted = rows.sortBy(_._5)
    assert(trainSorted.map(_._4).sliding(2).forall(p => p(0) <= p(1)),
      "train order must respect cohort boundaries")
    assert(trainSorted.sliding(2).exists(p =>
      p(0)._4 == p(1)._4 && p(0)._3 > p(1)._3),
      "within-cohort order must be shuffled, not difficulty-sorted")
    assert(run(docs.repartition(17)).toSet == rows.toSet)
  }

  test("leakage-safe split: cluster members share a split even when their " +
       "per-document draws disagree; singletons split ~80/10/10") {
    import spark.implicits._
    // 200 singletons plus planted pairs chosen so the PER-DOCUMENT md5
    // draws of the two members land in different splits — the exact case
    // a naive per-doc split leaks on.
    def docSplit(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      if (h < "cccc") "train" else if (h < "e666") "val" else "test"
    }
    val leakyPairs = (1000L until 2000L)
      .map(a => (a, a + 1000))
      .filter { case (a, b) => docSplit(a) != docSplit(b) }
      .take(20)
    assert(leakyPairs.size == 20) // the planted hazard is non-vacuous
    val ids = (0L until 200L) ++ leakyPairs.flatMap(p => Seq(p._1, p._2))
    val docsDf = ids.toDF("doc_id").withColumn("source", lit("s"))
    val pairsDf = leakyPairs.toDF("id_a", "id_b")
    val out = Mixing.leakageSafeSplit(docsDf, "doc_id", pairsDf,
      valFrac = 0.1, testFrac = 0.1)
    val rows = out.select("doc_id", "cluster", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every cluster maps to exactly one split
    val perCluster = rows.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(perCluster.values.forall(_.size == 1))
    // each planted pair is co-located, on the cluster label's draw
    leakyPairs.foreach { case (a, b) =>
      val (sa, sb) = (rows.find(_._1 == a).get._3, rows.find(_._1 == b).get._3)
      assert(sa == sb, s"pair ($a,$b) split across ($sa,$sb)")
      assert(sa == docSplit(math.min(a, b)))
    }
    // singletons follow their own-id draw, ~80/10/10 over 200 docs
    val single = rows.filter(_._1 < 200).map(t => t._3)
    assert(single.count(_ == "train") > 140 && single.count(_ == "train") < 190)
    assert(single.count(_ == "test") > 5)
    // deterministic across partitionings
    val again = Mixing.leakageSafeSplit(docsDf.repartition(7), "doc_id",
        pairsDf.repartition(3), valFrac = 0.1, testFrac = 0.1)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == rows.map(t => (t._1, t._3)).toSet)
  }

  test("tight packing: hard no-overflow guarantee, at least as few packs " +
       "as streaming fill, oversized docs isolated, deterministic") {
    import org.apache.spark.sql.functions.{col, sum, max, countDistinct}
    val cap = 512
    val tight = Mixing.packSequencesTight(docs, "doc_id", "text",
      "source", cap)
    val perPack = tight.groupBy("source", "pack_id")
      .agg(sum("n_tokens").as("tok")).collect()
    // every doc fits cap in this corpus -> NO pack may exceed it, ever
    assert(tight.agg(max("n_tokens")).head().getLong(0) <= cap)
    assert(perPack.forall(_.getLong(2) <= cap),
      perPack.filter(_.getLong(2) > cap).mkString(";"))
    // within the BFD bound of the volume lower bound, per stratum (NOT
    // comparable to packSequences' pack count — streaming fill OVERFLOWS
    // capacity, which is exactly the defect this operator removes)
    val byStratum = tight.groupBy("source")
      .agg(sum("n_tokens").as("tok"), countDistinct("pack_id").as("packs"))
      .collect()
    byStratum.foreach { r =>
      val lb = (r.getLong(1) + cap - 1) / cap
      assert(r.getLong(2) <= (11 * lb) / 9 + 1,
        s"${r.getString(0)}: ${r.getLong(2)} packs vs LB $lb")
    }
    // same doc set, each exactly once
    assert(tight.select("doc_id").distinct().count() == docs.count())
    // deterministic under input partitioning
    val again = Mixing.packSequencesTight(docs.repartition(13), "doc_id",
        "text", "source", cap)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again == tight.collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet)
    // an oversized doc gets a pack of its own
    import spark.implicits._
    val over = Seq((1L, "s", ("w " * 600).trim), (2L, "s", "a b c"),
      (3L, "s", "d e"))
      .toDF("doc_id", "source", "text")
    val packs = Mixing.packSequencesTight(over, "doc_id", "text",
        "source", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(packs(2L) == packs(3L) && packs(1L) != packs(2L), packs.toString)
  }

  test("epoch upsampling: copy counts bracket the target, epochs are " +
       "contiguous from 0, and the draw is partitioning-invariant") {
    val out = Mixing.epochUpsample(docs, "doc_id", "source",
        Map("src0" -> 2.5, "src1" -> 1.25), defaultEpochs = 0.75)
      .select("doc_id", "source", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perDoc = out.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3))
    // every doc emits floor(e) or floor(e)+1 copies, epochs 0..k-1
    perDoc.foreach { case ((_, src), epochs) =>
      val k = epochs.length
      val (lo, hi) = src match {
        case "src0" => (2, 3)
        case "src1" => (1, 2)
        case _      => (0, 1)
      }
      assert(k >= math.max(1, lo) && k <= hi, s"$src emitted $k copies")
      assert(epochs.sorted.toSeq == (0L until k).toSeq)
    }
    // realized totals track e_s * n_s (25 docs/source at sf0.01)
    val bySource = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySource("src0") >= 55 && bySource("src0") <= 70, bySource)
    assert(bySource("src1") >= 27 && bySource("src1") <= 40, bySource)
    val again = Mixing.epochUpsample(docs.repartition(11), "doc_id",
        "source", Map("src0" -> 2.5, "src1" -> 1.25), defaultEpochs = 0.75)
      .select("doc_id", "source", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(again == out.toSet)
  }

  test("dsir: weights separate the target slice and survive repartitioning") {
    val w = Mixing.dsirWeights(docs, "doc_id", "text",
      targetPred = col("lang") === "en", nBuckets = 512)
    val rows = w.join(docs.select("doc_id", "lang"), "doc_id")
      .select("doc_id", "lang", "log_w").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.length == docs.count())
    // the estimator's one job: target-looking docs score higher on average
    val en = rows.filter(_._2 == "en").map(_._3)
    val rest = rows.filter(_._2 != "en").map(_._3)
    assert(en.sum / en.length > rest.sum / rest.length + 0.1,
      s"en mean ${en.sum / en.length} vs rest ${rest.sum / rest.length}")
    // hash-derived, not partitioning-dependent
    val again = Mixing.dsirWeights(docs.repartition(13), "doc_id", "text",
        targetPred = col("lang") === "en", nBuckets = 512)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(again == rows.map(t => (t._1, t._3)).toSet)
  }

  test("dsir: gumbel top-k resample is deterministic and upweights the " +
       "target slice") {
    val w = Mixing.dsirWeights(docs, "doc_id", "text",
      targetPred = col("lang") === "en", nBuckets = 512)
    val sel = Mixing.dsirResample(w, "doc_id", k = 100)
    val got = sel.join(docs.select("doc_id", "lang"), "doc_id")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == 100)
    assert(got.map(_._1).distinct.length == 100) // without replacement
    // pool is ~44% en; softmax(log_w) sampling should pull the selected
    // set visibly toward the target slice
    val poolEnFrac = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    val selEnFrac = got.count(_._2 == "en") / 100.0
    assert(selEnFrac > poolEnFrac + 0.1,
      s"selected en frac $selEnFrac vs pool $poolEnFrac")
    // same seed, same draw — across partitionings
    val again = Mixing.dsirResample(
      Mixing.dsirWeights(docs.repartition(7), "doc_id", "text",
        targetPred = col("lang") === "en", nBuckets = 512),
      "doc_id", k = 100).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got.map(_._1).toSet)
  }

  test("weighted sample: length-biased draw prefers long documents and " +
       "replays deterministically") {
    val sf = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, sf)
    val got = graft.llm.Mixing.weightedSample(docs, "doc_id",
      org.apache.spark.sql.functions.col("n_chars"), k = 200)
    val rows = got.collect()
    assert(rows.length == 200)
    assert(rows.sameElements(graft.llm.Mixing.weightedSample(docs, "doc_id",
      org.apache.spark.sql.functions.col("n_chars"), k = 200).collect()))
    val sampleMean = rows.map(_.getAs[Long]("w")).sum.toDouble / 200
    val corpusMean = docs.agg(org.apache.spark.sql.functions
        .avg(org.apache.spark.sql.functions.col("n_chars")))
      .head().getDouble(0)
    // size-biased expectation is E[X^2]/E[X] > E[X]; demand a clear gap
    assert(sampleMean > corpusMean * 1.05,
      s"length bias: sample mean $sampleMean vs corpus mean $corpusMean")
  }

  test("dpo pairs: extremes pairing on a hand-checkable group, margin " +
       "drops near-ties, no document on both sides, odd middle unpaired") {
    import spark.implicits._
    // one group of 5 (middle unpaired), one group of 4 with a reward tie
    // that the margin must drop, one singleton (no pairs possible)
    val docs = Seq(
      ("g1", 1L, 50L), ("g1", 2L, 40L), ("g1", 3L, 30L), ("g1", 4L, 20L),
      ("g1", 5L, 10L),
      ("g2", 6L, 7L), ("g2", 7L, 7L), ("g2", 8L, 7L), ("g2", 9L, 1L),
      ("g3", 10L, 99L)
    ).toDF("g", "id", "r")
    val got = Mixing.dpoPairs(docs, Seq("g"), "id", "r")
      .select("g", "pair_id", "chosen_id", "rejected_id", "gap")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // g1: (1,5) gap 40, (2,4) gap 20; id 3 is the unpaired middle
    // g2 ranks by (r desc, id): 6,7,8,9 -> pairs (6,9) gap 6 and (7,8)
    // gap 0 — dropped by the margin
    assert(got == Set(("g1", 1L, 1L, 5L, 40L), ("g1", 2L, 2L, 4L, 20L),
      ("g2", 1L, 6L, 9L, 6L)))
    // corpus-level invariants at sf0.001: chosen strictly beats rejected,
    // ids never repeat within a side of a group, deterministic re-run
    val real = graft.SparkEntry.queries("mix_dpo_pairs")(spark,
      "/root/testdata/sf0.001")
    val rows = real.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(7) >= 1L))
    val perGroup = rows.groupBy(r => (r.getString(0), r.getString(1)))
    perGroup.values.foreach { rs =>
      val chosen = rs.map(_.getLong(3))
      val rejected = rs.map(_.getLong(4))
      assert(chosen.distinct.length == chosen.length)
      assert(rejected.distinct.length == rejected.length)
      assert(chosen.toSet.intersect(rejected.toSet).isEmpty)
    }
    val again = graft.SparkEntry.queries("mix_dpo_pairs")(spark,
      "/root/testdata/sf0.001").collect()
    assert(rows.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
  }

  test("best-of-n: one winner per group holding the max reward, margin " +
       "vs the true runner-up, null margin only on singleton groups") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("mix_best_of_n")(spark, sf)
      .collect()
    val docs = graft.Tables.documents(spark, sf)
      .select("lang", "source", "doc_id", "n_chars").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.length == docs.size, "exactly one winner per group")
    rows.foreach { r =>
      val g = docs((r.getString(0), r.getString(1)))
      // winner: max reward, min doc_id among ties
      val best = g.minBy { case (id, rw) => (-rw, id) }
      assert(r.getLong(3) == best._1 && r.getLong(4) == best._2)
      assert(r.getLong(2) == g.length.toLong)
      if (g.length == 1) assert(r.isNullAt(5))
      else {
        val sorted = g.sortBy { case (id, rw) => (-rw, id) }
        assert(r.getLong(5) == best._2 - sorted(1)._2)
      }
    }
  }

  test("grpo: advantages in every non-degenerate group sum to ~zero, " +
       "square-sum to ~n, and replay the exact integer formula") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("mix_grpo_advantage")(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) Double.NaN else r.getDouble(6))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val n = rs.head._2._2
      assert(rs.length.toLong == n, s"group $g n")
      val s = rs.map(_._2._1).sum
      val q = rs.map(t => t._2._1 * t._2._1).sum
      rs.foreach { case (_, (rw, _, advNum, adv)) =>
        assert(advNum == n * rw - s)
        if (n * q - s * s > 0)
          assert(adv == advNum.toDouble / math.sqrt((n * q - s * s).toDouble))
        else assert(adv.isNaN)
      }
      if (n * q - s * s > 0) {
        val advs = rs.map(_._2._4)
        assert(math.abs(advs.sum) < 1e-9 * n)
        // population standardization: sum of squares == n exactly up to fp
        assert(math.abs(advs.map(a => a * a).sum - n) < 1e-6 * n)
      }
    }
  }

  test("mix_kfold: folds live in 0..4, every member of a near-dup " +
       "cluster shares its cluster's fold, and all docs are assigned") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("mix_kfold")(
        spark, "/root/testdata/sf0.01")
      .select($"doc_id", $"cluster", $"fold")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == docs.count())
    assert(rows.forall { case (_, _, f) => f >= 0 && f < 5 })
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.values.forall(_.map(_._3).distinct.length == 1),
      "a cluster must never straddle folds")
    assert(byCluster.exists(_._2.length > 1),
      "sf0.01 must contain at least one multi-doc near-dup cluster " +
        "or the leakage guarantee is vacuous")
    // balance: md5-uniform folds over ~clusters; loose 2x bound
    val folds = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(folds.size == 5 && folds.values.min * 3 > folds.values.max,
      s"fold sizes suspiciously skewed: $folds")
  }

  test("keep-best survivorship: one keeper per cluster, the keeper " +
       "maximizes (n_chars, -doc_id), and singletons keep themselves") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("llm_dup_keep_best")(
        spark, "/root/testdata/sf0.01")
      .select($"doc_id", $"cluster", $"keeper", $"dropped")
      .as[(Long, Long, Long, Int)].collect()
    val nChars = docs.select($"doc_id", $"n_chars")
      .as[(Long, Long)].collect().toMap
    assert(rows.length == nChars.size)
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val keepers = rs.map(_._3).distinct
      assert(keepers.length == 1, "one keeper per cluster")
      val k = keepers.head
      val best = rs.map(_._1).minBy(id => (-nChars(id), id))
      assert(k == best, s"keeper $k vs best-by-reward $best")
      rs.foreach { case (id, _, _, dropped) =>
        assert((dropped == 1) == (id != k))
      }
      if (rs.length == 1) assert(rs.head._1 == k && rs.head._4 == 0)
    }
    assert(rows.exists(_._4 == 1), "fixture must drop something")
  }

}
