package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("higher tf wins between equal-length docs; rank is 1-based") {
    val d = docs(
      1L -> "cat dog bird fish",
      2L -> "cat cat cat fish",
      3L -> "dog bird fish frog")
    val got = Retrieval.bm25TopK(d, Seq("cat"), k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    // doc 3 has no 'cat' at all: absent from the result entirely
    assert(got == List((2L, 1), (1L, 2)))
  }

  test("length normalization: same tf, shorter doc scores higher") {
    val d = docs(
      1L -> ("cat " + Seq.fill(40)("x").mkString(" ")),
      2L -> "cat y z")
    val rows = Retrieval.bm25TopK(d, Seq("cat"), k = 2).collect()
    assert(rows.map(_.getLong(0)).toList == List(2L, 1L))
    assert(rows(0).getDouble(2) > rows(1).getDouble(2))
  }

  test("multi-term scores sum; rarer term carries higher idf weight") {
    val d = docs(
      1L -> "rare common a b",
      2L -> "common a b c",
      3L -> "common b c d",
      4L -> "common c d e")
    val got = Retrieval.bm25TopK(d, Seq("rare", "common"), k = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size == 4)
    // doc 1 matches both terms, everyone else only 'common'
    assert(got(1L) > got(2L) && got(1L) > got(3L) && got(1L) > got(4L))
  }

  test("query of absent terms returns no rows; k bounds the output") {
    val d = docs(1L -> "a b c", 2L -> "d e f")
    assert(Retrieval.bm25TopK(d, Seq("zzz"), k = 5).count() == 0)
    assert(Retrieval.bm25TopK(d, Seq("a", "d"), k = 1).count() == 1)
  }

  test("scores are identical under repartitioning (ordered fold, not sum)") {
    val base = docs((1L to 50L).map(i =>
      i -> s"tok${i % 7} tok${i % 3} filler$i pad${i % 11} tok${i % 7}"): _*)
    def run(df: DataFrame) =
      Retrieval.bm25TopK(df, Seq("tok1", "tok2", "tok4"), k = 20)
        .collect().map(r => (r.getLong(0), r.getInt(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)))).toList
    assert(run(base.repartition(1)) == run(base.repartition(13)),
      "bit-exact scores regardless of partitioning")
  }

  test("rrf fusion: doc on both lists beats docs on a single list") {
    import spark.implicits._
    // doc 1: matches the term AND is the nearest vector; docs 2/3 each
    // appear on only one list
    val d = docs(
      1L -> "cat x y z",
      2L -> "cat cat cat z", // lexically stronger than doc 1
      3L -> "p q r s")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),  // the query vector
      (1L, Array(0.9f, 0.1f), 0),  // near the query
      (2L, Array(-1.0f, 0.0f), 0), // opposite
      (3L, Array(0.8f, 0.2f), 0)   // near-ish
    ).toDF("vec_id", "embedding", "label")
    val got = Retrieval.hybridRrf(d, emb, Seq("cat"), queryVecId = 0L,
      kCand = 3, k = 3).collect().map(r => (r.getLong(0), r.getInt(1))).toList
    // doc 1: lex rank 2 + dense rank 1 = 1/62 + 1/61 ≈ 0.0325 beats
    // doc 2: lex rank 1 + dense rank 3 = 1/61 + 1/63 ≈ 0.0323 —
    // presence near the top of BOTH lists outweighs one first place
    assert(got.head == ((1L, 1)))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L))
  }

  test("rrf score is exactly the sum of the two reciprocal terms") {
    import spark.implicits._
    val d = docs(1L -> "cat a b", 2L -> "x y z")
    val emb = Seq((0L, Array(1.0f, 0.0f), 0), (1L, Array(2.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f), 0)).toDF("vec_id", "embedding", "label")
    val got = Retrieval.hybridRrf(d, emb, Seq("cat"), 0L, kCand = 5, k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 1: lex rank 1 + dense rank 1 (exactly parallel vector);
    // doc 2: dense rank 2 only
    assert(got(1L) == 1.0 / 61.0 + 1.0 / 61.0)
    assert(got(2L) == 1.0 / 62.0)
  }

  test("plan: distributed top-k, no global sort of the corpus") {
    val d = docs((1L to 30L).map(i => i -> s"cat x$i y z"): _*)
    val plan = Retrieval.bm25TopK(d, Seq("cat"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a TakeOrderedAndProject top-k, got:\n$plan")
  }

  test("batch BM25: each query's list equals the single-query operator's, " +
       "bit-for-bit, including when queries share terms") {
    val d = docs(
      1L -> "cat dog fish", 2L -> "cat cat dog", 3L -> "dog dog dog",
      4L -> "fish fish cat", 5L -> "bird bird bird cat", 6L -> "dog fish")
    val queries = Seq(0L -> Seq("cat", "dog"), 1L -> Seq("dog", "fish"),
      2L -> Seq("bird"))
    val batch = Retrieval.bm25TopKBatch(d, queries, k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .groupBy(_._1)
    for ((qid, terms) <- queries) {
      val single = Retrieval.bm25TopK(d, terms, k = 4)
        .collect()
        .map(r => (qid, r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      assert(batch(qid).toSet == single,
        s"q$qid: batch=${batch(qid).toSet} single=$single")
    }
    intercept[IllegalArgumentException](
      Retrieval.bm25TopKBatch(d, Seq(0L -> Seq.empty)))
  }

  test("batch hybrid RRF: a batch query's fused list equals the " +
       "single-query hybrid operator's, bit-for-bit") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val terms = Seq("spark", "vector", "hash")
    val single = Retrieval.hybridRrf(d, e, terms, queryVecId = 0L,
        kCand = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val batch = Retrieval.hybridRrfBatch(d, e,
        Seq(0L -> terms, 1L -> Seq("data", "table")),
        queryVec = Map(0L -> 0L, 1L -> 1L), kCand = 10, k = 5)
      .collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(batch == single, s"batch=$batch single=$single")
    intercept[IllegalArgumentException](
      Retrieval.hybridRrfBatch(d, e, Seq(0L -> terms),
        queryVec = Map.empty))
  }

  test("prf: expansion surfaces the term co-occurring with the query in " +
       "feedback docs and promotes a doc round 1 could not see") {
    // 'cat' query; feedback docs pair cat with 'felid'; doc 6 mentions
    // only 'felid' so round 1 cannot rank it, PRF can
    val d = docs(
      1L -> "cat felid cat felid",
      2L -> "cat felid fish",
      3L -> "cat felid bird",
      4L -> "dog dog dog",
      5L -> "bird fish bird",
      6L -> "felid felid felid")
    val plain = Retrieval.bm25TopK(d, Seq("cat"), k = 6)
      .collect().map(_.getLong(0)).toSet
    assert(!plain.contains(6L))
    val prf = Retrieval.bm25Prf(d, Seq("cat"), fbDocs = 3, fbTerms = 1,
      k = 6).collect().map(_.getLong(0)).toSet
    assert(prf.contains(6L),
      s"expansion must surface the felid-only doc: $prf")
    // deterministic under partitioning
    val again = Retrieval.bm25Prf(d.repartition(7), Seq("cat"),
      fbDocs = 3, fbTerms = 1, k = 6).collect().map(_.getLong(0)).toSet
    assert(again == prf)
  }

  test("QLD: higher tf wins at equal length, shorter doc wins at equal " +
       "tf, zero-match docs pruned, scores negative log-likelihoods") {
    val d = docs(
      1L -> "cat dog bird fish",
      2L -> "cat cat cat fish",
      3L -> "dog bird fish frog",
      4L -> "cat dog bird fish frog newt toad hen ox ant bee fly")
    val got = Retrieval.qldTopK(d, Seq("cat"), k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val ids = got.map(_._1).toList
    assert(!ids.contains(3L), "doc without the term must be pruned")
    assert(ids.head == 2L, s"tf=3 doc must rank first: $ids")
    assert(ids.indexOf(1L) < ids.indexOf(4L),
      "same tf=1: the 4-token doc must beat the 12-token doc")
    assert(got.forall(_._3 < 0.0), "log-likelihoods must be negative")
  }

  test("QLD: a missing query term contributes background mass, not " +
       "exclusion; deterministic under partitioning") {
    val d = docs(
      1L -> "cat dog",
      2L -> "cat frog",
      3L -> "frog newt")
    // doc 1 matches both terms, doc 2 one; both are candidates and doc 1
    // must outrank doc 2 via the second term's foreground mass
    val got = Retrieval.qldTopK(d, Seq("cat", "dog"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toList
    assert(got.map(_._1).take(2) == List(1L, 2L), s"got $got")
    val again = Retrieval.qldTopK(d.repartition(5), Seq("cat", "dog"),
      k = 10).collect().map(r => r.getLong(0) -> r.getInt(1)).toList
    assert(again == got)
  }

  test("evalRanking: closed-form metrics on a hand-scored ranking, " +
       "zero-hit query reports zeros (never null), bit-exact vs a " +
       "sequential scala replay") {
    import spark.implicits._
    // q0: docs 1..5 ranked 1..5, relevant {1,3,5}; q1: no relevant in
    // the top k but two judged docs exist
    val rankings = ((1L to 5L).map(d => (0L, d, d.toInt)) ++
      (1L to 5L).map(d => (1L, d, d.toInt)))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((0L, 1L), (0L, 3L), (0L, 5L), (1L, 77L), (1L, 88L))
      .toDF("query_id", "doc_id")
    val got = Retrieval.evalRanking(rankings, qrels, k = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    def log2(x: Double) = Math.log(x) / Math.log(2.0)
    val q0 = got(0L)
    assert(q0.getAs[Long]("n_rel") == 3L && q0.getAs[Long]("hits") == 3L)
    assert(q0.getAs[Double]("recall") == 1.0)
    assert(q0.getAs[Double]("mrr") == 1.0)
    val ap = (1.0 / 1.0 + 2.0 / 3.0 + 3.0 / 5.0) / 3.0
    assert(java.lang.Double.doubleToLongBits(q0.getAs[Double]("ap")) ==
      java.lang.Double.doubleToLongBits(ap))
    val dcg = 1.0 / log2(2.0) + 1.0 / log2(4.0) + 1.0 / log2(6.0)
    val idcg = 1.0 / log2(2.0) + 1.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(java.lang.Double.doubleToLongBits(q0.getAs[Double]("dcg")) ==
      java.lang.Double.doubleToLongBits(dcg))
    assert(java.lang.Double.doubleToLongBits(q0.getAs[Double]("ndcg")) ==
      java.lang.Double.doubleToLongBits(dcg / idcg))
    val q1 = got(1L)
    assert(q1.getAs[Long]("n_rel") == 2L && q1.getAs[Long]("hits") == 0L)
    Seq("recall", "mrr", "ap", "dcg", "ndcg").foreach { m =>
      assert(q1.getAs[Double](m) == 0.0, s"$m must be 0.0, not null")
    }
  }

  test("conjunctiveQrels: relevance requires EVERY query term; term " +
       "multiplicity and order are irrelevant") {
    val d = docs(
      1L -> "cat dog fish",
      2L -> "dog cat",      // both terms, other order
      3L -> "cat cat cat",  // one term, repeated
      4L -> "fish frog")
    val got = Retrieval.conjunctiveQrels(d,
        Seq(7L -> Seq("cat", "dog"), 8L -> Seq("fish")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((7L, 1L), (7L, 2L), (8L, 1L), (8L, 4L)))
  }
}
