package graft.llm

import graft.SparkSpec

/** Naive Bayes: learnability on a separable fixture, prior dominance on
  * empty evidence, vocabulary-cap behavior, and partitioning invariance.
  */
class ClassifySpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def corpus(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("separable vocabularies classify perfectly, including docs with " +
       "class-crossing noise tokens") {
    val d = corpus(
      (1L, "aa bb aa bb", "A"), (2L, "aa aa bb", "A"),
      (3L, "bb aa aa aa", "A"),
      (4L, "cc dd cc dd", "B"), (5L, "cc cc dd", "B"),
      (6L, "dd cc cc cc", "B"),
      // one noise token from the other side must not flip the majority
      (7L, "aa aa aa cc", "A"), (8L, "dd dd dd bb", "B"))
    val got = Classify.naiveBayes(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(3))).toMap
    assert(got.size == 8)
    assert(got.forall(_._2._2), s"all docs must classify correctly: $got")
  }

  test("class priors break even evidence: a shared-token doc goes to the " +
       "larger class; smoothing keeps unseen-token classes finite") {
    val d = corpus(
      (1L, "zz", "big"), (2L, "zz", "big"), (3L, "zz", "big"),
      (4L, "zz", "small"))
    // every doc is the single shared token; likelihoods tie up to
    // smoothing, the 3:1 prior decides
    val got = Classify.naiveBayes(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.values.forall(_ == "big"), s"prior must decide: $got")
  }

  test("vocabulary cap drops rare tokens from the model; docs with only " +
       "out-of-vocab tokens are absent") {
    val d = corpus(
      (1L, "aa aa aa aa", "A"), (2L, "aa aa aa", "A"),
      (3L, "bb bb bb bb", "B"), (4L, "bb bb bb", "B"),
      (5L, "rare", "B"))
    // vocabSize=2 keeps {aa, bb}; doc 5's only token is out of vocab
    val got = Classify.naiveBayes(d, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(identity))
  }

  test("deterministic under repartitioning on real data") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def run(df: DataFrame) = Classify.naiveBayes(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = run(d)
    assert(a.nonEmpty)
    assert(run(d.repartition(11)) == a)
  }
}
