package graft.llm

import graft.SparkSpec

class TopicsSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def corpus(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("plsa separates two planted themes into distinct topics") {
    // 20 docs, two disjoint vocabularies — the easiest possible
    // mixture; after a few EM rounds each theme's words must
    // concentrate in one topic, and the two themes in DIFFERENT topics
    val animal = "cat dog bird fish horse"
    val finance = "stock bond trade market price"
    val docs = corpus((0L until 20L).map { i =>
      i -> (if (i % 2 == 0) s"$animal $animal cat dog"
            else s"$finance $finance stock bond")
    }: _*)
    val phi = Topics.plsaTopics(docs, k = 2, vocabSize = 10, rounds = 20,
        topWords = 10)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    // for each word, its argmax topic
    val topicOf = phi.groupBy(_._2).map { case (w, rs) =>
      w -> rs.maxBy(_._3)._1
    }
    val animalTopics = animal.split(" ").map(topicOf).toSet
    val financeTopics = finance.split(" ").map(topicOf).toSet
    assert(animalTopics.size == 1, s"animal words split: $topicOf")
    assert(financeTopics.size == 1, s"finance words split: $topicOf")
    assert(animalTopics != financeTopics, s"themes merged: $topicOf")
  }

  test("plsa output is bit-identical under repartitioning and " +
       "phi rows are valid fixed-point probabilities") {
    val docs = corpus((0L until 30L).map(i =>
      i -> s"w${i % 7} w${i % 3} w${i % 5} filler$i w${i % 7}"): _*)
    def run(df: DataFrame) =
      Topics.plsaTopics(df, k = 3, vocabSize = 12, rounds = 3,
        topWords = 12)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3))).sortBy(t => (t._1, t._2)).toList
    val a = run(docs.repartition(1))
    val b = run(docs.repartition(13))
    assert(a == b, "fixed-point EM must not depend on partitioning")
    // phi in (0, S]; per topic the masses are near-normalized (each
    // div truncates at most 1, and the >=1 floor adds at most 1/S each)
    val s = 1048576L
    a.foreach { case (_, _, _, p) => assert(p >= 1 && p <= s) }
    a.groupBy(_._1).foreach { case (z, rows) =>
      val mass = rows.map(_._4).sum
      assert(mass <= s + rows.length && mass >= s - rows.length,
        s"topic $z mass $mass")
    }
  }
}
