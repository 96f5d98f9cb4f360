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

  test("plan: distributed top-k, no global sort of the corpus") {
    val d = docs((1L to 30L).map(i => i -> s"cat x$i y z"): _*)
    val plan = Retrieval.bm25TopK(d, Seq("cat"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a TakeOrderedAndProject top-k, got:\n$plan")
  }
}
