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
}
