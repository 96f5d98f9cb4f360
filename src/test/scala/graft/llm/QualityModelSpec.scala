package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained quality scorer: contrastive training learns a real separation,
  * is deterministic across runs and partitionings, and scores with a
  * map-only plan.
  */
class QualityModelSpec extends SparkSpec {

  private lazy val docs =
    graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("contrastive training separates clean documents from their " +
       "corruption with near-perfect accuracy") {
    val scorer = QualityModel.trainContrastive(docs, "doc_id", "text")
    val both = docs.select(col("doc_id"), col("text"), lit(true).as("y"))
      .unionByName(docs.select(col("doc_id"), QualityModel.corrupt(col("text"))
        .as("text"), lit(false).as("y")))
    val scored = QualityModel.score(both, "text", scorer)
      .select(col("y"), col("quality_logit")).collect()
      .map(r => (r.getBoolean(0), r.getDouble(1)))
    val clean = scored.filter(_._1).map(_._2)
    val dirty = scored.filterNot(_._1).map(_._2)
    val meanClean = clean.sum / clean.length
    val meanDirty = dirty.sum / dirty.length
    assert(meanClean > meanDirty + 2.0,
      s"meanClean=$meanClean meanDirty=$meanDirty")
    val acc = scored.count { case (y, z) => (z > 0) == y }.toDouble /
      scored.length
    assert(acc > 0.95, s"acc=$acc")
  }

  test("a hand-made fluent paragraph outranks word salad with the " +
       "trained scorer") {
    import spark.implicits._
    val scorer = QualityModel.trainContrastive(docs, "doc_id", "text")
    val probe = Seq(
      (1L, "the results of the query are stored in a table and the " +
        "engine is fast to scan and the plan is easy to read"),
      (2L, "zzk@@ qq##7 ;;!! pp%% xx&& 9988 ** ?? ~~ || ^^ { } " +
        "]] [[ // \\\\ ,, .. ;; ::")).toDF("doc_id", "text")
    val out = QualityModel.score(probe, "text", scorer)
      .orderBy("doc_id").collect().map(_.getDouble(2))
    assert(out(0) > out(1), out.mkString(","))
  }

  test("training is deterministic across runs and input partitionings") {
    def scorerOf(df: org.apache.spark.sql.DataFrame) =
      QualityModel.trainContrastive(df, "doc_id", "text")
    val a = scorerOf(docs)
    assert(scorerOf(docs) == a)
    assert(scorerOf(docs.repartition(13)) == a)
  }

  test("scoring is map-only: no shuffle, no driver state beyond literals") {
    val scorer = QualityModel.trainContrastive(docs, "doc_id", "text")
    val plan = QualityModel.score(docs, "text", scorer)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("FrozenScorer literals are exactly one trainContrastive run over " +
       "the sf0.001 corpus (pinned-provenance, the FrozenMerges rule)") {
    // If this fails, someone edited either the literals or the training
    // path: re-run graft.llm.QualityModelFreeze and re-pin deliberately.
    val fresh = QualityModel.trainContrastive(docs, "doc_id", "text")
    assert(QualityModel.FrozenScorer == fresh)
  }

  test("frozen scoring separates the hand-made probe and is independent " +
       "of the corpus it runs on") {
    import spark.implicits._
    val probe = Seq(
      (1L, "the results of the query are stored in a table and the " +
        "engine is fast to scan and the plan is easy to read"),
      (2L, "zzk@@ qq##7 ;;!! pp%% xx&& 9988 ** ?? ~~ || ^^ { } " +
        "]] [[ // \\\\ ,, .. ;; ::")).toDF("doc_id", "text")
    val out = QualityModel.score(probe, "text", QualityModel.FrozenScorer)
      .orderBy("doc_id").collect().map(_.getDouble(2))
    assert(out(0) > out(1), out.mkString(","))
  }
}
