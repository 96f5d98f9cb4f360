package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The operators are a LIBRARY: this spec runs the whole corpus-build
  * recipe end to end — quality gate → exact dedup → near-dup removal →
  * benchmark decontamination → DSIR selection → per-source cap → epoch
  * upsampling → tight packing → sharding — and asserts the invariants a
  * training-data engineer relies on at each seam. No step knows about
  * any other; everything composes through plain DataFrames.
  */
class PipelineCompositionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("corpus build: each stage preserves its contract through the " +
       "full chain") {
    val docs = Tables.documents(spark, sf)
    val n0 = docs.count()

    // 1. quality: keep docs whose stats clear cheap thresholds
    val stats = TextFeatures
    val quality = docs.filter(
      length(col("text")) >= 50 && length(col("text")) <= 100000)
    val n1 = quality.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. exact dedup: one (min-id) survivor per normalized text
    val exact = quality.join(
      Dedup.exact(quality).select("doc_id"), Seq("doc_id"))
    val n2 = exact.count()
    assert(n2 <= n1)
    assert(exact.groupBy(TextFeatures.normalized(col("text")))
      .count().filter(col("count") > 1).count() == 0,
      "exact dedup must leave no normalized-text twins")

    // 3. near-dup removal: minhash components, min-id survivors
    val pairs = Dedup.minHashNearDups(exact, "doc_id", "text",
      bands = 8, rows = 4, threshold = 0.8)
    val labels = Dedup.componentMinLabels(pairs)
    val deduped = exact.join(
      labels.filter(col("node") =!= col("label"))
        .select(col("node").as("doc_id")),
      Seq("doc_id"), "left_anti")
    val n3 = deduped.count()
    assert(n3 <= n2 && n3 > 0)

    // 4. decontamination: drop docs sharing 5-gram shingles with a
    // "benchmark" (a planted slice of the corpus itself -> those docs
    // MUST all be flagged)
    val benchmark = deduped.orderBy("doc_id").limit(5)
      .select("doc_id", "text")
    val flagged = Dedup.decontaminate(deduped, benchmark,
      "doc_id", "text", n = 5)
    val clean = deduped.join(flagged.select("doc_id"),
      Seq("doc_id"), "left_anti")
    val n4 = clean.count()
    assert(n4 < n3, "planted benchmark docs must be flagged")

    // 5. DSIR selection toward the en slice (softmax-weighted, without
    // replacement), then a per-source cap
    val weights = Mixing.dsirWeights(clean, "doc_id", "text",
      targetPred = col("lang") === "en", nBuckets = 512)
    assert(weights.count() == n4, "every doc gets a weight")
    val selected = clean.join(
      Mixing.dsirResample(weights, "doc_id", k = 300).select("doc_id"),
      Seq("doc_id"))
    val capped = Mixing.perSourceCap(selected, "doc_id", "source", cap = 12)
    val perSource = capped.groupBy("source").count().collect()
    assert(perSource.forall(_.getLong(1) <= 12))

    // 6. epoch upsampling: en sources get 2 epochs, others 1
    val upsampled = Mixing.epochUpsample(capped, "doc_id", "source",
      epochs = Map("src0" -> 2.0), defaultEpochs = 0.9999)
    assert(upsampled.filter(col("source") === "src0").count() ==
      2 * capped.filter(col("source") === "src0").count())

    // 7. tight packing of (doc, epoch) units — no pack over capacity
    val units = upsampled
      .withColumn("unit_id",
        col("doc_id") * 10 + col("epoch")) // distinct per copy
    val packed = Mixing.packSequencesTight(units, "unit_id", "text",
      "source", capacity = 512)
    assert(packed.count() == units.count())
    val over = packed.groupBy("source", "pack_id")
      .agg(sum("n_tokens").as("t")).filter(col("t") > 512).count()
    assert(over == 0, "tight packing contract violated downstream")

    // 8. sharding manifest covers every packed unit exactly once
    val manifest = Mixing.shardManifest(
      packed.join(units.select(col("unit_id"), col("text")), "unit_id"),
      "unit_id", "text", nShards = 8)
    assert(manifest.agg(sum("n_docs")).head().getLong(0) == packed.count())
  }
}
