package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus pipeline — the artifact a data team
  * actually runs, composing the engine's cleaning inventory in the
  * production order:
  *
  *   ingest → quality gate (structural Gopher + C4 blocklist + bounds) →
  *   exact dedup (fingerprint, min-id survivor) →
  *   near dedup (MinHash-LSH components, min-id survivor) →
  *   decontaminate (n-gram overlap vs the held-out benchmark split) →
  *   mix (temperature sampling over sources) →
  *   token budget (per-source md5-draw cap) →
  *   shard (deterministic md5 shard assignment)
  *
  * The deliverable is the per-stage funnel: one row per stage with the
  * surviving document and token counts, plus one row per output shard.
  * Every stage is an already-oracle-proven operator (text_gopher_rules /
  * text_c4_rules, dedup_exact, dedup_minhash, llm_decontaminate,
  * mix_temperature_sample, mix_token_budget, mix_shard_manifest), so the
  * WHOLE funnel hash-compares against a DuckDB replay.
  *
  * Scale shape: each stage produces a SURVIVOR-ID relation that is
  * repartitioned on doc_id and cut once (graft.Ckpt.cut), so no stage's
  * lineage — the rule regexes, the minhash signatures, the component
  * fixpoint — ever executes more than once; downstream stages re-attach
  * text by a cheap scan ⋉ ids semi-join. The funnel counts come from
  * ONE annotation pass over the six id sets (all equi-joins on doc_id)
  * followed by a reach-prefix explode. Id relations are ids only — no
  * text is checkpointed. Reference framing: the reference's dbt project
  * runs staging → marts → tests as one `dbt build`
  * (/root/reference/models, automate_pipeline.py:1-28); this is the
  * LLM-corpus equivalent with the same run-then-gate shape.
  */
object CorpusPipeline {

  val stageNames: Seq[String] = Seq("0_ingest", "1_quality",
    "2_exact_dedup", "3_near_dedup", "4_decontaminate", "5_mix", "6_budget")

  /** Per-stage funnel counts (stage, n_docs, n_tokens) + per-shard rows.
    *
    * `benchMod`: doc_id % benchMod == 0 is held out as the benchmark
    * split (the decontamination target, excluded from the corpus) — the
    * convention llm_decontaminate already uses.
    *
    * The quality gate is the STRUCTURAL subset of the published rules:
    * Gopher word count / mean word length / symbol ratio / alpha ratio,
    * C4's blocklist rules (lorem ipsum, brace, javascript), and the
    * length bounds. The punctuation-dependent rules (Gopher stop-word
    * octet, C4 terminal-punctuation line retention and min-sentences)
    * are corpus-register toggles a production gate configures per
    * source — on prose they bind, on code/log/table registers they are
    * switched off (this corpus has no sentence-terminal lines at all,
    * so leaving them on zeroes the funnel at stage 1; the full-strict
    * conjunction remains available as llm_doc_verdict).
    */
  def stageCounts(docs: DataFrame,
                  benchMod: Long = 97L,
                  bands: Int = 8, rows: Int = 4, threshold: Double = 0.8,
                  shingleN: Int = 4,
                  alpha: Double = 0.5, targetFraction: Double = 0.5,
                  budget: Long = 200L, nShards: Int = 8): DataFrame = {
    val bench = docs.filter(col("doc_id") % benchMod === 0)
    val corpus = docs.filter(col("doc_id") % benchMod =!= 0)
    // one materialization per survivor-id relation; partitioned on the
    // key every downstream join uses
    def cutIds(df: DataFrame): DataFrame =
      graft.Ckpt.cut(df.repartition(col("doc_id")))

    // stage 1: quality — structural Gopher rules + C4 blocklist rules +
    // length bounds (see the Scaladoc note on the punctuation toggles)
    val qIds = cutIds(
      CorpusQuality.gopherRules(corpus)
        .join(CorpusQuality.c4Rules(corpus)
          .select(col("doc_id"), col("c4_no_lorem"), col("c4_no_brace"),
            col("c4_no_js")), Seq("doc_id"))
        .join(corpus.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
        .filter(col("g_wc") === 1 && col("g_mwl") === 1 &&
          col("g_sym") === 1 && col("g_alpha") === 1 &&
          col("c4_no_lorem") === 1 && col("c4_no_brace") === 1 &&
          col("c4_no_js") === 1 &&
          col("n_chars") >= 100 && col("n_chars") <= 50000)
        .select("doc_id"))
    val quality = corpus.join(qIds, Seq("doc_id"), "left_semi")

    // stage 2: exact dedup — min doc_id per content fingerprint
    val exIds = cutIds(
      quality.groupBy(TextFeatures.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id"))
    val exact = quality.join(exIds, Seq("doc_id"), "left_semi")

    // stage 3: near dedup — MinHash-LSH connected components, min-id
    // survivor per cluster (portable signatures so the funnel replays)
    val losers = Dedup.componentMinLabels(
        Dedup.minHashNearDups(exact, "doc_id", "text", bands, rows,
          threshold, portable = true))
      .filter(col("label") < col("node"))
      .select(col("node").as("doc_id"))
    val nearIds = cutIds(exIds.join(losers, Seq("doc_id"), "left_anti"))
    val near = corpus.join(nearIds, Seq("doc_id"), "left_semi")

    // stage 4: decontaminate — drop any doc sharing an n-token shingle
    // with the benchmark split
    val cleanIds = cutIds(nearIds.join(
      Dedup.decontaminate(near, bench, "doc_id", "text", shingleN)
        .select("doc_id"),
      Seq("doc_id"), "left_anti"))
    val clean = corpus.join(cleanIds, Seq("doc_id"), "left_semi")

    // stage 5: temperature mix over sources (rates from the clean corpus)
    val mixIds = cutIds(
      Mixing.temperatureSample(clean, "doc_id", "source", alpha,
        targetFraction).select("doc_id"))
    val mixed = clean.join(mixIds, Seq("doc_id"), "left_semi")

    // stage 6: per-source token budget in md5-draw order
    val finIds = cutIds(
      Mixing.tokenBudget(mixed, "doc_id", "text", "source", budget)
        .select("doc_id"))
    val fin = mixed.join(finIds, Seq("doc_id"), "left_semi")

    // ONE funnel pass over the six (already materialized) id sets:
    // membership flags -> reach -> explode the reach prefix -> per-stage
    // integer aggregate.
    val nt = size(TextFeatures.tokens(col("text"))).cast("long")
    var ann = corpus.select(col("doc_id"), nt.as("nt"))
    Seq(qIds, exIds, nearIds, cleanIds, mixIds, finIds).zipWithIndex
      .foreach { case (ids, i) =>
        ann = ann.join(ids.select(col("doc_id"), lit(1).as(s"f$i")),
          Seq("doc_id"), "left")
      }
    val reach: Column = (0 until 6)
      .map(i => coalesce(col(s"f$i"), lit(0)))
      .reduce(_ + _)
    val stageRows = ann
      .select(explode(sequence(lit(0), reach)).as("ord"), col("nt"))
      .groupBy(col("ord"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      .select(
        element_at(array(stageNames.map(lit): _*), col("ord") + 1)
          .as("stage"),
        col("n_docs"), col("n_tokens"))
    val shardRows = Mixing.shardManifest(fin, "doc_id", "text", nShards)
      .select(concat(lit("7_shard_"), col("shard_id").cast("string"))
          .as("stage"),
        col("n_docs"), col("n_tokens"))
    // materialize the (tiny) funnel, then free the id checkpoints — the
    // cleanCorpus release discipline, so no per-call blocks linger
    val out = graft.Ckpt.cut(stageRows.unionByName(shardRows))
    Seq(qIds, exIds, nearIds, cleanIds, mixIds, finIds)
      .foreach(Dedup.releaseCheckpoint)
    out
  }
}
