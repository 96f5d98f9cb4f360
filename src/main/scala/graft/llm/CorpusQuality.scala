package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition-based quality signals — the Gopher/MassiveText filter rules
  * (Rae et al. 2021, table A1): heavily self-repeating documents are
  * boilerplate/spam and get filtered before training. Token-level n-gram
  * variants here (the line/paragraph variants degenerate on single-line
  * corpora):
  *
  *   - top_bigram_frac: occurrences of the single most frequent bigram
  *     over all bigram occurrences (Gopher filters docs > 0.18 for 2-grams)
  *   - dup_bigram_frac: fraction of bigram occurrences whose bigram occurs
  *     more than once (the duplicate-n-gram mass)
  *
  * Plan shape: explode to (doc, gram) -> partial+final count keyed by
  * (doc, gram) -> per-doc aggregate. Two keyed shuffles, both partially
  * aggregated map-side; no driver state — scales to any corpus. All
  * outputs are single divisions of exact integer counts, so the DuckDB
  * oracle matches bit-for-bit.
  */
object CorpusQuality {

  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val grams = docs
      .select(col(idCol), TextFeatures.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        explode(TextFeatures.bigramsOfTokens(col("toks"))).as("g"))
    grams
      .groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        (max(col("c")).cast("double") / sum(col("c"))).as("top_bigram_frac"),
        (sum(when(col("c") > 1, col("c")).otherwise(0L)).cast("double") /
          sum(col("c"))).as("dup_bigram_frac"))
  }

  /** Corpus-frequency commonness signals — the CCNet-style language-model
    * proxy computable without a model: score each document by how common
    * its tokens are in the WHOLE corpus. Documents of made-up strings,
    * mojibake, or code dumps score low-commonness/high-rarity; natural
    * prose scores high. Returns per doc:
    *   - n_tokens
    *   - mean_token_freq: mean over the doc's token OCCURRENCES of the
    *     token's corpus-wide occurrence count
    *   - rare_frac: fraction of occurrences whose token appears fewer
    *     than `rareBelow` times corpus-wide (hapax-ish mass)
    *
    * Everything stays in exact integer domain until ONE final division,
    * so the DuckDB oracle matches bit-for-bit (the log-perplexity form
    * would hinge on cross-engine ln() rounding).
    *
    * Plan shape at 100 TB: explode -> one global token-count aggregate
    * (partial+final, map-side combined) -> join occurrences back to
    * counts keyed by token -> per-doc aggregate. The token join is
    * naturally skewed ("the" dominates); AQE's skew-join splitting
    * handles the sort-merge side, and the count table per token is one
    * row, so no bucket ever explodes quadratically.
    */
  def commonness(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text",
                 rareBelow: Long = 5L): DataFrame = {
    val occurrences = docs
      .select(col(idCol), TextFeatures.tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(col("toks")).as("tok"))
    val freqs = occurrences.groupBy(col("tok"))
      .agg(count(lit(1)).as("tf"))
    occurrences.join(freqs, "tok")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(col("tf")).cast("double") / count(lit(1)))
          .as("mean_token_freq"),
        (sum(when(col("tf") < rareBelow, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("rare_frac"))
  }
}
