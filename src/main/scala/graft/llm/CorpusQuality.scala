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
}
