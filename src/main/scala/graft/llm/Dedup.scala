package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, each designed
  * around its shuffle shape at 100 TB:
  *
  *   - exact: one hash-aggregate on the content fingerprint (min-id wins) —
  *     a single keyed shuffle, the cheapest possible dedup.
  *   - MinHash-LSH: shingle -> k minhashes -> b bands; candidate pairs come
  *     from an equi-join on (band, band-signature) — NEVER an all-pairs
  *     cross join. Expected cost is sum of bucket sizes squared, which LSH
  *     theory keeps near-linear for sensible (b, r).
  *   - SimHash: one 64-bit signature per doc; near-dup candidates share one
  *     of four 16-bit chunks (pigeonhole: hamming distance <= 3 implies an
  *     identical chunk), again an equi-join.
  *
  * Candidates are then verified with the exact n-gram Jaccard (MinHash) or
  * hamming distance (SimHash) — the two-phase candidate/verify pattern every
  * large-scale dedup paper uses. Everything is pure SQL expressions: no
  * UDFs, no driver-side state, fully whole-stage-codegen'd.
  */
object Dedup {

  /** Exact dedup: keep the smallest doc_id per normalized-content
    * fingerprint. A single partial+final hash aggregate — at 100 TB this is
    * one shuffle keyed by a 128-bit hash, no skew (hashes are uniform).
    */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.groupBy(TextFeatures.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("fp"), col("n_copies"))

  /** Distinct token n-gram shingles of the text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextFeatures.tokens(text)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ",
            (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
  }

  /** k seeded minhashes per doc: explode shingles once, then k `min`
    * aggregates over seeded xxhash64s. The aggregate is a hard optimizer
    * boundary, so shingling runs exactly once per document (a nested
    * `transform` formulation gets re-inlined into every lambda by
    * CollapseProject and evaluates the shingle set k*b times — pathological).
    * Partial aggregation runs map-side, so the shuffle carries one signature
    * row per doc per partition; at 100 TB that is the minimum possible.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 64): DataFrame = {
    val exploded = docs.select(col(idCol),
      explode(shingles(col(textCol))).as("shingle"))
    val mins = (0 until k).map(h =>
      min(xxhash64(lit(h), col("shingle"))).as(s"mh$h"))
    exploded.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        array((0 until k).map(h => col(s"mh$h")): _*).as("sig"))
  }

  /** (doc_id, band, band_sig) — one row per band of the signature array.
    * b bands of r rows, k = b * r; `sig` is a physical column here, so the
    * band hashes are cheap slices.
    */
  def lshBands(docs: DataFrame, idCol: String, textCol: String,
               bands: Int, rows: Int): DataFrame =
    minhashSignatures(docs, idCol, textCol, bands * rows)
      .select(
        col(idCol),
        posexplode(
          transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)))))
          .as(Seq("band", "band_sig")))

  /** Candidate pairs from LSH banding, verified with exact shingle Jaccard.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    *
    * Plan shape: two scans of `docs`; an equi-join on (band, band_sig)
    * produces candidates; `array_intersect`/`array_union` verify. The join
    * keys are hashes, so the shuffle is uniform; duplicate candidate pairs
    * from multiple matching bands are collapsed pre-verify by the distinct
    * on (id_a, id_b) — verification cost is per unique candidate pair.
    */
  def minHashNearDups(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text",
                      bands: Int = 16, rows: Int = 4,
                      threshold: Double = 0.8): DataFrame = {
    val b = lshBands(docs, idCol, textCol, bands, rows)
    val left = b.toDF("id_a", "band", "band_sig")
    val right = b.toDF("id_b", "band", "band_sig")
    val candidates = left.join(right, Seq("band", "band_sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val withSh = docs.select(col(idCol), shingles(col(textCol)).as("sh"))
    candidates
      .join(withSh.toDF("id_a", "sh_a"), "id_a")
      .join(withSh.toDF("id_b", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash of the token multiset: per bit, sum +1/-1 over token
    * hashes; the sign picks the bit. Expressed as one aggregate over 64
    * generated bit columns — partial aggregation happens map-side, so the
    * shuffle carries 64 longs per doc-partition, not per token.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFeatures.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { bit =>
      sum(when(shiftright(col("h"), bit).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$bit")
    }
    val summed = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { bit =>
      when(col(s"b$bit") > 0, shiftleft(lit(1L), bit)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    summed.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dups: candidates share one of four 16-bit chunks
    * (equi-join on (chunk index, chunk value) — pigeonhole guarantees no
    * misses up to hamming distance 3), verified by exact popcount.
    */
  def simHashNearDups(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text",
                      maxHamming: Int = 3): DataFrame = {
    val sig = simhash(docs, idCol, textCol)
    val chunked = sig.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "chunk_val")))
    val left = chunked.toDF("id_a", "sig_a", "chunk", "chunk_val")
    val right = chunked.toDF("id_b", "sig_b", "chunk", "chunk_val")
    left.join(right, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
