package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (the FastCDC/gear-hash family, Xia et al.
  * 2016) — STORAGE-level deduplication, the missing fourth family next to
  * the engine's token-shingle (MinHash/Jaccard), bit-sampling (SimHash)
  * and suffix-window (substring) dedup: chunk boundaries are picked where
  * a rolling hash of the content hits a mask, so an insertion early in a
  * document only perturbs the chunks around the edit — every later
  * boundary re-synchronizes (the property fixed-size blocking
  * fundamentally lacks, where one inserted byte shifts every subsequent
  * block). Backing-store dedup, delta sync (rsync/restic/borg lineage),
  * and snapshot diffing all sit on this primitive.
  *
  * Gear hash: h = (h << 1) + G[byte], boundary when (h & mask) == 0 after
  * `minLen` bytes, forced at `maxLen`. G is a splitmix64 table of the
  * byte value — deterministic, no RNG state, same table on every executor.
  *
  * Scale shape: chunking is a per-document map (one pass over the bytes,
  * no shuffle); the dedup statistics are one groupBy over (chunk hash) —
  * the bounded-keyed-aggregate contract every dedup in the engine shares.
  */
object ContentChunks {

  private val gearTable: Array[Long] = Array.tabulate(256) { b =>
    var z = b.toLong * 0x9E3779B97F4A7C15L + 0xC2B2AE3D27D4EB4FL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The gear table reduced mod 2^avgBits — all the oracle needs: the
    * boundary test reads only (h & mask), and the low `avgBits` bits of
    * the gear recurrence close over themselves under modular arithmetic
    * (low(h<<1 + g) = (2·(h mod 2^(avgBits-1)) + low(g)) mod 2^avgBits),
    * so Java's 64-bit overflow wrap never reaches the replay.
    */
  def gearMod(avgBits: Int): Seq[Long] =
    gearTable.toSeq.map(g => g & ((1L << avgBits) - 1))

  /** Chunk `bytes` into content-defined spans: Seq of (offset, length).
    * `avgBits` sets the expected chunk size (2^avgBits bytes) via the
    * boundary mask; boundaries never fire before `minLen` and are forced
    * at `maxLen`, bounding both tails.
    */
  def chunkSpans(bytes: Array[Byte], minLen: Int = 16, avgBits: Int = 6,
                 maxLen: Int = 256): Seq[(Int, Int)] = {
    require(minLen >= 1 && maxLen >= minLen, "invalid chunk bounds")
    val mask = (1L << avgBits) - 1
    val out = Seq.newBuilder[(Int, Int)]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + gearTable(bytes(i) & 0xFF)
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        out += ((start, len))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length) out += ((start, bytes.length - start))
    out.result()
  }

  /** Per-document chunk rows: (idCol, chunk_idx, off, len, chunk_md5) —
    * the chunk index a backing store would dedup on. Map-only.
    */
  def chunks(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text", minLen: Int = 16, avgBits: Int = 6,
             maxLen: Int = 256): DataFrame = {
    val chunker = udf { text: String =>
      val bytes = text.getBytes("UTF-8")
      chunkSpans(bytes, minLen, avgBits, maxLen).zipWithIndex.map {
        case ((off, len), idx) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          md.update(bytes, off, len)
          (idx, off, len,
            md.digest().map(b => f"$b%02x").mkString)
      }
    }
    docs.select(col(idCol), explode(chunker(col(textCol))).as("c"))
      .select(col(idCol), col("c._1").as("chunk_idx"), col("c._2").as("off"),
        col("c._3").as("len"), col("c._4").as("chunk_md5"))
  }

  /** Corpus-level dedup statistics a backing store would realize: one row
    * — total vs distinct chunk counts and bytes (distinct bytes = each
    * unique chunk stored once), plus the byte-level dedup ratio.
    */
  def dedupStats(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val ch = chunks(docs, idCol, textCol)
    val perChunk = ch.groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n"), max(col("len")).as("len"))
    perChunk.agg(
      sum(col("n")).as("total_chunks"),
      count(lit(1)).as("distinct_chunks"),
      sum(col("n") * col("len")).as("total_bytes"),
      sum(col("len")).as("distinct_bytes"))
      .select(col("total_chunks"), col("distinct_chunks"),
        col("total_bytes"), col("distinct_bytes"),
        (col("distinct_bytes").cast("double") /
          col("total_bytes").cast("double")).as("stored_fraction"))
  }
}
