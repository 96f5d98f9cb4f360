package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: the mergeable frequent-items summary
  * (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS'12). The buffer holds at most k-1 counters; any item
  * with true frequency > n/k is GUARANTEED to survive, and every
  * surviving estimate undercounts its true frequency by at most n/k.
  *
  * Scale shape: a typed Aggregator, so partial buffers build map-side
  * and the shuffle carries one (k-1)-entry map per group per partition —
  * the only way to take "top vocabulary items" off a 100 TB token stream
  * without shuffling every token occurrence (the exact groupBy-count
  * alternative shuffles the full multiset). Merge subtracts the k-th
  * largest combined count when the union overflows, which preserves both
  * guarantees under any merge tree — estimates therefore vary slightly
  * across partitionings, but the heavy-hitter SET above n/k does not.
  */
object Sketches {

  /** Mutable sketch buffer: key -> single-cell count array, mutated in
    * place. A typed Aggregator is a TypedImperativeAggregate underneath —
    * the buffer lives as a JVM object for a whole partition and only
    * meets its encoder at spill/shuffle boundaries — so the hot loop
    * (reduce, once per token of a 100 TB stream) must not allocate. The
    * previous immutable formulation rebuilt a k-entry Map per token; this
    * one increments a long cell in place (no boxing: the count lives in a
    * one-element Array[Long]) and the decrement step removes entries via
    * the entry iterator. Kryo serializes the map at boundaries (~k
    * entries, negligible next to the shuffle it rides).
    */
  type MGBuf = java.util.HashMap[String, Array[Long]]

  final class MisraGries(k: Int)
      extends Aggregator[String, MGBuf, Map[String, Long]] {
    require(k > 1, s"k must exceed 1, got $k")

    def zero: MGBuf = new MGBuf(2 * k)

    def reduce(c: MGBuf, x: String): MGBuf = {
      val cell = c.get(x)
      if (cell != null) cell(0) += 1
      else if (c.size < k - 1) c.put(x, Array(1L))
      else {
        // decrement-all step: drop zeros in place, skip the new item
        val it = c.values().iterator()
        while (it.hasNext) {
          val v = it.next(); v(0) -= 1
          if (v(0) == 0L) it.remove()
        }
      }
      c
    }

    def merge(a: MGBuf, b: MGBuf): MGBuf = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val bit = b.entrySet().iterator()
      while (bit.hasNext) {
        val e = bit.next()
        val cell = a.get(e.getKey)
        if (cell != null) cell(0) += e.getValue()(0)
        else a.put(e.getKey, e.getValue) // b is dead after merge: safe alias
      }
      if (a.size > k - 1) {
        // subtract the k-th largest count from everything; combined
        // error stays ≤ n/k (Agarwal et al. merge rule)
        val vals = new Array[Long](a.size)
        var i = 0
        val vit = a.values().iterator()
        while (vit.hasNext) { vals(i) = vit.next()(0); i += 1 }
        java.util.Arrays.sort(vals)
        val d = vals(vals.length - k)
        val it = a.values().iterator()
        while (it.hasNext) {
          val cell = it.next()
          cell(0) -= d
          if (cell(0) <= 0L) it.remove()
        }
      }
      a
    }

    def finish(b: MGBuf): Map[String, Long] = {
      val out = Map.newBuilder[String, Long]
      b.forEach((key, cell) => out += key -> cell(0))
      out.result()
    }

    def bufferEncoder: Encoder[MGBuf] = Encoders.kryo[MGBuf]
    def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  val ops: Seq[Op] = Seq(
    // Per-source frequent tokens via the sketch, reduced to the top-5 by
    // estimate. Estimates are partition-order dependent by construction
    // (the survivor SET above n/k is not) -> rows-only; the frequency
    // guarantees are asserted in SketchesSpec.
    Op.noOracle("f_heavy_hitters") { (s, d) =>
      val mg = udaf(new MisraGries(k = 20), Encoders.STRING)
      Tables.documents(s, d)
        .select(col("source"),
          explode(graft.llm.TextFeatures.tokens(col("text"))).as("tok"))
        .groupBy(col("source"))
        .agg(mg(col("tok")).as("hitters"))
        .select(col("source"), explode(col("hitters")).as(Seq("tok", "est")))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
            .orderBy(col("est").desc, col("tok"))))
        .filter(col("rank") <= 5)
        .select(col("source"), col("tok"), col("rank"))
    }
  )
}
