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

  final case class MGBuf(counters: Map[String, Long])

  final class MisraGries(k: Int)
      extends Aggregator[String, MGBuf, Map[String, Long]] {
    require(k > 1, s"k must exceed 1, got $k")

    def zero: MGBuf = MGBuf(Map.empty)

    def reduce(b: MGBuf, x: String): MGBuf = {
      val c = b.counters
      c.get(x) match {
        case Some(v) => MGBuf(c.updated(x, v + 1))
        case None if c.size < k - 1 => MGBuf(c.updated(x, 1L))
        case None => // decrement-all step: drop zeros, skip the new item
          MGBuf(c.view.mapValues(_ - 1).filter(_._2 > 0).toMap)
      }
    }

    def merge(a: MGBuf, b: MGBuf): MGBuf = {
      if (a.counters.isEmpty) return b
      if (b.counters.isEmpty) return a
      val combined = (a.counters.keySet ++ b.counters.keySet).iterator
        .map(key => key ->
          (a.counters.getOrElse(key, 0L) + b.counters.getOrElse(key, 0L)))
        .toMap
      if (combined.size <= k - 1) MGBuf(combined)
      else {
        // subtract the k-th largest count from everything; ≤ combined
        // error stays ≤ n/k (Agarwal et al. merge rule)
        val d = combined.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
        MGBuf(combined.view.mapValues(_ - d).filter(_._2 > 0).toMap)
      }
    }

    def finish(b: MGBuf): Map[String, Long] = b.counters

    def bufferEncoder: Encoder[MGBuf] = ExpressionEncoder[MGBuf]()
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
