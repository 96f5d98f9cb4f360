package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: merging per-batch partial states
  * must equal the one-shot aggregate regardless of how the input was
  * batched or in which order batches arrive.
  */
class IvmSpec extends SparkSpec {

  private def partial(df: DataFrame): DataFrame =
    df.groupBy(col("k")).agg(sum(col("v")).as("s"), count(lit(1)).as("c"))

  test("merge over any batching and arrival order equals the full re-agg") {
    import spark.implicits._
    val rows = (1L to 3000L).map(i => (s"k${i % 7}", i))
    val full = partial(rows.toDF("k", "v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batches = rows.grouped(1000).map(_.toDF("k", "v")).toSeq
    def mergeAll(bs: Seq[DataFrame]): Set[(String, Long, Long)] =
      bs.map(partial).reduce((a, b) =>
          Relational.mergeAggregate(a, b, Seq("k")))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
    assert(mergeAll(batches) == full)
    assert(mergeAll(batches.reverse) == full, "arrival order must not matter")
    // a key absent from earlier batches still appears (union, not join)
    val disjoint = Seq(Seq(("a", 1L)).toDF("k", "v"),
      Seq(("b", 2L)).toDF("k", "v"))
    assert(mergeAll(disjoint) == Set(("a", 1L, 1L), ("b", 2L, 1L)))
  }
}
