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

  test("top-k merge: k-largest of per-batch k-largests equals the " +
       "one-shot top-k even when the cut interleaves batches") {
    import spark.implicits._
    // values chosen so each batch's own top-3 contributes a different
    // number of survivors to the global top-3
    val batchA = Seq(("g", 100L, 1L), ("g", 90L, 2L), ("g", 10L, 3L),
      ("g", 9L, 4L))
    val batchB = Seq(("g", 95L, 5L), ("g", 8L, 6L), ("g", 7L, 7L))
    val all = batchA ++ batchB
    def topk(rows: Seq[(String, Long, Long)], k: Int) =
      rows.sortBy { case (_, v, id) => (-v, id) }.take(k)
    val k = 3
    val merged = topk(topk(batchA, k) ++ topk(batchB, k), k)
    assert(merged == topk(all, k),
      "monoid property must hold for the interleaved cut")
    // and via the DataFrame shape the op uses
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g")
      .orderBy($"v".desc, $"id")
    def dfTopk(rows: Seq[(String, Long, Long)]) =
      rows.toDF("g", "v", "id").withColumn("rk", row_number().over(w))
        .filter($"rk" <= k).drop("rk")
    val got = dfTopk(batchA).unionByName(dfTopk(batchB))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= k)
      .select($"g", $"v", $"id").as[(String, Long, Long)].collect().toSeq
    assert(got.sortBy(t => (-t._2, t._3)) == topk(all, k))
  }

  test("delta join: the four terms partition the full join exactly — " +
       "disjoint, and their union equals the one-shot join") {
    import spark.implicits._
    val a = (1L to 40L).map(k => (k, s"a$k")).toDF("k", "av")
    val b = (1L to 120L).map(i => (i % 50 + 1, i)).toDF("k", "bv")
    val (aOld, aNew) = (a.filter($"k" % 4 =!= 0), a.filter($"k" % 4 === 0))
    val (bOld, bNew) = (b.filter($"bv" % 3 =!= 0), b.filter($"bv" % 3 === 0))
    def j(x: DataFrame, y: DataFrame) =
      x.join(y, "k").select($"k", $"av", $"bv")
        .as[(Long, String, Long)].collect().toSeq
    val terms = Seq(j(aOld, bOld), j(aNew, bOld), j(aOld, bNew),
      j(aNew, bNew))
    val full = j(a, b)
    assert(terms.flatten.sorted == full.sorted)
    // pairwise disjoint: total size already matches, so any overlap
    // would force a missing pair — check directly anyway
    val sets = terms.map(_.toSet)
    for (i <- sets.indices; l <- sets.indices if i < l)
      assert(sets(i).intersect(sets(l)).isEmpty, s"terms $i and $l overlap")
  }

}
