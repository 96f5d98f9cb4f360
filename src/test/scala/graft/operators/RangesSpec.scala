package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangesSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    val points = Seq((1L, 5.0), (2L, 999.0), (3L, 1000.0), (4L, 2500.0),
      (5L, -3.0)).toDF("pid", "x")
    val intervals = Seq(
      (10L, 0.0, 999.0),      // [0, 999]
      (11L, 500.0, 1500.0),   // overlaps the first
      (12L, 2500.0, 2500.0),  // degenerate single point
      (13L, -10.0, -1.0))     // negative range
      .toDF("iid", "lo", "hi")
    (points, intervals)
  }

  test("binned range join matches exactly the true containments, " +
       "multi-match and negatives included") {
    val (points, intervals) = fixture
    val got = Ranges.rangeJoin(points, "x", intervals, "lo", "hi", 100)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = points.crossJoin(intervals)
      .filter(col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.contains((2L, 10L)) && got.contains((2L, 11L))) // multi-match
    assert(got.contains((4L, 12L))) // degenerate interval
    assert(got.contains((5L, 13L))) // negative bins (floor semantics)
  }

  test("each true match is emitted exactly once (no bin-replication dups)") {
    val (points, intervals) = fixture
    val rows = Ranges.rangeJoin(points, "x", intervals, "lo", "hi", 100)
      .groupBy("pid", "iid").count().filter(col("count") > 1).count()
    assert(rows == 0)
  }

  test("interval overlap join: exact pair set, each pair exactly once") {
    import spark.implicits._
    val a = Seq((1L, 0.0, 250.0), (2L, 300.0, 400.0), (3L, 90.0, 110.0))
      .toDF("aid", "lo", "hi")
    val b = Seq((10L, 100.0, 350.0), (11L, 500.0, 600.0),
      (12L, 240.0, 260.0)).toDF("bid", "blo", "bhi")
    val got = Ranges.intervalOverlapJoin(a, b, "lo", "hi", "blo", "bhi", 100)
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = a.crossJoin(b)
      .filter(col("lo") <= col("bhi") && col("blo") <= col("hi"))
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // exact multiset equality: every true overlap exactly once, even for
    // pairs sharing multiple bins (1 x 10 share bins 1 and 2)
    assert(got.sorted.toSeq == expected.sorted.toSeq)
    assert(got.toSet.contains((1L, 10L)) && got.toSet.contains((1L, 12L)))
  }

  test("plan is a shuffle equi-join on the bin, not a nested loop") {
    val (points, intervals) = fixture
    val plan = Ranges.rangeJoin(points, "x", intervals, "lo", "hi", 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("interval merge: overlap and touch coalesce, strict gaps split, " +
       "islands carry exact bounds and counts; partitioning-invariant") {
    import spark.implicits._
    val iv = Seq(
      // group g1: [0,10] overlaps [5,12]; [12,15] touches (lo == prev
      // hi -> same island); [17,20] strictly after -> new island
      ("g1", 0L, 10L, 1L), ("g1", 5L, 12L, 2L), ("g1", 12L, 15L, 3L),
      ("g1", 17L, 20L, 4L),
      // group g2: containment [0,100] swallows [10,20]; far singleton
      ("g2", 0L, 100L, 5L), ("g2", 10L, 20L, 6L), ("g2", 200L, 201L, 7L))
      .toDF("g", "lo", "hi", "id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Ranges.mergeIntervals(df, Seq("g"), "lo", "hi", Seq("id"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    val got = run(iv)
    assert(got == Set(
      ("g1", 0L, 15L, 3L), ("g1", 17L, 20L, 1L),
      ("g2", 0L, 100L, 2L), ("g2", 200L, 201L, 1L)), got)
    assert(run(iv.repartition(5)) == got)
  }

  test("top paths and benford driver entries: bounded output, exact " +
       "share/count invariants") {
    val sf = "/root/testdata/sf0.001"
    val paths = graft.SparkEntry.queries("e_top_paths")(spark, sf).collect()
    assert(paths.length <= 20 && paths.nonEmpty)
    // counts are non-increasing in rank order (the orderBy before limit)
    val ns = paths.map(_.getLong(3))
    assert(ns.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    val ben = graft.SparkEntry.queries("f_benford")(spark, sf).collect()
    assert(ben.map(_.getString(0)).toSet.subsetOf(
      (1 to 9).map(_.toString).toSet))
    assert(math.abs(ben.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    assert(ben.map(_.getLong(1)).sum ==
      graft.Tables.orders(spark, sf).count())
  }
}
