package graft.olist

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: the physical-plan properties a 100 TB
  * deployment buys with saveBucketed, asserted on actual executed plans.
  * Broadcast is disabled in these tests so the shuffle behavior under a
  * too-big-to-broadcast (cluster-scale) join is what gets asserted.
  */
class BucketedTableSpec extends SparkSpec {

  private lazy val wh = new SessionCatalogWarehouse(spark)

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def setupBucketed(): Unit = {
    import spark.implicits._
    if (!wh.exists("b_orders")) {
      val orders = (1L to 4000L)
        .map(i => (i, i % 500, s"o$i")).toDF("o_id", "cust", "o_tag")
      val custs = (0L until 500L).map(i => (i, s"c$i")).toDF("cust", "c_tag")
      wh.saveBucketed("b_orders", orders, Seq("cust"), 8, Seq("cust"))
      wh.saveBucketed("b_custs", custs, Seq("cust"), 8, Seq("cust"))
    }
  }

  test("co-bucketed equi-join on the bucket key plans with no Exchange") {
    setupBucketed()
    withNoBroadcast {
      val joined = wh.load("b_orders").join(wh.load("b_custs"), "cust")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      // correctness too: every order finds its customer
      assert(joined.count() == 4000L)
    }
  }

  test("aggregation keyed by the bucket column skips its exchange") {
    setupBucketed()
    val agg = wh.load("b_orders").groupBy("cust")
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(agg.count() == 500L)
    assert(agg.filter(col("n") =!= 8).isEmpty) // 4000 orders over 500 custs
  }

  test("a non-bucketed copy of the same data DOES shuffle (the contrast " +
       "that proves the bucket metadata is what removes the exchange)") {
    setupBucketed()
    withNoBroadcast {
      wh.save("nb_orders", wh.load("b_orders"))
      wh.save("nb_custs", wh.load("b_custs"))
      val plan = wh.load("nb_orders").join(wh.load("nb_custs"), "cust")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), plan)
    }
  }

  test("bucketed tables survive the crash-safe replace protocol") {
    setupBucketed()
    import spark.implicits._
    val orders2 = (1L to 1000L)
      .map(i => (i, i % 500, s"n$i")).toDF("o_id", "cust", "o_tag")
    // replace() writes unbucketed (the generic path); re-bucketing after a
    // full replace is an explicit saveBucketed — assert the round trip
    wh.saveBucketed("b_orders2", orders2, Seq("cust"), 8)
    assert(wh.load("b_orders2").count() == 1000L)
    wh.saveBucketed("b_orders2", orders2.filter(col("o_id") <= 10L),
      Seq("cust"), 8)
    assert(wh.load("b_orders2").count() == 10L)
  }
}
