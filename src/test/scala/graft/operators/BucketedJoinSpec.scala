package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located join via bucketing: both sides written bucketed by the join
  * key plan a sort-merge join with NO shuffle exchange — the pre-partitioned
  * layout a 100 TB warehouse uses for its hot join keys. (Demonstrated at
  * test scale; the same saveAsTable(bucketBy) call is the production path.)
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val d = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.Tables.orders(spark, d)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
      graft.Tables.lineitem(spark, d)
        .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("items_bucketed")

      val joined = spark.table("orders_bucketed")
        .join(spark.table("items_bucketed"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() ==
        graft.Tables.lineitem(spark, d).select("l_orderkey").distinct().count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS items_bucketed")
    }
  }
}
