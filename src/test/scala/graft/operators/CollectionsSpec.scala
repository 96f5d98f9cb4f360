package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CollectionsSpec extends SparkSpec {

  test("approx_count_distinct (rsd=2%) is within 6% of exact per group") {
    val approx = graft.SparkEntry.queries("f_approx_distinct")(
        spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k).toDouble
      assert(math.abs(a - e) / e < 0.06, s"flag=$k approx=$a exact=$e")
    }
  }
}
