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

  test("percentile_approx (acc=1000) lands within 2% rank of exact") {
    val approx = graft.SparkEntry.queries("f_approx_quantile")(
        spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
    approx.foreach { case (flag, (p50, p95)) =>
      val vals = li.filter(col("l_returnflag") === flag)
        .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
      def rankOf(v: Double) = vals.count(_ <= v).toDouble / vals.length
      assert(math.abs(rankOf(p50) - 0.5) < 0.02, s"$flag p50=$p50")
      assert(math.abs(rankOf(p95) - 0.95) < 0.02, s"$flag p95=$p95")
    }
  }

  test("interpolated percentiles match a sequential order-statistics " +
       "replay exactly, in hundredth-cents") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val cents = graft.Tables.orders(spark, sf)
      .select($"o_orderpriority",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"),
        $"o_orderkey")
      .as[(String, Long, Long)].collect()
    val want = cents.groupBy(_._1).flatMap { case (g, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val n = sorted.length.toLong
      Seq(50L, 90L, 99L).map { p =>
        val k = ((n - 1) * p) / 100
        val r = ((n - 1) * p) % 100
        val lo = sorted(k.toInt)
        val hi = sorted(math.min(k + 1, n - 1).toInt)
        (g, p) -> (lo * (100 - r) + hi * r)
      }
    }.toMap
    val got = graft.SparkEntry.queries("f_percentile_cont")(spark, sf)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == want, s"diff: ${(got.toSet -- want.toSet).take(3)}")
  }
}
