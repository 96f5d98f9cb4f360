package graft.olist

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic-layer contract: one metric definition answers every slicing
  * request the same way, undeclared dimensions are rejected at compile
  * time, filters apply before aggregation, and ratio metrics compute in a
  * single pass.
  */
class MetricsSpec extends SparkSpec {

  private def orders = {
    import spark.implicits._
    Seq(
      (1L, "O", "2024-01-05 00:00:00", 10.0),
      (2L, "O", "2024-01-20 00:00:00", 30.0),
      (3L, "F", "2024-01-21 00:00:00", 100.0),
      (4L, "O", "2024-02-02 00:00:00", 50.0)
    ).toDF("id", "status", "ts", "amount")
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  private val revenue = Metrics.Metric(
    name = "revenue", agg = "sum",
    measure = col("amount").cast("decimal(18,2)"),
    timeDim = "ts", dims = Set("status"),
    present = _.cast("double"))

  test("query groups by grain + declared dims and aggregates exactly") {
    val out = Metrics.query(orders, revenue, "month", Seq("status"))
      .orderBy("metric_time", "status").collect()
      .map(r => (r.getTimestamp(0).toString.take(7),
        r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("2024-01", "F", 100.0), ("2024-01", "O", 40.0),
      ("2024-02", "O", 50.0)))
  }

  test("an undeclared dimension is rejected at compile time") {
    val e = intercept[IllegalArgumentException] {
      Metrics.query(orders, revenue, "month", Seq("id"))
    }
    assert(e.getMessage.contains("does not declare dimension"))
  }

  test("metric filters apply before aggregation") {
    val filtered = revenue.copy(filter = Some(col("status") === "O"))
    val out = Metrics.query(orders, filtered, "year").collect()
    assert(out.length == 1 && out(0).getDouble(1) == 90.0)
  }

  test("ratio metric: one aggregation pass, no self-join") {
    val nOrders = Metrics.Metric("n_orders", "count", lit(1), "ts",
      dims = Set("status"))
    val df = Metrics.ratio(orders, "aov", revenue, nOrders, "month")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val out = df.orderBy("metric_time").collect()
      .map(r => (r.getTimestamp(0).toString.take(7), r.getDouble(1)))
    assert(out.toSeq == Seq(("2024-01", 140.0 / 3), ("2024-02", 50.0)))
  }

  test("mismatched ratio filters are rejected") {
    val filteredDen = Metrics.Metric("n_orders", "count", lit(1), "ts",
      filter = Some(col("status") === "O"))
    val e = intercept[IllegalArgumentException] {
      Metrics.ratio(orders, "aov", revenue, filteredDen, "month")
    }
    assert(e.getMessage.contains("share the filter"))
  }
}
