package graft.olist

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A small semantic layer — dbt's metrics surface (the dbt 1.x `metrics:`
  * YAML block / MetricFlow's measure+dimension model): a metric couples a
  * MEASURE (an aggregation over one model) with the time dimension and the
  * dimensions it may legally be sliced by, and `query` compiles a
  * (metric, grain, dims) request into the groupBy plan. The point of the
  * layer is governance: consumers ask for "revenue by month by status"
  * and get the SAME aggregation every time, instead of five dashboards
  * hand-writing five slightly different sums.
  *
  * Money measures follow the engine-wide exactness convention (see
  * Relational.scala): aggregate in DECIMAL, present as double — so a
  * metric value is identical under any partitioning and matches the
  * DuckDB oracle bit-for-bit.
  *
  * `ratio` composes two measures over the same model in ONE pass (a
  * single groupBy computing both aggregations, then the division) — the
  * derived-metric form that needs no self-join and adds no shuffle.
  */
object Metrics {

  /** One declared metric over a model.
    *
    * `agg` ∈ sum | count | count_distinct | avg | min | max. `measure` is
    * the aggregated column (ignored for count). `dims` are the dimensions
    * a query may group by — requesting any other dimension is rejected at
    * compile time, dbt's contract.
    */
  final case class Metric(
      name: String,
      agg: String,
      measure: Column,
      timeDim: String,
      dims: Set[String] = Set.empty,
      filter: Option[Column] = None,
      present: Column => Column = identity)

  private def aggFor(m: Metric): Column = {
    val a = m.agg match {
      case "sum" => sum(m.measure)
      case "count" => count(lit(1))
      case "count_distinct" => count_distinct(m.measure)
      case "avg" => avg(m.measure)
      case "min" => min(m.measure)
      case "max" => max(m.measure)
      case other => throw new IllegalArgumentException(
        s"metric ${m.name}: unknown agg '$other'")
    }
    m.present(a).as(m.name)
  }

  private def grainCol(m: Metric, grain: String): Column = {
    require(Set("day", "week", "month", "quarter", "year")(grain),
      s"unsupported grain '$grain'")
    date_trunc(grain, col(m.timeDim)).as("metric_time")
  }

  private def checkDims(m: Metric, dims: Seq[String]): Unit = {
    val illegal = dims.filterNot(m.dims)
    require(illegal.isEmpty,
      s"metric ${m.name} does not declare dimension(s) " +
        s"${illegal.mkString(", ")} (declared: ${m.dims.toSeq.sorted.mkString(", ")})")
  }

  /** Compile one metric request: (metric, grain, dims) -> grouped plan.
    * Output columns: metric_time, <dims...>, <metric.name>.
    */
  def query(model: DataFrame, metric: Metric, grain: String,
            dims: Seq[String] = Nil): DataFrame = {
    checkDims(metric, dims)
    metric.filter.fold(model)(model.filter)
      .groupBy(grainCol(metric, grain) +: dims.map(col): _*)
      .agg(aggFor(metric))
  }

  /** Derived ratio metric over the SAME model: numerator / denominator in
    * one aggregation pass. Both metrics' filters must agree (a ratio of
    * differently-filtered measures needs two passes and a join — out of
    * scope by design, as in dbt's `ratio` calculation method).
    */
  def ratio(model: DataFrame, name: String,
            num: Metric, den: Metric, grain: String,
            dims: Seq[String] = Nil): DataFrame = {
    require(num.timeDim == den.timeDim,
      "ratio metrics must share the time dimension")
    require(num.filter.map(_.toString) == den.filter.map(_.toString),
      "ratio metrics must share the filter")
    checkDims(num, dims); checkDims(den, dims)
    num.filter.fold(model)(model.filter)
      .groupBy(grainCol(num, grain) +: dims.map(col): _*)
      .agg(aggFor(num), aggFor(den))
      .withColumn(name, col(num.name) / col(den.name))
      .drop(num.name, den.name)
  }
}
