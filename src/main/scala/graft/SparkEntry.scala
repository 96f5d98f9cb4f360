package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator module into the driver's
  * (queries, oracleSql) maps. Each module exposes `ops: Seq[Op]`; an Op
  * couples the Spark implementation with its DuckDB oracle SQL so the two
  * can never drift apart in column naming.
  */
object SparkEntry {

  private def allOps: Seq[Op] =
    operators.Relational.ops ++
      operators.Headline.ops ++
      operators.QualityGates.ops ++
      operators.Analytics.ops ++
      operators.AsOf.ops ++
      operators.Ranges.ops ++
      operators.Collections.ops ++
      operators.Sketches.ops ++
      operators.Events.ops ++
      operators.Timeseries.ops ++
      operators.Profiling.ops ++
      operators.Linkage.ops ++
      operators.Graphs.ops ++
      operators.Layout.ops ++
      olist.OlistOps.ops ++
      sources.SourceOps.ops ++
      llm.LlmOps.ops ++
      llm.Retrieval.ops ++
      llm.Classify.ops ++
      llm.Moderation.ops ++
      llm.Topics.ops ++
      llm.Evals.ops

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The fct_orders shape (agg + left join + derived total) — the reference's
    * single gold model (reference: models/marts/fct_orders.sql).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("j2_fct_orders")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(op => op.name -> op.query).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allOps.flatMap(op => op.oracle.map(op.name -> _)).toMap
}
