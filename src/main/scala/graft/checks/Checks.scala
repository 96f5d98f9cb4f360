package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks reproducing dbt's generic + singular test semantics.
  *
  * Reference semantics:
  *   - unique:        dbt/include/global_project/macros/generic_test_sql/unique.sql:1-12
  *                    (non-null keys grouped, HAVING count(*) > 1)
  *   - not_null:      .../generic_test_sql/not_null.sql:1-9
  *   - relationships: .../generic_test_sql/relationships.sql:1-22
  *                    (left-join-null idiom; NULL FKs pass)
  *   - singular:      tests/assert_revenue_is_positive.sql (violating-rows query)
  *   - harness:       .../materializations/tests/helpers.sql:5-14
  *                    (failures = count(*); should_error = failures != 0)
  *   - severity:      dbt/task/test.py:94,142 — Pass / Warn / Error ADT.
  *
  * Each check returns the *failure rows* DataFrame (0 rows = pass), mirroring
  * dbt's protocol; `evaluate` wraps it with the count harness. All checks are
  * single-pass distributed plans — no collect, no driver loops — so they run
  * unchanged on a 100 TB table.
  */
object Checks {

  sealed trait TestResult { def failures: Long }
  final case class Pass() extends TestResult { val failures = 0L }
  final case class Warn(failures: Long) extends TestResult
  final case class Error(failures: Long) extends TestResult

  /** Rows whose non-null `key` occurs more than once. */
  def unique(df: DataFrame, key: String): DataFrame =
    df.filter(col(key).isNotNull)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Rows where `key` is null. */
  def notNull(df: DataFrame, key: String): DataFrame =
    df.filter(col(key).isNull).select(col(key))

  /** Child rows whose non-null FK has no match in parent (NULL FKs pass,
    * per the reference macro's `where from_field is not null` guard).
    * Spark-first: a first-class left_anti join instead of the macro's
    * left-join + IS NULL — same semantics, no null-padded intermediate.
    */
  def relationships(child: DataFrame, fk: String,
                    parent: DataFrame, pk: String): DataFrame = {
    val parentKeys = parent.select(col(pk)).distinct()
    child.filter(col(fk).isNotNull)
      .join(parentKeys, child(fk) === parentKeys(pk), "left_anti")
      .select(child(fk))
  }

  /** Singular test: any predicate over the relation; violating rows fail. */
  def singular(df: DataFrame, violation: Column): DataFrame =
    df.filter(violation)

  /** dbt's accepted_values generic test (reference:
    * dbt/include/global_project/macros/generic_test_sql/accepted_values.sql):
    * group by the column, fail each group whose value is outside the
    * accepted list. NULL values pass (the macro's `not in` is 3VL: NULL
    * not-in-list is NULL, filtered out) — reproduced exactly by Spark's
    * `!isin`. One partial+final aggregate over at most |distinct values|
    * groups, so the check is as cheap as a distinct count at any scale.
    */
  def acceptedValues(df: DataFrame, key: String,
                     accepted: Seq[String]): DataFrame =
    df.groupBy(col(key).as("value_field"))
      .agg(count(lit(1)).as("n_records"))
      .filter(!col("value_field").isin(accepted: _*))

  // --- dbt-utils generic tests (the de-facto standard extension pack) ----

  /** dbt_utils.expression_is_true: rows where `expression` is NOT true
    * (false or NULL fail — the macro selects `where not(expr)`, and dbt
    * treats a NULL expression row as a failure via coalesce in common
    * usage; here the stricter "must be true" contract).
    */
  def expressionIsTrue(df: DataFrame, expression: Column): DataFrame =
    df.filter(!coalesce(expression, lit(false)))

  /** dbt_utils.recency: fails (one row) when the newest `tsCol` value is
    * older than `maxAgeSeconds` relative to `now` — the data-freshness
    * test form (vs Catalog.sourceFreshness, the operational command).
    * One column-pruned max aggregate.
    */
  def recency(df: DataFrame, tsCol: String, maxAgeSeconds: Long,
              now: java.sql.Timestamp): DataFrame =
    df.agg(max(col(tsCol)).as("most_recent"))
      .filter(col("most_recent").isNull ||
        col("most_recent") < lit(new java.sql.Timestamp(
          now.getTime - maxAgeSeconds * 1000L)))

  /** dbt_utils.equal_rowcount: fails (one row with both counts) when the
    * two relations disagree on row count. Two count aggregates, no join
    * of the data itself.
    */
  def equalRowcount(a: DataFrame, b: DataFrame): DataFrame = {
    val ca = a.agg(count(lit(1)).as("count_a"))
    val cb = b.agg(count(lit(1)).as("count_b"))
    ca.crossJoin(broadcast(cb)).filter(col("count_a") =!= col("count_b"))
  }

  /** dbt_utils.mutually_exclusive_ranges: within each `partitionBy` group,
    * ranges [lower, upper) ordered by lower bound must not overlap — the
    * SCD2-validity / booking-calendar invariant. One keyed window (lag of
    * the running max upper bound), no self-join: at 100 TB this is a
    * single shuffle on the partition key, not a range join.
    */
  def mutuallyExclusiveRanges(df: DataFrame, lower: String, upper: String,
                              partitionBy: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionBy.map(col): _*)
      .orderBy(col(lower), col(upper))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prev_max_upper", max(col(upper)).over(w))
      .filter(col("__prev_max_upper").isNotNull &&
        col(lower) < col("__prev_max_upper"))
      .drop("__prev_max_upper")
  }

  /** dbt_utils.accepted_range: rows whose column falls outside
    * [min, max] (either bound optional, inclusive like dbt_utils'
    * default). A pure map-side filter — the predicate pushes into the
    * scan.
    */
  def acceptedRange(df: DataFrame, valueCol: String,
                    minValue: Option[Double] = None,
                    maxValue: Option[Double] = None): DataFrame = {
    require(minValue.nonEmpty || maxValue.nonEmpty,
      "accepted_range needs at least one bound")
    val violations = Seq(
      minValue.map(m => col(valueCol) < m),
      maxValue.map(m => col(valueCol) > m)).flatten.reduce(_ || _)
    df.filter(col(valueCol).isNotNull && violations)
  }

  /** dbt_utils.sequential_values: within each group, the column ordered
    * by itself must step by EXACTLY `interval` — the gap/duplicate
    * detector for sequence ids, invoice numbers, daily partitions.
    * Returns the violating rows (value + its predecessor). One keyed
    * window (lag), no self-join — a single shuffle at any scale.
    */
  def sequentialValues(df: DataFrame, valueCol: String,
                       interval: Long = 1L,
                       partitionBy: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = (if (partitionBy.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(partitionBy.map(col): _*))
      .orderBy(col(valueCol))
    df.withColumn("__prev", lag(col(valueCol), 1).over(w))
      .filter(col("__prev").isNotNull &&
        col(valueCol) =!= col("__prev") + interval)
      .withColumnRenamed("__prev", "prev_value")
  }

  /** The dbt count harness as a one-row DataFrame — the distributed form
    * (reference: tests/helpers.sql:5-14's `select count(*) as failures,
    * count(*) != 0 as should_error`). `evaluate` below is the driver-side
    * ADT form of the same protocol; QualityGates and Pipeline both route
    * through these.
    */
  def harness(failureRows: DataFrame): DataFrame =
    failureRows.agg(count(lit(1)).as("failures"))
      .select(col("failures"), (col("failures") =!= 0).as("should_error"))

  /** dbt test-node config (reference:
    * dbt/include/global_project/macros/materializations/tests/test.sql:4-37):
    *   - `limit`: the test query is wrapped with `limit N` BEFORE counting,
    *     so `failures` is capped at N (get_limit_subquery_sql) — bounds the
    *     cost of a pathologically failing test on a huge table.
    *   - `storeFailures`: persist the (limited) failure rows for post-hoc
    *     debugging, dbt's store_failures audit table. Passed as a sink
    *     callback so the checks module stays warehouse-agnostic.
    */
  /** `warnIf`/`errorIf` mirror dbt's threshold expressions (defaults
    * `!= 0`): error wins when both trip; a failure count tripping neither
    * still passes (e.g. error_if = "> 100" tolerates up to 100 bad rows).
    */
  final case class TestConfig(
      warnOnly: Boolean = false,
      limit: Option[Int] = None,
      storeFailures: Option[DataFrame => Unit] = None,
      warnIf: Long => Boolean = _ != 0,
      errorIf: Long => Boolean = _ != 0)

  /** dbt's test harness: failures count + severity evaluation.
    * `warnOnly` mirrors severity: warn config.
    */
  def evaluate(failureRows: DataFrame, warnOnly: Boolean = false): TestResult =
    evaluate(failureRows, TestConfig(warnOnly = warnOnly))

  /** Full-config harness: limit wrapper first (dbt applies it inside the
    * count subquery), then the optional failure-row sink, then severity.
    */
  def evaluate(failureRows: DataFrame, config: TestConfig): TestResult = {
    val limited = config.limit.fold(failureRows)(failureRows.limit)
    config.storeFailures.foreach(sink => sink(limited))
    val n = limited.count()
    if (!config.warnOnly && config.errorIf(n)) Error(n)
    else if (config.warnIf(n)) Warn(n)
    else Pass()
  }
}
