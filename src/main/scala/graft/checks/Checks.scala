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

  /** The dbt count harness as a one-row DataFrame — the distributed form
    * (reference: tests/helpers.sql:5-14's `select count(*) as failures,
    * count(*) != 0 as should_error`). `evaluate` below is the driver-side
    * ADT form of the same protocol; QualityGates and Pipeline both route
    * through these.
    */
  def harness(failureRows: DataFrame): DataFrame =
    failureRows.agg(count(lit(1)).as("failures"))
      .select(col("failures"), (col("failures") =!= 0).as("should_error"))

  /** dbt's test harness: failures count + severity evaluation.
    * `warnOnly` mirrors severity: warn config.
    */
  def evaluate(failureRows: DataFrame, warnOnly: Boolean = false): TestResult = {
    val n = failureRows.count()
    if (n == 0) Pass()
    else if (warnOnly) Warn(n)
    else Error(n)
  }
}
