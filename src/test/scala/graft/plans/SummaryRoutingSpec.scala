package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

/** Materialized-aggregate routing: a registered summary must capture
  * matching groupBy/sum/count queries (proven with summary data that
  * deliberately diverges from the base — the only way the diverged
  * numbers can appear is via the rewrite), must RE-AGGREGATE partial
  * states rather than project them, and must leave everything else —
  * non-matching measures, drifted summary schemas, unregistered scans —
  * untouched.
  */
class SummaryRoutingSpec extends SparkSpec with BeforeAndAfterEach {

  private var baseDir: String = _
  private var summaryDir: String = _

  override def beforeEach(): Unit = {
    super.beforeEach()
    SummaryCatalog.clear()
    import spark.implicits._
    baseDir = Files.createTempDirectory("sr_base").toString
    summaryDir = Files.createTempDirectory("sr_sum").toString
    Seq(("a", 1L), ("a", 2L), ("b", 10L))
      .toDF("k", "v").write.mode("overwrite").parquet(baseDir)
    // partial states: TWO rows per key, and totals that deliberately
    // disagree with the base table (a: 100/5 vs base 3/2) so any routed
    // result is unmistakably from the summary
    Seq(("a", 60L, 2L), ("a", 40L, 3L), ("b", 7L, 1L))
      .toDF("k", "sum_v", "cnt").write.mode("overwrite").parquet(summaryDir)
  }

  override def afterEach(): Unit = {
    SummaryCatalog.clear()
    super.afterEach()
  }

  private def register(sumLoc: String = null): Unit =
    SummaryCatalog.register(SummaryCatalog.Summary(
      baseLocation = s"file:$baseDir",
      groupCols = Seq("k"),
      sums = Map("total" -> ("v", "sum_v")),
      counts = Map("n" -> "cnt"),
      summaryLocation = if (sumLoc == null) summaryDir else sumLoc))

  private def query() =
    spark.read.parquet(baseDir).groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("matching query routes to the summary and re-aggregates partials") {
    register()
    val got = asMap(query())
    assert(got == Map("a" -> (100L, 5L), "b" -> (7L, 1L)),
      "partial rows must be re-summed, and the diverged totals prove routing")
    // the optimized plan must aggregate the summary's state columns, not
    // the base column (Relation.toString omits paths, so assert columns)
    val optimized = query().queryExecution.optimizedPlan.toString
    assert(optimized.contains("sum(sum_v") && optimized.contains("sum(cnt"))
  }

  test("unregistered scans and non-matching measures are untouched") {
    // nothing registered: base numbers
    assert(asMap(query()) == Map("a" -> (3L, 2L), "b" -> (10L, 1L)))
    register()
    // avg is not a registered rewrite shape: still base numbers
    val avgGot = spark.read.parquet(baseDir).groupBy("k")
      .agg(avg(col("v")).as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(avgGot == Map("a" -> 1.5d, "b" -> 10.0d))
    // a sum aliased to a name the registration does not know: base numbers
    val other = spark.read.parquet(baseDir).groupBy("k")
      .agg(sum("v").as("other"), count(lit(1)).as("n"))
    assert(other.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 3L, "b" -> 10L))
    // grouping set mismatch: base numbers
    val nogroup = spark.read.parquet(baseDir)
      .agg(sum("v").as("total")).collect().head.getLong(0)
    assert(nogroup == 13L)
  }

  test("summary schema drift falls back to the base plan") {
    import spark.implicits._
    val drifted = Files.createTempDirectory("sr_drift").toString
    // registered columns sum_v/cnt are absent from the stored summary
    Seq(("a", 999L)).toDF("k", "wrong_col")
      .write.mode("overwrite").parquet(drifted)
    register(sumLoc = drifted)
    assert(asMap(query()) == Map("a" -> (3L, 2L), "b" -> (10L, 1L)))
  }

  test("distinct aggregates never match") {
    register()
    val d = spark.read.parquet(baseDir).groupBy("k")
      .agg(sum_distinct(col("v")).as("total"), count(lit(1)).as("n"))
    // sum_distinct over base == plain sum here (values unique), so the
    // decisive signal is the count column staying at base's 2, not 5
    assert(asMap(d) == Map("a" -> (3L, 2L), "b" -> (10L, 1L)))
  }
}
