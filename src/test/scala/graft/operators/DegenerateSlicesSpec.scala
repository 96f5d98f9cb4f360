package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the NULL-on-degenerate contracts the r11 fuzz campaign
  * introduced: statistics whose denominators collapse on adversarial
  * slices (zero variance, empty arms, singleton groups, empty strings)
  * must yield NULL — matching the DuckDB oracle's NULLIF — and NEVER
  * abort the job with an ANSI divide-by-zero, because at 100 TB one
  * degenerate group would otherwise kill a whole pipeline run.
  * (End-to-end coverage lives in tools/fuzz_sweep.py; these are the
  * fast suite-level pins of the same contracts.)
  */
class DegenerateSlicesSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("punctRatio and the frozen quality scorer yield NULL on the " +
       "empty string instead of an ANSI divide-by-zero") {
    import spark.implicits._
    val docs = Seq((0L, ""), (1L, "plain text here"))
      .toDF("doc_id", "text")
    val ratios = docs.select(col("doc_id"),
      graft.llm.TextFeatures.punctRatio(col("text")).as("pr"))
      .orderBy("doc_id").collect()
    assert(ratios(0).isNullAt(1), "empty text -> NULL ratio")
    assert(!ratios(1).isNullAt(1))
    val scored = graft.llm.QualityModel.score(docs, "text",
        graft.llm.QualityModel.FrozenScorer)
      .orderBy("doc_id").collect()
    assert(scored(0).isNullAt(2), "empty text -> NULL logit")
    assert(!scored(1).isNullAt(2))
  }

  test("spearman rho is NULL when a column has zero rank variance " +
       "(all-tie slice), moment sums still exact") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-degen-li").toString
    Seq.tabulate(20)(i => (1L, 1L, 1L, 1, 25.0, 100.0, 0.0, 0.0,
        "N", "O", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val Array(row) =
      graft.SparkEntry.queries("profile_spearman")(spark, dir).collect()
    assert(row.getLong(0) == 20L)
    assert(row.getDouble(1) == 0.0 && row.getDouble(2) == 0.0)
    assert(row.isNullAt(4), "all ties -> rho NULL, not a crash")
  }

  test("mann-whitney z and KS d are NULL with an empty arm; " +
       "ols slope is NULL on a single-day series") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-degen-ev").toString
    // every purchase from an even user id -> arm g=1 is empty; all on
    // one calendar day -> zero x-variance for the trend
    Seq.tabulate(10)(i => (i.toLong,
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 2L * i,
        "purchase", 10.0 + i, """{"k": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val mw = graft.SparkEntry.queries("f_mann_whitney")(spark, dir)
      .collect().head
    assert(mw.isNullAt(mw.length - 1), "empty arm -> z NULL")
    val ks = graft.SparkEntry.queries("f_ks_test")(spark, dir)
      .collect().head
    assert(ks.isNullAt(3) && ks.isNullAt(4), "empty arm -> d, ks NULL")
    val ols = graft.SparkEntry.queries("ts_ols_trend")(spark, dir)
      .collect().head
    assert(ols.isNullAt(3), "single-day series -> slope NULL")
  }

  test("wow growth drops the week after a zero-revenue week instead " +
       "of dividing by zero") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-degen-ord").toString
    Seq((1L, 1L, "O", 0.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
        (2L, 1L, "O", 50.0, java.sql.Timestamp.valueOf("2024-01-08 00:00:00"), "1-URGENT"),
        (3L, 1L, "O", 75.0, java.sql.Timestamp.valueOf("2024-01-15 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = graft.SparkEntry.queries("m_wow_growth")(spark, dir)
      .orderBy("wk").collect()
    // week 0 -> 1: undefined (0 predecessor, dropped); week 1 -> 2: 50%
    assert(rows.length == 1)
    assert(rows(0).getLong(2) == 500000L, "75/50 - 1 = +500000 ppm")
  }
}
