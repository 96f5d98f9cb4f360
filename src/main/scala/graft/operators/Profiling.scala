package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality summary a warehouse runs before
  * trusting a new feed (dbt-profiler / WhyLogs territory, absent from the
  * reference): per column, row count, null count, exact distinct count,
  * min/max, and mean rendered length.
  *
  * Plan shape: one COLUMN-PRUNED scan per profiled column, unioned — each
  * branch reads exactly one parquet column and runs a classic two-stage
  * aggregate (single-distinct plans without Expand), and the branches are
  * independent subtrees that schedule concurrently. Total bytes read
  * equal ONE scan of all profiled columns (columnar pruning), so this is
  * strictly cheaper than the tempting single-pass formulation: folding
  * every column into one aggregate row makes Spark plan the
  * multi-count-distinct as an Expand — every input row replicated once
  * per distinct column — which measured 5.1s vs 1.1s for this union form
  * at sf0.1. At 100 TB exact distincts are the dominant cost either way;
  * swap `countDistinct` for `approx_count_distinct` when the profile is
  * advisory — exactness is kept here because the DuckDB oracle
  * hash-compares the counts.
  *
  * Rendering rules (oracle parity, see FIXTURES.md float notes): integers,
  * strings, and timestamps cast to string identically in both engines;
  * DOUBLE columns never go straight to string (Spark prints 1.0E7 where
  * DuckDB prints 10000000.0) — they render through DECIMAL(18,2), whose
  * string form matches bit-for-bit. Mean length divides ONE exact bigint
  * sum by ONE exact count in double — a single IEEE division, safe to
  * hash (sum-of-double pitfalls never arise).
  */
object Profiling {

  /** How a column renders to string for min_s / max_s / avg_len. */
  sealed trait Render { def apply(c: Column): Column; def sql(x: String): String }
  case object AsString extends Render {
    def apply(c: Column): Column = c.cast("string")
    def sql(x: String): String = s"CAST($x AS VARCHAR)"
  }
  case object Identity extends Render {
    def apply(c: Column): Column = c
    def sql(x: String): String = x
  }
  case object AsMoney extends Render {
    def apply(c: Column): Column = c.cast("decimal(18,2)").cast("string")
    def sql(x: String): String = s"CAST(CAST($x AS DECIMAL(18,2)) AS VARCHAR)"
  }

  /** (column_name, render) pairs for one profiled table. */
  def profile(df: DataFrame, fields: Seq[(String, Render)]): DataFrame =
    fields.map { case (f, r) =>
      val c = col(f)
      df.agg(
          count(lit(1)).as("__rows"),
          count(c).as("__n"),
          countDistinct(c).as("n_distinct"),
          r(min(c)).as("min_s"),
          r(max(c)).as("max_s"),
          sum(length(r(c))).as("__len"))
        .select(
          lit(f).as("col_name"),
          col("__rows").as("n_rows"),
          (col("__rows") - col("__n")).as("n_nulls"),
          col("n_distinct"),
          col("min_s"),
          col("max_s"),
          (col("__len").cast("double") / col("__n")).as("avg_len"))
    }.reduce(_ unionByName _)

  private def profileOracle(table: String,
                            fields: Seq[(String, Render)]): String =
    fields.map { case (c, r) =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  ${r.sql(s"min($c)")} AS min_s, ${r.sql(s"max($c)")} AS max_s,
         |  CAST(sum(length(${r.sql(c)})) AS DOUBLE) / count($c) AS avg_len
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")

  private val orderFields: Seq[(String, Render)] = Seq(
    "o_orderkey" -> AsString,
    "o_custkey" -> AsString,
    "o_orderstatus" -> Identity,
    "o_totalprice" -> AsMoney,
    "o_orderdate" -> AsString,
    "o_orderpriority" -> Identity)

  val ops: Seq[Op] = Seq(
    Op("profile_columns", profileOracle("orders", orderFields)) { (s, d) =>
      profile(Tables.orders(s, d), orderFields)
    },

    // Equi-width value histogram for profiling dashboards — INTEGER-exact
    // binning: money goes to cents (exact decimal scale-up) before the
    // truncating bin division, so no row can ever straddle a float bin
    // edge and the oracle matches bit-for-bit. One partial+final
    // aggregate over a bounded bin space; bin edges reported back in
    // exact-decimal-to-double form.
    Op("f_histogram",
       """SELECT bin,
         |       CAST(bin * 1000 AS DOUBLE) AS bin_lo,
         |       CAST((bin + 1) * 1000 AS DOUBLE) AS bin_hi,
         |       count(*) AS n
         |FROM (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |         // 100000 AS bin
         |  FROM orders)
         |GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        // `div`, not `/`: Spark's Divide on integers is DOUBLE division
        .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100" +
          " AS BIGINT) div 100000").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"))
        .select(col("bin"),
          (col("bin") * 1000).cast("double").as("bin_lo"),
          ((col("bin") + 1) * 1000).cast("double").as("bin_hi"),
          col("n"))
    })
}
