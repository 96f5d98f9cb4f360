package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality summary a warehouse runs before
  * trusting a new feed (dbt-profiler / WhyLogs territory, absent from the
  * reference): per column, row count, null count, exact distinct count,
  * min/max, and mean rendered length.
  *
  * Plan shape: ONE scan. All per-column aggregates fold into a single
  * global aggregate row (Spark plans the multi-count-distinct via one
  * Expand — each input row is replicated once per distinct-column, then a
  * partial+final agg; no joins, no repeated scans), and the row is
  * exploded into one output row per column. At 100 TB the Expand's
  * n_cols× row replication is the cost of EXACT distinct counts; swap
  * `countDistinct` for `approx_count_distinct` when the profile is
  * advisory (the shape and everything else is unchanged) — exactness is
  * kept here because the DuckDB oracle hash-compares the counts.
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
  def profile(df: DataFrame, fields: Seq[(String, Render)]): DataFrame = {
    val aggs = fields.flatMap { case (f, r) =>
      val c = col(f)
      Seq(
        count(c).as(s"${f}__n"),
        countDistinct(c).as(s"${f}__d"),
        r(min(c)).as(s"${f}__min"),
        r(max(c)).as(s"${f}__max"),
        sum(length(r(c))).as(s"${f}__len"))
    }
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val entries = fields.map { case (f, _) =>
      struct(
        lit(f).as("col_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"${f}__n")).as("n_nulls"),
        col(s"${f}__d").as("n_distinct"),
        col(s"${f}__min").as("min_s"),
        col(s"${f}__max").as("max_s"),
        (col(s"${f}__len").cast("double") / col(s"${f}__n")).as("avg_len"))
    }
    row.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

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
    })
}
