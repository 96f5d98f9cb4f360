package graft.olist

import graft.Op
import org.apache.spark.sql.functions._

/** Driver-facing entries for the Olist pipeline. The pipeline runs over the
  * reference seed CSVs plus synthesized stripped seeds — tables the driver's
  * DuckDB oracle does not have — so these are rows-only (`noOracle`) checks;
  * value-level conformance for the same logic is covered by the ScalaTest
  * suite and, structurally, by the TPC-H-shaped oracle ops (j2_fct_orders is
  * the same plan shape with a DuckDB oracle).
  */
object OlistOps {

  /** Scratch warehouse inside the build dir (kept out of git; absolute so
    * the driver's working directory cannot redirect it).
    */
  private def scratch = "/root/repo/target/olist_wh"

  val ops: Seq[Op] = Seq(

    // End-to-end: seeds -> staging views -> stored fct_orders (S1, S3, S4,
    // D1-D4 in one pass). Returns the stored gold table.
    Op.noOracle("olist_fct_orders_pipeline") { (s, _) =>
      Pipeline.smoke(s, scratch)
    },

    // D4/D5: the five test nodes evaluated against the stored relation with
    // dbt's severity protocol; one summary row per test. Reuses the stored
    // warehouse when the pipeline op already built it (the build is
    // deterministic, so the result is identical either way); builds it first
    // otherwise, so the op stays self-contained.
    Op.noOracle("olist_tests_gate") { (s, _) =>
      val cat = Models.catalog(s, scratch,
        synthDir = Some(s"$scratch/_synth_seeds"))
      if (!cat.warehouse.exists("fct_orders")) Pipeline.smoke(s, scratch)
      import s.implicits._
      Pipeline.testQueries(cat)
        .map { case (name, q) =>
          val r = graft.checks.Checks.evaluate(q(), warnOnly = true)
          (name, r.failures,
            Pipeline.TestOutcome(name, r).status)
        }
        .toDF("test_name", "failures", "status")
    },

    // S1 visible in isolation: the three real reference CSVs through the
    // declared-schema ingest (BOM header, quoted zips, null sentinels).
    Op.noOracle("olist_seed_ingest") { (s, _) =>
      val products = Seeds.readCsv(s, Seeds.referenceSeedsDir,
        "olist_products_dataset")
      val sellers = Seeds.readCsv(s, Seeds.referenceSeedsDir,
        "olist_sellers_dataset")
      val xlat = Seeds.readCsv(s, Seeds.referenceSeedsDir,
        "product_category_name_translation")
      products.agg(count(lit(1)).as("n_products"),
          count(col("product_category_name")).as("n_categorized"))
        .crossJoin(broadcast(sellers.agg(count(lit(1)).as("n_sellers"),
          // quoted zips must keep leading zeros -> all length 5
          sum(when(length(col("seller_zip_code_prefix")) === 5, 1)
            .otherwise(0)).as("n_zip5"))))
        .crossJoin(broadcast(xlat.agg(count(lit(1)).as("n_translations"),
          // BOM must not corrupt the first header/column
          count(col("product_category_name")).as("n_bom_ok"))))
    },

    // --- semantic layer (dbt metrics) ------------------------------------

    // One governed metric definition compiled to a grouped plan: revenue
    // (decimal-exact sum presented as double) at month grain sliced by
    // order status. The oracle is the same aggregation hand-written.
    Op("m_revenue_monthly",
       """SELECT date_trunc('month', o_orderdate) AS metric_time,
         |       o_orderstatus,
         |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |         AS revenue
         |FROM orders GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Metrics.query(graft.Tables.orders(s, d), revenueMetric,
        grain = "month", dims = Seq("o_orderstatus"))
    },

    // Derived ratio metric in ONE aggregation pass: average order value =
    // decimal-exact revenue / order count per quarter (single division of
    // deterministic aggregates -> bit-exact replay).
    Op("m_avg_order_value",
       """SELECT metric_time,
         |       revenue / n_orders AS avg_order_value
         |FROM (
         |  SELECT date_trunc('quarter', o_orderdate) AS metric_time,
         |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         |           AS revenue,
         |         count(*) AS n_orders
         |  FROM orders GROUP BY 1)""".stripMargin) { (s, d) =>
      Metrics.ratio(graft.Tables.orders(s, d), "avg_order_value",
        num = revenueMetric, den = orderCountMetric, grain = "quarter")
    }
  )

  /** The demo metric definitions the semantic-layer entries compile. */
  private val revenueMetric = Metrics.Metric(
    name = "revenue", agg = "sum",
    measure = col("o_totalprice").cast("decimal(18,2)"),
    timeDim = "o_orderdate",
    dims = Set("o_orderstatus", "o_orderpriority"),
    present = _.cast("double"))

  private val orderCountMetric = Metrics.Metric(
    name = "n_orders", agg = "count", measure = lit(1),
    timeDim = "o_orderdate",
    dims = Set("o_orderstatus", "o_orderpriority"))
}
