package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Collection/semi-structured function families (SURVEY §2.9 lists them as
  * absent from the reference — engine extensions): array construction and
  * higher-order functions, lateral explode, pivot, and sketch aggregates.
  */
object Collections {

  val ops: Seq[Op] = Seq(

    // Array construction + higher-order functions over a generated array.
    // Spark sequence(1, n) == DuckDB range(1, n+1); the transform/filter/
    // aggregate trio maps 1:1 to DuckDB list_transform/list_filter/
    // list_sum.
    Op("f_array_funcs",
       """SELECT c_custkey AS customer_id,
         |       len(range(1, c_nationkey % 5 + 2)) AS n_items,
         |       CAST(list_aggregate(list_transform(range(1, c_nationkey % 5 + 2),
         |         x -> x * x), 'sum') AS BIGINT) AS sum_squares,
         |       len(list_filter(range(1, c_nationkey % 5 + 2),
         |         x -> x % 2 = 0)) AS n_even
         |FROM customer""".stripMargin) { (s, d) =>
      val arr = sequence(lit(1), pmod(col("c_nationkey"), lit(5)) + 1)
      Tables.customer(s, d).select(
        col("c_custkey").as("customer_id"),
        size(arr).cast("long").as("n_items"),
        aggregate(transform(arr, x => (x * x).cast("long")), lit(0L),
          (acc, x) => acc + x).as("sum_squares"),
        size(filter(arr, x => x % 2 === 0)).cast("long").as("n_even"))
    },

    // Lateral explode: one output row per generated element, then a
    // re-aggregation — the UNNEST shape.
    Op("f_explode",
       """SELECT CAST(item AS BIGINT) AS item, count(*) AS n
         |FROM (SELECT unnest(range(1, o_orderkey % 3 + 2)) AS item
         |      FROM orders)
         |GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(explode(sequence(lit(1), pmod(col("o_orderkey"), lit(3)) + 1))
          .as("item"))
        .groupBy(col("item").cast("long").as("item"))
        .agg(count(lit(1)).as("n"))
    },

    // Pivot: per-priority counts fanned out to one column per order status.
    // Explicit pivot values keep the schema static (required at scale — a
    // dynamic pivot needs a driver-side distinct pass first).
    Op("f_pivot",
       """SELECT o_orderpriority AS priority,
         |       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
         |       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
         |       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
         |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("priority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .na.fill(0L, Seq("F", "O", "P"))
    },

    // HLL sketch aggregate per group. No SQL oracle (DuckDB's approx sketch
    // differs by construction); the relative-error bound vs an exact count
    // is asserted in CollectionsSpec. Sketch-only on purpose: mixing an
    // exact countDistinct into the same agg forces an Expand duplication of
    // every input row.
    Op.noOracle("f_approx_distinct") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.02)
          .as("approx_orders"))
    },

    // Approximate quantiles (Greenwald-Khanna sketch): mergeable partial
    // sketches -> one small final merge, the scalable shape for
    // percentiles over 100 TB (an exact percentile needs a global sort).
    // Sketch internals are engine-specific -> rows-only; the error bound
    // vs exact quantiles is asserted in CollectionsSpec.
    Op.noOracle("f_approx_quantile") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("p50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000))
            .as("p95"))
    },

    // EXACT discrete percentiles: percentile_disc picks an actual element
    // (the smallest value whose cumulative distribution reaches q) — no
    // interpolation arithmetic, so unlike the continuous/approximate
    // variants the result is a real input datum and hash-matches across
    // engines (DuckDB's quantile_disc selects the same ceil(q*n)-th
    // order statistic at these quantiles). The scalable shape is still
    // the GK sketch above — exact per-group percentiles sort each group —
    // but groups here are bounded (5 priorities), which is exactly when
    // exact is affordable: per-group sort width is n/5, one shuffle.
    Op("f_percentile_disc",
       """SELECT o_orderpriority,
         |       quantile_disc(o_totalprice, 0.5) AS p50,
         |       quantile_disc(o_totalprice, 0.9) AS p90
         |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
            .as("p50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)")
            .as("p90"))
    },

    // INTERPOLATED percentiles (percentile_cont semantics) computed
    // manually from order statistics so the interpolation is EXACT
    // integer arithmetic instead of each engine's own float formula:
    // pos = (n−1)·p/100 splits into k = pos div 100 and r = pos mod
    // 100; the answer is lo·(100−r) + hi·r in hundredth-cents — one
    // deterministic expression over the rank-k and rank-k+1 values, so
    // p50/p90/p99 hash-compare per group where the built-ins would
    // drift in the last ulp. One rank window per group + a 3-row
    // percentile fan-out joined back by rank — two keyed lookups per
    // (group, p), no full sort collect.
    Op("f_percentile_cont",
       """WITH o AS (
         |  SELECT o_orderpriority AS grp,
         |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |           AS cents,
         |         row_number() OVER (PARTITION BY o_orderpriority
         |           ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |                    AS BIGINT), o_orderkey) AS rk,
         |         count(*) OVER (PARTITION BY o_orderpriority) AS n
         |  FROM orders),
         |ps AS (SELECT unnest([50, 90, 99]) AS p),
         |pos AS (
         |  SELECT DISTINCT grp, n, p,
         |         (n - 1) * p // 100 AS k, (n - 1) * p % 100 AS r
         |  FROM o, ps)
         |SELECT pos.grp, CAST(pos.p AS BIGINT) AS p,
         |       CAST(lo.cents * (100 - pos.r) + hi.cents * pos.r
         |            AS BIGINT) AS pctl_centicents
         |FROM pos
         |JOIN o lo ON lo.grp = pos.grp AND lo.rk = pos.k + 1
         |JOIN o hi ON hi.grp = pos.grp
         |         AND hi.rk = least(pos.k + 2, pos.n)""".stripMargin) {
      (s, d) =>
        val W = org.apache.spark.sql.expressions.Window
        val o = Tables.orders(s, d)
          .select(col("o_orderpriority").as("grp"), col("o_orderkey"),
            (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast("long").as("cents"))
          .select(col("grp"), col("cents"),
            row_number().over(W.partitionBy(col("grp"))
              .orderBy(col("cents"), col("o_orderkey"))).as("rk"),
            count(lit(1)).over(W.partitionBy(col("grp"))).as("n"))
          .transform(graft.Ckpt.cut(_)) // feeds pos AND both rank lookups
        val pos = o.select(col("grp"), col("n")).distinct()
          .select(col("grp"), col("n"),
            explode(array(lit(50L), lit(90L), lit(99L))).as("p"))
          .select(col("grp"), col("n"), col("p"),
            expr("(n - 1) * p div 100").as("k"),
            expr("(n - 1) * p % 100").as("r"))
        val loTab = o.select(col("grp").as("g1"), col("rk").as("rk1"),
          col("cents").as("lo_c"))
        val hiTab = o.select(col("grp").as("g2"), col("rk").as("rk2"),
          col("cents").as("hi_c"))
        pos
          .join(loTab, col("grp") === col("g1") &&
            col("rk1") === col("k") + 1)
          .join(hiTab, col("grp") === col("g2") &&
            col("rk2") === least(col("k") + 2, col("n")))
          .select(col("grp"), col("p"),
            (col("lo_c") * (lit(100L) - col("r")) + col("hi_c") * col("r"))
              .as("pctl_centicents"))
    }
  )
}
