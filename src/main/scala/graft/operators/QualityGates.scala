package graft.operators

import graft.{Op, Tables}
import graft.checks.Checks
import org.apache.spark.sql.functions._

/** The reference's five test nodes (reference: models/marts/schema.yml:9-19 +
  * tests/assert_revenue_is_positive.sql), re-targeted at the testdata star
  * schema and wrapped with the dbt count harness
  * (reference: dbt macros/materializations/tests/helpers.sql:5-14) so each
  * gate yields exactly one deterministic row: (failures, should_error).
  */
object QualityGates {

  private def harness(rows: org.apache.spark.sql.DataFrame) =
    Checks.harness(rows)

  val ops: Seq[Op] = Seq(

    // unique(order_id) analog (reference: schema.yml:10).
    Op("t_unique_orderkey",
       """SELECT count(*) AS failures, count(*) <> 0 AS should_error FROM (
         |  SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL
         |  GROUP BY o_orderkey HAVING count(*) > 1)""".stripMargin) { (s, d) =>
      harness(Checks.unique(Tables.orders(s, d), "o_orderkey"))
    },

    // not_null(order_id) analog (reference: schema.yml:11).
    Op("t_notnull_orderkey",
       """SELECT count(*) AS failures, count(*) <> 0 AS should_error
         |FROM (SELECT 1 FROM orders WHERE o_orderkey IS NULL)""".stripMargin) { (s, d) =>
      harness(Checks.notNull(Tables.orders(s, d), "o_orderkey"))
    },

    // relationships(customer_id -> customers) analog (reference:
    // schema.yml:17-19; note the reference's own ref('stg_customers') is a
    // broken node name — we implement the intended FK check, see SURVEY §3).
    Op("t_relationships_custkey",
       """SELECT count(*) AS failures, count(*) <> 0 AS should_error FROM (
         |  SELECT o.o_custkey FROM orders o
         |  WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
         |    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))""".stripMargin) { (s, d) =>
      harness(Checks.relationships(
        Tables.orders(s, d), "o_custkey", Tables.customer(s, d), "c_custkey"))
    },

    // singular revenue >= 0 analog (reference:
    // tests/assert_revenue_is_positive.sql:3-7 — NULL totals pass via 3VL).
    Op("t_singular_revenue",
       """SELECT count(*) AS failures, count(*) <> 0 AS should_error
         |FROM (SELECT 1 FROM orders WHERE o_totalprice < 0)""".stripMargin) { (s, d) =>
      harness(Checks.singular(Tables.orders(s, d), col("o_totalprice") < 0))
    },

    // accepted_values (reference:
    // dbt macros/generic_test_sql/accepted_values.sql — framework test
    // unused by the project). The accepted list deliberately excludes the
    // real status 'P' so the FAILURE path is exercised: exactly one group
    // fails, failures = 1, should_error = true.
    Op("t_accepted_values",
       """SELECT count(*) AS failures, count(*) <> 0 AS should_error FROM (
         |  SELECT o_orderstatus AS value_field, count(*) AS n_records
         |  FROM orders GROUP BY o_orderstatus
         |  HAVING o_orderstatus NOT IN ('O', 'F'))""".stripMargin) { (s, d) =>
      harness(Checks.acceptedValues(Tables.orders(s, d), "o_orderstatus",
        Seq("O", "F")))
    },

    // dbt's test `limit` config (reference:
    // dbt macros/materializations/tests/test.sql:4-8 —
    // get_limit_subquery_sql wraps the test query with `limit N` BEFORE the
    // count): a massively failing test reports at most N failures and stops
    // scanning once N rows are found.
    Op("t_limited_failures",
       """SELECT count(*) AS failures, count(*) <> 0 AS should_error FROM (
         |  SELECT 1 FROM orders WHERE o_totalprice > 0 LIMIT 5)""".stripMargin) { (s, d) =>
      harness(Checks.singular(Tables.orders(s, d), col("o_totalprice") > 0)
        .limit(5))
    },

    // --- dbt-utils generic tests (the standard extension pack) ----------

    // expression_is_true: every row must satisfy the expression; false OR
    // NULL rows fail. The 50k threshold is deliberately low enough that
    // real orders violate it, exercising the failure path.
    Op("t_expression_is_true",
       """SELECT count(*) AS failures, count(*) <> 0 AS should_error
         |FROM (SELECT 1 FROM orders
         |      WHERE NOT coalesce(o_totalprice < 50000, false))""".stripMargin) { (s, d) =>
      harness(Checks.expressionIsTrue(Tables.orders(s, d),
        col("o_totalprice") < 50000))
    },

    // recency: newest o_orderdate must be within 7300 days of the pinned
    // "now" (2026-01-01) — TPC-H dates end in 1998, so the gate trips.
    Op("t_recency",
       """SELECT count(*) AS failures, count(*) <> 0 AS should_error
         |FROM (SELECT max(o_orderdate) AS most_recent FROM orders)
         |WHERE most_recent IS NULL
         |   OR most_recent < TIMESTAMP '2026-01-01 00:00:00'
         |                    - INTERVAL 7300 DAY""".stripMargin) { (s, d) =>
      harness(Checks.recency(Tables.orders(s, d), "o_orderdate",
        maxAgeSeconds = 7300L * 86400L,
        now = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    },

    // equal_rowcount: raw compare row (count_a, count_b) when the two
    // relations disagree — orders vs lineitem always do.
    Op("t_equal_rowcount",
       """SELECT count_a, count_b FROM (
         |  SELECT (SELECT count(*) FROM orders) AS count_a,
         |         (SELECT count(*) FROM lineitem) AS count_b)
         |WHERE count_a <> count_b""".stripMargin) { (s, d) =>
      Checks.equalRowcount(Tables.orders(s, d), Tables.lineitem(s, d))
    },

    // mutually_exclusive_ranges: per customer, 30-day windows starting at
    // each order date must not overlap (they frequently do — the failing
    // rows are the oracle-compared output). One keyed window, no range
    // self-join.
    Op("t_exclusive_ranges",
       """WITH r AS (
         |  SELECT o_custkey, o_orderdate AS lower,
         |         o_orderdate + INTERVAL 30 DAY AS upper
         |  FROM orders),
         |m AS (
         |  SELECT o_custkey, lower, upper,
         |         max(upper) OVER (PARTITION BY o_custkey
         |           ORDER BY lower, upper
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |           AS prev
         |  FROM r)
         |SELECT o_custkey, lower, upper FROM m
         |WHERE prev IS NOT NULL AND lower < prev""".stripMargin) { (s, d) =>
      Checks.mutuallyExclusiveRanges(
        Tables.orders(s, d).select(col("o_custkey"),
          col("o_orderdate").as("lower"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("upper")),
        "lower", "upper", Seq("o_custkey"))
    },

    // accepted_range (dbt_utils): discounts must sit in [0, 0.1] —
    // planted violations via a deterministic +0.2 bump on ~every 199th
    // line (prime modulus — a multiple of 10 would never hit: linenumber
    // is 1..7), so the gate returns exactly those rows.
    Op("t_accepted_range",
       """SELECT l_orderkey, l_linenumber, l_discount FROM (
         |  SELECT l_orderkey, l_linenumber,
         |         CASE WHEN (l_orderkey * 10 + l_linenumber) % 199 = 0
         |              THEN l_discount + 0.2 ELSE l_discount END AS l_discount
         |  FROM lineitem)
         |WHERE l_discount IS NOT NULL
         |  AND (l_discount < 0.0 OR l_discount > 0.1)""".stripMargin) {
      (s, d) =>
        Checks.acceptedRange(
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
            when((col("l_orderkey") * 10 + col("l_linenumber")) % 199 === 0,
              col("l_discount") + 0.2).otherwise(col("l_discount"))
              .as("l_discount")),
          "l_discount", minValue = Some(0.0), maxValue = Some(0.1))
    },

    // sequential_values (dbt_utils): l_linenumber must step by exactly 1
    // within each order. Dropping every line number 2 plants a
    // deterministic gap in every multi-line order; the op returns the
    // violating (order, line, predecessor) rows the test would report.
    Op("t_sequential_values",
       """SELECT l_orderkey, l_linenumber, prev_value FROM (
         |  SELECT l_orderkey, l_linenumber,
         |         lag(l_linenumber) OVER (PARTITION BY l_orderkey
         |           ORDER BY l_linenumber) AS prev_value
         |  FROM lineitem WHERE l_linenumber <> 2)
         |WHERE prev_value IS NOT NULL
         |  AND l_linenumber <> prev_value + 1""".stripMargin) { (s, d) =>
      Checks.sequentialValues(
        Tables.lineitem(s, d).filter(col("l_linenumber") =!= 2)
          .select(col("l_orderkey"), col("l_linenumber")),
        "l_linenumber", interval = 1L, partitionBy = Seq("l_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("prev_value"))
    }
  )
}
