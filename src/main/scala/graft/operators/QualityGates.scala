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
    }
  )
}
