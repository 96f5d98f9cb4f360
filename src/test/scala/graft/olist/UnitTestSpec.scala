package graft.olist

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** dbt unit tests over the fct_orders model: fixtures in, pinned rows out,
  * labeled except-both-ways diff — including a deliberate mismatch and the
  * missing-fixture guard.
  */
class UnitTestSpec extends SparkSpec {

  import UnitTests._

  private lazy val cat = Models.catalog(spark,
    Files.createTempDirectory("graft_unit").toString)

  private def fixtures = {
    import spark.implicits._
    val orders = Seq(
      ("o1", "c1", "delivered", "2024-01-01"),
      ("o2", "c2", "shipped", "2024-01-02")) // no items -> NULL totals
      .toDF("order_id", "customer_id", "order_status", "purchased_at")
    val customers = Seq(
      ("c1", "CityA", "ST"), ("c2", "CityB", "ST"))
      .toDF("customer_id", "city", "state")
    val items = Seq(
      ("o1", 10.0, 2.5), ("o1", 5.0, 1.5))
      .toDF("order_id", "price", "shipping_cost")
    Map("stg_olist_orders" -> orders, "stg_olist_customers" -> customers,
      "stg_items" -> items)
  }

  private def expectAll = {
    import spark.implicits._
    Seq(
      ("o1", "delivered", "CityA", Some(15.0), Some(4.0), Some(19.0)),
      ("o2", "shipped", "CityB", None, None, None))
      .toDF("order_id", "order_status", "city", "total_item_revenue",
        "total_shipping_revenue", "total_order_value")
  }

  test("fct_orders unit test passes on correct expectations (item " +
       "aggregation, NULL-propagating total, left-join row preservation)") {
    val r = UnitTests.run(cat, UnitTest("ut_fct_orders", "fct_orders",
      fixtures, expectAll))
    assert(r.passed, r.diff.collect().mkString("\n"))
  }

  test("a wrong expectation fails with rows labeled by provenance") {
    import spark.implicits._
    val wrong = Seq(
      ("o1", Some(99.0)), // wrong total
      ("o2", None))
      .toDF("order_id", "total_order_value")
    val r = UnitTests.run(cat, UnitTest("ut_bad", "fct_orders",
      fixtures, wrong))
    assert(!r.passed)
    val labeled = r.diff.collect()
      .map(x => (x.getString(0), x.getString(x.length - 1))).toSet
    assert(labeled == Set(
      ("o1", "actual_not_expected"), ("o1", "expected_not_actual")))
  }

  test("bag semantics: a model output duplicating a row fails even when " +
       "the row VALUES all appear in expect") {
    import spark.implicits._
    val dup = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("k", "v")
    val exp = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    assert(!UnitTests.diff(dup, exp).isEmpty)
  }

  test("missing fixtures and unknown expected columns are rejected up front") {
    import spark.implicits._
    intercept[IllegalArgumentException](
      UnitTests.run(cat, UnitTest("ut_missing", "fct_orders",
        fixtures - "stg_items", expectAll)))
    val badCols = Seq(("o1", 1.0)).toDF("order_id", "no_such_column")
    intercept[IllegalArgumentException](
      UnitTests.run(cat, UnitTest("ut_cols", "fct_orders", fixtures, badCols)))
  }
}
