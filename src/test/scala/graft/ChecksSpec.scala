package graft

import graft.checks.Checks
import org.apache.spark.sql.functions._

/** Unit tests for the dbt-semantics checks module (SURVEY §5) on hand-built
  * frames — the reference behaviors each one reproduces are cited in
  * Checks.scala.
  */
class ChecksSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.{Row, types => T}

  private def df(rows: Seq[(java.lang.Long, String)]) = {
    val schema = T.StructType(Seq(
      T.StructField("id", T.LongType, nullable = true),
      T.StructField("fk", T.StringType, nullable = true)))
    spark.createDataFrame(
      rows.map { case (i, f) => Row(i, f) }.asJava, schema)
  }

  test("unique: flags duplicated non-null keys only") {
    val d = df(Seq((1L, "a"), (1L, "a"), (2L, "b"), (null, "c"), (null, "d")))
    val dups = Checks.unique(d, "id").collect()
    assert(dups.length == 1)
    assert(dups.head.getLong(0) == 1L && dups.head.getLong(1) == 2L)
  }

  test("notNull: returns exactly the null-key rows") {
    val d = df(Seq((1L, "a"), (null, "b"), (null, "c")))
    assert(Checks.notNull(d, "id").count() == 2)
    assert(Checks.notNull(d, "fk").count() == 0)
  }

  test("relationships: orphaned FKs fail, NULL FKs pass (dbt macro guard)") {
    val child = df(Seq((1L, "p1"), (2L, "p2"), (3L, "orphan"), (4L, null)))
    val parent = df(Seq((10L, "p1"), (11L, "p2")))
    val bad = Checks.relationships(child, "fk", parent, "fk").collect()
    assert(bad.map(_.getString(0)).toSeq == Seq("orphan"))
  }

  test("singular: violating-rows predicate, 3VL excludes NULL rows") {
    val d = df(Seq((-1L, "x"), (5L, "y"), (null, "z")))
    // id < 0 is NULL for the null row -> not a violation (SQL 3VL), exactly
    // the reference's total_order_value < 0 semantics for item-less orders.
    assert(Checks.singular(d, col("id") < 0).count() == 1)
  }

  test("evaluate: Pass / Warn / Error severity protocol (D5)") {
    val d = df(Seq((-1L, "x"), (5L, "y")))
    assert(Checks.evaluate(Checks.singular(d, col("id") < -100)) == Checks.Pass())
    assert(Checks.evaluate(Checks.singular(d, col("id") < 0)) == Checks.Error(1))
    assert(Checks.evaluate(Checks.singular(d, col("id") < 0), warnOnly = true) ==
      Checks.Warn(1))
  }

  test("acceptedValues: out-of-list groups fail with counts, NULLs pass") {
    val d = df(Seq((1L, "ok"), (2L, "ok"), (3L, "bad"), (4L, null)))
    val out = Checks.acceptedValues(d, "fk", Seq("ok")).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "bad" && out.head.getLong(1) == 1L)
    assert(Checks.acceptedValues(d, "fk", Seq("ok", "bad")).count() == 0)
  }

  test("limit config caps reported failures before counting (dbt limit)") {
    val d = df((1L to 100L).map(i => (java.lang.Long.valueOf(i), "x")))
    val failing = Checks.singular(d, col("id") > 0)
    assert(Checks.evaluate(failing, Checks.TestConfig(limit = Some(7))) ==
      Checks.Error(7))
    assert(Checks.evaluate(failing,
      Checks.TestConfig(warnOnly = true, limit = Some(7))) == Checks.Warn(7))
  }

  test("warn_if / error_if thresholds: counts below the gate pass") {
    val d = df((1L to 10L).map(i => (java.lang.Long.valueOf(i), "x")))
    val failing = Checks.singular(d, col("id") > 5) // 5 failure rows
    // tolerate up to 100 bad rows -> pass outright
    assert(Checks.evaluate(failing,
      Checks.TestConfig(warnIf = _ > 100, errorIf = _ > 100)) == Checks.Pass())
    // warn from 1, error only above 100 -> warn
    assert(Checks.evaluate(failing,
      Checks.TestConfig(errorIf = _ > 100)) == Checks.Warn(5))
    // default gates unchanged
    assert(Checks.evaluate(failing, Checks.TestConfig()) == Checks.Error(5))
  }

  test("storeFailures persists the (limited) failure rows (store_failures)") {
    val d = df(Seq((-1L, "x"), (-2L, "y"), (5L, "z")))
    val dir = java.nio.file.Files.createTempDirectory("graft_sf").toString
    val r = Checks.evaluate(Checks.singular(d, col("id") < 0),
      Checks.TestConfig(storeFailures =
        Some(rows => rows.write.mode("overwrite").parquet(s"$dir/audit"))))
    assert(r == Checks.Error(2))
    val stored = spark.read.parquet(s"$dir/audit")
    assert(stored.count() == 2)
    assert(stored.filter(col("id") >= 0).count() == 0)
  }

  test("expressionIsTrue: false AND null expression rows fail") {
    import spark.implicits._
    val d = Seq((1L, Some(5.0)), (2L, Some(-1.0)), (3L, None))
      .toDF("id", "amount")
    val fails = Checks.expressionIsTrue(d, col("amount") > 0)
      .collect().map(_.getLong(0)).toSet
    assert(fails == Set(2L, 3L)) // -1 is false; NULL is not-true
  }

  test("recency: passes inside the window, fails outside, fails on empty") {
    import spark.implicits._
    val now = java.sql.Timestamp.valueOf("2026-08-13 00:00:00")
    val d = Seq(java.sql.Timestamp.valueOf("2026-08-12 00:00:00"))
      .toDF("loaded_at")
    assert(Checks.recency(d, "loaded_at", 2 * 86400L, now).count() == 0)
    assert(Checks.recency(d, "loaded_at", 3600L, now).count() == 1)
    assert(Checks.recency(d.filter(lit(false)), "loaded_at", 3600L, now)
      .count() == 1) // empty table = no fresh data
  }

  test("equalRowcount: equal passes, unequal emits the count pair") {
    import spark.implicits._
    val a = (1 to 5).toDF("x"); val b = (1 to 5).toDF("y")
    assert(Checks.equalRowcount(a, b).count() == 0)
    val r = Checks.equalRowcount(a, b.limit(3)).collect()
    assert(r.length == 1 && r(0).getLong(0) == 5 && r(0).getLong(1) == 3)
  }

  test("mutuallyExclusiveRanges: overlap flagged within a key, adjacent " +
       "ranges and other keys pass") {
    import spark.implicits._
    val d = Seq(
      ("a", 0, 10), ("a", 10, 20),  // adjacent: [0,10) then [10,20) - ok
      ("a", 15, 25),                // overlaps [10,20) -> fail
      ("b", 0, 100)                 // other key untouched
    ).toDF("k", "lower", "upper")
    val fails = Checks.mutuallyExclusiveRanges(d, "lower", "upper", Seq("k"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(fails == Set(("a", 15)))
  }
}
