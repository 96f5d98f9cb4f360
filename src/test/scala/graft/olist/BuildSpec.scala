package graft.olist

import graft.SparkSpec
import graft.checks.Checks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** dbt `build` semantics: interleaved materialize-then-test in DAG order,
  * error outcomes gate the failing node's downstream subtree, independent
  * branches keep running, warn severity does not gate.
  */
class BuildSpec extends SparkSpec {

  // diamond: seed -> (good, bad) -> sink_good / sink_bad
  private def diamond(badRows: Seq[Long]): Catalog = {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_build").toString
    def pass(dep: String) =
      (d: Map[String, DataFrame]) => d(dep)
    new Catalog(spark, new Warehouse(spark, wh), Seq(
      Model("seed", Nil, Materialization.Table,
        (_: Map[String, DataFrame]) => (1L to 10L).toDF("id")),
      Model("good", Seq("seed"), Materialization.Table, pass("seed")),
      Model("bad", Seq("seed"), Materialization.Table,
        (d: Map[String, DataFrame]) =>
          d("seed").unionByName(badRows.toDF("id"))),
      Model("sink_good", Seq("good"), Materialization.Table, pass("good")),
      Model("sink_bad", Seq("bad"), Materialization.Table, pass("bad"))))
  }

  private val uniqueTest: Map[String, Seq[(String, Catalog => DataFrame)]] =
    Map("bad" -> Seq("unique_bad_id" ->
      ((c: Catalog) => Checks.unique(c.warehouse.load("bad"), "id"))))

  test("an error-severity test failure skips the failing node's subtree " +
       "but the sibling branch still builds") {
    val cat = diamond(badRows = Seq(1L)) // duplicate id -> unique fails
    val rs = cat.build(Seq("sink_good", "sink_bad"), uniqueTest,
      withUpstream = true).map(r => r.name -> r.status).toMap
    assert(rs == Map("seed" -> "success", "good" -> "success",
      "bad" -> "error", "sink_good" -> "success", "sink_bad" -> "skipped"),
      rs.toString)
    assert(cat.warehouse.exists("sink_good") && !cat.warehouse.exists("sink_bad"))
  }

  test("a warn-severity failure does not gate downstream") {
    val cat = diamond(badRows = Seq(1L))
    val rs = cat.build(Seq("sink_bad"), uniqueTest,
      withUpstream = true, warnOnly = Set("unique_bad_id"))
      .map(r => r.name -> r.status).toMap
    assert(rs("bad") == "success" && rs("sink_bad") == "success", rs.toString)
  }

  test("a passing run reports per-node test outcomes and builds everything") {
    val cat = diamond(badRows = Nil)
    val rs = cat.build(Seq("sink_good", "sink_bad"), uniqueTest,
      withUpstream = true)
    assert(rs.forall(_.status == "success"), rs.toString)
    val badTests = rs.find(_.name == "bad").get.tests
    assert(badTests == Seq("unique_bad_id" -> Checks.Pass()))
  }

  test("a build exception marks the node error and skips its subtree, " +
       "run continues elsewhere") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_build2").toString
    val cat = new Catalog(spark, new Warehouse(spark, wh), Seq(
      Model("boom", Nil, Materialization.Table,
        (_: Map[String, DataFrame]) => sys.error("kaboom")),
      Model("child", Seq("boom"), Materialization.Table,
        (d: Map[String, DataFrame]) => d("boom")),
      Model("other", Nil, Materialization.Table,
        (_: Map[String, DataFrame]) => Seq(1L).toDF("id"))))
    val rs = cat.build(Seq("child", "other"), Map.empty,
      withUpstream = true).map(r => r.name -> r.status).toMap
    assert(rs("boom") == "error" && rs("child") == "skipped" &&
      rs("other") == "success", rs.toString)
  }

  test("retry re-executes only the failed node and its skipped subtree, " +
       "leaving successes untouched") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_retry").toString
    val runCounts = scala.collection.mutable.Map[String, Int]()
      .withDefaultValue(0)
    @volatile var broken = true
    def counted(name: String)(f: Map[String, DataFrame] => DataFrame) =
      (d: Map[String, DataFrame]) => { runCounts(name) += 1; f(d) }
    val cat = new Catalog(spark, new Warehouse(spark, wh), Seq(
      Model("ok", Nil, Materialization.Table,
        counted("ok")(_ => Seq(1L).toDF("id"))),
      Model("flaky", Nil, Materialization.Table,
        counted("flaky") { _ =>
          if (broken) sys.error("transient") else Seq(2L).toDF("id")
        }),
      Model("child", Seq("flaky"), Materialization.Table,
        counted("child")(d => d("flaky")))))
    val first = cat.build(Seq("ok", "child"), Map.empty, withUpstream = true)
    assert(first.map(r => r.name -> r.status).toMap ==
      Map("ok" -> "success", "flaky" -> "error", "child" -> "skipped"))
    broken = false
    val merged = cat.retry(first, Map.empty)
    assert(merged.map(r => r.name -> r.status).toMap ==
      Map("ok" -> "success", "flaky" -> "success", "child" -> "success"),
      merged.toString)
    // ok built once (never retried); flaky twice (fail + retry); child
    // once (skip on the first pass runs nothing)
    assert(runCounts.toMap == Map("ok" -> 1, "flaky" -> 2, "child" -> 1),
      runCounts.toString)
    assert(cat.warehouse.exists("child"))
    // an all-success result set retries nothing and returns unchanged
    val counts = runCounts.toMap
    assert(cat.retry(merged, Map.empty) == merged &&
      runCounts.toMap == counts)
  }
}
