package graft.olist

import graft.SparkSpec
import graft.checks.Checks
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** File-level run artifacts: a `build` outcome written as run_results.json
  * must drive a `retry` in a FRESH catalog instance (the crashed-process
  * scenario dbt's `retry` command exists for, [dbt]/task/retry.py), and the
  * manifest JSON must round-trip the `state:modified` fingerprints.
  */
class ArtifactsSpec extends SparkSpec {

  private def models(broken: () => Boolean) = {
    import spark.implicits._
    Seq(
      Model("ok", Nil, Materialization.Table,
        (_: Map[String, DataFrame]) => Seq(1L, 1L).toDF("id")),
      Model("flaky", Nil, Materialization.Table,
        (_: Map[String, DataFrame]) =>
          if (broken()) sys.error("transient") else Seq(2L).toDF("id")),
      Model("child", Seq("flaky"), Materialization.Table,
        (d: Map[String, DataFrame]) => d("flaky")))
  }

  // "ok" carries a warn-severity unique test that FAILS (duplicate id) so
  // the artifact has a non-trivial test entry to round-trip.
  private val tests: Map[String, Seq[(String, Catalog => DataFrame)]] =
    Map("ok" -> Seq("unique_ok_id" ->
      ((c: Catalog) => Checks.unique(c.warehouse.load("ok"), "id"))))

  test("retry from a stored run_results.json in a fresh catalog " +
       "re-runs only the failed subtree") {
    val wh = Files.createTempDirectory("graft_artifacts").toString
    val artifact = Files.createTempDirectory("graft_target")
      .resolve("run_results.json").toString
    @volatile var broken = true

    val cat1 = new Catalog(spark, new Warehouse(spark, wh), models(() => broken))
    val first = cat1.build(Seq("ok", "child"), tests, withUpstream = true,
      warnOnly = Set("unique_ok_id"))
    assert(first.map(r => r.name -> r.status).toMap ==
      Map("ok" -> "success", "flaky" -> "error", "child" -> "skipped"))
    Artifacts.writeRunResults(artifact, first)

    // Fresh process: new Catalog over the same warehouse, state from disk.
    broken = false
    val cat2 = new Catalog(spark, new Warehouse(spark, wh), models(() => broken))
    val previous = Artifacts.readRunResults(artifact, cat2)
    assert(previous.map(r => r.name -> r.status) ==
      first.map(r => r.name -> r.status))
    // the warn test outcome round-tripped with its failure count
    assert(previous.find(_.name == "ok").get.tests ==
      Seq("unique_ok_id" -> Checks.Warn(1)))

    val merged = cat2.retry(previous, tests, warnOnly = Set("unique_ok_id"))
    assert(merged.map(r => r.name -> r.status).toMap ==
      Map("ok" -> "success", "flaky" -> "success", "child" -> "success"),
      merged.toString)
    assert(cat2.warehouse.exists("child"))
    // the merged outcome is itself writable — the retry's own artifact
    Artifacts.writeRunResults(artifact, merged)
    val again = Artifacts.readRunResults(artifact, cat2)
    assert(again.map(r => r.name -> r.status).toMap ==
      merged.map(r => r.name -> r.status).toMap)
  }

  test("manifest.json round-trips fingerprints and records deps/" +
       "materialization") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_artifacts_m").toString
    val path = Files.createTempDirectory("graft_target_m")
      .resolve("manifest.json").toString
    val cat = new Catalog(spark, new Warehouse(spark, wh), Seq(
      Model("base", Nil, Materialization.Table,
        (_: Map[String, DataFrame]) => Seq(1L).toDF("id"),
        tags = Set("nightly")),
      Model("leaf", Seq("base"), Materialization.View,
        (d: Map[String, DataFrame]) => d("base"))))
    Artifacts.writeManifest(path, cat)
    val fps = Artifacts.readManifestFingerprints(path)
    assert(fps.fingerprints == cat.manifest().fingerprints)
    val text = Files.readString(java.nio.file.Paths.get(path))
    assert(text.contains("\"model.base\"") && text.contains("nightly"))
    assert(text.contains("\"materialized\" : \"View\"") ||
      text.contains("\"materialized\":\"View\""))
    assert(text.contains("\"model.leaf\""))
  }

  test("catalog.json lists only built relations with as-stored columns " +
       "and row counts") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_artifacts_c").toString
    val path = Files.createTempDirectory("graft_target_c")
      .resolve("catalog.json").toString
    val cat = new Catalog(spark, new Warehouse(spark, wh), Seq(
      Model("built", Nil, Materialization.Table,
        (_: Map[String, DataFrame]) =>
          Seq((1L, "x"), (2L, "y")).toDF("id", "name")),
      Model("unbuilt", Nil, Materialization.Table,
        (_: Map[String, DataFrame]) => Seq(1L).toDF("id"))))
    cat.run(Seq("built"))
    Artifacts.writeCatalog(path, cat)
    val text = Files.readString(java.nio.file.Paths.get(path))
    assert(text.contains("\"model.built\"") &&
      !text.contains("\"model.unbuilt\""))
    assert(text.contains("\"row_count\" : 2") ||
      text.contains("\"row_count\":2"))
    assert(text.contains("\"name\"") && text.contains("\"bigint\""))
  }
}
