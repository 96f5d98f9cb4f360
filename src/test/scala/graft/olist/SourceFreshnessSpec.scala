package graft.olist

import graft.SparkSpec
import graft.checks.Checks
import org.apache.spark.sql.DataFrame
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Duration

/** dbt `source freshness` semantics: age = now - max(loaded_at), graded
  * against warn_after / error_after windows (error wins).
  */
class SourceFreshnessSpec extends SparkSpec {

  private val now = Timestamp.valueOf("2024-06-01 12:00:00")

  private def catalogWith(rows: Seq[(Long, Timestamp)]): Catalog = {
    val wh = Files.createTempDirectory("graft_fresh").toString
    val cat = new Catalog(spark, new Warehouse(spark, wh), Seq(
      Model("src", Nil, Materialization.Table,
        (_: Map[String, DataFrame]) => {
          import spark.implicits._
          rows.toDF("id", "loaded_at")
        })))
    cat.run(Seq("src"))
    cat
  }

  private def freshness(cat: Catalog) =
    cat.sourceFreshness("src", "loaded_at",
      warnAfter = Duration.ofHours(1), errorAfter = Duration.ofHours(24),
      now = () => now)

  test("a fresh source passes") {
    val cat = catalogWith(Seq(
      1L -> Timestamp.valueOf("2024-06-01 11:30:00"),
      2L -> Timestamp.valueOf("2024-06-01 09:00:00"))) // max wins
    assert(freshness(cat) == Checks.Pass())
  }

  test("a source past warn_after but within error_after warns with its " +
       "age in seconds") {
    val cat = catalogWith(Seq(
      1L -> Timestamp.valueOf("2024-06-01 09:00:00"))) // 3h stale
    assert(freshness(cat) == Checks.Warn(3L * 3600))
  }

  test("a source past error_after errors; error wins over warn") {
    val cat = catalogWith(Seq(
      1L -> Timestamp.valueOf("2024-05-30 12:00:00"))) // 48h stale
    assert(freshness(cat) == Checks.Error(48L * 3600))
  }

  test("an empty source grades Error(Long.MaxValue) instead of throwing") {
    val cat = catalogWith(Nil)
    assert(freshness(cat) == Checks.Error(Long.MaxValue))
  }

  test("boundary: age exactly equal to the window does not trip it") {
    val cat = catalogWith(Seq(
      1L -> Timestamp.valueOf("2024-06-01 11:00:00"))) // exactly 1h
    assert(freshness(cat) == Checks.Pass())
  }
}
