package graft.olist

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** dbt exposures ([dbt]/contracts/graph/nodes.py Exposure;
  * graph/selector_methods.py ExposureSelectorMethod): downstream
  * consumers declared in the graph — the reference's real instance is
  * its two Power BI dashboards over fct_orders. Exposures are leaf
  * nodes: they materialize nothing, contribute dependency edges to
  * selection, and appear in manifest.json.
  */
class ExposureSpec extends SparkSpec {

  private def mkCat(exposures: Seq[Exposure]): Catalog = {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_exp").toString)
    new Catalog(spark, wh, Seq(
      Model("src_a", Nil, Materialization.Table,
        _ => Seq((1L, 2.0)).toDF("id", "x")),
      Model("stg_a", Seq("src_a"), Materialization.View,
        d => d("src_a").select(col("id"), col("x"))),
      Model("mart", Seq("stg_a"), Materialization.Table,
        d => d("stg_a").agg(sum("x").as("total"))),
      Model("other", Nil, Materialization.Table,
        _ => Seq(1L).toDF("id"))),
      exposures = exposures)
  }

  test("exposure: selects the dashboard's direct parents; +exposure: " +
       "selects its full runnable ancestry; other models stay out") {
    val cat = mkCat(Seq(
      Exposure("dash", "dashboard", "bi-team", Seq("mart"))))
    assert(cat.topo(Seq("exposure:dash"), withUpstream = false) == Seq("mart"))
    assert(cat.topo(Seq("+exposure:dash"), withUpstream = false) ==
      Seq("src_a", "stg_a", "mart"))
  }

  test("unknown exposure name and unknown dependency both fail like " +
       "dbt's node-not-found compile errors") {
    val cat = mkCat(Seq(
      Exposure("dash", "dashboard", "bi-team", Seq("mart"))))
    intercept[NoSuchElementException](
      cat.topo(Seq("exposure:nope"), withUpstream = false))
    intercept[NoSuchElementException](
      mkCat(Seq(Exposure("bad", "dashboard", "bi", Seq("missing_model")))))
  }

  test("manifest.json carries exposure nodes with type/owner/edges") {
    val cat = mkCat(Seq(
      Exposure("dash", "dashboard", "bi-team", Seq("mart", "other"),
        url = Some("https://bi.example/dash"), maturity = "high")))
    val path = Files.createTempDirectory("graft_expm").resolve("manifest.json")
    Artifacts.writeManifest(path.toString, cat)
    val json = Files.readString(path)
    assert(json.contains("\"exposure.dash\""), json)
    assert(json.contains("\"type\" : \"dashboard\""), json)
    assert(json.contains("\"owner\" : \"bi-team\""), json)
    assert(json.contains("\"model.mart\"") &&
      json.contains("\"model.other\""), json)
    assert(json.contains("https://bi.example/dash"), json)
  }

  test("the olist catalog registers the reference's two dashboards over " +
       "the mart") {
    val dir = Files.createTempDirectory("graft_expo").toString
    val cat = Models.catalog(spark, dir, synthDir = Some(s"$dir/_synth"))
    assert(cat.exposures.map(_.name).sorted ==
      Seq("orders_dashboard", "sp_analysis_dashboard"))
    // +exposure pulls the whole mart chain, seeds included
    val sel = cat.topo(Seq("+exposure:orders_dashboard"), withUpstream = false)
    assert(sel.last == "fct_orders" && sel.contains("stg_olist_orders"), sel)
  }
}
