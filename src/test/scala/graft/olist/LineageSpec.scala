package graft.olist

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Column-level lineage from the analyzed plan: the olist graph's marts
  * must root every output column at exactly the upstream columns that
  * can influence it, and the walker must survive the plan shapes that
  * mint fresh attributes (aggregates, generate, expand, union).
  */
class LineageSpec extends SparkSpec {

  private lazy val cat = {
    // seeds must exist on disk: planSchema resolves seed models by
    // actually reading their CSV headers
    val wh = Files.createTempDirectory("graft_lineage_wh").toString
    val c = Models.catalog(spark, wh, synthDir = Some(s"$wh/_synth_seeds"))
    Pipeline.runAll(c, s"$wh/_synth_seeds", nOrders = 100L)
    c
  }

  test("fct_orders: joins, aggregates, and derived columns root at the " +
       "right staging columns") {
    val lin = cat.columnLineage("fct_orders")
    assert(lin("order_id") == Seq("stg_olist_orders.order_id"))
    assert(lin("customer_id") == Seq("stg_olist_orders.customer_id"))
    assert(lin("order_status") == Seq("stg_olist_orders.order_status"))
    assert(lin("city") == Seq("stg_olist_customers.city"))
    assert(lin("total_item_revenue") == Seq("stg_items.price"))
    assert(lin("total_shipping_revenue") == Seq("stg_items.shipping_cost"))
    // derived sum unions both inputs
    assert(lin("total_order_value") ==
      Seq("stg_items.price", "stg_items.shipping_cost"))
  }

  test("staging rename keeps provenance to the seed column") {
    val lin = cat.columnLineage("stg_olist_orders")
    assert(lin("purchased_at") ==
      Seq("olist_orders_dataset.order_purchase_timestamp"))
    assert(lin("order_id") == Seq("olist_orders_dataset.order_id"))
  }

  test("generate, expand and union plans keep provenance") {
    import spark.implicits._
    val a = Seq.empty[(Long, String)].toDF("id", "toks").as("ta")
    val exploded = a.select(col("id"), explode(split(col("toks"), " "))
      .as("tok"))
    val linG = Lineage.columnLineage(exploded.queryExecution.analyzed)
    assert(linG("tok") == Seq("ta.toks"))
    assert(linG("id") == Seq("ta.id"))

    val c = Seq.empty[(String, String, Long)].toDF("x", "y", "v").as("tc")
    val cubed = c.cube(col("x"), col("y")).agg(sum(col("v")).as("s"))
    val linC = Lineage.columnLineage(cubed.queryExecution.analyzed)
    assert(linC("x") == Seq("tc.x"))
    assert(linC("s") == Seq("tc.v"))

    val u1 = Seq.empty[(Long, Long)].toDF("k", "v").as("tu1")
    val u2 = Seq.empty[(Long, Long)].toDF("k", "w").as("tu2")
    val unioned = u1.union(u2)
    val linU = Lineage.columnLineage(unioned.queryExecution.analyzed)
    assert(linU("k") == Seq("tu1.k", "tu2.k"))
    assert(linU("v") == Seq("tu1.v", "tu2.w"))
  }

  test("manifest artifact carries per-column lineage") {
    val p = Files.createTempDirectory("graft_lineage_art")
      .resolve("manifest.json").toString
    Artifacts.writeManifest(p, cat)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(p)))
    val fct = root.get("nodes").get("model.fct_orders").get("columns")
    val tov = fct.get("total_order_value").get("lineage")
    assert(tov.size() == 2 &&
      tov.get(0).asText() == "stg_items.price" &&
      tov.get(1).asText() == "stg_items.shipping_cost", tov.toString)
  }
}
