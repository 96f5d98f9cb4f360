package graft.olist

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** S1: seed CSV ingest, plus deterministic synthesis of the three seeds the
  * reference stripped as large blobs (reference: .MISSING_LARGE_BLOBS:5-10 —
  * customers, orders, order_items; the other three CSVs are present in
  * reference/seeds/).
  *
  * Ingest semantics mirror dbt's seed materialization (reference:
  * dbt/include/global_project/macros/materializations/seeds/seed.sql:12,27-34)
  * with the agate inference ladder replaced by declared schemas (Schemas.scala):
  *   - header row, quoted fields, empty string and literal "null" as NULL
  *     sentinels (agate_helper.py's ("null","") null set),
  *   - UTF-8 BOM tolerated (product_category_name_translation.csv:1 starts
  *     with one),
  *   - timestamps parsed as `%Y-%m-%d %H:%M:%S` in the session (UTC) zone.
  *
  * Synthesis is fully distributed and deterministic: rows are derived from
  * `spark.range` ids via hash/md5 expressions — no driver-side loops, no RNG
  * state, so the same ids appear at any partitioning and any scale.
  */
object Seeds {

  val referenceSeedsDir = "/root/reference/seeds"

  /** Read one seed CSV with its declared schema (S1). */
  def readCsv(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read
      .schema(Schemas.all(name))
      .option("header", "true")
      .option("nullValue", "")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(s"$dir/$name.csv")

  // --- deterministic synthesis of the stripped seeds -----------------------

  /** Stable 32-hex id in the style of Olist keys. */
  private def hexId(prefix: String, n: org.apache.spark.sql.Column) =
    md5(concat(lit(prefix), n.cast("string")))

  /** Pseudo-uniform double in [0,1) derived from a key — xxhash64 is a
    * stable 64-bit hash, so this is reproducible across runs/partitionings.
    */
  private def u01(c: org.apache.spark.sql.Column) =
    (pmod(xxhash64(c), lit(1000000L)).cast("double") / 1000000.0)

  def synthCustomers(spark: SparkSession, n: Long): DataFrame = {
    val cities = array(Seq("sao paulo", "rio de janeiro", "belo horizonte",
      "brasilia", "curitiba", "campinas", "porto alegre", "salvador")
      .map(lit): _*)
    val states = array(Seq("SP", "RJ", "MG", "DF", "PR", "SP", "RS", "BA")
      .map(lit): _*)
    spark.range(n).select(
      hexId("cust", col("id")).as("customer_id"),
      // ~20% of customers share a customer_unique_id with a neighbor
      // (repeat buyers in the real dataset).
      hexId("cuniq", (col("id") / 5).cast("long")).as("customer_unique_id"),
      lpad(pmod(col("id") * 37L, lit(100000L)).cast("string"), 5, "0")
        .as("customer_zip_code_prefix"),
      element_at(cities, pmod(col("id"), lit(8)).cast("int") + 1)
        .as("customer_city"),
      element_at(states, pmod(col("id"), lit(8)).cast("int") + 1)
        .as("customer_state"))
  }

  def synthOrders(spark: SparkSession, n: Long, nCustomers: Long): DataFrame = {
    val base = to_timestamp(lit("2017-01-01 00:00:00"))
    val purchased = timestamp_seconds(
      unix_timestamp(base) + pmod(xxhash64(col("id")), lit(86400L * 600)))
    spark.range(n).select(
      hexId("ord", col("id")).as("order_id"),
      // 1:1 orders->customers like the real dataset (customer_id is
      // per-order; customer_unique_id is the person).
      hexId("cust", pmod(col("id"), lit(nCustomers))).as("customer_id"),
      when(u01(concat(lit("st"), col("id"))) < 0.97, "delivered")
        .when(u01(concat(lit("st"), col("id"))) < 0.99, "shipped")
        .otherwise("canceled").as("order_status"),
      purchased.as("order_purchase_timestamp"),
      // ~5% never approved -> NULL (exercises the nullValue round-trip).
      when(u01(concat(lit("ap"), col("id"))) < 0.95,
        purchased + expr("INTERVAL 1 HOUR")).as("order_approved_at"),
      when(u01(concat(lit("ca"), col("id"))) < 0.9,
        purchased + expr("INTERVAL 2 DAYS"))
        .as("order_delivered_carrier_date"),
      when(u01(concat(lit("dl"), col("id"))) < 0.85,
        purchased + expr("INTERVAL 9 DAYS"))
        .as("order_delivered_customer_date"),
      (purchased + expr("INTERVAL 14 DAYS"))
        .as("order_estimated_delivery_date"))
  }

  /** Items: 1–4 per order for ~95% of orders; ~5% of orders have no items at
    * all (exercises fct_orders' NULL-revenue left-join path).
    */
  def synthOrderItems(spark: SparkSession, nOrders: Long): DataFrame = {
    val dec = DecimalType(12, 2)
    val withCount = spark.range(nOrders).select(
      col("id"),
      when(u01(concat(lit("ni"), col("id"))) < 0.05, 0)
        .otherwise(pmod(xxhash64(concat(lit("k"), col("id"))), lit(4)).cast("int") + 1)
        .as("n_items"))
    withCount
      .filter(col("n_items") > 0)
      .select(col("id"), explode(sequence(lit(1), col("n_items"))).as("order_item_id"))
      .select(
        hexId("ord", col("id")).as("order_id"),
        col("order_item_id"),
        hexId("prod", pmod(xxhash64(col("id"), col("order_item_id")), lit(3000L)))
          .as("product_id"),
        hexId("sell", pmod(xxhash64(col("order_item_id"), col("id")), lit(300L)))
          .as("seller_id"),
        timestamp_seconds(
          unix_timestamp(to_timestamp(lit("2017-01-05 00:00:00"))) +
            pmod(xxhash64(col("id")), lit(1000L)) * 3600L)
          .as("shipping_limit_date"),
        // 2-decimal prices in [5, 505); exact decimal end-to-end.
        ((floor(u01(concat(lit("pr"), col("id"), col("order_item_id"))) * 50000) / 100)
          .cast(dec) + lit(5).cast(dec)).as("price"),
        ((floor(u01(concat(lit("fr"), col("id"), col("order_item_id"))) * 5000) / 100)
          .cast(dec)).as("freight_value"))
  }

  /** Write the synthesized seeds as real CSVs (header, empty-string nulls)
    * and read them back through `readCsv`, so the missing tables exercise the
    * same S1 ingest path — null sentinels, quoting, timestamp parse — as the
    * three reference CSVs.
    */
  def synthesizeCsv(spark: SparkSession, dir: String,
                    nOrders: Long = 2000L): Unit = {
    val nCustomers = math.max(nOrders / 2, 1L)
    val out = Map(
      "olist_customers_dataset" -> synthCustomers(spark, nCustomers),
      "olist_orders_dataset" -> synthOrders(spark, nOrders, nCustomers),
      "olist_order_items_dataset" -> synthOrderItems(spark, nOrders))
    out.foreach { case (name, df) =>
      df.write.mode("overwrite")
        .option("header", "true")
        .option("nullValue", "")
        .option("emptyValue", "")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(s"$dir/$name.csv")
    }
  }
}
