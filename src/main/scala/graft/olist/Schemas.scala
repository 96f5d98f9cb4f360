package graft.olist

import org.apache.spark.sql.types._

/** Declared schemas for the nine Olist seed tables (S1).
  *
  * The reference infers these at seed-load time with agate's type ladder
  * (reference: dbt-env/.../dbt_common/clients/agate_helper.py:59-77) and then
  * relies on the inferred types implicitly — there are no explicit casts in
  * any model. We declare the schemas instead (SURVEY §7.4(1)): inference is
  * non-deterministic under data drift and silently numerifies digit-only zip
  * codes, dropping leading zeros unless the CSV happens to quote them
  * (reference: seeds/olist_sellers_dataset.csv:2 quotes them; the stripped
  * customers CSV per the public dataset does not). Zip codes are therefore
  * StringType by design — a documented deviation that strictly improves on
  * the reference.
  *
  * Money columns are DECIMAL(12,2): Snowflake NUMBER is exact decimal, and
  * exact decimals keep every downstream aggregate order-independent across
  * Spark partitionings (SURVEY §7.4(2)).
  */
object Schemas {

  /** reference: seeds/olist_products_dataset.csv header (9 cols). */
  val products: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("product_category_name", StringType),
    StructField("product_name_lenght", IntegerType),
    StructField("product_description_lenght", IntegerType),
    StructField("product_photos_qty", IntegerType),
    StructField("product_weight_g", IntegerType),
    StructField("product_length_cm", IntegerType),
    StructField("product_height_cm", IntegerType),
    StructField("product_width_cm", IntegerType)))

  /** reference: seeds/olist_sellers_dataset.csv header (4 cols). */
  val sellers: StructType = StructType(Seq(
    StructField("seller_id", StringType),
    StructField("seller_zip_code_prefix", StringType),
    StructField("seller_city", StringType),
    StructField("seller_state", StringType)))

  /** reference: seeds/product_category_name_translation.csv (2 cols, BOM). */
  val categoryTranslation: StructType = StructType(Seq(
    StructField("product_category_name", StringType),
    StructField("product_category_name_english", StringType)))

  /** Stripped seed (reference: .MISSING_LARGE_BLOBS); columns recovered from
    * models/staging/stg_olist_customers.sql:5-10 + the public Kaggle schema.
    */
  val customers: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("customer_unique_id", StringType),
    StructField("customer_zip_code_prefix", StringType),
    StructField("customer_city", StringType),
    StructField("customer_state", StringType)))

  /** Stripped seed; columns from models/staging/stg_olist_orders.sql:5-13. */
  val orders: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("customer_id", StringType),
    StructField("order_status", StringType),
    StructField("order_purchase_timestamp", TimestampType),
    StructField("order_approved_at", TimestampType),
    StructField("order_delivered_carrier_date", TimestampType),
    StructField("order_delivered_customer_date", TimestampType),
    StructField("order_estimated_delivery_date", TimestampType)))

  /** Stripped seed; columns from models/staging/stg_items.sql:5-10. */
  val orderItems: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("order_item_id", IntegerType),
    StructField("product_id", StringType),
    StructField("seller_id", StringType),
    StructField("shipping_limit_date", TimestampType),
    StructField("price", DecimalType(12, 2)),
    StructField("freight_value", DecimalType(12, 2))))

  /** seed name -> schema, for every table the pipeline can load. */
  val all: Map[String, StructType] = Map(
    "olist_products_dataset" -> products,
    "olist_sellers_dataset" -> sellers,
    "product_category_name_translation" -> categoryTranslation,
    "olist_customers_dataset" -> customers,
    "olist_orders_dataset" -> orders,
    "olist_order_items_dataset" -> orderItems)
}
