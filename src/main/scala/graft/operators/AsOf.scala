package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the LATEST right row of the same key
  * with right time <= left time (classic market-data / event-enrichment
  * semantics; kdb's aj, DuckDB's ASOF JOIN). Spark has no native operator
  * for it, and the naive formulations die at scale: a range-predicate
  * join plans as a per-key cartesian (O(n·m) pairs verified), and a
  * per-left-row subquery is not expressible distributively at all.
  *
  * This is the union + carry-forward formulation — the composition-first
  * rung of the custom-operator ladder, and the shape that scales:
  * interleave both sides into one frame tagged by side, sort each key's
  * timeline once, and propagate the last seen right ROW forward — packed
  * into a single struct column carried by one `last(_, ignoreNulls)` over
  * a running window, so a right row with NULL payload fields is still
  * matched atomically (per-column carry would tear rows). ONE shuffle +
  * sort on
  * the join key total, O(1) state per row, no pair blowup; ties at equal
  * time resolve right-before-left (inclusive <=) and then by `tieBreak`
  * among simultaneous right rows, making the result fully deterministic.
  *
  * Output: every left row (row count preserved, like a left join) plus
  * `<prefix><rightCol>` columns, NULL where no right row precedes.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               tieBreak: String, prefix: String = "r_"): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val rCols = right.columns.filterNot(_ == key).toSeq
    require(rCols.contains(tieBreak), s"tieBreak '$tieBreak' not in right side")
    // The right payload travels as ONE struct column carried by ONE
    // last(ignoreNulls): the matched right row arrives atomically. Carrying
    // each payload column independently would mix columns from different
    // right rows whenever a payload field is NULL (the newer row's NULL
    // field would be "filled" from an older row — a torn row).
    val rStruct = StructType(
      rCols.map(c => StructField(c, right.schema(c).dataType)))
    // __tb snapshots the right-side tie-break for the window ORDER BY.
    val lPart = left
      .select(left.columns.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(right.schema(tieBreak).dataType).as("__tb"),
        lit(null).cast(rStruct).as("__r")): _*)
    val rPart = right
      .select(left.columns.toSeq.map {
        case c if c == key => col(key)
        case c => lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        col(tieBreak).as("__tb"),
        struct(rCols.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lPart.unionByName(rPart)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        rCols.map(c => col("__r").getField(c).as(s"$prefix$c")): _*)
  }

  /** Driver entry: every event enriched with the user's latest
    * prior-or-simultaneous click. The oracle replays the union +
    * carry-forward-window formulation itself (portable ANSI window SQL,
    * same tie-breaks), so the as-of semantics are hash-checked
    * end-to-end rather than trusted to a dialect's native ASOF JOIN,
    * whose tie rules differ across engines.
    */
  val ops: Seq[graft.Op] = Seq(
    graft.Op("e_asof_join",
      """WITH l AS (SELECT event_id, user_id, ts FROM events),
        |r AS (SELECT user_id, event_id, ts, value FROM events
        |      WHERE event_type = 'click'),
        |u AS (
        |  SELECT event_id, user_id, ts, ts AS t, 1 AS side,
        |         CAST(NULL AS BIGINT) AS tb,
        |         CAST(NULL AS STRUCT(event_id BIGINT, ts TIMESTAMP,
        |                             "value" DOUBLE)) AS rrow
        |  FROM l
        |  UNION ALL
        |  SELECT CAST(NULL AS BIGINT), user_id, CAST(NULL AS TIMESTAMP),
        |         ts, 0, event_id,
        |         struct_pack(event_id := event_id, ts := ts, value := value)
        |  FROM r),
        |c AS (
        |  SELECT event_id, user_id, ts, side,
        |         last_value(rrow IGNORE NULLS) OVER w AS rrow
        |  FROM u
        |  WINDOW w AS (
        |    PARTITION BY user_id
        |    ORDER BY t ASC, side ASC, tb ASC NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |       struct_extract(rrow, 'event_id') AS r_event_id,
        |       epoch_us(struct_extract(rrow, 'ts')) AS r_ts_us,
        |       struct_extract(rrow, 'value') AS r_value
        |FROM c WHERE side = 1""".stripMargin) { (s, d) =>
      val ev = graft.Tables.events(s, d)
      val l = ev.select(col("event_id"), col("user_id"), col("ts"))
      val r = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      // timestamps presented as epoch micros: pandas reads Spark parquet
      // as ns resolution and DuckDB as us, which fails the dtype-agnostic
      // frame compare even when the instants are identical
      asofJoin(l, r, "user_id", "ts", "ts", tieBreak = "event_id")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("r_event_id"), unix_micros(col("r_ts")).as("r_ts_us"),
          col("r_value"))
    })
}
