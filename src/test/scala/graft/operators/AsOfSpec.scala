package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixture = {
    import spark.implicits._
    val trades = Seq(
      (1L, 100L, ts("2024-01-01 10:00:05")),
      (2L, 100L, ts("2024-01-01 10:00:10")),
      (3L, 100L, ts("2024-01-01 10:00:00")), // before any quote
      (4L, 200L, ts("2024-01-01 10:00:07")))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      (10L, 100L, ts("2024-01-01 10:00:03"), 1.0),
      (11L, 100L, ts("2024-01-01 10:00:05"), 2.0), // simultaneous w/ trade 1
      (12L, 100L, ts("2024-01-01 10:00:09"), 3.0),
      (13L, 200L, ts("2024-01-01 10:00:01"), 9.0))
      .toDF("quote_id", "sym", "ts", "px")
    (trades, quotes)
  }

  test("asof join picks the latest right row at-or-before each left time") {
    val (trades, quotes) = fixture
    val out = AsOf.asofJoin(trades, quotes, "sym", "ts", "ts", "quote_id")
      .orderBy("trade_id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[java.lang.Long]("r_quote_id"))
        .map(_.toLong)))
    assert(out.toSeq == Seq(
      1L -> Some(11L), // inclusive: simultaneous quote wins over the 10:00:03
      2L -> Some(12L),
      3L -> None,      // nothing before -> NULLs, row preserved
      4L -> Some(13L)))
  }

  test("row count is preserved and result is partition-invariant") {
    val (trades, quotes) = fixture
    val a = AsOf.asofJoin(trades, quotes, "sym", "ts", "ts", "quote_id")
    assert(a.count() == trades.count())
    val b = AsOf.asofJoin(trades.repartition(7), quotes.repartition(3),
      "sym", "ts", "ts", "quote_id")
    assert(a.orderBy("trade_id").collect().toSeq ==
      b.orderBy("trade_id").collect().toSeq)
  }

  test("plan is one keyed window, never a range-cartesian") {
    val (trades, quotes) = fixture
    val plan = AsOf.asofJoin(trades, quotes, "sym", "ts", "ts", "quote_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("a right row with NULL payload fields is matched atomically " +
       "(no torn rows mixing columns of different right rows)") {
    import spark.implicits._
    val l = Seq((1L, 5L, ts("2024-01-01 00:00:10"))).toDF("lid", "k", "ts")
    val r = Seq(
      (21L, 5L, ts("2024-01-01 00:00:01"), Some(1.5)),
      (22L, 5L, ts("2024-01-01 00:00:02"), None)) // latest row, NULL payload
      .toDF("rid", "k", "ts", "v")
    val out = AsOf.asofJoin(l, r, "k", "ts", "ts", "rid").head()
    assert(out.getAs[Long]("r_rid") == 22L)
    // the NULL travels with its row — NOT filled from the older row 21
    assert(out.isNullAt(out.fieldIndex("r_v")),
      s"torn row: r_v=${out.get(out.fieldIndex("r_v"))}")
  }

  test("simultaneous right rows resolve deterministically via tieBreak") {
    import spark.implicits._
    val l = Seq((1L, 5L, ts("2024-01-01 00:00:10"))).toDF("lid", "k", "ts")
    val r = Seq(
      (21L, 5L, ts("2024-01-01 00:00:10"), 1.0),
      (22L, 5L, ts("2024-01-01 00:00:10"), 2.0))
      .toDF("rid", "k", "ts", "v")
    val out = AsOf.asofJoin(l, r, "k", "ts", "ts", "rid").head()
    assert(out.getAs[Long]("r_rid") == 22L) // greatest tieBreak wins (last)
  }
}
