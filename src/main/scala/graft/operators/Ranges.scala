package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — match every point to the intervals
  * containing it. Spark plans the naive `p >= lo AND p <= hi` join as a
  * broadcast-nested-loop/cartesian with a filter: O(points x intervals)
  * comparisons, dead at scale.
  *
  * This is the BINNED formulation: pick a bin width, explode each interval
  * to the bins it overlaps, bucket each point into its own bin, and
  * equi-join on the bin before verifying the exact predicate. A point and
  * an interval can only meet in the point's single bin, so the join emits
  * each true match EXACTLY once — no post-dedup — and the comparison count
  * drops to points x (intervals overlapping their bin). Bin width tunes
  * replication vs selectivity: ~the median interval length is the usual
  * sweet spot (intervals replicate ~2x, each point sees only its bin's
  * intervals).
  */
object Ranges {

  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                binWidth: Long): DataFrame = {
    require(binWidth > 0)
    def binOf(c: Column): Column = floor(c / binWidth).cast("long")
    val p = points.withColumn("__bin", binOf(col(pointCol)))
    val iv = intervals.withColumn("__bin",
      explode(sequence(binOf(col(loCol)), binOf(col(hiCol)))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join: all pairs (a, b) with a.lo <= b.hi AND
    * b.lo <= a.hi. Same binning idea, one extra subtlety: two intervals
    * can share SEVERAL bins, so each side explodes to its bins and a pair
    * is emitted only in the bin where the later-starting interval begins
    * (`bin == max(binOf(a.lo), binOf(b.lo))`) — every true overlap
    * appears in exactly that one bin, so no distinct pass is needed.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          loL: String, hiL: String,
                          loR: String, hiR: String,
                          binWidth: Long): DataFrame = {
    require(binWidth > 0)
    def binOf(c: Column): Column = floor(c / binWidth).cast("long")
    val l = left.withColumn("__bin",
      explode(sequence(binOf(col(loL)), binOf(col(hiL)))))
    val r = right.withColumn("__bin",
      explode(sequence(binOf(col(loR)), binOf(col(hiR)))))
    l.join(r, Seq("__bin"))
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .filter(col("__bin") === greatest(binOf(col(loL)), binOf(col(loR))))
      .drop("__bin")
  }

  /** Driver entry: lineitem prices matched into overlapping price bands
    * (width 2500, stride 2000 — adjacent bands overlap, so one price can
    * land in two bands, exercising true multi-match range semantics).
    * The oracle states the plain inequality join; the engine's binned
    * plan must produce the identical match set.
    */
  val ops: Seq[graft.Op] = Seq(
    graft.Op("r_range_join",
      """WITH bands AS (
        |  SELECT b.range AS band, CAST(b.range * 2000 AS DOUBLE) AS lo,
        |         CAST(b.range * 2000 + 2499 AS DOUBLE) AS hi
        |  FROM range(0, 30) b)
        |SELECT l_orderkey, l_linenumber, band
        |FROM lineitem, bands
        |WHERE l_extendedprice >= lo AND l_extendedprice <= hi""".stripMargin) { (s, d) =>
      // 30 constant rows: one partition at any scale — the default
      // 32-slice range layout costs a 32-task stage for 30 rows
      val bands = s.range(0, 30, 1, 1).select(
        col("id").as("band"),
        (col("id") * 2000).cast("double").as("lo"),
        (col("id") * 2000 + 2499).cast("double").as("hi"))
      rangeJoin(graft.Tables.lineitem(s, d), "l_extendedprice",
          bands, "lo", "hi", binWidth = 2000)
        .select(col("l_orderkey"), col("l_linenumber"), col("band"))
    },

    // Coalesce overlapping shipment windows [shipdate, shipdate +
    // quantity days] per (supplier, part) into busy-period islands —
    // classic gaps-and-islands with the new-island flag from a strict
    // prefix max over interval ends. One shuffle keyed by the group;
    // both windows share its (partition, order) spec, so Spark plans a
    // single sort. Days are epoch-day BIGINTs; the flag, island ids,
    // and bounds are all integer-exact.
    graft.Op("r_interval_merge",
      """WITH iv AS (
        |  SELECT l_suppkey, l_partkey,
        |         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS lo,
        |         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |           + CAST(l_quantity AS BIGINT) AS hi,
        |         l_orderkey, l_linenumber
        |  FROM lineitem),
        |flagged AS (
        |  SELECT *, CASE WHEN lo > max(hi) OVER (PARTITION BY l_suppkey, l_partkey
        |              ORDER BY lo, hi, l_orderkey, l_linenumber
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |            THEN 1 ELSE 0 END AS new_island
        |  FROM iv),
        |islands AS (
        |  SELECT *, CAST(sum(new_island) OVER (PARTITION BY l_suppkey, l_partkey
        |            ORDER BY lo, hi, l_orderkey, l_linenumber
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
        |  FROM flagged)
        |SELECT l_suppkey, l_partkey, min(lo) AS start_day,
        |       max(hi) AS end_day, count(*) AS n_lines
        |FROM islands GROUP BY l_suppkey, l_partkey, island""".stripMargin) {
      (s, d) =>
        val iv = graft.Tables.lineitem(s, d).select(
          col("l_suppkey"), col("l_partkey"),
          unix_date(to_date(col("l_shipdate"))).cast("long").as("lo"),
          (unix_date(to_date(col("l_shipdate"))).cast("long") +
            col("l_quantity").cast("long")).as("hi"),
          col("l_orderkey"), col("l_linenumber"))
        mergeIntervals(iv, Seq("l_suppkey", "l_partkey"), "lo", "hi",
          Seq("l_orderkey", "l_linenumber"))
    })

  /** Gaps-and-islands interval coalescing: merge overlapping (or
    * touching — `lo <= prev hi`) intervals within each group into
    * islands, returning one row per island with its bounds and member
    * count. `tiebreak` must complete a total order so the running flag
    * sum replays identically on any engine. Both windows share one
    * (partition, order) spec — a single shuffle + sort.
    */
  def mergeIntervals(iv: DataFrame, groupCols: Seq[String],
                     loCol: String, hiCol: String,
                     tiebreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = (Seq(loCol, hiCol) ++ tiebreak).map(col)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    val prevHi = max(col(hiCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv.withColumn("__new", when(col(loCol) > prevHi, 1).otherwise(0))
      .withColumn("__island", sum(col("__new")).over(running))
      .groupBy((groupCols.map(col) :+ col("__island")): _*)
      .agg(min(col(loCol)).as("start_day"), max(col(hiCol)).as("end_day"),
        count(lit(1)).as("n_lines"))
      .drop("__island")
  }
}
