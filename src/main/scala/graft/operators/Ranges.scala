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
      val bands = s.range(0, 30).select(
        col("id").as("band"),
        (col("id") * 2000).cast("double").as("lo"),
        (col("id") * 2000 + 2499).cast("double").as("hi"))
      rangeJoin(graft.Tables.lineitem(s, d), "l_extendedprice",
          bands, "lo", "hi", binWidth = 2000)
        .select(col("l_orderkey"), col("l_linenumber"), col("band"))
    })
}
