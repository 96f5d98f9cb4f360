package graft.operators

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("zvalue interleaves bits: a at even positions, b at odd") {
    import spark.implicits._
    val r = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zvalue(col("a"), col("b"), 3).as("z"))
      .collect().head.getLong(0)
    // a=101 -> bits 0,4 ; b=011 -> bits 1,3 : 1+2+8+16 = 27
    assert(r == 27L)
  }

  /** Per-file (min,max) spans of both keys for every parquet file in
    * `dir`, normalized by the global key ranges.
    */
  private def fileSpans(dir: String): Seq[(Double, Double)] = {
    val files = Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq
    val global = spark.read.parquet(dir)
      .agg(min("l_orderkey"), max("l_orderkey"),
        min("l_partkey"), max("l_partkey")).collect().head
    val (okRange, pkRange) = (
      (global.getLong(1) - global.getLong(0)).toDouble.max(1.0),
      (global.getLong(3) - global.getLong(2)).toDouble.max(1.0))
    files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_orderkey"), max("l_orderkey"),
          min("l_partkey"), max("l_partkey")).collect().head
      ((r.getLong(1) - r.getLong(0)) / okRange,
        (r.getLong(3) - r.getLong(2)) / pkRange)
    }
  }

  test("z-ordered layout bounds BOTH key spans per file; a single-column " +
       "sort leaves the other dimension unprunable") {
    val li = Tables.lineitem(spark, sf)
    val zdir = Files.createTempDirectory("zorder").toString
    val ldir = Files.createTempDirectory("linear").toString
    Layout.writeZOrdered(li, zdir, "l_orderkey", "l_partkey",
      rankBits = 10, numFiles = 16)
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(ldir)

    val zs = fileSpans(zdir)
    val ls = fileSpans(ldir)
    def meanPk(xs: Seq[(Double, Double)]) = xs.map(_._2).sum / xs.size
    // linear layout: every file's partkey span is ~the whole domain
    assert(meanPk(ls) > 0.8, s"linear partkey spans: ${ls.map(_._2)}")
    // z layout: partkey spans are bounded well below the domain, and
    // orderkey spans stay bounded too (the curve trades a little of one
    // dimension for a lot of the other)
    assert(meanPk(zs) < 0.5 * meanPk(ls), s"z partkey spans: ${zs.map(_._2)}")
    assert(zs.map(_._1).sum / zs.size < 0.6,
      s"z orderkey spans: ${zs.map(_._1)}")

    // File pruning on the NON-sort dimension: a partkey-selective,
    // orderkey-wide predicate. The linear (orderkey-sorted) layout can
    // never prune it — every file's partkey span is the domain — while
    // the z layout confines each partkey range to a strip of the curve.
    def overlapping(dir: String, pk: (Long, Long)) = {
      val files = Files.list(java.nio.file.Paths.get(dir)).toArray
        .map(_.toString).filter(_.endsWith(".parquet"))
      (files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min("l_partkey"), max("l_partkey")).collect().head
        r.getLong(0) <= pk._2 && r.getLong(1) >= pk._1
      }, files.length)
    }
    val (zHit, zn) = overlapping(zdir, (100L, 110L))
    val (lHit, ln) = overlapping(ldir, (100L, 110L))
    assert(lHit == ln, s"linear layout should never prune on partkey: " +
      s"$lHit of $ln")
    assert(zHit <= zn / 2, s"z layout should skip most files on a " +
      s"partkey strip: hit $zHit of $zn")
  }

  test("zOrdered plan is scale-shaped: no window, no single-partition " +
       "exchange — one range shuffle plus map-side rank/interleave") {
    val li = Tables.lineitem(spark, sf)
    val plan = Layout.zOrdered(li, "l_orderkey", "l_partkey",
      rankBits = 10, numFiles = 16).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.contains("rangepartitioning"), plan)
    assert(plan.contains("zorder_rank"), plan)
  }

  test("z-ordered write preserves content exactly") {
    val li = Tables.lineitem(spark, sf)
    val dir = Files.createTempDirectory("zorder_content").toString
    Layout.writeZOrdered(li, dir, "l_orderkey", "l_partkey")
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    assert(back.unionByName(li).distinct().count() ==
      li.distinct().count())
    assert(back.columns.sorted.toSeq == li.columns.sorted.toSeq)
  }

  test("RUNTIME read volume: a partkey-strip scan over the z layout " +
       "reads a fraction of the rows the linear layout must read") {
    // footer spans (above) promise skipping; task input metrics prove the
    // reader actually skipped — the difference between a pretty layout
    // and a fast one
    val li = Tables.lineitem(spark, sf)
    val zdir = Files.createTempDirectory("zorder_rt").toString
    val ldir = Files.createTempDirectory("linear_rt").toString
    Layout.writeZOrdered(li, zdir, "l_orderkey", "l_partkey",
      rankBits = 10, numFiles = 16)
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(ldir)
    def readRows(dir: String): Long = {
      val (_, m) = graft.Instrumentation.measure(spark) {
        spark.read.parquet(dir)
          .filter(col("l_partkey").between(100L, 110L)).count()
      }
      m.inputRecords
    }
    val zRead = readRows(zdir)
    val lRead = readRows(ldir)
    assert(lRead >= li.count(),
      s"linear layout cannot skip on partkey: read $lRead")
    assert(zRead * 2 < lRead,
      s"z layout should skip most row groups: read $zRead vs $lRead")
  }

  test("hilbertIndex: bijective over the grid and CONTINUOUS — every " +
       "consecutive pair of d values is an edge-adjacent cell (the " +
       "property Morton lacks)") {
    val bits = 5
    val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (Layout.hilbertIndex(x, y, bits), (x, y))
    val ds = cells.map(_._1)
    assert(ds.distinct.size == n * n, "d must be a bijection on the grid")
    assert(ds.min == 0L && ds.max == (n * n - 1))
    val byD = cells.sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve must step to an adjacent cell: ($x1,$y1)->($x2,$y2)")
    }
    // the first quadrant walk of the unit curve
    assert(Seq((0, 0), (0, 1), (1, 1), (1, 0))
      .map { case (x, y) => Layout.hilbertIndex(x, y, 1) } ==
      Seq(0L, 1L, 2L, 3L))
    // Morton breaks continuity at the very first seam (cell 1 -> 2 jumps
    // diagonally), proving the fixture distinguishes the curves
    val mortonJump = Seq((0, 0), (1, 0), (0, 1), (1, 1))
    assert(mortonJump.sliding(2).exists { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    })
  }

  test("RUNTIME bloom skipping: the point lookup reads a fraction of " +
       "the plain layout's rows and returns the identical answer") {
    val row = graft.SparkEntry.queries("layout_bloom_skip")(spark, sf)
      .head()
    val (nb, np) = (row.getAs[Long]("n_match_bloom"),
      row.getAs[Long]("n_match_plain"))
    assert(nb == np, "bloom filtering must never change the answer")
    assert(nb > 0, "the probe key must exist")
    val (rb, rp) = (row.getAs[Long]("rows_read_bloom"),
      row.getAs[Long]("rows_read_plain"))
    assert(rb * 4 < rp,
      s"bloom should skip most row groups: read $rb vs plain $rp")
  }
}
