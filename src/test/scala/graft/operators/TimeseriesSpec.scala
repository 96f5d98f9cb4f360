package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Timeseries ops + the skyline helper: hand-built fixtures where the
  * expected output is computable on paper, plus brute-force and
  * partitioning-invariance properties for the distributed skyline.
  */
class TimeseriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("gap-fill: every user's span is dense, LOCF never emits null, " +
       "observed days carry their own value") {
    val out = graft.SparkEntry.queries("ts_gapfill_locf")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getBoolean(3)))
    assert(out.nonEmpty)
    val byUser = out.groupBy(_._1)
    byUser.foreach { case (u, rows) =>
      val days = rows.map(_._2).sorted
      assert(days.head + days.length - 1 == days.last,
        s"user $u span has holes: ${days.mkString(",")}")
      assert(days.distinct.length == days.length, s"user $u duplicate days")
    }
    // a filled (unobserved) day equals the closest observed day before it
    byUser.foreach { case (u, rows) =>
      val sortedRows = rows.sortBy(_._2)
      var lastObserved = Double.NaN
      sortedRows.foreach { case (_, d, v, obs) =>
        if (obs) lastObserved = v
        else assert(v == lastObserved,
          s"user $u day $d carried $v, expected $lastObserved")
      }
    }
  }

  test("anomaly cells all exceed twice their (type, hour) mean; the flag " +
       "is a strict subset of the cell table") {
    val cells = graft.SparkEntry.queries("ts_anomaly_hours")(spark, sf)
      .collect()
    assert(cells.nonEmpty, "sf0.001 should still surface spikes")
    cells.foreach { r =>
      val (n, nd, tot) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n * nd > 2 * tot, s"flagged cell violates its own rule: $r")
      assert(n <= tot && nd >= 1)
    }
  }

  test("cumulative distinct users: final value per type equals the exact " +
       "count(distinct), curve is strictly increasing") {
    val rows = graft.SparkEntry.queries("ts_cum_distinct_users")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val truth = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (t, curve) =>
      val sortedCurve = curve.sortBy(_._2)
      assert(sortedCurve.last._4 == truth(t),
        s"type $t curve ends at ${sortedCurve.last._4}, truth ${truth(t)}")
      assert(sortedCurve.map(_._4).sliding(2).forall(p => p(0) < p(1)),
        s"type $t curve not strictly increasing")
      assert(sortedCurve.map(_._3).sum == truth(t))
    }
  }

  test("skyline matches the brute-force dominance check and is invariant " +
       "under partitioning and partition count") {
    import spark.implicits._
    // adversarial fixture: duplicated (price, size) points, price ties
    // with distinct sizes, and a strictly dominated chain
    val pts = Seq(
      (1L, 100L, 5L), (2L, 100L, 9L), (3L, 100L, 9L), (4L, 120L, 9L),
      (5L, 150L, 12L), (6L, 150L, 11L), (7L, 200L, 12L), (8L, 90L, 2L),
      (9L, 300L, 20L), (10L, 310L, 19L), (11L, 90L, 2L), (12L, 85L, 1L))
    val df = pts.toDF("id", "cents", "size")
    val brute = pts.filter { case (_, c, s) =>
      !pts.exists { case (_, c2, s2) =>
        c2 <= c && s2 >= s && (c2 < c || s2 > s) }
    }.map(_._1).toSet
    val got = Analytics.skylineMinMax(df, "cents", "size")
      .select("id").as[Long].collect().toSet
    assert(got == brute, s"skyline $got != brute $brute")
    for (parts <- Seq(1, 3, 16)) {
      val again = Analytics
        .skylineMinMax(df.repartition(7), "cents", "size", numParts = parts)
        .select("id").as[Long].collect().toSet
      assert(again == brute, s"parts=$parts gave $again")
    }
  }

  test("twap: closed-form weights on a crafted day; zero-span days " +
       "excluded; exact micros arithmetic") {
    import spark.implicits._
    // user 1 day 0: value 10.00 held 30s, then 20.00 held 10s, then a
    // final observation (zero weight) -> twap = (10*30 + 20*10)/40 = 12.5
    // user 2: single observation -> zero span -> excluded
    val base = 86400L * 1000000L // stay inside day 1 (epoch-day 1)
    val ev = Seq(
      (1L, 1L, base + 0L, 10.00, "view"),
      (2L, 1L, base + 30L * 1000000L, 20.00, "view"),
      (3L, 1L, base + 40L * 1000000L, 99.00, "view"),
      (4L, 2L, base + 5L * 1000000L, 50.00, "view"))
      .toDF("event_id", "user_id", "us", "value", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val dir = java.nio.file.Files.createTempDirectory("twap").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("ts_twap")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 1L, 12.5)), got.toSeq)
  }

  test("ab test: statistic is non-negative and finite, counts bounded") {
    val r = graft.SparkEntry.queries("e_ab_test")(spark,
      "/root/testdata/sf0.001").collect().head
    val (n0, c0, n1, c1, z2) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))
    assert(c0 >= 0 && c0 <= n0 && c1 >= 0 && c1 <= n1)
    assert(z2 >= 0.0 && !z2.isNaN && !z2.isInfinite)
  }

  test("ema, debounce, cusum: closed forms on crafted event streams") {
    import spark.implicits._
    val base = 86400L * 1000000L
    def ev(rows: (Long, Long, Long, Double, String)*) = {
      val dir = java.nio.file.Files.createTempDirectory("ts").toString
      rows.toDF("event_id", "user_id", "us", "value", "event_type")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // EMA over daily cents 1000, 2000, 3000:
    // (1000+2000)>>1 = 1500; (1500+3000)>>1 = 2250
    val emaDir = ev(
      (1L, 1L, base, 10.00, "view"),
      (2L, 1L, base + 86400L * 1000000L, 20.00, "view"),
      (3L, 1L, base + 2 * 86400L * 1000000L, 30.00, "view"))
    val ema = graft.SparkEntry.queries("ts_ema")(spark, emaDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ema.toSeq == Seq((1L, 3L, 2250L)), ema.toSeq)

    // debounce: events at t0, t0+1h, t0+7h for one (user, type):
    // the +1h event is suppressed (gap 1h <= 6h), the +7h event
    // survives (gap to PREVIOUS RAW event = 6h1m > 6h)
    val debDir = ev(
      (1L, 1L, base, 1.0, "click"),
      (2L, 1L, base + 3600L * 1000000L, 1.0, "click"),
      (3L, 1L, base + (7 * 3600L + 60L) * 1000000L, 1.0, "click"),
      (4L, 2L, base, 1.0, "click")) // other user unaffected
    val kept = graft.SparkEntry.queries("e_debounce")(spark, debDir)
      .collect().map(_.getLong(2)).toSet
    assert(kept == Set(1L, 3L, 4L), kept)

    // cusum: flat series with a level shift on the last 2 of 4 days
    // peaks (in magnitude) at the last pre-shift day
    val csDir = ev(
      (1L, 1L, base, 10.0, "view"),
      (2L, 1L, base + 86400L * 1000000L, 10.0, "view"),
      (3L, 1L, base + 2 * 86400L * 1000000L, 50.0, "view"),
      (4L, 1L, base + 3 * 86400L * 1000000L, 50.0, "view"))
    val cp = graft.SparkEntry.queries("ts_cusum_changepoint")(spark, csDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // daily cents 1000,1000,5000,5000; T=12000, D=4
    // dev*D-T: 4000-12000=-8000 each flat day -> cusum -8000,-16000,
    // then +8000 each shifted day -> -8000, 0; peak |.| at day 2
    assert(cp.toSeq == Seq(("view", 2L, -16000L)), cp.toSeq)
  }

  test("autocorr: perfect alternation scores r1 = -1 exactly under the " +
       "truncated mean; |r1| <= 1 on real data; session stats reconcile") {
    import spark.implicits._
    val base = 86400L * 1000000L
    // daily cents alternate 1000, 3000 over 4 days; truncated mean 2000
    // -> dv = -1000, +1000, ... ; num = -3e6, den = 4e6?? no:
    // dv: -1000,1000,-1000,1000; products dv*dvn = -1e6 x3 -> num=-3e6
    // den = 4e6 -> r1 = -0.75 exactly
    val ev = (0 until 4).map { i =>
      ((i + 1).toLong, 1L, base + i * 86400L * 1000000L,
        if (i % 2 == 0) 10.00 else 30.00, "view")
    }.toDF("event_id", "user_id", "us", "value", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val dir = java.nio.file.Files.createTempDirectory("ac").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.SparkEntry.queries("ts_autocorr")(spark, dir)
      .collect().head
    assert(r.getLong(0) == -3000000L && r.getLong(1) == 4000000L &&
      r.getDouble(2) == -0.75, r)
    val real = graft.SparkEntry.queries("ts_autocorr")(spark,
      "/root/testdata/sf0.001").collect().head.getDouble(2)
    assert(math.abs(real) <= 1.0)
    // session stats reconcile with sessionize: same session count and
    // total events per user
    val sf = "/root/testdata/sf0.001"
    val stats = graft.SparkEntry.queries("e_session_stats")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sess = graft.SparkEntry.queries("e_sessionize")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(stats.map(_._3).sum == sess.length)
    assert(stats.map(s => (s._1, s._2)).toSet ==
      sess.map(s => (s._1, s._2)).toSet)
  }

  test("skyline on sf0.001 part equals the quadratic reference") {
    import spark.implicits._
    val p = graft.Tables.part(spark, sf).select(col("p_partkey").as("id"),
      (col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("long").as("cents"),
      col("p_size").cast("long").as("size"))
    val pts = p.as[(Long, Long, Long)].collect()
    val brute = pts.filter { case (_, c, s) =>
      !pts.exists { case (_, c2, s2) =>
        c2 <= c && s2 >= s && (c2 < c || s2 > s) }
    }.map(_._1).toSet
    val got = Analytics.skylineMinMax(p, "cents", "size")
      .select("id").as[Long].collect().toSet
    assert(got == brute)
  }

  test("Holt fold equals the reference recurrence run per user in plain " +
       "Scala on sf0.001") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val daily = graft.Tables.events(spark, sf)
      .groupBy($"user_id", unix_date(to_date($"ts")).cast("long").as("day"))
      .agg(sum($"value".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    def holt(ys: List[Long]): (Long, Long) =
      ys.tail.foldLeft((ys.head, 0L)) { case ((l, b), y) =>
        val l2 = (y + l + b) >> 1
        (l2, (l2 - l + b) >> 1)
      }
    val got = graft.SparkEntry.queries("ts_holt_forecast")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("level"), r.getAs[Long]("trend"),
          r.getAs[Long]("fc7")))).toMap
    assert(got.keySet == daily.keySet)
    daily.foreach { case (u, ys) =>
      val (l, b) = holt(ys)
      assert(got(u) == ((l, b, l + 7 * b)), s"user $u")
    }
  }


  test("Kaplan-Meier risk sets and event counts match an independent " +
       "subject reconstruction on sf0.001") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts").as("t"))
      .as[(Long, String, Long)].collect()
    val tMax = ev.map(_._3).max
    val subjects = ev.filter(_._2 == "view").groupBy(_._1).toSeq.map {
      case (u, vs) =>
        val tv = vs.map(_._3).min
        val conv = ev.filter(e => e._1 == u && e._2 == "purchase" &&
          e._3 > tv).map(_._3)
        if (conv.nonEmpty) ((conv.min - tv) / 86400000000L, true)
        else ((tMax - tv) / 86400000000L, false)
    }
    val got = graft.SparkEntry.queries("ts_kaplan_meier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    var logS = 0.0
    got.foreach { case (t, nRisk, dEv) =>
      val expectedRisk = subjects.count(_._1 >= t)
      val expectedEv = subjects.count(s => s._1 == t && s._2)
      assert(nRisk == expectedRisk, s"n_risk at day $t")
      assert(dEv == expectedEv, s"d_events at day $t")
    }
    // survival curve is strictly decreasing in the log domain
    val ls = graft.SparkEntry.queries("ts_kaplan_meier")(spark, sf)
      .collect().map(_.getAs[Double]("log_surv"))
    assert(ls.sorted.reverse.sameElements(ls) && ls.forall(_ < 0.0))
  }

  test("ols trend: BIGINT moments replayed in plain Scala give the same " +
       "fit, and the closed-form line through a crafted exact series is " +
       "recovered bit-exactly") {
    val row = graft.SparkEntry.queries("ts_ols_trend")(spark, sf).head()
    // independent replay of the daily cells -> moments -> fit
    val daily = graft.Tables.events(spark, sf)
      .groupBy(unix_date(to_date(col("ts"))).cast("long").as("day"))
      .agg(sum(col("value").cast("decimal(18,2)") * 100).cast("long")
        .as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = daily.length.toLong
    val sx = daily.map(_._1).sum
    val sy = daily.map(_._2).sum
    val sxy = daily.map(p => p._1 * p._2).sum
    val sxx = daily.map(p => p._1 * p._1).sum
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("slope_num") == n * sxy - sx * sy)
    assert(row.getAs[Long]("slope_den") == n * sxx - sx * sx)
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(java.lang.Double.doubleToLongBits(
      row.getAs[Double]("slope_cents")) ==
      java.lang.Double.doubleToLongBits(slope))
    val intercept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
    assert(java.lang.Double.doubleToLongBits(
      row.getAs[Double]("intercept_cents")) ==
      java.lang.Double.doubleToLongBits(intercept))
  }

  test("holt-winters: the fixed-point recursion replayed in plain Scala " +
       "reproduces level, trend, and all 7 forecasts exactly") {
    val got = graft.SparkEntry.queries("ts_holt_winters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(got.length == 7)
    val cents = graft.Tables.events(spark, sf)
      .groupBy(unix_date(to_date(col("ts"))).cast("long").as("day"))
      .agg(sum(col("value").cast("decimal(18,2)") * 100).cast("long")
        .as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).map(_._2)
    assert(cents.length >= 14, "need two weekly cycles")
    var l = cents.take(7).sum / 7
    var b = 0L
    var ss = cents.take(7).map(_ - l)
    cents.drop(7).foreach { y =>
      val s0 = ss.head
      val l2 = (y - s0 + l + b) >> 1
      val b2 = (l2 - l + b) >> 1
      val s2 = (y - l2 + s0) >> 1
      l = l2; b = b2; ss = ss.tail :+ s2
    }
    got.foreach { case (h, level, trend, fc) =>
      assert(level == l && trend == b, s"state at h=$h")
      assert(fc == l + h * b + ss((h - 1).toInt), s"forecast h=$h")
    }
  }

  test("seasonal decomposition: components sum back to the series " +
       "exactly, the trend is the true centered average, and the " +
       "seasonal profile is centered") {
    val rows = graft.SparkEntry.queries("ts_stl_decompose")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(rows.nonEmpty)
    // exact additive identity in the fixed-point domain
    rows.foreach { case (day, cents, t, se, res) =>
      assert(t + se + res == cents * 1048576L, s"identity at $day")
    }
    // trend equals an independent centered 7-day average
    val daily = graft.Tables.events(spark, sf)
      .groupBy(unix_date(to_date(col("ts"))).cast("long").as("day"))
      .agg(sum(col("value").cast("decimal(18,2)") * 100).cast("long")
        .as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val byDay = daily.map(_._2)
    val dayIdx = daily.map(_._1).zipWithIndex.toMap
    rows.foreach { case (day, _, t, _, _) =>
      val i = dayIdx(day)
      val want = byDay.slice(i - 3, i + 4).sum * 1048576L / 7L
      assert(t == want, s"trend at $day: $t vs $want")
    }
    // the 7 distinct seasonal values sum to ~0 (within div truncation)
    val seas = rows.map(r => (r._1 % 7) -> r._4).distinct
    assert(seas.length == 7)
    assert(math.abs(seas.map(_._2).sum) <= 7L, s"seasonal sum ${seas.map(_._2).sum}")
  }

  test("theil-sen: selected middle pairs match a sequential pairwise-" +
       "slope median replay, and the median lies within the slope range") {
    val sf = "/root/testdata/sf0.001"
    val Array(row) = graft.SparkEntry.queries("ts_theil_sen")(spark, sf)
      .collect()
    // replay: daily cents series -> all pairwise slopes -> same ordering
    val daily = graft.Tables.events(spark, sf)
      .groupBy(unix_date(to_date(col("ts"))).cast("long").as("day"))
      .agg(sum(col("value").cast("decimal(18,2)") * 100).cast("long")
        .as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val pairs = for {
      i <- daily.indices; j <- daily.indices if daily(j)._1 > daily(i)._1
    } yield {
      val dy = daily(j)._2 - daily(i)._2
      val dx = daily(j)._1 - daily(i)._1
      (dy.toDouble / dx.toDouble, dy, dx, daily(i)._1)
    }
    val m = pairs.size.toLong
    assert(row.getLong(0) == daily.length.toLong && row.getLong(1) == m)
    val sorted = pairs.sortBy(p => (p._1, p._2, p._3, p._4))
    val lo = sorted(((m + 1) / 2 - 1).toInt)
    val hi = sorted((m / 2 + 1 - 1).toInt)
    assert((row.getLong(2), row.getLong(3)) == (lo._2, lo._3))
    assert((row.getLong(4), row.getLong(5)) == (hi._2, hi._3))
    assert(row.getDouble(6) == (lo._1 + hi._1) / 2)
    val slopes = pairs.map(_._1)
    assert(row.getDouble(6) >= slopes.min && row.getDouble(6) <= slopes.max)
  }

  test("granger: RSS values match an independent Gaussian-elimination " +
       "OLS replay, nest correctly, and F reconciles") {
    val sf = "/root/testdata/sf0.001"
    val Array(row) = graft.SparkEntry.queries("ts_granger")(spark, sf)
      .collect()
    val (n, rssR, rssU, cGain, f) = (row.getLong(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(rssU >= 0 && rssR >= rssU, "nested models: RSS_u <= RSS_r")
    assert(cGain == rssR - rssU)
    assert(f == cGain / (rssU / (n - 3).toDouble))
    // independent replay: collect the zero-filled daily series, fit both
    // models by Gaussian elimination with partial pivoting
    val ev = graft.Tables.events(spark, sf)
    def dailyOf(t: String, revenue: Boolean): Map[Long, Long] = {
      val f0 = ev.filter(col("event_type") === t)
      val df0 =
        if (revenue) f0.groupBy(unix_date(to_date(col("ts"))).cast("long")
            .as("d"))
          .agg(sum(col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("v"))
        else f0.groupBy(unix_date(to_date(col("ts"))).cast("long").as("d"))
          .agg(count(lit(1)).as("v"))
      df0.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val xs = dailyOf("click", revenue = false)
    val ys = dailyOf("purchase", revenue = true)
    val days = (xs.keySet ++ ys.keySet).toSeq.sorted
    val rowsT = days.sliding(2).collect { case Seq(p, c) if c == p + 1 =>
      (ys.getOrElse(c, 0L).toDouble, ys.getOrElse(p, 0L).toDouble,
        xs.getOrElse(p, 0L).toDouble)
    }.toSeq
    // the engine keeps every lagged row (lag over the day SEQUENCE, not
    // the calendar): rebuild identically — consecutive positions in the
    // sorted day list, gap or not
    val rows2 = days.sliding(2).collect { case Seq(p, c) =>
      (ys.getOrElse(c, 0L).toDouble, ys.getOrElse(p, 0L).toDouble,
        xs.getOrElse(p, 0L).toDouble)
    }.toSeq
    val data = if (rows2.size.toLong == n) rows2 else rowsT
    assert(data.size.toLong == n)
    def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
      val m = b0.length
      val a = a0.map(_.clone); val b = b0.clone
      for (i <- 0 until m) {
        val p = (i until m).maxBy(r => math.abs(a(r)(i)))
        val (ta, tb) = (a(i), b(i)); a(i) = a(p); a(p) = ta
        b(i) = b(p); b(p) = tb
        for (r <- i + 1 until m) {
          val fct = a(r)(i) / a(i)(i)
          for (cI <- i until m) a(r)(cI) -= fct * a(i)(cI)
          b(r) -= fct * b(i)
        }
      }
      val x = new Array[Double](m)
      for (i <- m - 1 to 0 by -1) {
        var s = b(i)
        for (j <- i + 1 until m) s -= a(i)(j) * x(j)
        x(i) = s / a(i)(i)
      }
      x
    }
    def rssOf(useX: Boolean): Double = {
      val feats = data.map { case (_, yl, xl) =>
        if (useX) Array(1.0, yl, xl) else Array(1.0, yl) }
      val ts = data.map(_._1)
      val m = feats.head.length
      val ata = Array.tabulate(m, m)((i, j) =>
        feats.zip(ts).map { case (fr, _) => fr(i) * fr(j) }.sum)
      val atb = Array.tabulate(m)(i =>
        feats.zip(ts).map { case (fr, t) => fr(i) * t }.sum)
      val beta = solve(ata, atb)
      feats.zip(ts).map { case (fr, t) =>
        val e = t - fr.zip(beta).map { case (u, v) => u * v }.sum
        e * e
      }.sum
    }
    assert(math.abs(rssOf(useX = false) - rssR) <= 1e-6 * rssR)
    assert(math.abs(rssOf(useX = true) - rssU) <= 1e-6 * math.max(rssU, 1.0))
  }

  test("cross-correlation: per-lag numerators match a sequential replay " +
       "of the zero-filled series, and lag 0 covers every day") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("ts_cross_corr")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 7L))
    val ev = graft.Tables.events(spark, sf)
    val xs = ev.filter(col("event_type") === "click")
      .selectExpr("unix_date(CAST(ts AS DATE))").collect()
      .groupBy(_.getInt(0).toLong).view.mapValues(_.length.toLong).toMap
    val ys = ev.filter(col("event_type") === "purchase")
      .selectExpr("unix_date(CAST(ts AS DATE))",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").collect()
      .groupBy(_.getInt(0).toLong).view
      .mapValues(_.map(_.getLong(1)).sum).toMap
    val days = (xs.keySet ++ ys.keySet).toSeq.sorted
    val nd = days.length.toLong
    val tx = xs.values.sum; val ty = ys.values.sum
    val dx = days.map(d => d -> (xs.getOrElse(d, 0L) -
      Math.floorDiv(tx, nd))).toMap
    val dy = days.map(d => d -> (ys.getOrElse(d, 0L) -
      Math.floorDiv(ty, nd))).toMap
    val sxx = dx.values.map(v => v * v).sum
    val syy = dy.values.map(v => v * v).sum
    rows.foreach { case (lag, nOv, num, oSxx, oSyy, r) =>
      val hits = days.filter(d => dy.contains(d + lag))
      assert(nOv == hits.length.toLong, s"lag $lag overlap")
      val expNum = hits.map(d => dx(d) * dy(d + lag)).sum
      assert(num == expNum, s"lag $lag numerator")
      assert(oSxx == sxx && oSyy == syy)
      assert(r == num.toDouble / math.sqrt(sxx.toDouble * syy.toDouble))
    }
    assert(rows.head._2 == nd)
  }

  test("CUSUM changepoint replays the sequential argmax of |n*P_t - " +
       "t*T| and a synthetic step lands exactly on the shift day") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // sequential replay on the real daily series
    val daily = graft.Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("d"))
      .agg(sum($"value".cast("decimal(18,2)") * 100).cast("long")
        .as("cents"))
      .select(datediff($"d", lit("1970-01-01").cast("date")).cast("long"),
        $"cents")
      .as[(Long, Long)].collect().sortBy(_._1)
    val n = daily.length.toLong
    val total = daily.map(_._2).sum
    var pre = 0L
    val ds = daily.zipWithIndex.dropRight(1).map { case ((day, c), i) =>
      pre += c
      (day, i + 1L, pre, (n * pre - (i + 1L) * total).abs)
    }
    val best = ds.maxBy(x => (x._4, -x._1))
    val row = graft.SparkEntry.queries("ts_level_shift")(spark, sf)
      .collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == best._1, "changepoint day")
    assert(row.getLong(2) == best._4, "cleared deviation")
    assert(row.getDouble(3) == best._3.toDouble / best._2.toDouble)
    assert(row.getDouble(4) ==
      (total - best._3).toDouble / (n - best._2).toDouble)
    // synthetic step: level 100 for 10 days then 200 for 10 days -> the
    // cleared CUSUM peaks exactly at the last low day
    val step = (1L to 20L).map(d => (d, if (d <= 10) 100L else 200L))
    val st = step.map(_._2).sum
    val peaks = step.dropRight(1).scanLeft((0L, 0L, 0L)) {
      case ((_, t, p), (d, c)) => (d, t + 1, p + c)
    }.drop(1).map { case (d, t, p) => (d, (20L * p - t * st).abs) }
    assert(peaks.maxBy(x => (x._2, -x._1))._1 == 10L)
  }

  test("gapfill interpolation: observed days pass through, gaps ramp " +
       "monotonically between their neighbors, and spans match LOCF's") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("ts_gapfill_interp")(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    val locf = graft.SparkEntry.queries("ts_gapfill_locf")(spark, sf)
      .select($"user_id", $"day").as[(Long, Long)].collect().toSet
    assert(rows.map(r => (r._1, r._2)).toSet == locf,
      "interp and LOCF fill the identical calendar")
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val seq = rs.sortBy(_._2)
      assert(seq.head._4 && seq.last._4, "span edges are observed")
      // between consecutive observed days, the fill is sandwiched
      val obsIdx = seq.indices.filter(seq(_)._4)
      obsIdx.zip(obsIdx.tail).foreach { case (i, j) =>
        val (lo, hi) = (math.min(seq(i)._3, seq(j)._3),
          math.max(seq(i)._3, seq(j)._3))
        (i + 1 until j).foreach { m =>
          assert(seq(m)._3 >= lo - 1 && seq(m)._3 <= hi,
            s"fill ${seq(m)} escapes [$lo,$hi]")
        }
      }
    }
  }


  test("pacf: Durbin-Levinson matches an independent JVM replay exactly") {
    import spark.implicits._
    val ts0 = java.time.LocalDate.of(2024, 1, 1)
    // one event per day -> daily cents = 100 * value
    val values = Seq(3.0, 7.0, 2.0, 9.0, 4.0, 8.0, 1.0, 6.0, 5.0, 10.0)
    val events = values.zipWithIndex.map { case (v, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(
        ts0.plusDays(i).atStartOfDay()), 1L, "t", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val row = Timeseries.pacf(events).collect()(0)
    assert(row.getLong(0) == values.length.toLong)

    // independent replay: exact integer autocovariances, then DL
    val cents = values.map(v => BigInt(math.round(v * 100)))
    val n = cents.length
    val mean = cents.sum / n // integer truncation, as the operator defines
    val dv = cents.map(_ - mean)
    def c(k: Int): BigInt =
      (0 until n - k).map(t => dv(t) * dv(t + k)).sum
    val r = (1 to 4).map(k =>
      BigDecimal(c(k)).toDouble / BigDecimal(c(0)).toDouble)
    val (r1, r2, r3, r4) = (r(0), r(1), r(2), r(3))
    val pacf1 = r1
    val v1 = 1.0 - r1 * r1
    val pacf2 = (r2 - r1 * r1) / v1
    val phi21 = r1 - pacf2 * r1
    val v2 = v1 * (1.0 - pacf2 * pacf2)
    val pacf3 = (r3 - (phi21 * r2 + pacf2 * r1)) / v2
    val phi31 = phi21 - pacf3 * pacf2
    val phi32 = pacf2 - pacf3 * phi21
    val v3 = v2 * (1.0 - pacf3 * pacf3)
    val pacf4 = (r4 - ((phi31 * r3 + phi32 * r2) + pacf3 * r1)) / v3

    assert(row.getDouble(1) == r1 && row.getDouble(2) == r2 &&
      row.getDouble(3) == r3 && row.getDouble(4) == r4)
    assert(row.getDouble(5) == pacf1 && row.getDouble(6) == pacf2 &&
      row.getDouble(7) == pacf3 && row.getDouble(8) == pacf4)
  }

  test("pacf: a sub-5-point series yields NULL high lags, no crash") {
    import spark.implicits._
    val events = (0 until 3).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-0${i + 1}%d 00:00:00"),
        1L, "t", 1.0 + i, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val row = Timeseries.pacf(events).collect()(0)
    assert(row.getLong(0) == 3L)
    assert(row.isNullAt(3) && row.isNullAt(4), "r3/r4 null on 3 points")
  }
}
