package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  test("seq-pattern reduction equals the brute exists-ordered-triple " +
       "scan on sf0.001") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts").as("t"))
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(e => (e._2, e._3)).sortBy(_._2).toList).toMap
    val types = ev.values.flatten.map(_._1).toSet.toList
    // brute: a triple is supported for a user iff some strictly
    // increasing timestamp triple carries the types in order
    def supports(tl: List[(String, Long)], a: String, b: String,
                 c: String): Boolean =
      tl.exists { case (ta, t1) => ta == a &&
        tl.exists { case (tb, t2) => tb == b && t2 > t1 &&
          tl.exists { case (tc, t3) => tc == c && t3 > t2 } } }
    val brute = (for {
      a <- types; b <- types; c <- types
      n = ev.values.count(tl => supports(tl, a, b, c)) if n > 0
    } yield (a, b, c) -> n.toLong).toMap
    val got = graft.SparkEntry.queries("e_seq_patterns")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(got == brute)
  }

  test("markov removal attribution: sequential replay of the whole " +
       "protocol matches, shares sum to ~1, effects lie in [0,1]") {
    val sf = "/root/testdata/sf0.001"
    // sequential replay from the raw events, entirely independent code:
    // journeys split after each purchase; chain in the 2^20/2^40 integer
    // protocol; 30 absorption rounds with self-looped absorbers
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000,
        r.getString(3)))
    val trans = scala.collection.mutable.ArrayBuffer[(String, String)]()
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val tl = rows.sortBy(r => (r._3, r._2)).map(_._4)
      // journey boundaries: indexes after each purchase
      val journeys = tl.foldLeft(List(List.empty[String])) {
        case (acc, t) =>
          if (t == "purchase") Nil :: (acc.head :+ t) :: acc.tail
          else (acc.head :+ t) :: acc.tail
      }.reverse.filter(_.nonEmpty)
      journeys.foreach { j =>
        val states = "START" +: j.map {
          case "purchase" => "CONV"
          case t => t
        }
        val withEnd = if (j.last == "purchase") states else states :+ "NULL"
        withEnd.sliding(2).foreach {
          case Seq(a, b) => if (a != "CONV") trans += ((a, b))
          case _ => ()
        }
      }
    }
    val pairs = trans.groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }.toSeq
    val rowTot = pairs.groupBy(_._1).map { case (f, xs) => f -> xs.map(_._3).sum }
    val edges = pairs.map { case (f, t, n) => (f, t, n * 1048576L / rowTot(f)) } ++
      Seq(("CONV", "CONV", 1048576L), ("NULL", "NULL", 1048576L))
    def absorbed(removed: String): Long = {
      val e2 = edges.filter(_._1 != removed)
        .map { case (f, t, p) => (f, if (t == removed) "NULL" else t, p) }
      var m = Map("START" -> 1099511627776L)
      for (_ <- 1 to 30)
        m = e2.flatMap { case (f, t, p) => m.get(f).map(x => t -> x * p / 1048576L) }
          .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
      m.getOrElse("CONV", 0L)
    }
    val chans = edges.map(_._1).distinct
      .filterNot(Set("START", "CONV", "NULL")).sorted
    val pFull = absorbed("FULL")
    val want = chans.map(c => c -> (pFull, absorbed(c))).toMap
    val got = graft.SparkEntry.queries("e_attribution_markov")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, s"got $got want $want")
    val rows = graft.SparkEntry.queries("e_attribution_markov")(spark, sf)
      .collect()
    val shares = rows.map(_.getDouble(4))
    assert(math.abs(shares.sum - 1.0) < 1e-9, s"shares sum ${shares.sum}")
    rows.map(_.getDouble(3)).foreach(re => assert(re >= 0.0 && re <= 1.0))
  }

  test("shapley attribution: independent replay matches and efficiency " +
       "(sum of credits = v(all) - v(none)) holds exactly in the scaled " +
       "integers") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 +
          r.getTimestamp(2).getNanos / 1000 % 1000,
        r.getString(3)))
    val chans = ev.map(_._4).filter(_ != "purchase").distinct.sorted
    val bit = chans.zipWithIndex.toMap
    // journeys -> (touch mask, converted)
    val jours = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val tl = rows.sortBy(r => (r._3, r._2)).map(_._4)
      var mask = 0L
      var open = false
      tl.foreach { t =>
        if (t == "purchase") { jours += ((mask, 1)); mask = 0L; open = false }
        else { mask |= 1L << bit(t); open = true }
      }
      if (open) jours += ((mask, 0))
    }
    val v = jours.groupBy(_._1).map { case (m, xs) =>
      m -> xs.map(_._2).sum.toLong * 1000000L / xs.size
    }
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val k = chans.length
    val want = chans.map { ch =>
      val bv = 1L << bit(ch)
      ch -> (0L until (1L << k)).filter(m => (m & bv) == 0L).map { m =>
        val sz = java.lang.Long.bitCount(m)
        fact(sz) * fact(k - 1 - sz) *
          (v.getOrElse(m | bv, 0L) - v.getOrElse(m, 0L))
      }.sum
    }.toMap
    val got = graft.SparkEntry.queries("e_attribution_shapley")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"got $got want $want")
    // efficiency: sum of scaled credits telescopes to K!(v(C) - v(empty))
    val eff = fact(k) *
      (v.getOrElse((1L << k) - 1, 0L) - v.getOrElse(0L, 0L))
    assert(got.values.sum == eff, s"sum ${got.values.sum} != $eff")
  }

  test("cuped: integer moments replay exactly and the adjusted uplift " +
       "is the documented IEEE expression over them") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) 0.0 else r.getDouble(2)))
    val byUser = ev.groupBy(_._1).map { case (uid, rows) =>
      val x = rows.count(_._2 == "click").toLong
      val y = rows.filter(_._2 == "purchase")
        .map(r => math.round(r._3 * 100)).sum
      (uid % 2, x, y)
    }.toSeq
    val n = byUser.size.toLong
    val sx = byUser.map(_._2).sum; val sy = byUser.map(_._3).sum
    val sxy = byUser.map(r => r._2 * r._3).sum
    val sxx = byUser.map(r => r._2 * r._2).sum
    def side(v: Long) = byUser.filter(_._1 == v)
    val (n0, sx0, sy0) = (side(0).size.toLong, side(0).map(_._2).sum,
      side(0).map(_._3).sum)
    val (n1, sx1, sy1) = (side(1).size.toLong, side(1).map(_._2).sum,
      side(1).map(_._3).sum)
    val covNum = n * sxy - sx * sy
    val varNum = n * sxx - sx * sx
    val theta = covNum.toDouble / varNum.toDouble
    val rawUp = sy1.toDouble / n1 - sy0.toDouble / n0
    val cuped = rawUp - theta * (sx1.toDouble / n1 - sx0.toDouble / n0)
    val r = graft.SparkEntry.queries("e_ab_cuped")(spark, sf)
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == (n0, n1))
    assert((r.getLong(2), r.getLong(3)) == (covNum, varNum))
    assert(r.getDouble(4) == theta && r.getDouble(5) == rawUp &&
      r.getDouble(6) == cuped,
      s"${(r.getDouble(4), r.getDouble(5), r.getDouble(6))} vs " +
        s"${(theta, rawUp, cuped)}")
  }

  test("variant extraction: typed variant_get agrees with the string " +
       "JSON path row-for-row, missing paths are NULL everywhere") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("e_variant_extract")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val ev = graft.Tables.events(spark, sf)
    // every row's k extracted; no phantom '$.absent' values anywhere
    val perType = ev.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == perType(r.getString(0)), "n_k covers all rows")
      assert(r.getLong(5) == 0L, "missing path must count zero")
    }
    // row-level agreement between the variant path and get_json_object
    val disagree = ev.select(
        expr("variant_get(parse_json(props), '$.k', 'long')").as("v"),
        get_json_object(col("props"), "$.k").cast("long").as("j"))
      .filter(!(col("v") <=> col("j"))).count()
    assert(disagree == 0L)
  }

  test("conversion paths replay a driver-side first-purchase history " +
       "build: counts, ordering, and the top-10 cutoff all agree") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("t"), $"event_id",
        $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val fp = ev.filter(_._4 == "purchase").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2).min }
    val paths = ev.filter(e => fp.get(e._1).exists(e._2 < _))
      .groupBy(_._1).map { case (_, es) =>
        es.sortBy(e => (e._2, e._3)).map(_._4).mkString(">")
      }
    val expected = paths.groupBy(identity).map { case (p, v) =>
      (p, v.size.toLong) }.toSeq
      .sortBy { case (p, n) => (-n, p) }.take(10)
    val got = graft.SparkEntry.queries("e_conversion_paths")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected, s"\n$got\nvs\n$expected")
  }

  test("e_retention_weekly: k=0 retains the whole cohort, activity " +
       "never exceeds the cohort, and cohort sizes sum to all users") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("e_retention_weekly")(spark, sf)
      .select("cohort_week", "k", "n_cohort", "n_active", "retention_ppm")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val k0 = rows.filter(_._2 == 0L)
    assert(k0.nonEmpty && k0.forall(r => r._4 == r._3 && r._5 == 1000000L),
      "every user is active in their own first week")
    assert(rows.forall(r => r._4 <= r._3 && r._2 >= 0L))
    val users = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(k0.map(_._3).sum == users, "cohorts partition the user base")
  }

  test("feature lags: gaps are non-negative, the 7d rolling count " +
       "matches a sequential replay, and first events have null prev") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("e_feature_lags")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
    val raw = graft.Tables.events(spark, sf)
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime / 1000))
    val byUser = raw.groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._3, e._2))).toMap
    assert(rows.length == raw.length)
    rows.foreach { case (eid, uid, _, prev, gap, e7) =>
      val seq = byUser(uid)
      val idx = seq.indexWhere(_._2 == eid)
      assert((idx == 0) == prev.isEmpty && (idx == 0) == gap.isEmpty,
        s"event $eid idx $idx prev $prev")
      gap.foreach(g => assert(g >= 0, s"negative gap on $eid"))
      val t = seq(idx)._3
      val expected7d = seq.count(e => e._3 >= t - 604800 && e._3 <= t)
      assert(e7 == expected7d, s"event $eid: 7d $e7 vs $expected7d")
    }
  }
}
