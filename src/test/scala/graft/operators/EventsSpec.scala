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
}
