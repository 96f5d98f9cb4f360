package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior contract for Mixing.btRatings (the MM-fit Bradley–Terry
  * solve behind mix_bt_ratings; the oracle CTE replays its integers,
  * this spec pins the model semantics the hash compare can't name).
  */
class BradleyTerrySpec extends SparkSpec {

  private def pairsDf(pairs: Seq[(String, String)]) = {
    import spark.implicits._
    pairs.toDF("w", "l")
  }

  test("a dominance chain orders the fitted strengths (A > B > C) and " +
       "wins/games account exactly") {
    val pairs =
      Seq.fill(9)(("A", "B")) ++ Seq.fill(1)(("B", "A")) ++
        Seq.fill(9)(("B", "C")) ++ Seq.fill(1)(("C", "B")) ++
        Seq.fill(9)(("A", "C")) ++ Seq.fill(1)(("C", "A"))
    val out = Mixing.btRatings(pairsDf(pairs), "w", "l").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (ra, wa, ga) = out("A")
    val (rb, wb, gb) = out("B")
    val (rc, wc, gc) = out("C")
    assert(ra > rb && rb > rc, s"ratings not ordered: $out")
    assert(wa == 18 && wb == 10 && wc == 2)
    assert(ga == 20 && gb == 20 && gc == 20)
  }

  test("a perfectly symmetric tournament fits flat ratings at the " +
       "normalization unit") {
    val pairs = Seq.fill(5)(("X", "Y")) ++ Seq.fill(5)(("Y", "X"))
    val out = Mixing.btRatings(pairsDf(pairs), "w", "l").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("X") == out("Y"))
    // K * unit split evenly: each sits at the 1e6 mean
    assert(out("X") == 1000000L)
  }

  test("ratings are bit-identical under repartitioning and row order") {
    val pairs =
      Seq.fill(7)(("A", "B")) ++ Seq.fill(3)(("B", "A")) ++
        Seq.fill(6)(("B", "C")) ++ Seq.fill(4)(("C", "B")) ++
        Seq.fill(8)(("C", "D")) ++ Seq.fill(2)(("D", "C")) ++
        Seq.fill(5)(("A", "D")) ++ Seq.fill(5)(("D", "A"))
    val base = Mixing.btRatings(pairsDf(pairs), "w", "l")
      .orderBy("player").collect().toSeq
    val shuffled = Mixing.btRatings(
      pairsDf(scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(pairs)).repartition(13), "w", "l")
      .orderBy("player").collect().toSeq
    assert(base == shuffled)
  }

  test("the normalized mean stays at the unit: sum(rating) ~= K * 1e6") {
    val pairs = Seq.fill(9)(("A", "B")) ++ Seq.fill(1)(("B", "A")) ++
      Seq.fill(2)(("C", "A")) ++ Seq.fill(8)(("A", "C"))
    val out = Mixing.btRatings(pairsDf(pairs), "w", "l").collect()
      .map(_.getLong(1))
    val tot = out.sum
    // floor divisions drop at most K units per round
    assert(math.abs(tot - 3000000L) <= 3 * 13,
      s"normalization drifted: $tot")
  }
}
