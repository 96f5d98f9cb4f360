package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the range-partitioned distributed utilities added
  * this round: the skyline and the interval coalescer must be
  * indistinguishable from their quadratic/sequential reference
  * implementations on arbitrary inputs and partitionings — these are the
  * operators whose correctness depends on cross-partition carry logic,
  * exactly where a boundary bug would hide from fixture tests.
  */
class DistributedUtilPropertySpec extends SparkSpec {

  private def checkProp(prop: Prop, tests: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), prop)
    assert(res.passed, res.status.toString)
  }

  test("skylineMinMax == quadratic dominance filter on random point " +
       "sets, any partition count") {
    val genPts = for {
      pts <- Gen.nonEmptyListOf(for {
        c <- Gen.chooseNum(0L, 20L) // small domain -> many exact ties
        s <- Gen.chooseNum(0L, 20L)
      } yield (c, s))
      parts <- Gen.oneOf(1, 2, 5, 16)
    } yield (pts.zipWithIndex.map { case ((c, s), i) => (i.toLong, c, s) },
      parts)
    checkProp(Prop.forAll(genPts) { case (pts, parts) =>
      import spark.implicits._
      val brute = pts.filter { case (_, c, s) =>
        !pts.exists { case (_, c2, s2) =>
          c2 <= c && s2 >= s && (c2 < c || s2 > s) }
      }.map(_._1).toSet
      val got = Analytics.skylineMinMax(
          pts.toDF("id", "cents", "size").repartition(3),
          "cents", "size", numParts = parts)
        .select("id").as[Long].collect().toSet
      got == brute
    })
  }

  test("mergeIntervals == sequential sweep on random interval sets") {
    val genIvs = Gen.nonEmptyListOf(for {
      g <- Gen.oneOf("a", "b")
      lo <- Gen.chooseNum(0L, 50L)
      len <- Gen.chooseNum(0L, 10L)
    } yield (g, lo, lo + len))
    checkProp(Prop.forAll(genIvs) { ivs =>
      import spark.implicits._
      // sequential sweep reference: sort by lo, extend while overlapping
      def sweep(xs: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
        val sorted = xs.sorted
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long)]
        var (cs, ce, cn) = (sorted.head._1, sorted.head._2, 1L)
        sorted.tail.foreach { case (lo, hi) =>
          if (lo > ce) { out += ((cs, ce, cn)); cs = lo; ce = hi; cn = 1 }
          else { ce = math.max(ce, hi); cn += 1 }
        }
        out += ((cs, ce, cn))
        out.toSeq
      }
      val expect = ivs.groupBy(_._1).flatMap { case (g, rows) =>
        sweep(rows.map(r => (r._2, r._3))).map {
          case (lo, hi, n) => (g, lo, hi, n) }
      }.toSet
      val df = ivs.zipWithIndex
        .map { case ((g, lo, hi), i) => (g, lo, hi, i.toLong) }
        .toDF("g", "lo", "hi", "id").repartition(4)
      val got = Ranges.mergeIntervals(df, Seq("g"), "lo", "hi", Seq("id"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      got == expect
    })
  }

  test("prefixSums == sequential running sums on random keyed counts, " +
       "any partition count") {
    val genRows = for {
      vals <- Gen.nonEmptyListOf(for {
        a <- Gen.chooseNum(-5L, 5L)
        b <- Gen.chooseNum(0L, 9L)
      } yield (a, b))
      parts <- Gen.oneOf(1, 2, 5, 16)
    } yield (vals.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong * 7 % 1000 * 1000 + i, a, b) }, parts) // unique keys
    checkProp(Prop.forAll(genRows) { case (rows, parts) =>
      import spark.implicits._
      val sorted = rows.sortBy(_._1)
      var (ca, cb) = (0L, 0L)
      val expect = sorted.map { case (k, a, b) =>
        ca += a; cb += b; (k, ca, cb)
      }.toSet
      val got = graft.llm.Mixing.prefixSums(
          rows.toDF("k", "a", "b").repartition(3),
          org.apache.spark.sql.functions.col("k"), Seq("a", "b"),
          numParts = parts)
        .select("k", "a_cum", "b_cum").as[(Long, Long, Long)]
        .collect().toSet
      got == expect
    })
  }
}
