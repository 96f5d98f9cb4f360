package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def customers(rows: (Long, String, Int, String)*) =
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment")

  test("transitive fuzzy matches collapse to one entity: A~B and B~C " +
       "link A,B,C even though dist(A,C) = 2") {
    val c = customers(
      (1L, "smith john", 7, "BUILDING"),
      (2L, "smith jahn", 7, "BUILDING"), // 1 sub from A
      (3L, "smith jahm", 7, "BUILDING"), // 1 sub from B, 2 from A
      (4L, "wholly other", 7, "BUILDING"))
    val out = Linkage.linkCustomers(c).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("blocking isolates: identical names in different blocks never link") {
    val c = customers(
      (1L, "same name", 1, "BUILDING"),
      (2L, "same name", 2, "BUILDING"), // other nation
      (3L, "same name", 1, "MACHINERY")) // other segment
    val out = Linkage.linkCustomers(c).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("singletons survive with themselves as entity id (left join, " +
       "not inner)") {
    val c = customers((10L, "only record", 3, "AUTOMOBILE"))
    val out = Linkage.linkCustomers(c).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((10L, 10L)))
  }

  test("golden record: oldest name, best balance, one row per entity") {
    val c = Seq(
      (1L, "smith john", 7, "BUILDING", 10.0),
      (2L, "smith jahn", 7, "BUILDING", 50.0), // links to 1
      (3L, "smith jahm", 7, "BUILDING", 30.0), // links to 2 -> entity 1
      (9L, "alone", 7, "MACHINERY", 5.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = Linkage.goldenRecords(c).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2),
        r.getDouble(3), r.getString(4))).toMap
    assert(out.keySet == Set(1L, 9L)) // one golden row per entity
    assert(out(1L) == ((3L, "smith john", 50.0, "BUILDING")),
      out(1L).toString) // oldest-record name, best balance
    assert(out(9L) == ((1L, "alone", 5.0, "MACHINERY")))
  }

  test("Fellegi-Sunter: weights sum per agreement pattern, graded " +
       "evidence surfaces a name-miss pair, sub-threshold pairs absent") {
    val c = Seq(
      (1L, "ann lee", 7, "BUILDING", 500.0),
      (2L, "ann lep", 7, "BUILDING", 450.0),   // name~, bal close, same sign
      (3L, "bo carver", 7, "BUILDING", 460.0), // name miss, bal close to 2
      (4L, "cy quartz", 7, "BUILDING", -9000.0)) // nothing close
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = Linkage.fellegiSunterPairs(c).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5))).toMap
    def w(m: Double, u: Double, agree: Boolean) =
      if (agree) math.log(m / u) else math.log((1 - m) / (1 - u))
    def score(gn: Boolean, gb: Boolean, gs: Boolean) =
      w(0.95, 0.001, gn) + w(0.7, 0.02, gb) + w(0.9, 0.5, gs)
    // (1,2): full agreement; (2,3) and (1,3): name miss but bal+sign agree
    assert(out((1L, 2L)) == ((1, 1, 1, score(gn = true, gb = true, gs = true))))
    assert(out((2L, 3L)) == ((0, 1, 1, score(gn = false, gb = true, gs = true))))
    assert(out((1L, 3L)) == ((0, 1, 1, score(gn = false, gb = true, gs = true))))
    // every pair with 4 fails the threshold (wrong sign, far balance)
    assert(!out.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("tableDiff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "v")
    val neu = Seq((2L, "b"), (3L, "CHANGED"), (4L, "d"))
      .toDF("k", "v")
    val out = Analytics.tableDiff(old, neu, "k", Seq("v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("deletion-neighborhood signatures find EVERY distance<=1 pair " +
       "across lengths (sub, insert, delete, exact dup), no block key") {
    val c = Seq(
      (1L, "abcd", 0, "X"), (2L, "abed", 1, "Y"),   // substitution
      (3L, "abd", 2, "Z"), (4L, "abcde", 3, "W"),   // delete / insert
      (5L, "abcd", 4, "V"),                         // exact duplicate
      (6L, "zzzz", 5, "U"), (7L, "wxyz", 6, "T"))   // far strings
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    val got = Linkage.editJoinBySignature(c).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference over all pairs — the oracle shape
    val names = Seq(1L -> "abcd", 2L -> "abed", 3L -> "abd",
      4L -> "abcde", 5L -> "abcd", 6L -> "zzzz", 7L -> "wxyz")
    val brute = (for {
      (ia, na) <- names; (ib, nb) <- names if ia < ib
      d = levenshteinRef(na, nb) if d <= 1
    } yield (ia, ib)).toSet
    assert(got == brute)
    assert(brute.contains((1L, 2L)) && brute.contains((1L, 3L)) &&
      brute.contains((1L, 4L)) && brute.contains((1L, 5L)))
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

}
