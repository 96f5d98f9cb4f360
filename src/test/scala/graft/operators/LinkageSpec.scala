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
}
