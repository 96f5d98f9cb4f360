package graft.operators

import graft.SparkSpec

class CollectionsSpec extends SparkSpec {

  test("approx_count_distinct (rsd=1%) is within 3% of exact") {
    val row = graft.SparkEntry.queries("f_approx_distinct")(
      spark, "/root/testdata/sf0.01").head()
    val approx = row.getLong(0).toDouble
    val exact = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.03,
      s"approx=$approx exact=$exact")
  }
}
