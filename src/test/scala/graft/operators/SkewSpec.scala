package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join is row-identical to the plain join on skewed data") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = (1L to 2000L)
      .map(i => (if (i % 10 == 0) i % 7 else 999L, i))
      .toDF("k", "row_id")
    val dim = Seq((999L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "label")
    val plain = fact.join(dim, Seq("k")).select("k", "row_id", "label")
    val salted = Skew.saltedJoin(fact, dim, "k", buckets = 8,
        saltBy = Seq("row_id"))
      .select("k", "row_id", "label")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("salt spreads the hot key over multiple shuffle partitions") {
    import spark.implicits._
    val fact = (1L to 1000L).map(i => (999L, i)).toDF("k", "row_id")
    val salts = fact.withColumn("s",
        pmod(xxhash64(col("row_id")), lit(8)).cast("int"))
      .groupBy("s").count().collect()
    assert(salts.length == 8, salts.mkString(","))
    // roughly even: no salt bucket holds more than a third of the rows
    assert(salts.forall(_.getLong(1) < 334))
  }
}
