package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for SURVEY §7.4's silent-divergence risks: NULL
  * propagation in decimal arithmetic (E1), left-join row preservation
  * (J1/J2), and NULL-FK admission in the relationships check. Uses raw
  * scalacheck (no scalatest bridge in the offline dependency set): each
  * property runs through `SCTest.check` with a fixed seed-independent
  * parameter set and must report `passed`.
  */
class ThreeValuedLogicSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val dec = DataTypes.createDecimalType(12, 2)

  private def checkProp(prop: Prop, tests: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), prop)
    assert(res.passed, res.status.toString)
  }

  private def moneyDf(rows: List[(Option[Long], Option[Long])]) = {
    val schema = StructType(Seq(
      StructField("a", dec, nullable = true),
      StructField("b", dec, nullable = true)))
    spark.createDataFrame(rows.map { case (a, b) =>
      Row(a.map(c => BigDecimal(c, 2).underlying).orNull,
          b.map(c => BigDecimal(c, 2).underlying).orNull)
    }.asJava, schema)
  }

  private val genMoney: Gen[Option[Long]] =
    Gen.frequency(
      3 -> Gen.chooseNum(0L, 100000L).map(Some(_)),
      1 -> Gen.const(None))

  test("E1: a + b is NULL iff either side is NULL; exact otherwise") {
    checkProp(Prop.forAll(Gen.nonEmptyListOf(Gen.zip(genMoney, genMoney))) {
      rows =>
        val got = moneyDf(rows)
          .select((col("a") + col("b")).as("s"))
          .collect()
          .map(r => Option(r.getDecimal(0)).map(BigDecimal(_)))
        val want = rows.map { case (a, b) =>
          for (x <- a; y <- b) yield BigDecimal(x, 2) + BigDecimal(y, 2) }
        got.toSeq == want
    })
  }

  test("J2: left join preserves exactly the left rows, unmatched get NULLs") {
    checkProp(Prop.forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(0L, 30L)),
      Gen.listOf(Gen.chooseNum(0L, 30L))) { (leftKeys, rightKeys) =>
      import spark.implicits._
      val l = leftKeys.toDF("k")
      val r = rightKeys.distinct.toDF("k").withColumn("v", col("k") * 2)
      val joined = l.join(r, Seq("k"), "left")
      val unmatched = leftKeys.toSet.diff(rightKeys.toSet)
      joined.count() == leftKeys.size &&
        joined.filter(col("v").isNull).count() ==
          leftKeys.count(unmatched.contains)
    }, tests = 10)
  }

  test("relationships: NULL FKs never fail the check, orphans always do") {
    checkProp(Prop.forAll(
      Gen.nonEmptyListOf(Gen.option(Gen.chooseNum(0L, 20L))),
      Gen.nonEmptyListOf(Gen.chooseNum(0L, 10L))) { (fks, pks) =>
      val childSchema = StructType(Seq(
        StructField("fk", LongType, nullable = true)))
      val child = spark.createDataFrame(
        fks.map(f => Row(f.map(Long.box).orNull)).asJava, childSchema)
      import spark.implicits._
      val parent = pks.distinct.toDF("pk")
      val failures = checks.Checks
        .relationships(child, "fk", parent, "pk").count()
      failures == fks.flatten.count(k => !pks.contains(k))
    }, tests = 10)
  }
}
