package graft.olist

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** dbt unit tests: build ONE model from fixture inputs and diff the result
  * against expected rows (dbt's unit-test materialization; the compare is
  * the labeled except-both-ways of
  * [dbt]/include/global_project/macros/materializations/tests/helpers.sql:23-44
  * — `select 'actual' ... except expected UNION ALL select 'expected' ...
  * except actual`).
  *
  * Unlike the data tests in graft.checks (which validate BUILT relations),
  * a unit test validates the model's LOGIC in isolation: `given` supplies a
  * fixture DataFrame per dependency, the model's build function runs over
  * exactly those, and `expect` pins the complete output. Because builds
  * are functions of resolved deps (Model.build), no warehouse, seed, or
  * upstream model is touched — fixture-sized Spark jobs, instant at any
  * project scale.
  */
object UnitTests {

  final case class UnitTest(
      name: String,
      model: String,
      given: Map[String, DataFrame],
      expect: DataFrame)

  final case class UnitTestResult(name: String, passed: Boolean,
                                  diff: DataFrame)

  /** Bag-semantics two-way diff on the EXPECTED columns (dbt compares the
    * columns the fixture pins; extra model outputs are ignored), labeled
    * by provenance like the reference macro. Empty = pass. `exceptAll`
    * keeps duplicate multiplicities — `except`'s set semantics would pass
    * a model that wrongly duplicates rows.
    */
  def diff(actual: DataFrame, expected: DataFrame): DataFrame = {
    val missing = expected.columns.filterNot(actual.columns.contains)
    require(missing.isEmpty,
      s"expected columns ${missing.mkString(", ")} absent from model output " +
        s"(model produced: ${actual.columns.mkString(", ")})")
    val a = actual.select(expected.columns.map(col).toSeq: _*)
    a.exceptAll(expected).withColumn("__which", lit("actual_not_expected"))
      .unionByName(
        expected.exceptAll(a).withColumn("__which", lit("expected_not_actual")))
  }

  /** Run one unit test against a catalog's registered model. Every
    * dependency must have a fixture — a unit test that silently read a
    * real relation would not be a unit test.
    */
  def run(cat: Catalog, test: UnitTest): UnitTestResult = {
    val m = cat.model(test.model)
    val missing = m.deps.filterNot(test.given.contains)
    require(missing.isEmpty,
      s"unit test '${test.name}' missing fixtures for: ${missing.mkString(", ")}")
    val d = diff(m.build(test.given), test.expect)
    UnitTestResult(test.name, d.isEmpty, d)
  }

  def runAll(cat: Catalog, tests: Seq[UnitTest]): Seq[UnitTestResult] =
    tests.map(run(cat, _))
}
