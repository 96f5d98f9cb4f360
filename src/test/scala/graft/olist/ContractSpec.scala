package graft.olist

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Model contracts: a `contract: enforced` model whose built schema drifts
  * from the declaration must fail BEFORE writing (missing, extra, or
  * retyped columns), pass when the schema matches regardless of column
  * order, and gate its downstream subtree in `build` like any node error.
  */
class ContractSpec extends SparkSpec {

  private val declared = StructType(Seq(
    StructField("id", LongType),
    StructField("amount", DoubleType)))

  private def cat(build: Map[String, DataFrame] => DataFrame,
                  wh: String): Catalog =
    new Catalog(spark, new Warehouse(spark, wh), Seq(
      Model("priced", Nil, Materialization.Table, build,
        contract = Some(declared)),
      Model("consumer", Seq("priced"), Materialization.Table,
        (d: Map[String, DataFrame]) => d("priced"))))

  test("a conforming build passes, column order ignored") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_contract").toString
    val c = cat(_ => Seq((1.5, 1L)).toDF("amount", "id"), wh)
    c.run(Seq("priced"))
    assert(c.warehouse.exists("priced"))
  }

  test("a missing column fails the node before anything is written") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_contract2").toString
    val c = cat(_ => Seq(1L).toDF("id"), wh)
    val e = intercept[Contracts.Violation] { c.run(Seq("priced")) }
    assert(e.getMessage.contains("missing: amount"), e.getMessage)
    assert(!c.warehouse.exists("priced"))
  }

  test("an extra column and a retyped column are both named in the error") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_contract3").toString
    val c = cat(
      _ => Seq((1L, 1, "x")).toDF("id", "amount", "note"), wh)
    val e = intercept[Contracts.Violation] { c.run(Seq("priced")) }
    assert(e.getMessage.contains("unexpected: note"), e.getMessage)
    assert(e.getMessage.contains("amount: declared double, built int"),
      e.getMessage)
  }

  test("a contract violation gates the downstream subtree in build") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_contract4").toString
    val c = cat(_ => Seq(1L).toDF("id"), wh)
    val rs = c.build(Seq("consumer"), Map.empty, withUpstream = true)
      .map(r => r.name -> r.status).toMap
    assert(rs == Map("priced" -> "error", "consumer" -> "skipped"), rs.toString)
  }

  test("a contracted view enforces on ref too") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_contract5").toString
    val c = new Catalog(spark, new Warehouse(spark, wh), Seq(
      Model("v", Nil, Materialization.View,
        (_: Map[String, DataFrame]) => Seq(("a", 1)).toDF("id", "amount"),
        contract = Some(declared))))
    val e = intercept[Contracts.Violation] { c.ref("v") }
    assert(e.getMessage.contains("id: declared bigint, built string"),
      e.getMessage)
  }
}
