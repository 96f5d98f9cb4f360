package graft.olist

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** dbt `clone` semantics: selected relations copy from another
  * environment's store; later writes touch only the clone; nodes absent
  * from the source store are skipped.
  */
class CloneSpec extends SparkSpec {

  private def models = {
    import spark.implicits._
    Seq(
      Model("base", Nil, Materialization.Table,
        (_: Map[String, DataFrame]) => Seq(1L, 2L).toDF("id")),
      Model("inc", Seq("base"), Materialization.Incremental("id"),
        (d: Map[String, DataFrame]) => d("base")),
      Model("never_built", Nil, Materialization.Table,
        (_: Map[String, DataFrame]) => Seq(9L).toDF("id")))
  }

  test("clone copies built prod relations; writes stay in dev; unbuilt " +
       "nodes are skipped") {
    import spark.implicits._
    val prodDir = Files.createTempDirectory("graft_clone_prod").toString
    val devDir = Files.createTempDirectory("graft_clone_dev").toString
    val prodWh = new Warehouse(spark, prodDir)
    val prod = new Catalog(spark, prodWh, models)
    prod.run(Seq("inc"), withUpstream = true) // builds base + inc in prod

    val dev = new Catalog(spark, new Warehouse(spark, devDir), models)
    val cloned = dev.cloneFrom(prodWh, Seq("inc"), withUpstream = true)
    assert(cloned == Seq("base", "inc"))
    assert(dev.warehouse.exists("base") && dev.warehouse.exists("inc"))
    assert(!dev.warehouse.exists("never_built"))
    assert(dev.cloneFrom(prodWh, Seq("never_built")) == Nil)

    // the CI scenario clone exists for: an incremental merge against the
    // CLONE must leave prod untouched
    val devModels = models.map {
      case m if m.name == "inc" => m.copy(build =
        (_: Map[String, DataFrame]) => Seq(3L).toDF("id"))
      case m => m
    }
    new Catalog(spark, new Warehouse(spark, devDir), devModels)
      .run(Seq("inc")) // merge id=3 into the dev clone
    assert(spark.read.parquet(s"$devDir/inc").count() == 3)
    assert(spark.read.parquet(s"$prodDir/inc").count() == 2) // prod intact
  }
}
