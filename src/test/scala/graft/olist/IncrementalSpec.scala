package graft.olist

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** dbt merge-on-unique-key incremental materialization semantics. */
class IncrementalSpec extends SparkSpec {

  test("first run full-builds; later runs upsert by unique key") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_inc").toString)
    @volatile var batch: Seq[(Long, String)] = Seq(1L -> "a", 2L -> "b")
    val cat = new Catalog(spark, wh, Seq(
      Model("inc_model", Nil, Materialization.Incremental("id"),
        _ => batch.toDF("id", "v"))))

    cat.run(Seq("inc_model"))
    assert(wh.load("inc_model").orderBy("id").collect().map(_.getString(1))
      .toSeq == Seq("a", "b"))

    // second batch: update id=2, insert id=3; id=1 must survive untouched
    batch = Seq(2L -> "b2", 3L -> "c")
    cat.run(Seq("inc_model"))
    val out = wh.load("inc_model").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "b2"), (3L, "c")))

    // idempotent: re-running the same batch changes nothing
    cat.run(Seq("inc_model"))
    assert(wh.load("inc_model").count() == 3)
  }

  test("replace() safely rewrites a table from a plan that reads it") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_rep").toString)
    import spark.implicits._
    wh.save("t", Seq(1L, 2L, 3L).toDF("x"))
    // self-referential rewrite: double every stored value
    wh.replace("t", wh.load("t").select((col("x") * 2).as("x")))
    assert(wh.load("t").orderBy("x").collect().map(_.getLong(0)).toSeq ==
      Seq(2L, 4L, 6L))
  }
}
