package graft.olist

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** dbt `state:modified` / `state:new` selection and `--defer` semantics:
  * fingerprints are content hashes of each model's OWN transform (deps
  * enter as schema-only placeholders), persisted in a Manifest and diffed
  * by the state selector — the CI pattern of rebuilding only what changed
  * ([dbt]/task/runnable.py:90,167; graph/selector_methods.py).
  */
class StateSelectionSpec extends SparkSpec {

  private def seedModel(name: String, df: => DataFrame,
                        hit: String => Unit = _ => ()): Model =
    Model(name, Nil, Materialization.Table, { _ => hit(name); df })

  test("fingerprints: stable across catalog constructions, changed by a " +
       "transform edit, unchanged for untouched models") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_st").toString)
    def mkCat(vExpr: String): Catalog = new Catalog(spark, wh, Seq(
      seedModel("src_a", Seq((1L, 2.0), (2L, 3.0)).toDF("id", "x")),
      Model("stg_a", Seq("src_a"), Materialization.View,
        deps => deps("src_a").select(col("id"), col("x"))),
      Model("mart", Seq("stg_a"), Materialization.Table,
        deps => deps("stg_a").select(col("id"),
          expr(vExpr).as("y")))))
    val c1 = mkCat("x * 2")
    val c2 = mkCat("x * 2")
    val c3 = mkCat("x * 3") // one literal changed in one model
    assert(c1.manifest() == c2.manifest()) // deterministic across instances
    assert(c1.fingerprint("mart") != c3.fingerprint("mart"))
    assert(c1.fingerprint("stg_a") == c3.fingerprint("stg_a"))
    assert(c1.fingerprint("src_a") == c3.fingerprint("src_a"))
    // manifest round-trips through its file format
    val mf = Files.createTempDirectory("graft_mf").resolve("manifest.tsv")
    c1.manifest().write(mf.toString)
    assert(Manifest.read(mf.toString) == c1.manifest())
  }

  test("state:modified reruns exactly the edited model; state:modified+ " +
       "adds its descendants; state:new picks up added models") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_st2").toString)
    def mkCat(martExpr: String, extra: Seq[Model] = Nil): Catalog =
      new Catalog(spark, wh, Seq(
        seedModel("src_a", Seq((1L, 2.0)).toDF("id", "x")),
        Model("mart", Seq("src_a"), Materialization.Table,
          deps => deps("src_a").select(col("id"), expr(martExpr).as("y"))),
        Model("report", Seq("mart"), Materialization.Table,
          deps => deps("mart").agg(sum("y").as("total_y")))) ++ extra)

    val v1 = mkCat("x * 2")
    v1.run(Seq("src_a", "mart", "report"))
    val state = Some(v1.manifest())
    assert(wh.load("report").head().getDouble(0) == 4.0)

    // nothing changed -> empty selection, nothing runs
    val v1b = mkCat("x * 2")
    assert(v1b.topo(Seq("state:modified"), withUpstream = false,
      state = state).isEmpty)

    // one model edited -> exactly that model (dbt's state:modified)
    val v2 = mkCat("x * 10")
    assert(v2.topo(Seq("state:modified"), withUpstream = false,
      state = state) == Seq("mart"))
    val ran = v2.run(Seq("state:modified"), state = state)
    assert(ran == Seq("mart"))
    assert(wh.load("mart").head().getDouble(1) == 20.0)
    // report did NOT rebuild: still carries the v1 total, not 20.0
    assert(wh.load("report").head().getDouble(0) == 4.0)

    // the `+` affix composes with the state method, like dbt
    assert(v2.topo(Seq("state:modified+"), withUpstream = false,
      state = state) == Seq("mart", "report"))

    // a brand-new model is state:new AND state:modified
    val extra = Seq(Model("extra", Nil, Materialization.Table,
      _ => Seq(1).toDF("z")))
    val v3 = mkCat("x * 10", extra)
    val s3 = Some(mkCat("x * 10").manifest()) // manifest written before `extra`
    assert(v3.topo(Seq("state:new"), withUpstream = false, state = s3) ==
      Seq("extra"))
    assert(v3.topo(Seq("state:modified"), withUpstream = false, state = s3) ==
      Seq("extra"))

    // state selectors without a manifest error like dbt's missing --state
    val e = intercept[IllegalArgumentException](
      v3.topo(Seq("state:modified"), withUpstream = false))
    assert(e.getMessage.contains("manifest"))
  }

  test("an upstream SCHEMA change marks dependents modified; an upstream " +
       "logic change that keeps the schema does not") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_st3").toString)
    def mkCat(stgCols: DataFrame => DataFrame): Catalog = new Catalog(spark, wh,
      Seq(
        seedModel("src_a", Seq((1L, 2.0, "u")).toDF("id", "x", "u")),
        Model("stg_a", Seq("src_a"), Materialization.View,
          deps => stgCols(deps("src_a"))),
        Model("mart", Seq("stg_a"), Materialization.Table,
          deps => deps("stg_a").select(col("id")))))
    val base = mkCat(_.select(col("id"), col("x")))
    // logic change, same output schema: mart's fingerprint holds
    val logic = mkCat(_.filter(col("x") > 0).select(col("id"), col("x")))
    assert(base.fingerprint("stg_a") != logic.fingerprint("stg_a"))
    assert(base.fingerprint("mart") == logic.fingerprint("mart"))
    // schema change upstream: mart's placeholder deps change -> modified
    val schema = mkCat(_.select(col("id"), col("x"), col("u")))
    assert(base.fingerprint("mart") != schema.fingerprint("mart"))
  }

  test("--defer: unbuilt upstreams resolve from the deferred store (CI " +
       "builds one model in a scratch warehouse against prod state)") {
    import spark.implicits._
    val prod = new Warehouse(spark,
      Files.createTempDirectory("graft_prod").toString)
    val scratch = new Warehouse(spark,
      Files.createTempDirectory("graft_ci").toString)
    def models(martExpr: String): Seq[Model] = Seq(
      seedModel("src_a", Seq((1L, 2.0), (2L, 3.0)).toDF("id", "x")),
      Model("mart", Seq("src_a"), Materialization.Table,
        deps => deps("src_a").select(col("id"), expr(martExpr).as("y"))))

    val prodCat = new Catalog(spark, prod, models("x * 2"))
    prodCat.run(Seq("src_a", "mart"))
    val state = Some(prodCat.manifest())

    // CI: mart edited; scratch warehouse is EMPTY; defer to prod for src_a
    val ci = new Catalog(spark, scratch, models("x * 100"), defer = Some(prod))
    val ran = ci.run(Seq("state:modified"), state = state)
    assert(ran == Seq("mart"))
    assert(scratch.exists("mart") && !scratch.exists("src_a"))
    assert(scratch.load("mart").orderBy("id").collect().map(_.getDouble(1))
      .toSeq == Seq(200.0, 300.0))
    // prod untouched
    assert(prod.load("mart").orderBy("id").collect().map(_.getDouble(1))
      .toSeq == Seq(4.0, 6.0))

    // without defer the same run fails on the missing upstream
    val noDefer = new Catalog(spark, new Warehouse(spark,
      Files.createTempDirectory("graft_ci2").toString), models("x * 100"))
    val e = intercept[IllegalStateException](
      noDefer.run(Seq("state:modified"), state = state))
    assert(e.getMessage.contains("not found"))
  }
}
