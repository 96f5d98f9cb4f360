package graft.olist

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S4's saveAsTable mapping: the pipeline runs unchanged against the Spark
  * session catalog, models become real catalog tables visible to SQL
  * readers, and the self-referential incremental replace works through the
  * scratch-table rename protocol.
  */
class SessionCatalogSpec extends SparkSpec {

  test("table model materializes as a catalog table readable via SQL") {
    import spark.implicits._
    val store = new SessionCatalogWarehouse(spark)
    val cat = new Catalog(spark, store, Seq(
      Model("sc_base", Nil, Materialization.Table,
        (_: Map[String, DataFrame]) => (1 to 50).toDF("x")),
      Model("sc_doubled", Seq("sc_base"), Materialization.Table,
        m => m("sc_base").withColumn("y", col("x") * 2))))
    cat.run(Seq("sc_doubled"), withUpstream = true)
    assert(store.exists("sc_doubled"))
    assert(spark.sql("SELECT count(*) AS n FROM sc_doubled").head.getLong(0) == 50)
    assert(spark.sql("SELECT max(y) FROM sc_doubled").head.getInt(0) == 100)
  }

  test("incremental merge works against the session catalog (self-read)") {
    import spark.implicits._
    var batch = Seq((1L, "v1"), (2L, "v1")).toDF("id", "v")
    val store = new SessionCatalogWarehouse(spark)
    val cat = new Catalog(spark, store, Seq(
      Model("sc_inc", Nil, Materialization.Incremental("id"),
        (_: Map[String, DataFrame]) => batch)))
    cat.run(Seq("sc_inc"))
    batch = Seq((2L, "v2"), (3L, "v2")).toDF("id", "v")
    cat.run(Seq("sc_inc"))
    val rows = store.load("sc_inc").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "v1"), (2L, "v2"), (3L, "v2")))
  }

  test("replace swaps via rename-aside, cleans up, and survives stale " +
       "__old leftovers from a crashed prior swap") {
    import spark.implicits._
    val store = new SessionCatalogWarehouse(spark)
    store.save("sc_swap", Seq((1, "old")).toDF("id", "v"))
    // a stale aside copy, as a crash between the two renames would leave
    Seq((9, "stale")).toDF("id", "v").write.mode("overwrite")
      .saveAsTable("sc_swap__old")
    store.replace("sc_swap", Seq((2, "new")).toDF("id", "v"))
    val rows = store.load("sc_swap").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == Seq((2, "new")))
    assert(!store.exists("sc_swap__old") && !store.exists("sc_swap__tmp"))
  }

  test("unsafe table names are rejected before reaching SQL") {
    val store = new SessionCatalogWarehouse(spark)
    intercept[IllegalArgumentException](store.exists("x; DROP TABLE y"))
  }
}
