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

  test("--full-refresh rebuilds from scratch, discarding stale rows the " +
       "merge path would have kept") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_fr").toString)
    @volatile var batch: Seq[(Long, String)] = Seq(1L -> "a", 2L -> "b")
    val cat = new Catalog(spark, wh, Seq(
      Model("m", Nil, Materialization.Incremental("id"),
        _ => batch.toDF("id", "v"))))
    cat.run(Seq("m"))
    batch = Seq(2L -> "b2", 3L -> "c")
    // merge keeps id=1; the same batch under --full-refresh must not
    cat.run(Seq("m"), fullRefresh = true)
    val out = wh.load("m").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((2L, "b2"), (3L, "c")))
  }

  test("model config full_refresh=false pins the model incremental even " +
       "under the run flag; full_refresh=true always rebuilds") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_frc").toString)
    @volatile var batch: Seq[(Long, String)] = Seq(1L -> "a")
    val cat = new Catalog(spark, wh, Seq(
      Model("pinned", Nil, Materialization.Incremental("id"),
        _ => batch.toDF("id", "v"), fullRefresh = Some(false)),
      Model("always", Nil, Materialization.Incremental("id"),
        _ => batch.toDF("id", "v"), fullRefresh = Some(true))))
    cat.run(Seq("pinned", "always"))
    batch = Seq(2L -> "b")
    // flag set: 'pinned' still merges (keeps id=1), 'always' rebuilds
    cat.run(Seq("pinned", "always"), fullRefresh = true)
    assert(wh.load("pinned").count() == 2)
    assert(wh.load("always").collect().map(_.getLong(0)).toSeq == Seq(2L))
    batch = Seq(3L -> "c")
    // no flag: 'always' STILL rebuilds (config full_refresh: true)
    cat.run(Seq("always"))
    assert(wh.load("always").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("--full-refresh on insert_overwrite rebuilds the whole partitioned " +
       "table, dropping partitions the batch no longer carries") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_frp").toString)
    @volatile var batch = Seq(("d1", 1L), ("d2", 2L))
    val cat = new Catalog(spark, wh, Seq(
      Model("p", Nil, Materialization.IncrementalByPartition("day"),
        _ => batch.toDF("day", "n"))))
    cat.run(Seq("p"))
    batch = Seq(("d2", 20L))
    // partition-merge would keep d1; full refresh must not
    cat.run(Seq("p"), fullRefresh = true)
    val out = wh.load("p").select("day", "n").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("d2", 20L)))
  }

  test("on_schema_change=ignore (default): added batch columns are " +
       "dropped; a batch missing stored columns errors") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_osc1").toString)
    @volatile var batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val cat = new Catalog(spark, wh, Seq(
      Model("m", Nil, Materialization.Incremental("id"), _ => batch)))
    cat.run(Seq("m"))
    // batch grows a column: ignored, table schema unchanged
    batch = Seq((2L, "b2", 9)).toDF("id", "v", "extra")
    cat.run(Seq("m"))
    assert(wh.load("m").columns.toSeq == Seq("id", "v"))
    assert(wh.load("m").orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("a", "b2"))
    // batch drops a stored column: the insert errors, dbt-style
    batch = Seq(Tuple1(3L)).toDF("id")
    val e = intercept[IllegalStateException](cat.run(Seq("m")))
    assert(e.getMessage.contains("missing stored columns"))
  }

  test("on_schema_change=fail aborts on any drift") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_osc2").toString)
    @volatile var batch = Seq((1L, "a")).toDF("id", "v")
    val cat = new Catalog(spark, wh, Seq(
      Model("m", Nil, Materialization.Incremental("id",
        Materialization.OnSchemaChange.Fail), _ => batch)))
    cat.run(Seq("m"))
    batch = Seq((2L, "b", 1.5)).toDF("id", "v", "w")
    val e = intercept[IllegalStateException](cat.run(Seq("m")))
    assert(e.getMessage.contains("on_schema_change"))
    assert(wh.load("m").count() == 1) // table untouched
  }

  test("on_schema_change=append_new_columns: table gains batch columns " +
       "(history NULL-filled); departed columns stay, NULL in new rows") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_osc3").toString)
    @volatile var batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val cat = new Catalog(spark, wh, Seq(
      Model("m", Nil, Materialization.Incremental("id",
        Materialization.OnSchemaChange.AppendNewColumns), _ => batch)))
    cat.run(Seq("m"))
    // add a column
    batch = Seq((2L, "b2", 7), (3L, "c", 8)).toDF("id", "v", "extra")
    cat.run(Seq("m"))
    val afterAdd = wh.load("m").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2))))
    assert(wh.load("m").columns.toSeq == Seq("id", "v", "extra"))
    assert(afterAdd.toSeq == Seq((1L, "a", None), (2L, "b2", Some(7)),
      (3L, "c", Some(8))))
    // now remove a column: `extra` stays in the table, NULL for new rows
    batch = Seq((4L, "d")).toDF("id", "v")
    cat.run(Seq("m"))
    val afterRm = wh.load("m").orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getInt(2))))
    assert(wh.load("m").columns.toSeq == Seq("id", "v", "extra"))
    assert(afterRm.toSeq == Seq((1L, None), (2L, Some(7)), (3L, Some(8)),
      (4L, None)))
  }

  test("on_schema_change=sync_all_columns: table takes the batch schema — " +
       "adds, removals, and type changes") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_osc4").toString)
    @volatile var batch = Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "v", "n")
    val cat = new Catalog(spark, wh, Seq(
      Model("m", Nil, Materialization.Incremental("id",
        Materialization.OnSchemaChange.SyncAllColumns), _ => batch)))
    cat.run(Seq("m"))
    // drop `v`, add `w`, and widen `n` to long in one batch
    batch = Seq((2L, 200L, 2.5), (3L, 300L, 3.5)).toDF("id", "n", "w")
    cat.run(Seq("m"))
    val t = wh.load("m")
    assert(t.columns.toSeq == Seq("id", "n", "w"))
    assert(t.schema("n").dataType.typeName == "long")
    val rows = t.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // id=1 survives with n cast 10 -> 10L and w NULL; 2 replaced; 3 new
    assert(rows.toSeq == Seq((1L, 10L, None), (2L, 200L, Some(2.5)),
      (3L, 300L, Some(3.5))))
  }

  test("on_schema_change applies to insert_overwrite partitions too") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_osc5").toString)
    @volatile var batch = Seq(("d1", 1L), ("d2", 2L)).toDF("day", "x")
    val cat = new Catalog(spark, wh, Seq(
      Model("m", Nil, Materialization.IncrementalByPartition("day",
        Materialization.OnSchemaChange.AppendNewColumns), _ => batch)))
    cat.run(Seq("m"))
    batch = Seq(("d2", 20L, "z")).toDF("day", "x", "tag")
    cat.run(Seq("m"))
    val rows = wh.load("m").orderBy("day").collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Long]("x"),
        Option(r.getAs[String]("tag"))))
    assert(rows.toSeq == Seq(("d1", 1L, None), ("d2", 20L, Some("z"))))
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
