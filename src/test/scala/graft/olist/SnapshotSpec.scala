package graft.olist

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** SCD2 snapshot materialization semantics (dbt timestamp strategy):
  * changed keys close their current version and append a new one,
  * unchanged keys are untouched, new keys start a history.
  */
class SnapshotSpec extends SparkSpec {

  private val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2024-02-01 00:00:00")

  private def batch(rows: (Long, String, Timestamp)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "payload", "updated_at")
  }

  private def snapshotCatalog(source: () => DataFrame): Catalog = {
    val wh = Files.createTempDirectory("graft_snap").toString
    new Catalog(spark, new Warehouse(spark, wh), Seq(
      Model("snap", Nil, Materialization.Snapshot("id", "updated_at"),
        (_: Map[String, DataFrame]) => source())))
  }

  test("first run: every row becomes a current version") {
    val cat = snapshotCatalog(() => batch((1L, "a", t1), (2L, "b", t1)))
    cat.run(Seq("snap"))
    val snap = cat.warehouse.load("snap")
    assert(snap.count() == 2)
    assert(snap.filter(col("valid_to").isNull).count() == 2)
    assert(snap.filter(col("valid_from") === lit(t1)).count() == 2)
  }

  test("changed key closes the old version; unchanged and new keys behave") {
    var current = batch((1L, "a", t1), (2L, "b", t1))
    val cat = snapshotCatalog(() => current)
    cat.run(Seq("snap"))
    current = batch((1L, "a2", t2), (2L, "b", t1), (3L, "c", t2))
    cat.run(Seq("snap"))
    val snap = cat.warehouse.load("snap").cache()

    // key 1: two versions - old one closed at t2, new one open from t2
    val k1 = snap.filter(col("id") === 1).orderBy("valid_from").collect()
    assert(k1.length == 2)
    assert(k1(0).getAs[String]("payload") == "a" &&
      k1(0).getAs[Timestamp]("valid_to") == t2)
    assert(k1(1).getAs[String]("payload") == "a2" &&
      k1(1).getAs[Timestamp]("valid_to") == null)

    // key 2 unchanged: single open version
    val k2 = snap.filter(col("id") === 2).collect()
    assert(k2.length == 1 && k2(0).getAs[Timestamp]("valid_to") == null)

    // key 3 new: single open version from t2
    val k3 = snap.filter(col("id") === 3).collect()
    assert(k3.length == 1 && k3(0).getAs[Timestamp]("valid_from") == t2)
    snap.unpersist()
  }

  test("Snapshots.asOf reconstructs any past state; current() returns " +
       "the live rows; tombstones excluded unless requested") {
    var current = batch((1L, "a", t1), (2L, "b", t1))
    val cat = snapshotCatalog(() => current)
    cat.run(Seq("snap"))
    current = batch((1L, "a2", t2), (2L, "b", t1), (3L, "c", t2))
    cat.run(Seq("snap"))
    val snap = cat.warehouse.load("snap")
    def state(ts: Timestamp) = Snapshots.asOf(snap, ts).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap
    // between t1 and t2: the original payloads, key 3 not yet born
    assert(state(Timestamp.valueOf("2024-01-15 00:00:00")) ==
      Map(1L -> "a", 2L -> "b"))
    // at/after t2: key 1's new version, key 3 exists
    assert(state(t2) == Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    // before t1: nothing born yet
    assert(state(Timestamp.valueOf("2023-12-31 00:00:00")) == Map.empty)
    assert(Snapshots.current(snap).collect().map(_.getAs[Long]("id")).toSet
      == Set(1L, 2L, 3L))
    // with new_record hard deletes: deleted key excluded by default,
    // visible when asked for
    @volatile var now = t1
    @volatile var src2 = checkBatch((1L, "x", "p"), (2L, "y", "p"))
    val wh2 = Files.createTempDirectory("graft_snap_asof").toString
    val cat2 = new Catalog(spark, new Warehouse(spark, wh2), Seq(
      Model("snapc", Nil, Materialization.SnapshotCheck("id",
        Seq("watched"), () => now,
        hardDeletes = Materialization.HardDeletes.NewRecord),
        (_: Map[String, DataFrame]) => src2)))
    cat2.run(Seq("snapc"))
    now = t2
    src2 = checkBatch((1L, "x", "p")) // key 2 deleted
    cat2.run(Seq("snapc"))
    val snap2 = cat2.warehouse.load("snapc")
    assert(Snapshots.current(snap2).collect().map(_.getAs[Long]("id")).toSet
      == Set(1L))
    assert(Snapshots.current(snap2, includeDeleted = true).collect()
      .map(_.getAs[Long]("id")).toSet == Set(1L, 2L))
    // as-of before the deletion still sees key 2 alive
    assert(Snapshots.asOf(snap2, Timestamp.valueOf("2024-01-15 00:00:00"))
      .collect().map(_.getAs[Long]("id")).toSet == Set(1L, 2L))

    // changedBetween: the CDC diff of the two as-of states — key 1
    // changed payload, key 3 was added, key 2 untouched (absent)
    val diff = Snapshots.changedBetween(snap, "id", Seq("payload"),
        Timestamp.valueOf("2024-01-15 00:00:00"), t2)
      .collect().map(r => r.getAs[Long]("id") -> r.getString(1)).toMap
    assert(diff == Map(1L -> "changed", 3L -> "added"), diff.toString)
  }

  test("re-running the same batch is a no-op (idempotent snapshot)") {
    val cat = snapshotCatalog(() => batch((1L, "a", t1)))
    cat.run(Seq("snap"))
    cat.run(Seq("snap"))
    assert(cat.warehouse.load("snap").count() == 1)
  }

  // --- check strategy ----------------------------------------------------

  private def checkBatch(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "watched", "unwatched")
  }

  private def checkCatalog(source: () => DataFrame, cols: Seq[String],
                           at: () => Timestamp): Catalog = {
    val wh = Files.createTempDirectory("graft_snapchk").toString
    new Catalog(spark, new Warehouse(spark, wh), Seq(
      Model("snap", Nil,
        Materialization.SnapshotCheck("id", cols, at),
        (_: Map[String, DataFrame]) => source())))
  }

  test("check strategy: a watched column change opens a new SCD2 row; " +
       "an unwatched change does not") {
    @volatile var now = t1
    @volatile var current = checkBatch((1L, "w", "u"), (2L, "w", "u"))
    val cat = checkCatalog(() => current, Seq("watched"), () => now)
    cat.run(Seq("snap"))

    now = t2
    // key 1: watched col changes -> new version; key 2: only the
    // UNWATCHED col changes -> untouched
    current = checkBatch((1L, "w2", "u"), (2L, "w", "u-changed"))
    cat.run(Seq("snap"))
    val snap = cat.warehouse.load("snap").cache()

    val k1 = snap.filter(col("id") === 1).orderBy("valid_from").collect()
    assert(k1.length == 2)
    assert(k1(0).getAs[String]("watched") == "w" &&
      k1(0).getAs[Timestamp]("valid_to") == t2)
    assert(k1(1).getAs[String]("watched") == "w2" &&
      k1(1).getAs[Timestamp]("valid_from") == t2 &&
      k1(1).getAs[Timestamp]("valid_to") == null)

    val k2 = snap.filter(col("id") === 2).collect()
    assert(k2.length == 1 && k2(0).getAs[Timestamp]("valid_to") == null)
    assert(k2(0).getAs[String]("unwatched") == "u") // old version kept
    snap.unpersist()
  }

  test("check strategy with check_cols=all: any column change (incl. a " +
       "null transition) versions the row; identical rows are no-ops") {
    @volatile var now = t1
    @volatile var current = checkBatch((1L, "w", "u"), (2L, "w", "u"))
    val cat = checkCatalog(() => current, Nil, () => now) // Nil = all
    cat.run(Seq("snap"))

    now = t2
    current = {
      import spark.implicits._
      Seq((1L, "w", null: String), (2L, "w", "u"))
        .toDF("id", "watched", "unwatched")
    }
    cat.run(Seq("snap"))
    val snap = cat.warehouse.load("snap").cache()
    // key 1 versioned on the u -> NULL transition (null-safe compare)
    assert(snap.filter(col("id") === 1).count() == 2)
    // key 2 identical -> single open version
    val k2 = snap.filter(col("id") === 2).collect()
    assert(k2.length == 1 && k2(0).getAs[Timestamp]("valid_to") == null)
    snap.unpersist()

    // idempotent: re-running the same batch at a later time changes nothing
    now = Timestamp.valueOf("2024-03-01 00:00:00")
    cat.run(Seq("snap"))
    assert(cat.warehouse.load("snap").count() == 3)
  }

  test("check strategy: new keys start a history stamped with the run " +
       "timestamp") {
    @volatile var now = t1
    @volatile var current = checkBatch((1L, "w", "u"))
    val cat = checkCatalog(() => current, Seq("watched"), () => now)
    cat.run(Seq("snap"))
    now = t2
    current = checkBatch((1L, "w", "u"), (3L, "x", "y"))
    cat.run(Seq("snap"))
    val k3 = cat.warehouse.load("snap").filter(col("id") === 3).collect()
    assert(k3.length == 1 && k3(0).getAs[Timestamp]("valid_from") == t2 &&
      k3(0).getAs[Timestamp]("valid_to") == null)
  }

  test("invalidate_hard_deletes (timestamp strategy): a key gone from the " +
       "source closes at the run timestamp; default leaves it open") {
    val tRun = Timestamp.valueOf("2024-03-01 00:00:00")
    var current = batch((1L, "a", t1), (2L, "b", t1))
    val wh = Files.createTempDirectory("graft_snap_hd").toString
    val cat = new Catalog(spark, new Warehouse(spark, wh), Seq(
      Model("snap", Nil, Materialization.Snapshot("id", "updated_at",
        hardDeletes = Materialization.HardDeletes.Invalidate,
        snapshotAt = () => tRun),
        (_: Map[String, DataFrame]) => current)))
    cat.run(Seq("snap"))
    current = batch((1L, "a", t1)) // key 2 hard-deleted from the source
    cat.run(Seq("snap"))
    val snap = cat.warehouse.load("snap").cache()
    val k2 = snap.filter(col("id") === 2).collect()
    assert(k2.length == 1 && k2(0).getAs[Timestamp]("valid_to") == tRun,
      k2.mkString(";"))
    // key 1 untouched and still current
    val k1 = snap.filter(col("id") === 1).collect()
    assert(k1.length == 1 && k1(0).getAs[Timestamp]("valid_to") == null)
    snap.unpersist()

    // contrast: the default (false) leaves the absent key's version open
    var cur2 = batch((1L, "a", t1), (2L, "b", t1))
    val cat2 = snapshotCatalog(() => cur2)
    cat2.run(Seq("snap"))
    cur2 = batch((1L, "a", t1))
    cat2.run(Seq("snap"))
    val open2 = cat2.warehouse.load("snap")
      .filter(col("id") === 2).collect()
    assert(open2.length == 1 && open2(0).getAs[Timestamp]("valid_to") == null)
  }

  test("invalidate_hard_deletes (check strategy): deletion closes; a " +
       "reappearing key starts a new version") {
    @volatile var now = t1
    @volatile var current = checkBatch((1L, "w", "u"), (2L, "x", "y"))
    val wh = Files.createTempDirectory("graft_snapchk_hd").toString
    val cat = new Catalog(spark, new Warehouse(spark, wh), Seq(
      Model("snap", Nil, Materialization.SnapshotCheck("id", Seq("watched"),
        () => now, hardDeletes = Materialization.HardDeletes.Invalidate),
        (_: Map[String, DataFrame]) => current)))
    cat.run(Seq("snap"))
    now = t2
    current = checkBatch((1L, "w", "u")) // key 2 deleted
    cat.run(Seq("snap"))
    now = Timestamp.valueOf("2024-03-01 00:00:00")
    current = checkBatch((1L, "w", "u"), (2L, "x", "y")) // key 2 returns
    cat.run(Seq("snap"))
    val k2 = cat.warehouse.load("snap").filter(col("id") === 2)
      .orderBy("valid_from").collect()
    assert(k2.length == 2, k2.mkString(";"))
    assert(k2(0).getAs[Timestamp]("valid_from") == t1 &&
      k2(0).getAs[Timestamp]("valid_to") == t2) // closed on deletion
    assert(k2(1).getAs[Timestamp]("valid_from") == now &&
      k2(1).getAs[Timestamp]("valid_to") == null) // reopened on return
  }

  test("hard_deletes new_record (timestamp strategy): deletion closes the " +
       "live row AND appends an open tombstone flagged dbt_is_deleted") {
    val tRun = Timestamp.valueOf("2024-03-01 00:00:00")
    var current = batch((1L, "a", t1), (2L, "b", t1))
    val wh = Files.createTempDirectory("graft_snap_nr").toString
    val cat = new Catalog(spark, new Warehouse(spark, wh), Seq(
      Model("snap", Nil, Materialization.Snapshot("id", "updated_at",
        hardDeletes = Materialization.HardDeletes.NewRecord,
        snapshotAt = () => tRun),
        (_: Map[String, DataFrame]) => current)))
    cat.run(Seq("snap"))
    // first run: every live row carries the flag, false
    val first = cat.warehouse.load("snap").collect()
    assert(first.forall(!_.getAs[Boolean]("dbt_is_deleted")))

    current = batch((1L, "a", t1)) // key 2 hard-deleted
    cat.run(Seq("snap"))
    val k2 = cat.warehouse.load("snap").filter(col("id") === 2)
      .orderBy("valid_from", "valid_to").collect()
    assert(k2.length == 2, k2.mkString(";"))
    val closed = k2.find(_.getAs[Timestamp]("valid_to") != null).get
    val tomb = k2.find(_.getAs[Timestamp]("valid_to") == null).get
    assert(closed.getAs[Timestamp]("valid_to") == tRun &&
      !closed.getAs[Boolean]("dbt_is_deleted"))
    assert(tomb.getAs[Timestamp]("valid_from") == tRun &&
      tomb.getAs[Boolean]("dbt_is_deleted") &&
      tomb.getAs[String]("payload") == "b") // payload preserved
  }

  test("hard_deletes new_record (check strategy): a reappearing key " +
       "closes its tombstone and opens a fresh live version") {
    @volatile var now = t1
    @volatile var current = checkBatch((1L, "w", "u"), (2L, "x", "y"))
    val wh = Files.createTempDirectory("graft_snapchk_nr").toString
    val cat = new Catalog(spark, new Warehouse(spark, wh), Seq(
      Model("snap", Nil, Materialization.SnapshotCheck("id", Seq("watched"),
        () => now, hardDeletes = Materialization.HardDeletes.NewRecord),
        (_: Map[String, DataFrame]) => current)))
    cat.run(Seq("snap"))
    now = t2
    current = checkBatch((1L, "w", "u")) // key 2 deleted
    cat.run(Seq("snap"))
    val afterDelete = cat.warehouse.load("snap").filter(col("id") === 2)
      .collect()
    assert(afterDelete.length == 2) // closed live row + open tombstone
    assert(afterDelete.count(r => r.getAs[Timestamp]("valid_to") == null &&
      r.getAs[Boolean]("dbt_is_deleted")) == 1)

    now = Timestamp.valueOf("2024-03-01 00:00:00")
    current = checkBatch((1L, "w", "u"), (2L, "x", "y")) // key 2 returns
    cat.run(Seq("snap"))
    val k2 = cat.warehouse.load("snap").filter(col("id") === 2)
      .orderBy("valid_from", "valid_to").collect()
    // three versions: original (closed at t2), tombstone (closed at
    // return), fresh live row (flag false, open)
    assert(k2.length == 3, k2.mkString(";"))
    val live = k2.filter(_.getAs[Timestamp]("valid_to") == null)
    assert(live.length == 1 && !live(0).getAs[Boolean]("dbt_is_deleted") &&
      live(0).getAs[Timestamp]("valid_from") == now)
    val tomb = k2.find(_.getAs[Boolean]("dbt_is_deleted")).get
    assert(tomb.getAs[Timestamp]("valid_from") == t2 &&
      tomb.getAs[Timestamp]("valid_to") == now)
  }

  test("Main gate: build failure exits 1, warn-only test failures exit 0") {
    import graft.checks.Checks
    assert(Main.gate(scala.util.Failure(new RuntimeException("boom"))) == 1)
    val warn = Pipeline.PipelineResult(Seq("fct_orders"),
      Seq(Pipeline.TestOutcome("t", Checks.Warn(3))))
    assert(!warn.testsOk)
    assert(Main.gate(scala.util.Success(warn)) == 0)
    val clean = Pipeline.PipelineResult(Seq("fct_orders"),
      Seq(Pipeline.TestOutcome("t", Checks.Pass())))
    assert(Main.gate(scala.util.Success(clean)) == 0)
  }

  test("Main.run leaves the dbt artifact trio under <warehouse>/target " +
       "and exits 0 on the reference pipeline") {
    val wh = Files.createTempDirectory("graft_main_art").toString
    assert(Main.run(spark, wh) == 0)
    Seq("run_results.json", "manifest.json", "catalog.json").foreach { f =>
      assert(Files.exists(java.nio.file.Paths.get(wh, "target", f)), f)
    }
    val rr = Files.readString(
      java.nio.file.Paths.get(wh, "target", "run_results.json"))
    assert(rr.contains("\"model.fct_orders\"") &&
      rr.contains("\"test.unique_order_id\"") || rr.contains("\"test."))
    val catJson = Files.readString(
      java.nio.file.Paths.get(wh, "target", "catalog.json"))
    assert(catJson.contains("\"model.fct_orders\"") &&
      catJson.contains("row_count"))
  }
}
