package graft.olist

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Warehouse maintenance operations: small-file compaction (the OPTIMIZE
  * of a parquet store) and catalog statistics (ANALYZE feeding join
  * sizing / CBO). Both are metadata-or-layout changes — row content must
  * be bit-identical before and after.
  */
class CompactionSpec extends SparkSpec {

  test("compact consolidates a many-small-files table; content identical; " +
       "swap stays crash-safe (no partial table observable)") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_cmp").toString)
    // a high-parallelism write: 64 tiny files
    val df = (1L to 10000L).toDF("id")
      .withColumn("v", col("id") * 3).repartition(64)
    wh.save("t", df)
    assert(wh.dataFiles("t").size >= 32, wh.dataFiles("t").size)
    val before = wh.load("t").orderBy("id").collect().toSeq
    // tiny target: stored bytes fit one file
    val n = wh.compact("t", targetFileBytes = 1L << 30)
    assert(n == 1)
    assert(wh.dataFiles("t").size == 1, wh.dataFiles("t").mkString(","))
    assert(wh.load("t").orderBy("id").collect().toSeq == before)
  }

  test("compact on a partitioned table keeps the hive layout and prunes " +
       "to ~one file per partition value") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_cmp2").toString)
    val df = (1L to 2000L).toDF("id")
      .withColumn("part", (col("id") % 4).cast("int"))
      .repartition(32)
    wh.savePartitioned("p", df, Seq("part"))
    val filesBefore = wh.dataFiles("p").size
    assert(filesBefore > 8, filesBefore)
    val before = wh.load("p").orderBy("id").collect().toSeq
    wh.compact("p", targetFileBytes = 1L << 30, partitionBy = Seq("part"))
    val files = wh.dataFiles("p")
    // hive directories survive; each of the 4 values consolidated
    assert(files.forall(_.contains("part=")), files.mkString(","))
    assert(files.size <= 4, files.mkString(","))
    assert(wh.load("p").orderBy("id").collect().toSeq == before)
    // partition pruning still works on the compacted layout
    val plan = wh.load("p").filter(col("part") === 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part"), plan)
  }

  test("analyze records table stats the planner can read; column stats " +
       "compute on request") {
    import spark.implicits._
    val wh = new SessionCatalogWarehouse(spark)
    val name = "graft_stats_t"
    wh.save(name, (1L to 5000L).toDF("id").withColumn("k", col("id") % 7))
    try {
      assert(wh.stats(name).isEmpty ||
        wh.stats(name).exists(_._2.isEmpty)) // no rowCount before ANALYZE
      wh.analyze(name)
      val Some((size, rows)) = wh.stats(name)
      assert(size > 0 && rows.contains(BigInt(5000)), wh.stats(name))
      wh.analyze(name, forColumns = Seq("id", "k"))
      // column stats land in the catalog metadata
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name))
      assert(meta.stats.exists(_.colStats.keySet == Set("id", "k")),
        meta.stats.toString)
      intercept[IllegalArgumentException](
        wh.analyze(name, forColumns = Seq("id; drop table x")))
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("vacuum removes stranded __tmp/__old swap leftovers and nothing " +
       "else") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_vac")
    val wh = new Warehouse(spark, root.toString)
    wh.save("t", (1L to 100L).toDF("id"))
    val before = wh.load("t").orderBy("id").collect().toSeq
    // strand the two crash artifacts the swap protocol can leave behind
    Files.createDirectories(root.resolve("t__tmp"))
    Files.createFile(root.resolve("t__tmp").resolve("part-0.parquet"))
    Files.createDirectories(root.resolve("t__old"))
    val removed = wh.vacuum()
    assert(removed.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet ==
      Set("t__tmp", "t__old"), removed.mkString(","))
    assert(!Files.exists(root.resolve("t__tmp")))
    assert(!Files.exists(root.resolve("t__old")))
    // the live table is untouched, and a second vacuum is a no-op
    assert(wh.load("t").orderBy("id").collect().toSeq == before)
    assert(wh.vacuum().isEmpty)
  }
}
