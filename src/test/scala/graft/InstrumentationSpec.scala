package graft

import org.apache.spark.sql.functions._

/** Runtime metrics must confirm what the plan assertions only promise:
  * aggregations move bytes through a shuffle, map-only pipelines move
  * none — measured from actual task metrics, not the plan.
  */
class InstrumentationSpec extends SparkSpec {

  test("a groupBy shuffles bytes; a map-only pipeline shuffles none") {
    import spark.implicits._
    val df = (1L to 200000L).toDF("id")
      .withColumn("k", col("id") % 1000)
    val (nAgg, withShuffle) = Instrumentation.measure(spark) {
      df.groupBy("k").agg(sum("id")).count()
    }
    assert(nAgg == 1000L)
    assert(withShuffle.shuffleWriteBytes > 0,
      s"groupBy must shuffle: $withShuffle")
    assert(withShuffle.tasks > 0 && withShuffle.stages >= 2)

    val (nMap, noShuffle) = Instrumentation.measure(spark) {
      df.filter(col("id") % 2 === 0)
        .select(col("id") * 3).count()
    }
    assert(nMap == 100000L)
    // count() plans a final single-partition agg over per-partition
    // counts — a handful of tiny rows; DATA must not have shuffled
    assert(noShuffle.shuffleWriteBytes < 10000,
      s"map-only pipeline moved data: $noShuffle")
  }

  test("epochUpsample is runtime-map-side: the claimed no-shuffle shape " +
       "holds in task metrics, not just the plan") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (_, m) = Instrumentation.measure(spark) {
      graft.llm.Mixing.epochUpsample(docs, "doc_id", "source",
        Map("src0" -> 2.5), defaultEpochs = 0.75).count()
    }
    assert(m.shuffleWriteBytes < 10000, m.toString)
    assert(m.inputRecords > 0)
  }

  test("shuffle skew signal: a single hot key concentrates write bytes " +
       "in one task") {
    import spark.implicits._
    val skewed = (1L to 100000L).toDF("id")
      .withColumn("k", lit(0L)) // every row the same key
      .repartition(8)
    val (_, m) = Instrumentation.measure(spark) {
      skewed.withColumn("v", col("id") * 7)
        .repartition(col("k")).count()  // force a key shuffle of all rows
    }
    assert(m.shuffleWriteBytes > 0)
    // 8 upstream tasks each write their slice to ONE reducer partition:
    // write-side balance, read-side concentration — assert the read side
    assert(m.shuffleReadBytes >= m.shuffleWriteBytes, m.toString)
  }
}
