package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Diagnostic harness for the optimization rounds: run one query (warm-up
  * pass + one measured pass, noop sink — the Bench methodology) and print
  * the measured pass's per-JOB wall time with the first line of each
  * job's call site, plus per-stage task-time/shuffle totals. This answers
  * "which part of this operator costs what" without the Spark UI (disabled
  * in this sandbox). Measurement-only: never invoked by Bench/Verify.
  *
  * Usage: runMain graft.ProfileOp <name> [sfDir]
  */
object ProfileOp {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.local(cpus.toInt)
    val sc = spark.sparkContext

    def pass(): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    pass() // warm-up (codegen/JIT/parquet footers), untimed

    final case class Job(start: Long, var end: Long, site: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val stageLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, Job(e.time, -1L,
          Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val tm = si.taskMetrics
        stageLines.add(
          f"    stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"runTime=${tm.executorRunTime / 1000.0}%8.2fs " +
            f"cpu=${tm.executorCpuTime / 1e9}%8.2fs " +
            f"sRead=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%9.2fMB " +
            f"sWrite=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%9.2fMB " +
            s"  ${si.name.linesIterator.next()}")
      }
    }
    sc.addSparkListener(listener)
    val t0 = System.nanoTime()
    pass()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let the async bus drain
    sc.removeSparkListener(listener)

    println(f"PROFILE $name wall=$wall%.2f s, jobs=${jobs.size}")
    import scala.jdk.CollectionConverters._
    val ordered = jobs.asScala.toSeq.sortBy(_._1)
    val firstStart = ordered.headOption.map(_._2.start).getOrElse(0L)
    var prevEnd = firstStart
    ordered.foreach { case (id, j) =>
      val gap = (j.start - prevEnd) / 1000.0
      val dur = (j.end - j.start) / 1000.0
      prevEnd = math.max(prevEnd, j.end)
      println(f"  job $id%3d  +${(j.start - firstStart) / 1000.0}%7.2fs " +
        f"gap=$gap%6.2fs dur=$dur%7.2fs  ${j.site}")
    }
    println("  --- stages (completion order) ---")
    stageLines.asScala.foreach(println)
    spark.stop()
  }
}
