package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Runtime execution metrics for one action — the observability layer a
  * real engine deployment needs (dashboards, regression gates, capacity
  * planning) and the honest counterpart of this repo's plan-shape
  * assertions: a plan can LOOK map-side; these numbers prove whether any
  * bytes actually crossed a shuffle, spilled to disk, or piled onto one
  * skewed task.
  *
  * Implementation: a SparkListener accumulating per-task metrics for
  * the duration of the measured action. The listener bus is
  * asynchronous (and its drain API is private[spark]), so completion is
  * detected by polling the accumulators until they stabilize — fine for
  * a measurement utility whose actions run serially, the way Bench and
  * TimeOp run theirs.
  */
object Instrumentation {

  final case class RunMetrics(
      tasks: Long,
      stages: Long,
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      diskSpillBytes: Long,
      memorySpillBytes: Long,
      peakTaskShuffleWriteBytes: Long,
      inputRecords: Long,
      outputRows: Long) {
    /** Max single-task share of shuffle write — the skew signal: ~1/p for
      * a balanced p-partition stage, ~1.0 when one task carries the key.
      */
    def shuffleWriteSkew: Double =
      if (shuffleWriteBytes == 0) 0.0
      else peakTaskShuffleWriteBytes.toDouble / shuffleWriteBytes
  }

  /** Run `action` and return (result, metrics accumulated by its tasks).
    * Metrics cover everything the session executed between registration
    * and the post-action bus drain — measure one action at a time.
    */
  def measure[T](spark: SparkSession)(action: => T): (T, RunMetrics) = {
    val sc = spark.sparkContext
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val sRead = new java.util.concurrent.atomic.AtomicLong
    val sWrite = new java.util.concurrent.atomic.AtomicLong
    val dSpill = new java.util.concurrent.atomic.AtomicLong
    val mSpill = new java.util.concurrent.atomic.AtomicLong
    val peakW = new java.util.concurrent.atomic.AtomicLong
    val inRec = new java.util.concurrent.atomic.AtomicLong
    val outRows = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          tasks.incrementAndGet()
          sRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          val w = m.shuffleWriteMetrics.bytesWritten
          sWrite.addAndGet(w)
          peakW.getAndUpdate(p => math.max(p, w))
          dSpill.addAndGet(m.diskBytesSpilled)
          mSpill.addAndGet(m.memoryBytesSpilled)
          inRec.addAndGet(m.inputMetrics.recordsRead)
          outRows.addAndGet(m.outputMetrics.recordsWritten)
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    }
    sc.addSparkListener(listener)
    try {
      val result = action
      // the bus is async and its drain API is private[spark]: poll until
      // the accumulators stop moving (two consecutive quiet reads)
      def snapshot() = (tasks.get(), stages.get(), sRead.get(), sWrite.get())
      var prev = snapshot()
      var quiet = 0
      var waited = 0
      while (quiet < 2 && waited < 10000) {
        Thread.sleep(100); waited += 100
        val cur = snapshot()
        if (cur == prev) quiet += 1 else { quiet = 0; prev = cur }
      }
      (result, RunMetrics(tasks.get(), stages.get(), sRead.get(),
        sWrite.get(), dSpill.get(), mSpill.get(), peakW.get(),
        inRec.get(), outRows.get()))
    } finally sc.removeSparkListener(listener)
  }
}
