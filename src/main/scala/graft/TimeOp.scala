package graft

/** Time one query end-to-end (noop materialization): diagnostics for slow
  * operators. Warm-up pass first (codegen/JIT/footers), then three timed
  * passes — the MIN is the steady-state number comparable to Bench's warm
  * measurements. Usage: runMain graft.TimeOp <name> [sfDir]
  */
object TimeOp {
  def main(args: Array[String]): Unit = {
    // comma-separated names probe several ops in one JVM (each still
    // gets its own warm-up + min-of-3) — the scaling-probe batch mode
    val names = args(0).split(',').toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.local(cpus.toInt)
    names.foreach { name =>
      def pass(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      pass() // warm-up
      val times = Seq.fill(3)(pass())
      println(f"TIMEOP $name warm-min=${times.min}%.2f s " +
        times.map(t => f"$t%.2f").mkString("passes=[", ", ", "] s"))
    }
    spark.stop()
  }
}
