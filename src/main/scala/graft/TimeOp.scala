package graft

/** Time one query end-to-end (noop materialization): diagnostics for slow
  * operators. Usage: runMain graft.TimeOp <name> [sfDir]
  */
object TimeOp {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = Engine.local(8)
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"TIMEOP $name $secs%.2f s rows=${df.count()}")
    spark.stop()
  }
}
