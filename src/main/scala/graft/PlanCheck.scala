package graft
import org.apache.spark.sql.functions._
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val d = Tables.documents(spark, "/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("warm")(d.count())
    val exploded = llm.Dedup.withShingles(d, "doc_id", "text")
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    time("explode_count")(println("  rows=" + exploded.count()))
    time("explode_noop")(noop(exploded))
    def aggK(k: Int) = {
      val mins = (0 until k).map(h => min(xxhash64(lit(h), col("shingle"))).as(s"mh$h"))
      exploded.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    }
    time("agg4")(noop(aggK(4)))
    time("agg16")(noop(aggK(16)))
    time("agg64")(noop(aggK(64)))
    time("agg64_again")(noop(aggK(64)))
    spark.stop()
  }
}
