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
    time("sig")(noop(llm.Dedup.minhashSignatures(d, "doc_id", "text")))
    time("sig2")(noop(llm.Dedup.minhashSignatures(d, "doc_id", "text")))
    time("bands")(noop(llm.Dedup.lshBands(d, "doc_id", "text", 16, 4)))
    time("full")(noop(llm.Dedup.minHashNearDups(d)))
    time("full2")(noop(llm.Dedup.minHashNearDups(d)))
    spark.stop()
  }
}
