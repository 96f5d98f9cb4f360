package graft.olist

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** dbt hook semantics: model pre-/post-hooks bracket each
  * materialization in declaration order; on-run-start fires once before
  * any node, on-run-end once after the invocation — including failed runs.
  */
class HooksSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def newLog() =
    java.util.Collections.synchronizedList(new java.util.ArrayList[String]())

  test("pre/post hooks bracket each node; run hooks bracket the run") {
    import spark.implicits._
    val log = newLog()
    def mk(name: String, deps: Seq[String]) =
      Model(name, deps, Materialization.Table,
        (m: Map[String, DataFrame]) => {
          log.add(s"build:$name")
          m.values.headOption.getOrElse((1 to 3).toDF("x"))
        },
        preHooks = Seq(_ => log.add(s"pre:$name"), _ => log.add(s"pre2:$name")),
        postHooks = Seq(_ => log.add(s"post:$name")))
    val cat = new Catalog(spark,
      new Warehouse(spark, Files.createTempDirectory("graft_hooks").toString),
      Seq(mk("a", Nil), mk("b", Seq("a"))),
      onRunStart = Seq(_ => log.add("run-start")),
      onRunEnd = Seq((_, order) => log.add(s"run-end:${order.mkString(",")}")))
    cat.run(Seq("b"), withUpstream = true)
    assert(log.asScala.toSeq == Seq(
      "run-start",
      "pre:a", "pre2:a", "build:a", "post:a",
      "pre:b", "pre2:b", "build:b", "post:b",
      "run-end:a,b"))
  }

  test("on-run-end still fires when a node fails (dbt invocation-end hook)") {
    val log = newLog()
    val cat = new Catalog(spark,
      new Warehouse(spark, Files.createTempDirectory("graft_hooks2").toString),
      Seq(Model("boom", Nil, Materialization.Table,
        (_: Map[String, DataFrame]) => sys.error("node failure"))),
      onRunEnd = Seq((_, _) => log.add("run-end")))
    intercept[RuntimeException](cat.run(Seq("boom")))
    assert(log.asScala.toSeq == Seq("run-end"))
  }

  test("a failing pre-hook aborts the node before its build runs") {
    val log = newLog()
    val cat = new Catalog(spark,
      new Warehouse(spark, Files.createTempDirectory("graft_hooks3").toString),
      Seq(Model("m", Nil, Materialization.Table,
        (_: Map[String, DataFrame]) => { log.add("build"); sys.error("unreached") },
        preHooks = Seq(_ => sys.error("hook failure")))))
    intercept[RuntimeException](cat.run(Seq("m")))
    assert(log.asScala.isEmpty)
  }
}
