package graft.olist

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** D1–D3: model registry, DAG scheduling, and `--select` semantics.
  *
  * The reference wires models with `ref()` (reference:
  * models/marts/fct_orders.sql:2,6,14; resolver dbt/context/providers.py:679-697),
  * builds a DAG from the recorded edges (dbt/compilation.py:132,190) and runs
  * nodes in topological order (dbt/task/runnable.py:317). Here the registry is
  * typed Scala: a `Model` couples its name, dependency names, materialization
  * and a build function from resolved dependency DataFrames. `ref()` becomes
  * `Catalog.ref(name)` — a lookup that either reads the stored relation or
  * composes the lazy plan, exactly the view-vs-table split dbt configures in
  * dbt_project.yml:35-36.
  */
sealed trait Materialization
object Materialization {
  /** S3: query stored, re-expanded per reader — a lazy DataFrame. Catalyst
    * inlines it into every consumer, which is strictly more optimizable than
    * dbt's per-view relation boundary.
    */
  case object View extends Materialization

  /** S4: CTAS — persisted to the warehouse, readers scan the stored bytes. */
  case object Table extends Materialization

  /** S1: CSV -> stored table. */
  case object Seed extends Materialization

  /** dbt's incremental materialization with the merge strategy on a unique
    * key (available-but-unused in the reference — SURVEY §2.9): the first
    * run is a full build; later runs keep stored rows whose key is absent
    * from the new batch and replace the rest. At scale this rewrites only
    * the table, never rescans upstream history — the build function decides
    * what "new batch" means (typically a timestamp predicate).
    */
  final case class Incremental(uniqueKey: String) extends Materialization
}

final case class Model(
    name: String,
    deps: Seq[String],
    materialized: Materialization,
    build: Map[String, DataFrame] => DataFrame)

/** S4 sink + S2 scan: a directory of parquet tables standing in for the
  * warehouse. Writes are distributed (no coalesce — the writer parallelism is
  * the upstream partitioning; at cluster scale that is the whole point of the
  * sink).
  */
final class Warehouse(spark: SparkSession, val dir: String) {
  private def path(name: String) = s"$dir/$name"
  def save(name: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(path(name))
  def load(name: String): DataFrame = spark.read.parquet(path(name))
  def exists(name: String): Boolean =
    new java.io.File(path(name)).exists()

  /** Replace a table with a plan that READS the same table: write to a
    * scratch location first, then swap directories. Overwriting a parquet
    * path while a lazy plan still scans it corrupts the read — the classic
    * self-referential merge trap.
    */
  def replace(name: String, df: DataFrame): Unit = {
    val tmp = s"${path(name)}__tmp"
    df.write.mode("overwrite").parquet(tmp)
    val target = new java.io.File(path(name))
    def delete(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(delete)
      f.delete()
    }
    if (target.exists()) delete(target)
    if (!new java.io.File(tmp).renameTo(target))
      throw new java.io.IOException(s"swap failed for $name")
  }
}

final class Catalog(
    val spark: SparkSession,
    val warehouse: Warehouse,
    models: Seq[Model]) {

  private val byName: Map[String, Model] = models.map(m => m.name -> m).toMap

  def model(name: String): Model = byName.getOrElse(name,
    throw new NoSuchElementException(
      s"ref('$name') resolves to no registered model — the dbt analog is a " +
        "compile-time 'depends on a node which was not found' error"))

  /** S2: `ref(name)` — the dependency's DataFrame. Tables and seeds read the
    * stored relation; views re-expand lazily (so a consumer's filters push
    * all the way down into the seed scans).
    */
  def ref(name: String): DataFrame = {
    val m = model(name)
    m.materialized match {
      case Materialization.View => m.build(resolveDeps(m))
      case _ =>
        if (!warehouse.exists(name))
          throw new IllegalStateException(
            s"relation '$name' not found in warehouse ${warehouse.dir} — " +
              "run it (or seed) first, like dbt's Database Error on a " +
              "missing upstream relation")
        warehouse.load(name)
    }
  }

  private def resolveDeps(m: Model): Map[String, DataFrame] =
    m.deps.map(d => d -> ref(d)).toMap

  /** D2: deterministic topological order of `names` plus (optionally) all
    * ancestors. Kahn's algorithm with name-sorted tie-break so run order is
    * stable across JVMs.
    */
  def topo(names: Seq[String], withUpstream: Boolean): Seq[String] = {
    val wanted = scala.collection.mutable.Set[String]()
    def visit(n: String): Unit = if (!wanted(n)) {
      wanted += n
      if (withUpstream) model(n).deps.foreach(visit)
    }
    names.foreach(visit)
    val remaining = scala.collection.mutable.Set(wanted.toSeq: _*)
    val order = scala.collection.mutable.ArrayBuffer[String]()
    while (remaining.nonEmpty) {
      val ready = remaining.toSeq.sorted
        .filter(n => model(n).deps.forall(d => !remaining(d)))
      if (ready.isEmpty)
        throw new IllegalStateException(s"cycle among ${remaining.toSeq.sorted}")
      order ++= ready
      remaining --= ready
    }
    order.toSeq
  }

  /** D3: `run --select <names>`. Like dbt, a bare select does NOT rebuild
    * ancestors (`withUpstream = false` — reference: automate_pipeline.py:10
    * runs `--select fct_orders` assuming staging exists); `withUpstream =
    * true` mirrors dbt's `+fct_orders`. Views cost nothing to "run" (their
    * materialization is the lazy plan itself) but are registered as temp
    * views so SQL readers can also see them.
    */
  def run(select: Seq[String], withUpstream: Boolean = false): Seq[String] = {
    val order = topo(select, withUpstream)
    order.foreach { name =>
      val m = model(name)
      m.materialized match {
        case Materialization.View =>
          m.build(resolveDeps(m)).createOrReplaceTempView(name)
        case Materialization.Incremental(key) =>
          val fresh = m.build(resolveDeps(m))
          if (!warehouse.exists(name)) warehouse.save(name, fresh)
          else {
            val kept = warehouse.load(name)
              .join(fresh.select(col(key)).distinct(), Seq(key), "left_anti")
            warehouse.replace(name, kept.unionByName(fresh))
          }
        case _ =>
          warehouse.save(name, m.build(resolveDeps(m)))
      }
    }
    order
  }
}
