package graft.operators

import graft.{Op, Tables}
import graft.llm.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage — the canonical dedup shape for
  * OPERATIONAL records (customers, suppliers) rather than documents:
  *
  *   1. BLOCKING: candidate pairs only within a cheap equality block
  *     (here nation × market segment), never the full cross product.
  *     The quadratic term is per-block; block cardinality is the knob a
  *     100 TB run tunes (add blocking keys until the largest block's
  *     pair count fits a task; skewed blocks split under AQE).
  *   2. VERIFY: an edit-distance predicate on the name inside the block
  *     join — Spark's codegen'd `levenshtein`, identical to DuckDB's, so
  *     the oracle replays candidate selection exactly.
  *   3. CLUSTER: verified pairs feed the same pointer-jumping
  *     connected-components fixpoint the document pipeline uses
  *     (Dedup.componentMinLabels) — transitive matches collapse to one
  *     entity (A~B, B~C ⇒ one cluster even when A!~C).
  *
  * Output: every source record with its canonical entity id (the minimum
  * member key — records with no fuzzy match are their own entity).
  */
object Linkage {

  def linkCustomers(customers: DataFrame): DataFrame = {
    // Probe side repartitioned ON THE BLOCKING KEY: the in-block pair
    // enumeration is the quadratic term, so its parallelism must track
    // the number of blocks, not the source file count — a dimension-sized
    // table arrives as one parquet split, and a broadcast join would run
    // every block's O(m²) verify in that single task (measured 3.2s of
    // the op's 4.9s at sf0.1; the shuffle moves only the slim key+name
    // projection).
    val a = customers.select(col("c_custkey").as("id_a"),
      col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
      col("c_name").as("name_a"))
      .repartition(col("nk"), col("seg"))
    val b = customers.select(col("c_custkey").as("id_b"),
      col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
      col("c_name").as("name_b"))
    // Banded edit distance: the 3-arg levenshtein computes only the
    // ±threshold diagonal (O(len·k) per pair, -1 past the bound) instead
    // of the full O(len²) DP — the verify predicate is the hot loop of
    // any blocking-based linkage. Same pair set as `levenshtein(x,y)<=1`,
    // which is what the DuckDB oracle replays.
    val pairs = a.join(b, Seq("nk", "seg"))
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("name_a"), col("name_b"), 1) =!= -1)
      .select("id_a", "id_b")
    val labels = Dedup.componentMinLabels(pairs)
    customers.select(col("c_custkey").as("customer_id"))
      .join(labels.select(col("node").as("customer_id"),
        col("label")), Seq("customer_id"), "left")
      .select(col("customer_id"),
        coalesce(col("label"), col("customer_id")).as("entity_id"))
  }

  private val linkOracle: String =
    """WITH RECURSIVE pairs AS (
      |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      |  FROM customer a JOIN customer b
      |    ON a.c_nationkey = b.c_nationkey
      |   AND a.c_mktsegment = b.c_mktsegment
      |   AND a.c_custkey < b.c_custkey
      |   AND levenshtein(a.c_name, b.c_name) <= 1),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs),
      |walk(node, reach) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT w.node, e.dst FROM walk w JOIN edges e ON e.src = w.reach),
      |labels AS (
      |  SELECT node, least(node, min(reach)) AS label
      |  FROM walk GROUP BY node)
      |SELECT c.c_custkey AS customer_id,
      |       coalesce(l.label, c.c_custkey) AS entity_id
      |FROM customer c LEFT JOIN labels l ON l.node = c.c_custkey""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("er_link_entities", linkOracle) { (s, d) =>
      linkCustomers(Tables.customer(s, d))
    })
}
