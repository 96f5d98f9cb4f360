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

  /** Survivorship — the step after linking that makes ER useful: collapse
    * each entity cluster to ONE golden record by per-column rules, the
    * classic MDM recipe (each rule is deliberately a different shape):
    *   - `name`: oldest-record-wins (`min_by` on the lowest member key);
    *   - `acctbal`: best-value-wins (max);
    *   - `mktsegment`: most-frequent-wins, ties to the lexicographically
    *     smallest (mode via a keyed count + row_number window).
    * One keyed aggregate + one bounded window over (entity, segment)
    * groups — nothing beyond the linking cost at 100 TB.
    */
  def goldenRecords(customers: DataFrame): DataFrame = {
    val linked = customers.select(col("c_custkey").as("customer_id"),
        col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      .join(linkCustomers(customers), Seq("customer_id"))
    val base = linked.groupBy(col("entity_id")).agg(
      count(lit(1)).as("n_records"),
      min_by(col("c_name"), col("customer_id")).as("name"),
      max(col("c_acctbal")).as("acctbal"))
    val segMode = linked
      .groupBy(col("entity_id"), col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("entity_id"))
          .orderBy(col("cnt").desc, col("c_mktsegment"))))
      .filter(col("rn") === 1)
      .select(col("entity_id"), col("c_mktsegment").as("mktsegment"))
    base.join(segMode, Seq("entity_id"))
  }

  /** Shared DuckDB replay of the blocking + verify + component walk,
    * through `labels(node, label)` — both linkage oracles build on it.
    */
  private val linkCte: String =
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
      |  FROM walk GROUP BY node)""".stripMargin

  private val linkOracle: String =
    s"""$linkCte
      |SELECT c.c_custkey AS customer_id,
      |       coalesce(l.label, c.c_custkey) AS entity_id
      |FROM customer c LEFT JOIN labels l ON l.node = c.c_custkey""".stripMargin

  private val goldenOracle: String =
    s"""$linkCte,
      |linked AS (
      |  SELECT c.c_custkey AS customer_id,
      |         coalesce(l.label, c.c_custkey) AS entity_id,
      |         c.c_name, c.c_acctbal, c.c_mktsegment
      |  FROM customer c LEFT JOIN labels l ON l.node = c.c_custkey),
      |base AS (
      |  SELECT entity_id, count(*) AS n_records,
      |         min_by(c_name, customer_id) AS name,
      |         max(c_acctbal) AS acctbal
      |  FROM linked GROUP BY 1),
      |segmode AS (
      |  SELECT entity_id, mktsegment FROM (
      |    SELECT entity_id, mktsegment,
      |           row_number() OVER (PARTITION BY entity_id
      |             ORDER BY cnt DESC, mktsegment) AS rn
      |    FROM (SELECT entity_id, c_mktsegment AS mktsegment,
      |                 count(*) AS cnt
      |          FROM linked GROUP BY 1, 2))
      |  WHERE rn = 1)
      |SELECT b.entity_id, b.n_records, b.name, b.acctbal, s.mktsegment
      |FROM base b JOIN segmode s USING (entity_id)""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("er_link_entities", linkOracle) { (s, d) =>
      linkCustomers(Tables.customer(s, d))
    },
    Op("er_golden_record", goldenOracle) { (s, d) =>
      goldenRecords(Tables.customer(s, d))
    })
}
