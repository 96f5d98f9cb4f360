package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed joins — the manual fallback when AQE's
  * skew-join splitting can't apply (e.g. a skewed key feeding a
  * non-sort-merge join, or a join inside a cached/streamed subtree).
  *
  * `saltedJoin(fact, dim, key, buckets)`:
  *   - the fact side gets a deterministic per-row salt in [0, buckets)
  *     derived by hashing the whole row's join-irrelevant identity (the
  *     passed `saltBy` columns), spreading one hot key over `buckets`
  *     shuffle partitions;
  *   - the dim side is replicated `buckets` times (explode of a literal
  *     range — cheap when dim << fact, which is exactly the skew-join
  *     setting);
  *   - the equi-join runs on (key, salt), then salt is dropped.
  *
  * Result is row-identical to the unsalted join (asserted in SkewSpec);
  * only the shuffle distribution changes.
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int, saltBy: Seq[String],
                 joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // The dim side is replicated `buckets` times, so any join type that
    // emits unmatched DIM rows (right/full outer) would emit each of them
    // `buckets` times — only fact-side-preserving types are row-identical
    // to the unsalted join.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(
        joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin only preserves fact-side semantics; got '$joinType'")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltBy.map(col): _*), lit(buckets)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
