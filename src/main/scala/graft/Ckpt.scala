package graft

import org.apache.spark.sql.DataFrame

/** The engine's ONE way to cut lineage inside an iterative operator.
  *
  * Every fixpoint here (CC label propagation, Borůvka merges, Brandes
  * levels, h-index rounds, EM iterations, ...) checkpoints each round so
  * plan depth stays bounded. All of those sites route through this
  * object so that two invariants hold everywhere:
  *
  *   - `reliable = true` swaps the fast local checkpoint for a RELIABLE
  *     one written to `spark.checkpoint.dir` (set via
  *     Engine.cluster(checkpointDir)) — executor-loss-safe on a real
  *     cluster at the cost of a durable write.
  *   - the preserved leaf statistics are CLAMPED to Long range
  *     ([[org.apache.spark.sql.graft.CheckpointStats]]); without the
  *     clamp, per-round size products compound across rounds into
  *     BigInts with millions of digits and the OPTIMIZER (not the job)
  *     becomes the bottleneck — a planner DoS that only manifests once
  *     the data is big enough to need more rounds, i.e. exactly at
  *     scale.
  */
object Ckpt {
  /** A cut is RELIABLE when the caller asks for it OR the session has a
    * durable checkpoint directory configured (Engine.cluster(
    * checkpointDir) / SPARK_GRAFT_CHECKPOINT_DIR) — so a deployment
    * that provisioned durable checkpoint storage gets executor-loss
    * safety in EVERY fixpoint without threading `reliable` through 50
    * call sites, and local runs keep the fast lossy localCheckpoint.
    */
  def cut(df: DataFrame, reliable: Boolean = false): DataFrame = {
    val durable = reliable ||
      df.sparkSession.sparkContext.getCheckpointDir.isDefined
    org.apache.spark.sql.graft.CheckpointStats.clamp(
      if (durable) df.checkpoint() else df.localCheckpoint())
  }
}
