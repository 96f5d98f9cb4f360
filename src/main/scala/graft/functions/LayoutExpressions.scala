package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `zorder_rank` — map a numeric value to its quantile bucket via binary
  * search over a FROZEN sorted boundary array (the Delta-style
  * range_partition_id step of z-ordering: interleave RANKS, not raw
  * keys, so the curve's cells are power-of-2 aligned and equi-depth
  * regardless of the raw domain or its skew).
  *
  * The boundaries ride the plan as an expression-held literal array —
  * computed once from a one-pass quantile sketch, O(buckets) driver
  * state, broadcast with the plan like the PQ codebooks. Per row this is
  * one O(log buckets) binary search in tight JVM code; no window, no
  * shuffle, no per-row allocation — the scalable alternative to the
  * global ntile window a naive ranker needs.
  */
case class RankBucket(child: Expression, bounds: Array[Double])
    extends UnaryExpression {

  require(bounds.nonEmpty, "bounds must be non-empty")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"input must be double, got ${child.dataType}")

  override def nullSafeEval(a: Any): Any =
    LayoutKernels.rankBucket(a.asInstanceOf[Double], bounds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", bounds, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LayoutKernels.rankBucket($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): RankBucket =
    copy(child = newChild)

  override def prettyName: String = "zorder_rank"
}

object LayoutKernels {
  /** Bucket of `v` among `bounds` (sorted ascending): the count of
    * boundaries <= v, i.e. 0 for v < bounds(0), bounds.length past the
    * last — searchsorted-right via binary search.
    */
  def rankBucket(v: Double, bounds: Array[Double]): Long = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}
