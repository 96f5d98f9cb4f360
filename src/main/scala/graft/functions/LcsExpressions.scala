package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-row LCS dynamic program over two token arrays — the kernel
  * behind ROUGE-L. O(m·n) time, O(n) space, zero allocation beyond the two
  * int rows; runs as straight-line JVM code inside whole-stage codegen
  * (preference-ladder case (b): a native Expression, not a UDF).
  *
  * The DuckDB oracle replays the SAME recurrence by anti-diagonal
  * recursion (each diagonal depends only on the previous two, so a
  * recursive CTE can carry a pair of integer lists per row — see
  * LlmOps-style replay in Evals.scala) and must produce identical exact
  * integers.
  */
object LcsKernel {
  def lcsLen(a: ArrayData, b: ArrayData): Long = {
    val m = a.numElements()
    val n = b.numElements()
    if (m == 0 || n == 0) return 0L
    val bs = new Array[UTF8String](n)
    var j = 0
    while (j < n) { bs(j) = b.getUTF8String(j); j += 1 }
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 0
    while (i < m) {
      val ai = a.getUTF8String(i)
      j = 0
      while (j < n) {
        val diag = if (ai != null && ai.equals(bs(j))) prev(j) + 1 else 0
        val best = math.max(math.max(prev(j + 1), cur(j)), diag)
        cur(j + 1) = best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n).toLong
  }
}

/** `lcs_len(array<string>, array<string>) -> bigint` — exact longest common
  * subsequence length between two token sequences.
  */
case class LcsLen(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall {
      _.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lcs_len needs two array<string>, got ${left.dataType}, " +
        s"${right.dataType}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    LcsKernel.lcsLen(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.LcsKernel.lcsLen($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LcsLen = copy(l, r)
  override def prettyName: String = "lcs_len"
}
