package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the engine's portable md5 draw idiom.
  *
  * Every resampling / fanout / masking operator draws its pseudo-random
  * integers as `CAST(conv(substring(md5(s), start, len), 16, 10) AS
  * BIGINT)` — a draw both engines (Spark and the DuckDB oracle) compute
  * bit-identically from the md5 hex string. The composed form pays for
  * that portability three times per draw: materialize the 32-char hex
  * string, slice it (`substring`), and parse the slice back out of hex
  * (`conv`). These kernels compute the SAME integers straight from the
  * 16 digest bytes — `MessageDigest("MD5")` over the UTF-8 bytes of `s`
  * is exactly what Spark's `md5(s)` hex-encodes, and a hex slice
  * [start, start+len-1] (1-indexed) is the big-endian nibble run
  * [start-1, start+len-2] of the digest — so the values are
  * byte-for-byte the composed formulation's and every DuckDB oracle
  * replay is untouched (Md5DrawParitySpec pins the equivalence).
  *
  * Same native-kernel rationale as minhash_md5 (ladder rung (b)): the
  * draw sites are the hot loop of the two heaviest sf1 bench entries
  * (f_permutation_test, f_bootstrap_ci — 32 draws per input row), where
  * the hex build + substring + conv parse is pure overhead on top of
  * the digest itself.
  */
object Md5Draws {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** The four 32-bit draws of one digest: slice j (hex chars
    * [8j+1, 8j+8]) = digest bytes [4j, 4j+3] big-endian unsigned.
    * Invoked from generated code — keep the signature JVM-friendly.
    */
  def slices32(s: UTF8String): ArrayData = {
    val md = digests.get()
    md.reset()
    val dig = md.digest(s.getBytes)
    val out = new Array[Long](4)
    var j = 0
    while (j < 4) {
      out(j) = ((dig(4 * j) & 0xffL) << 24) |
        ((dig(4 * j + 1) & 0xffL) << 16) |
        ((dig(4 * j + 2) & 0xffL) << 8) |
        (dig(4 * j + 3) & 0xffL)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** One draw: the big-endian value of hex chars [start, start+len-1]
    * (1-indexed, len <= 15 so the value fits a signed long the way
    * conv's decimal string does through CAST AS BIGINT).
    */
  def bits(s: UTF8String, start: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    val dig = md.digest(s.getBytes)
    var v = 0L
    var i = start - 1 // 0-indexed first nibble
    val end = start - 1 + len
    while (i < end) {
      val b = dig(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

/** `md5_slices32(s)` -> array<bigint> — the four 32-bit draws of
  * md5(s), element j byte-equal to
  * `CAST(conv(substring(md5(s), 1 + j*8, 8), 16, 10) AS BIGINT)`.
  */
case class Md5Slices32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(a: Any): Any =
    Md5Draws.slices32(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Draws.slices32($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Slices32 =
    copy(child = newChild)

  override def prettyName: String = "md5_slices32"
}

/** `md5_bits(s, start, len)` -> bigint — byte-equal to
  * `CAST(conv(substring(md5(s), start, len), 16, 10) AS BIGINT)` for
  * 1 <= start, len <= 15, start + len - 1 <= 32.
  */
case class Md5Bits(child: Expression, start: Int, len: Int)
    extends UnaryExpression {

  require(start >= 1 && len >= 1 && len <= 15 && start + len - 1 <= 32,
    s"invalid hex slice [start=$start, len=$len]")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(a: Any): Any =
    Md5Draws.bits(a.asInstanceOf[UTF8String], start, len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Draws.bits($c, $start, $len);")

  override protected def withNewChildInternal(newChild: Expression): Md5Bits =
    copy(child = newChild)

  override def prettyName: String = "md5_bits"
}
