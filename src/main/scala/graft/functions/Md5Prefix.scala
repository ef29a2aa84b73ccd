package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The first `bits` bits of md5(input) as a long — the portable hash
  * every dedup/text query keys on — computed NATIVELY from the digest
  * bytes inside whole-stage codegen.
  *
  * Numerically identical to the declarative formula
  * `conv(substring(md5(col), 1, bits/4), 16, 10)` (the first k hex
  * characters ARE the top 4k bits of the digest), but skips the
  * 32-char hex-string materialization, the substring copy, and conv's
  * per-row base-16 string parse. On the shingle/token fan-outs this
  * expression runs once per token over the whole corpus — the
  * hottest scalar in the dedup suite — so the byte-path matters at
  * 100 TB. The DuckDB oracle side is unchanged:
  * `CAST('0x' || substr(md5(e), 1, k) AS BIGINT)`.
  */
case class Md5Prefix(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 60 && bits % 4 == 0,
    "bits must be a positive multiple of 4, at most 60 (sign-safe)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = s"graft_md5_$bits"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix.hash(input.asInstanceOf[UTF8String].getBytes, bits)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Prefix.hash($c.getBytes(), $bits)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)
}

object Md5Prefix {
  // MessageDigest is stateful — one instance per thread, reset per call
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Top `bits` bits of md5(bytes), right-aligned in a long. */
  def hash(bytes: Array[Byte], bits: Int): Long = {
    val m = md.get()
    m.reset()
    val d = m.digest(bytes)
    // assemble the first 8 digest bytes big-endian, then keep the top
    // `bits` — identical to parsing the first bits/4 hex chars
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> (64 - bits)
  }
}
