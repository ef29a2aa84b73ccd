package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter membership sketch (Bloom, "Space/time trade-offs in hash
  * coding with allowable errors", CACM 1970) with Kirsch–Mitzenmacher
  * double hashing ("Less hashing, same performance", ESA 2006): k probe
  * positions derived from ONE 63-bit hash, so build and probe cost one
  * hash plus k bit tests regardless of k.
  *
  * Why it earns a place next to [[HllSketch]]/[[ThetaSketch]]: those
  * answer "how many distinct"; a Bloom filter answers "is this one a
  * member" with NO false negatives — the sketch that turns a
  * too-big-to-broadcast key set into a broadcastable prefilter. The
  * canonical 100 TB use is benchmark decontamination (q_decontam_bloom):
  * a contamination shingle set of 10⁸ 8-byte hashes is ~800 MB as a
  * broadcast set, but ~120 MB as a 10-bits-per-key Bloom filter — and the
  * filter thins the corpus-side probe BEFORE the exact-confirm join's
  * exchange, so the shuffle carries only true hits plus the ~1% false
  * positives instead of every corpus shingle. Same mechanism as Spark's
  * own runtime `InjectRuntimeFilter` bloom — made explicit, persistable,
  * and available where the optimizer's heuristic doesn't reach.
  *
  * Determinism: value identity is [[ThetaSketch.hash63]] (FNV-1a 64 +
  * splitmix finalizer — shared across the sketch family), bit positions
  * are a pure function of that hash, and merge is a bitwise OR — so the
  * sketch bytes are identical under any row order, partitioning, or
  * merge tree, and a query using the filter as a PREFILTER (followed by
  * an exact confirm) is bit-for-bit reproducible and oracle-checkable.
  *
  * The aggregate evaluates to the serialized filter (BinaryType):
  * `[numBits:int][numHashes:int][ceil(numBits/64) big-endian longs]`.
  * [[BloomMightContain]] probes that binary without deserializing.
  */
case class BloomSketch(
    child: Expression,
    bitsExpr: Expression,
    hashesExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val numBits: Int = BloomSketch.foldInt(bitsExpr).get
  private lazy val numHashes: Int = BloomSketch.foldInt(hashesExpr).get

  override def children: Seq[Expression] = Seq(child, bitsExpr, hashesExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    import TypeCheckResult._
    def intLit(e: Expression) = e.foldable &&
      (e.dataType == IntegerType || e.dataType == LongType)
    if (!intLit(bitsExpr) || !intLit(hashesExpr))
      TypeCheckFailure("graft_bloom(value, numBits, numHashes): numBits and " +
        "numHashes must be integer literals")
    else (BloomSketch.foldInt(bitsExpr), BloomSketch.foldInt(hashesExpr)) match {
      case (None, _) | (_, None) =>
        TypeCheckFailure("graft_bloom sizes must not be null")
      case (Some(m), _) if m < 64 || m > (1 << 30) =>
        TypeCheckFailure(s"graft_bloom numBits must be in [64, 2^30], got $m")
      case (_, Some(k)) if k < 1 || k > 16 =>
        TypeCheckFailure(s"graft_bloom numHashes must be in [1, 16], got $k")
      case _ => TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((numBits + 63) >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h1 = ThetaSketch.hash63(v)
      val h2 = BloomRuntime.secondHash(h1)
      var i = 0
      while (i < numHashes) {
        val p = ((h1 + i * h2) & Long.MaxValue) % numBits
        buf((p >>> 6).toInt) |= 1L << (p & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.length)
    bb.putInt(numBits).putInt(numHashes)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getInt(); bb.getInt() // sizes — fixed per aggregate instance
    val words = new Array[Long]((bytes.length - 8) >>> 3)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    words
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"

  override def withNewMutableAggBufferOffset(n: Int): BloomSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomSketch =
    copy(child = newChildren(0), bitsExpr = newChildren(1),
      hashesExpr = newChildren(2))
}

object BloomSketch {
  private[functions] def foldInt(e: Expression): Option[Int] =
    Option(e.eval(InternalRow.empty)).map {
      case i: Int => i
      case l: Long => l.toInt
    }

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, "graft_bloom takes (value, numBits, numHashes)")
    BloomSketch(exprs(0), exprs(1), exprs(2))
  }
  val mightContainBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "graft_bloom_contains takes (sketch, value)")
    BloomMightContain(exprs(0), exprs(1))
  }

  /** Registers graft_bloom / graft_bloom_contains. */
  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("graft_bloom", builder, "built-in")
    r.createOrReplaceTempFunction(
      "graft_bloom_contains", mightContainBuilder, "built-in")
  }
}

/** Static probe kernel, shaped for whole-stage codegen: the generated
  * Java calls these forwarders directly, so the per-row cost is one hash
  * + k bit reads straight off the serialized bytes — no deserialization,
  * no Expression.eval virtual dispatch in the scan loop. (Contrast
  * [[ThetaEstimate]]'s CodegenFallback, which is fine because sketch
  * FINALIZERS run once per group; a membership probe runs once per fact
  * row and sits inside the hottest loop of the plan.) */
object BloomRuntime {
  /** Kirsch–Mitzenmacher second hash. MUST be a full-width finalizer
    * (murmur3 fmix64 here), not a bare multiply: with a power-of-two
    * numBits, `p mod m` keeps only LOW bits, and `h1 * C` mod 2^16
    * depends only on h1 mod 2^16 — that version collapsed the whole
    * probe sequence to 16 bits of entropy and measured 6% FPP where
    * theory says 0.07% (any probe whose low 16 bits collided with an
    * inserted key hit all k positions at once). The xor-shifts fold the
    * high bits back down so h2 mod m sees the full 63. Forced odd so the
    * probe stride is coprime with the power-of-two bit count. */
  def secondHash(h1: Long): Long = {
    var z = h1 ^ (h1 >>> 33)
    z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33
    z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33
    z | 1L
  }

  /** Probe the serialized filter with a pre-computed 63-bit hash. */
  def mightContainHash(sk: Array[Byte], h1: Long): Boolean = {
    val numBits = readInt(sk, 0)
    val k = readInt(sk, 4)
    val h2 = secondHash(h1)
    var i = 0
    while (i < k) {
      val p = ((h1 + i * h2) & Long.MaxValue) % numBits
      val word = readLong(sk, 8 + ((p >>> 6).toInt << 3))
      if ((word & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def mightContainLong(sk: Array[Byte], v: Long): Boolean =
    mightContainHash(sk, ThetaSketch.hash63(v))
  def mightContainUtf8(sk: Array[Byte], v: UTF8String): Boolean =
    mightContainHash(sk, ThetaSketch.hash63(v))

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def readLong(b: Array[Byte], off: Int): Long =
    ((readInt(b, off) & 0xffffffffL) << 32) | (readInt(b, off + 4) & 0xffffffffL)
}

/** `graft_bloom_contains(sketch, value)` — true iff `value` MAY be in the
  * set the sketch summarizes (no false negatives; false-positive rate set
  * by the build's bits-per-key). Generates inline Java so the probe lives
  * INSIDE whole-stage codegen — this expression is designed to sit in a
  * Filter directly above a 100 TB scan. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a bloom sketch (binary), got ${left.dataType.sql}")
    else right.dataType match {
      case LongType | IntegerType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports BIGINT/INT/STRING probes, got ${other.sql}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  private def kernel: String = right.dataType match {
    case LongType => "mightContainLong"
    case IntegerType => "mightContainLong"
    case StringType => "mightContainUtf8"
    case other => throw new IllegalStateException(other.sql)
  }

  override protected def nullSafeEval(sk: Any, v: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    v match {
      case l: Long => BloomRuntime.mightContainLong(bytes, l)
      case i: Int => BloomRuntime.mightContainLong(bytes, i.toLong)
      case s: UTF8String => BloomRuntime.mightContainUtf8(bytes, s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, v) => {
      val cast = if (right.dataType == IntegerType) "(long) " else ""
      s"${ev.value} = graft.functions.BloomRuntime.$kernel($sk, $cast$v);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
