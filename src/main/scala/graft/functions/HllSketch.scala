package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch as a TypedImperativeAggregate — the
  * UDAF extension surface (SURVEY.md §4). 2^12 = 4096 byte registers
  * (σ ≈ 1.04/√m ≈ 1.6%), the estimator of Flajolet, Fusy, Gandouet &
  * Meunier, "HyperLogLog: the analysis of a near-optimal cardinality
  * estimation algorithm" (AofA 2007), with the linear-counting
  * small-range correction (Whang et al. 1990).
  *
  * The buffer is the raw register array, so partial aggregation ships
  * 4 KiB per group per partition and merge is an elementwise max — the
  * map-side-combinable shape that makes distinct counting feasible at
  * 100 TB where an exact distinct would shuffle every key.
  *
  * Cross-checked in q_agg_approx against the exact count (±5%) rather
  * than against another engine's HLL — sketch internals are
  * implementation-defined, accuracy bounds are not.
  */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HllSketch.{M, insert, registerMax}

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    registerMax(buf, other)

  override def eval(buf: Array[Byte]): Any = HllSketch.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll"

  override def withNewMutableAggBufferOffset(n: Int): HllSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

object HllSketch {
  private[graft] val P = 12
  private[graft] val M = 1 << P // 4096 registers

  /** splitmix64 — a strong, cheap, deterministic 64-bit mixer. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over the raw bytes — full 64-bit entropy for strings
    * (a 32-bit hashCode pre-hash would cap the sketch at ~2^32 and bias
    * large cardinalities low), then the splitmix finalizer. */
  private def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix(h)
  }

  private def hashOf(v: Any): Long = v match {
    case l: Long => mix(l)
    case i: Int => mix(i.toLong)
    case s: UTF8String => hashBytes(s.getBytes)
    case d: Double => mix(java.lang.Double.doubleToLongBits(d))
    case f: Float => mix(java.lang.Float.floatToIntBits(f).toLong)
    case b: Array[Byte] => hashBytes(b)
    case sh: Short => mix(sh.toLong)
    case by: Byte => mix(by.toLong)
    case bo: Boolean => mix(if (bo) 1L else 0L)
    case dec: org.apache.spark.sql.types.Decimal =>
      hashBytes(dec.toJavaBigDecimal.unscaledValue.toByteArray)
    case other => hashBytes(other.toString.getBytes("UTF-8"))
  }

  /** Insert one value into a register array (mutates `buf`). */
  private[graft] def insert(buf: Array[Byte], v: Any): Unit = {
    val h = hashOf(v)
    val idx = (h >>> (64 - P)).toInt
    val rest = h << P
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | 1L) + 1).toByte
    if (rank > buf(idx)) buf(idx) = rank
  }

  /** Elementwise register max — the HLL union (mutates and returns
    * `buf`). Order-free and idempotent, which is what makes per-file
    * sketches mergeable across any pruning subset. */
  private[graft] def registerMax(
      buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    require(other.length == M, s"not a graft_hll register array")
    var i = 0
    while (i < M) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  /** The FFGM estimator with linear-counting small-range correction.
    *
    * The register sum Σ 2^−reg is computed EXACTLY in integer units of
    * 2^−64 (terms are powers of two; a float fold over 4096 registers
    * rounds at nearly every add and its value depends on fold order),
    * then collapses to double in ONE division. That makes the estimate
    * an order-free pure function of the register ARRAY — so a DuckDB
    * oracle can replay it bit-for-bit (HUGEINT sum + the same two IEEE
    * ops), turning the HLL accuracy verdict into a value-exact check
    * (q_agg_approx). */
  private[graft] def estimate(buf: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    // per-register-value histogram: ranks are ≤ 64, so S = Σ cnt(r)·2^(64−r)
    val cnt = new Array[Int](65)
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = buf(i).toInt
      cnt(r) += 1
      if (r == 0) zeros += 1
      i += 1
    }
    var s = java.math.BigInteger.ZERO
    var r = 0
    while (r <= 64) {
      if (cnt(r) > 0)
        s = s.add(java.math.BigInteger.valueOf(cnt(r).toLong)
          .shiftLeft(64 - r))
      r += 1
    }
    val invSum = s.doubleValue() / 1.8446744073709552E19 // = 2^64 exactly
    val raw = alpha * M.toDouble * M.toDouble / invSum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.round(est)
  }

  /** Single function builder shared by [[register]] and GraftExtensions. */
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "graft_hll takes exactly 1 argument")
    HllSketch(exprs.head)
  }

  private[graft] val regsBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "graft_hll_regs takes exactly 1 argument")
    HllRegisters(exprs.head)
  }

  /** Registers `graft_hll(col)` (the estimate) and `graft_hll_regs(col)`
    * (the raw register blob, for sketch tables) in the session
    * function registry. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll", builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_regs", regsBuilder, "built-in")
  }
}

/** The same sketch, evaluated to its RAW REGISTER ARRAY instead of the
  * estimate — what a persisted statistics row stores so that unions
  * across arbitrary file subsets stay possible (register max), with
  * the estimate taken once at read time. The zone-map source's
  * per-column NDV statistics are built from these. */
case class HllRegisters(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HllSketch.{M, insert, registerMax}

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    registerMax(buf, other)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_regs"

  override def withNewMutableAggBufferOffset(n: Int): HllRegisters =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllRegisters =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(
      newChild: Expression): HllRegisters =
    copy(child = newChild)
}
