package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingles(text, n)` — a custom Generator (the UDTF surface):
  * one output row per n-word shingle of the input text, produced
  * directly from the raw string with no intermediate token/shingle
  * arrays materialized per row.
  *
  * vs. the declarative `explode(array_distinct(transform(sequence(...),
  * ...)))` used in Dedup.shingles: same relation, but the generator
  * walks the string once and emits lazily — no per-row array allocation
  * of all shingles before the explode. Distinctness is left to the
  * caller (it is an aggregation concern, not a generation concern).
  */
case class Shingles(child: Expression, nExpr: Expression)
    extends Generator with CodegenFallback {

  private lazy val n: Int = nExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_shingles n must be an integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(child, nExpr)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"graft_shingles expects a string, got ${child.dataType.sql}")
    else if (!nExpr.foldable ||
        !(nExpr.dataType == IntegerType || nExpr.dataType == LongType))
      TypeCheckFailure("graft_shingles n must be an integer literal")
    else if (n < 1) TypeCheckFailure(s"graft_shingles n must be >= 1, got $n")
    else TypeCheckSuccess
  }

  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val words = v.asInstanceOf[UTF8String].toString.split(' ')
      if (words.length < n) Nil
      else (0 to words.length - n).iterator.map { i =>
        InternalRow(UTF8String.fromString(
          words.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Shingles =
    copy(child = newChildren(0), nExpr = newChildren(1))
}

object Shingles {
  /** Single function builder shared by [[register]] and GraftExtensions. */
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "graft_shingles takes (text, n)")
    Shingles(exprs.head, exprs(1))
  }

  /** Registers `graft_shingles(text, n)` in the session registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", builder, "built-in")
}
