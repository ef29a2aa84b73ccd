package graft

import graft.functions.TextAnalysis.{h32, h60}
import org.apache.spark.sql.functions._

/** The native Md5Prefix expression must be bit-identical to the
  * declarative conv(substring(md5(...))) formula it replaced — that
  * formula is what the DuckDB oracle mirrors. */
class HashSpec extends SparkSpec {

  private def declarative(c: org.apache.spark.sql.Column, hexChars: Int) =
    conv(substring(md5(c.cast("binary")), 1, hexChars), 16, 10).cast("long")

  test("Md5Prefix equals the declarative md5-hex formula on real tokens") {
    val toks = Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
    // null-safe inequality: a native-null vs declarative-value divergence
    // must surface as a mismatch, not vanish into three-valued logic
    val bad = toks.select(
        h60(col("t")).as("native60"), declarative(col("t"), 15).as("decl60"),
        h32(col("t")).as("native32"), declarative(col("t"), 8).as("decl32"))
      .filter(!(col("native60") <=> col("decl60"))
        || !(col("native32") <=> col("decl32")))
      .take(3)
    assert(bad.isEmpty, bad.mkString(","))
  }

  test("Md5Prefix handles empty, unicode, and null input") {
    import spark.implicits._
    val df = Seq(Some(""), Some("héllo wörld é中文"), None)
      .toDF("t")
    val rows = df.select(h60(col("t")).as("n"),
      declarative(col("t"), 15).as("d")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
    // null in, null out
    assert(rows.exists(_.isNullAt(0)))
  }

  test("Md5Prefix stays inside whole-stage codegen") {
    val df = Tables(spark, sfDir, "documents")
      .select(h60(col("text")).as("h"))
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    // pin the GENERATED CALL, not just the presence of a codegen stage —
    // a fallback-to-interpreted regression would still print a
    // WholeStageCodegen subtree
    assert(codegen.contains("graft.functions.Md5Prefix.hash"), codegen)
  }
}
