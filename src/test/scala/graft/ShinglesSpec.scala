package graft

import graft.functions.Shingles
import org.apache.spark.sql.functions._

/** The custom Generator must produce exactly the shingle relation the
  * declarative derivation produces. */
class ShinglesSpec extends SparkSpec {

  test("matches the declarative shingle derivation on real documents") {
    Shingles.register(spark)
    val docs = Tables(spark, sfDir, "documents").limit(100)
    val viaGen = docs.select(col("doc_id"),
      expr("graft_shingles(text, 3)").as("shingle"))
    val toks = split(col("text"), " ")
    val viaDecl = docs
      .filter(size(toks) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))).as("shingle"))
    assert(viaGen.exceptAll(viaDecl).count() == 0
      && viaDecl.exceptAll(viaGen).count() == 0)
  }

  test("short and null inputs generate no rows") {
    Shingles.register(spark)
    import spark.implicits._
    val df = Seq(Some("one two"), Some("a b c"), None).toDF("text")
    val out = df.select(expr("graft_shingles(text, 3)")).collect()
    assert(out.length == 1 && out(0).getString(0) == "a b c")
  }

  test("rejects non-string input and n < 1 at analysis time") {
    Shingles.register(spark)
    import spark.implicits._
    intercept[Exception] {
      Seq(1).toDF("x").select(expr("graft_shingles(x, 3)")).collect()
    }
    intercept[Exception] {
      Seq("a").toDF("x").select(expr("graft_shingles(x, 0)")).collect()
    }
  }
}
