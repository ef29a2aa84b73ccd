package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the text-analysis queries beyond the DuckDB hash
  * compare (the float/argmax invariants a hash alone doesn't explain). */
class TextSpec extends SparkSpec {

  test("q_text_nb: confusion matrix partitions the corpus and predicts " +
    "only trained languages") {
    val rows = SparkEntry.queries("q_text_nb")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val docs = Tables(spark, sfDir, "documents")
    val langs = docs.select(col("lang")).distinct()
      .collect().map(_.getString(0)).toSet
    // every document lands in exactly one confusion cell
    assert(rows.map(_._3).sum == docs.count())
    // the model can only predict languages it was trained on, and
    // actuals are the corpus's own labels
    rows.foreach { case (actual, pred, n) =>
      assert(langs(actual) && langs(pred), s"($actual, $pred)")
      assert(n > 0)
    }
    // cells are unique (grouped output)
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length)
  }
}
