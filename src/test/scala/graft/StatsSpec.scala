package graft

import org.apache.spark.sql.functions._

/** Pins for the statistical shape aggregates beyond the DuckDB hash
  * compare: the exact-integer-moment rewrite must agree with Spark's
  * builtin streaming-moment implementation. */
class StatsSpec extends SparkSpec {

  test("q_agg_skew matches builtin skewness/kurtosis within rounding") {
    val got = SparkEntry.queries("q_agg_skew")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(r.fieldIndex("skew")), r.getDouble(r.fieldIndex("kurt"))))
      .toMap
    val ref = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(skewness(col("l_quantity")).as("sk"),
        kurtosis(col("l_quantity")).as("ku"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got.keySet == ref.keySet)
    // q_agg_skew rounds to 6 decimals (≤5e-7) and the builtin's
    // partition-order float folds add ulp-level noise — 1e-5 covers both
    got.foreach { case (g, (sk, ku)) =>
      assert(math.abs(sk - ref(g)._1) < 1e-5, s"$g skew: $sk vs ${ref(g)._1}")
      assert(math.abs(ku - ref(g)._2) < 1e-5, s"$g kurt: $ku vs ${ref(g)._2}")
    }
  }
}
