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

  test("q_skyline: output is exactly the non-dominated set (brute-force " +
    "dominance check, both directions)") {
    import org.apache.spark.sql.functions._
    val sky = SparkEntry.queries("q_skyline")(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    assert(sky.nonEmpty)
    val all = Tables(spark, sfDir, "part")
      .select(col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getDouble(0), r.getInt(1))).distinct
    def dominates(a: (Double, Int), b: (Double, Int)): Boolean =
      a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)
    // soundness: no point anywhere dominates a skyline point
    sky.foreach { s =>
      assert(!all.exists(p => dominates(p, s)), s"$s is dominated")
    }
    // completeness: every non-dominated point IS in the skyline
    val expected = all.filter(p => !all.exists(q => dominates(q, p))).toSet
    assert(sky.toSet == expected,
      s"skyline ${sky.length} points != brute-force ${expected.size}")
  }
}
