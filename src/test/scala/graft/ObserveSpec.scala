package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Observe-API quality counters: values must match a direct computation
  * and must NOT add a scan (they ride the consuming action). */
class ObserveSpec extends SparkSpec {

  test("quality metrics ride the consuming action and match direct counts") {
    val orders = Tables(spark, sfDir, "orders")
      .withColumn("status_np", nullif(col("o_orderstatus"), lit("P")))
    val obs = new Observation("q")
    val observed = graft.operators.Observe.withQualityMetrics(
      orders, obs, Seq("status_np", "o_orderkey"))
    val n = observed.count() // the ONE action; metrics are a side product
    val m = obs.get
    assert(m("n_rows") == n)
    val directNulls = orders.filter(col("status_np").isNull).count()
    assert(m("n_null_status_np") == directNulls && directNulls > 0)
    assert(m("n_null_o_orderkey") == 0L)
  }

  test("metrics reflect the frame they are attached to, filters included") {
    val li = Tables(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 25)
    val obs = new Observation("filtered")
    graft.operators.Observe.withQualityMetrics(li, obs, Seq("l_returnflag"))
      .write.format("noop").mode("overwrite").save()
    assert(m(obs)("n_rows") == li.count())
  }

  private def m(o: Observation): Map[String, Any] = o.get
}
