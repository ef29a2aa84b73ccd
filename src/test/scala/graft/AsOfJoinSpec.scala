package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** The native as-of join operator (logical node + strategy + physical
  * merge, plans/AsOfJoin.scala): planned shape, semantics against a
  * window-composed oracle, and the SQL NULL rules. */
class AsOfJoinSpec extends SparkSpec {

  private def purchases(dir: String): DataFrame =
    Tables(spark, dir, "events").filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))

  private def clicks(dir: String): DataFrame =
    Tables(spark, dir, "events").filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))

  test("plans as AsOfJoinExec over co-partitioned sorted children") {
    val df = AsOfJoin.asof(purchases(sfDir), clicks(sfDir),
      "p_user", "c_user", "p_ts", "c_ts", Seq("click_id"))
    // the physical node prints without its Exec suffix
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p)
    assert(p.contains("Exchange hashpartitioning"),
      "EnsureRequirements must co-partition both children:\n" + p)
    assert(p.contains("Sort ["), "EnsureRequirements must sort both children:\n" + p)
    df.write.format("noop").mode("overwrite").save() // executes end to end
  }

  test("downstream per-key aggregation reuses the join's partitioning") {
    // outputPartitioning forwards the left child's hash partitioning, so
    // a following groupBy on the join key must NOT add a third exchange
    val agg = AsOfJoin.asof(purchases(sfDir), clicks(sfDir),
        "p_user", "c_user", "p_ts", "c_ts", Seq("click_id"))
      .groupBy(col("p_user")).agg(count(lit(1)).as("n"))
    val p = agg.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2, s"expected only the join's two exchanges, got $exchanges:\n$p")
  }

  test("matches the union + last-observation window composition on real events") {
    val native = AsOfJoin.asof(purchases(sfDir), clicks(sfDir),
      "p_user", "c_user", "p_ts", "c_ts", Seq("click_id"))
      .filter(col("click_id").isNotNull)
      .select(col("purchase_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the q_join_asof2 derivation, inlined
    val ev = Tables(spark, sfDir, "events")
    val u = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("kind"), col("event_id"))
      .unionByName(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("kind"), col("event_id")))
    val win = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = u
      .withColumn("click_id",
        last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(win))
      .filter(col("kind") === 1 && col("click_id").isNotNull)
      .collect().map(r => (r.getLong(3), r.getLong(4))).toSet
    assert(native == composed,
      s"only-native=${native.diff(composed)} only-composed=${composed.diff(native)}")
  }

  test("random data: merge equals the window oracle across partitions") {
    import spark.implicits._
    val rnd = new Random(29)
    // few keys, many collisions, duplicate timestamps — the merge's
    // hard cases; ids disambiguate ties
    val l = Seq.tabulate(400)(i => (rnd.nextInt(7).toLong, rnd.nextInt(50).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val r = Seq.tabulate(400)(i => (rnd.nextInt(7).toLong, rnd.nextInt(50).toLong, i.toLong))
      .toDF("rk", "rt", "rid")
    val native = AsOfJoin.asof(l, r, "k", "rk", "t", "rt", Seq("rid"))
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toSet
    val w = Window.partitionBy(col("k")).orderBy(col("rt"), col("rid"))
    val oracle = l.join(r, col("k") === col("rk") && col("rt") <= col("t"), "left")
      .withColumn("rn", when(col("rid").isNotNull,
        row_number().over(Window.partitionBy(col("lid"))
          .orderBy(col("rt").desc, col("rid").desc))).otherwise(lit(1)))
      .filter(col("rn") === 1)
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toSet
    assert(native == oracle,
      s"only-native=${native.diff(oracle)} only-oracle=${oracle.diff(native)}")
  }

  test("mismatched key or ts types are rejected up front") {
    import spark.implicits._
    val l = Seq((1L, 1L, 1L)).toDF("k", "t", "lid")
    val rIntKey = Seq((1, 1L, 1L)).toDF("rk", "rt", "rid")
    // a LongType ordering reading an IntegerType slot would compare
    // garbage silently — the API must refuse instead
    val e = intercept[IllegalArgumentException] {
      plans.AsOfJoin.asof(l, rIntKey, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("key types differ"), e.getMessage)
  }

  test("AQE partition coalescing keeps the merge's two sides aligned") {
    // the zipPartitions merge requires equal partition counts; AQE's
    // coalescing must treat the two exchanges as one group — force
    // aggressive coalescing (tiny data, huge advisory size) and check
    // both execution and results
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    s2.conf.set("spark.sql.shuffle.partitions", "7")
    import org.apache.spark.sql.functions.{col => c}
    val l = s2.range(300).select((c("id") % 5).as("k"), (c("id") % 40).as("t"),
      c("id").as("lid"))
    val r = s2.range(300).select((c("id") % 5).as("rk"), (c("id") % 37).as("rt"),
      c("id").as("rid"))
    val native = plans.AsOfJoin.asof(l, r, "k", "rk", "t", "rt", Seq("rid"))
      .select(c("lid"), c("rid"))
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toSet
    val oracle = l.join(r, c("k") === c("rk") && c("rt") <= c("t"), "left")
      .withColumn("rn", when(c("rid").isNotNull,
        row_number().over(Window.partitionBy(c("lid"))
          .orderBy(c("rt").desc, c("rid").desc))).otherwise(lit(1)))
      .filter(c("rn") === 1)
      .select(c("lid"), c("rid"))
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toSet
    assert(native == oracle,
      s"only-native=${native.diff(oracle)} only-oracle=${oracle.diff(native)}")
  }

  test("AQE coalescing on skewed, asymmetric sides: alignment holds and " +
    "coalescing demonstrably fires") {
    // adversarial case for the zipPartitions contract: one side 3000
    // rows with 90% of them on a single key, the other side 12 rows —
    // per-side coalescing decisions would diverge wildly if AQE did not
    // treat the join's two exchanges as one coalescing group. Assert the
    // plan actually coalesced (the symmetric test above could pass with
    // AQE silently inert) AND that the merge still matches the oracle.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    s2.conf.set("spark.sql.shuffle.partitions", "13")
    import org.apache.spark.sql.functions.{col => c}
    val l = s2.range(3000).select(
      when(c("id") % 10 < 9, lit(0L)).otherwise(c("id") % 5).as("k"),
      (c("id") % 97).as("t"), c("id").as("lid"))
    val r = s2.range(12).select((c("id") % 5).as("rk"),
      (c("id") * 7 % 50).as("rt"), c("id").as("rid"))
    // read the plan from the SAME DataFrame the action finalizes — a
    // .select would run its own QueryExecution and leave this one
    // un-adapted (isFinalPlan=false, no AQEShuffleRead to see)
    val joined = plans.AsOfJoin.asof(l, r, "k", "rk", "t", "rt", Seq("rid"))
      .select(c("lid"), c("rid"))
    val native = joined
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toSet
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p.take(800))
    assert(p.contains("coalesced"),
      "AQE coalescing did not fire — the test is not exercising the path:\n"
        + p.take(1500))
    val oracle = l.join(r, c("k") === c("rk") && c("rt") <= c("t"), "left")
      .withColumn("rn", when(c("rid").isNotNull,
        row_number().over(Window.partitionBy(c("lid"))
          .orderBy(c("rt").desc, c("rid").desc))).otherwise(lit(1)))
      .filter(c("rn") === 1)
      .select(c("lid"), c("rid"))
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toSet
    assert(native == oracle,
      s"only-native=${native.diff(oracle)} only-oracle=${oracle.diff(native)}")
  }

  test("null keys and null timestamps never match; unmatched keeps null right") {
    import spark.implicits._
    val l = Seq(
      (Some(1L), Some(10L), 1L), // matches rid 100 (rt 5 <= 10)
      (Some(1L), None, 2L),      // null left ts -> no match
      (None, Some(10L), 3L),     // null left key -> no match
      (Some(2L), Some(10L), 4L), // right side has only null-ts rows for key 2
      (Some(3L), Some(10L), 5L)  // no right rows at all for key 3
    ).toDF("k", "t", "lid")
    val r = Seq(
      (Some(1L), Some(5L), 100L),
      (Some(2L), None, 200L),     // null right ts -> never matches
      (Option.empty[Long], Some(1L), 300L) // null right key -> never matches
    ).toDF("rk", "rt", "rid")
    val got = AsOfJoin.asof(l, r, "k", "rk", "t", "rt", Seq("rid"))
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
    assert(got == Map(
      1L -> Some(100L), 2L -> None, 3L -> None, 4L -> None, 5L -> None), got.toString)
  }
}
