package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The full training-data curation funnel, composed end to end from the
  * shipped primitives over real documents: quality gate → exact dedup →
  * near-dup pair detection → connected components → keep-one-per-cluster
  * → per-source quota. Every stage is individually oracle-checked by its
  * own query; this spec pins that they COMPOSE — monotone row counts,
  * cluster consistency, and a deterministic end result. */
class CurationPipelineSpec extends SparkSpec {

  private def docs: DataFrame = Tables(spark, sfDir, "documents")

  private def runFunnel(): (Long, Long, Long, Long, Set[Long]) = {
    // 1. quality gate: pushed filters only
    val gated = docs.filter(col("n_chars") >= 50 &&
      size(split(col("text"), " ")) >= 10)
    // 2. exact dedup: keep the smallest doc_id per content hash
    val keepExact = gated
      .groupBy(md5(col("text").cast("binary")))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val exact = gated.join(keepExact, Seq("doc_id"), "left_semi").cache()
    // 3. near-dup pairs via the SHIPPED pair pipeline (the same
    //    Dedup.jaccardPairs the oracle-checked queries run) →
    //    connected components → keep the smallest doc_id per cluster
    val sh = Dedup.shinglesOf(exact)
      .select(col("doc_id"), graft.functions.TextAnalysis.h60(col("shingle")).as("sid"))
      .cache()
    val pairs = Dedup.jaccardPairs(sh).select(col("id_a"), col("id_b"))
    val cc = Dedup.connectedComponents(pairs)
    val dropNearDups = cc.filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
    val deduped = exact.join(dropNearDups, Seq("doc_id"), "left_anti").cache()
    // 4. per-source char quota (the q_curate_quota admission rule)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val admitted = deduped
      .withColumn("used", sum(col("n_chars")).over(w))
      .filter(coalesce(col("used"), lit(0)) < 4000)
    val ids = admitted.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val result = (docs.count(), gated.count(), exact.count(), deduped.count(), ids)
    sh.unpersist(); exact.unpersist(); deduped.unpersist()
    result
  }

  test("the funnel composes: monotone counts, non-trivial at every stage") {
    val (total, gated, exact, deduped, admitted) = runFunnel()
    assert(total >= gated && gated >= exact && exact >= deduped &&
      deduped >= admitted.size, s"$total >= $gated >= $exact >= $deduped >= ${admitted.size}")
    // every stage keeps something and the quota stage actually cuts
    assert(admitted.nonEmpty)
    assert(admitted.size < deduped, "quota admitted everything — cap never bound")
  }

  test("the funnel is deterministic end to end") {
    assert(runFunnel()._5 == runFunnel()._5)
  }
}
