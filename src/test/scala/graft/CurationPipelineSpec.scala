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
    val exact = gated.join(keepExact, Seq("doc_id"), "left_semi")
    // 3. near-dup pairs (shingle equi-join + exact Jaccard >= 0.8) →
    //    connected components → keep the smallest doc_id per cluster
    val sh = Dedup.shinglesOf(exact)
      .select(col("doc_id"), graft.functions.TextAnalysis.h60(col("shingle")).as("sid"))
      .cache()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val cand = sh.select(col("doc_id").as("id_a"), col("sid"))
      .join(sh.select(col("doc_id").as("id_b"), col("sid").as("sid_b")),
        col("sid") === col("sid_b") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
    val pairs = cand
      .join(cnt.select(col("doc_id").as("id_a2"), col("n").as("na")),
        col("id_a") === col("id_a2"))
      .join(cnt.select(col("doc_id").as("id_b2"), col("n").as("nb")),
        col("id_b") === col("id_b2"))
      .filter(col("shared") * lit(1.0) /
        (col("na") + col("nb") - col("shared")) >= 0.8)
      .select(col("id_a"), col("id_b"))
    val cc = Dedup.connectedComponents(pairs)
    val dropNearDups = cc.filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
    val deduped = exact.join(dropNearDups, Seq("doc_id"), "left_anti")
    // 4. per-source char quota (the q_curate_quota admission rule)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val admitted = deduped
      .withColumn("used", sum(col("n_chars")).over(w))
      .filter(coalesce(col("used"), lit(0)) < 4000)
    val ids = admitted.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    sh.unpersist()
    (docs.count(), gated.count(), exact.count(), deduped.count(), ids)
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
