package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The full training-data curation funnel, composed end to end from the
  * shipped primitives over real documents: quality gate → exact dedup →
  * near-dup pair detection → connected components → keep-one-per-cluster
  * → benchmark decontamination → per-source quota → sequence packing.
  * Every stage is individually oracle-checked by its own query; this
  * spec pins that they COMPOSE — monotone row counts, cluster
  * consistency, a deterministic end result, and well-formed packed
  * bins at the very end. */
class CurationPipelineSpec extends SparkSpec {

  private def docs: DataFrame = Tables(spark, sfDir, "documents")

  /** (total, gated, exact, deduped, clean, admitted ids, packed rows). */
  private def runFunnel()
      : (Long, Long, Long, Long, Long, Set[Long], Seq[(Long, Long, Long)]) = {
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
    // 4. benchmark decontamination (the q_text_decontam rule): drop any
    //    doc with >= 50% shingle overlap against the broadcast eval set
    //    (docs 0..19 stand in, same convention as the query). The
    //    surviving sh cache feeds this stage too — no re-shingling.
    val bench = sh.filter(col("doc_id") < 20).select(col("sid")).distinct()
    val tot = sh.filter(col("doc_id") >= 20)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val hit = sh.filter(col("doc_id") >= 20)
      .join(broadcast(bench), "sid")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    val contaminated = tot.join(hit, Seq("doc_id"))
      .filter(col("n_hit") * lit(1.0) / col("n_sh") >= 0.5)
      .select(col("doc_id"))
    val clean = deduped.filter(col("doc_id") >= 20)
      .join(contaminated, Seq("doc_id"), "left_anti").cache()
    // 5. per-source char quota (the q_curate_quota admission rule) over
    //    the decontaminated survivors
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val admitted = clean
      .withColumn("used", sum(col("n_chars")).over(w))
      .filter(coalesce(col("used"), lit(0)) < 4000)
      .cache()
    // 6. sequence packing (the q_text_pack layout) over the admitted set:
    //    (doc_id, start_off, n_tok) per lang into 512-token bins
    val pw = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = admitted
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("start_off", sum(col("n_tok")).over(pw) - col("n_tok"))
      .select(col("doc_id"), col("start_off"), col("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ids = admitted.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val result = (docs.count(), gated.count(), exact.count(), deduped.count(),
      clean.count(), ids, packed)
    sh.unpersist(); exact.unpersist(); deduped.unpersist()
    clean.unpersist(); admitted.unpersist()
    result
  }

  test("the funnel composes: monotone counts, non-trivial at every stage") {
    val (total, gated, exact, deduped, clean, admitted, packed) = runFunnel()
    assert(total >= gated && gated >= exact && exact >= deduped &&
      deduped >= clean && clean >= admitted.size,
      s"$total >= $gated >= $exact >= $deduped >= $clean >= ${admitted.size}")
    // every stage keeps something and the quota stage actually cuts
    assert(admitted.nonEmpty)
    assert(admitted.size < clean, "quota admitted everything — cap never bound")
    // packing covers exactly the admitted docs, contiguously per lang:
    // offsets are non-negative and total packed tokens = Σ n_tok
    assert(packed.map(_._1).toSet == admitted, "pack input = quota output")
    assert(packed.forall(_._2 >= 0))
  }

  test("the funnel is deterministic end to end") {
    val a = runFunnel(); val b = runFunnel()
    assert(a._6 == b._6 && a._7.toSet == b._7.toSet)
  }
}
