package graft

import org.apache.spark.sql.functions._

/** Driver-side replay pins for the retrieval re-ranking family
  * (q_search_mmr; q_search_hybrid is pinned in PlanSpec + the oracle). */
class SearchSpec extends SparkSpec {

  test("q_search_mmr replays the greedy λ=0.7 selection exactly; picks " +
    "are distinct and rank 1 is the pure relevance argmax") {
    val got = SparkEntry.queries("q_search_mmr")(spark, sfDir).collect()
      .map(r => (r.getInt(r.fieldIndex("pick_rank")),
        r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("rel_u")),
        r.getLong(r.fieldIndex("red_u")),
        r.getLong(r.fieldIndex("score"))))
      .sortBy(_._1).toList
    assert(got.map(_._1) == (1 to 5).toList)
    assert(got.map(_._2).distinct.length == 5)
    // independent replay from the raw embeddings with the same fold
    // order as graft_cosine (cosine is IEEE-symmetric: the dot's
    // element products commute termwise and ‖a‖²·‖b‖² commutes under
    // the single sqrt, so sim(s, c) = sim(c, s) bitwise)
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val q = e.find(_._1 == 0L).get._2
    def cosU(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      math.floor(dot / math.sqrt(na * nb) * 1000000.0 + 0.5).toLong
    }
    val cand = e.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, cosU(q, v)) }
      .sortBy(c => (-c._3, c._1)).take(20)
    val byId = cand.map(c => c._1 -> c).toMap
    var sel = List.empty[(Int, Long, Long, Long, Long)]
    for (r <- 1 to 5) {
      val picked = sel.map(_._2).toSet
      val best = cand.filter(c => !picked(c._1)).map { c =>
        val red = if (sel.isEmpty) 0L
        else sel.map(s => cosU(byId(s._2)._2, c._2)).max
        (c._1, c._3, red, 7 * c._3 - 3 * red)
      }.minBy(x => (-x._4, x._1))
      sel :+= ((r, best._1, best._2, best._3, best._4))
    }
    assert(got == sel, s"engine $got vs replay $sel")
    // the re-ranker must actually diversify on this fixture: at least
    // one pick differs from the pure top-5-by-relevance head
    val topRel = cand.take(5).map(_._1).toSet
    assert(got.map(_._2).toSet != topRel ||
      got.exists(_._4 > 0), "MMR degenerated to pure relevance")
  }

  test("q_knn_ivf_served probes the PERSISTED index through runtime " +
    "cell pruning: the plan carries the dynamic filter, a bounded " +
    "probe scans only its cells' files, and served == trained") {
    // running the query builds (or reuses) the index at
    // /tmp/graft_ivf_<hash> and must match the retrain-every-time twin
    val served = SparkEntry.queries("q_knn_ivf_served")(spark, sfDir)
    val got = served.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val want = SparkEntry.queries("q_knn_ivf_trained")(spark, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(got == want, "served index diverged from inline retraining")
    // the serving join reaches the zone scan as a runtime filter
    assert(served.queryExecution.executedPlan.toString
      .toLowerCase.contains("dynamicpruning"),
      served.queryExecution.executedPlan.toString)
    // at this SF all 8 cells happen to be probed (10 queries × 2
    // probes over K=8), so pin the PRUNING itself with a bounded
    // 2-cell probe against the same persisted index: kept files must
    // be exactly the probed cells' batches, not the corpus
    val idx = "/tmp/graft_ivf_" +
      Tables.contentFingerprint(spark, s"$sfDir/embeddings.parquet")
    val totalFiles = graft.sources.ZoneMapSource.zoneRows(idx).size
    assert(totalFiles >= 4, s"index unexpectedly small: $totalFiles")
    val twoCells = spark.range(0, 2).toDF("cell")
      .filter(pmod(col("cell"), lit(1000000007L)) === col("cell"))
    val probe2 = spark.read.format("graft.sources.ZoneMapSource")
      .load(idx)
      .join(broadcast(twoCells), col("a") === col("cell"))
      .agg(count(lit(1)).as("n"))
    val n2 = probe2.collect()(0).getLong(0)
    // AQE buries the scan inside materialized query stages — recurse
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(b)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansIn(q.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansIn(a.executedPlan)
      }.flatten
    val scan = scansIn(probe2.queryExecution.executedPlan).headOption
      .getOrElse(fail("no BatchScan in the 2-cell probe plan"))
    // the scan description reports the post-runtime-filter pruning
    // state ("zones kept k/n ... runtime keys on a: 2")
    val desc = scan.scan.description()
    val kept = "zones kept (\\d+)/(\\d+)".r.findFirstMatchIn(desc)
      .getOrElse(fail(s"no kept/total in scan description: $desc"))
    assert(kept.group(1).toInt < kept.group(2).toInt &&
      kept.group(2).toInt == totalFiles,
      s"2-cell probe kept ${kept.group(1)}/${kept.group(2)} of " +
        s"$totalFiles files — runtime cell pruning did not fire: $desc")
    assert(desc.contains("runtime keys on a: 2"), desc)
    // and the kept rows are exactly the two cells' inverted lists
    val direct = spark.read.format("graft.sources.ZoneMapSource")
      .load(idx).filter(col("a") < 2).count()
    assert(n2 == direct, s"pruned probe returned $n2, want $direct")
  }

  test("incremental IVF maintenance: appends assign to persisted " +
    "centroids and retractions tombstone via deletion vectors, " +
    "serving row-identically to a from-scratch rebuild with the " +
    "same quantizer — no retraining") {
    import graft.operators.Similarity
    val e = Tables(spark, sfDir, "embeddings")
    val base = e.filter(col("vec_id") < 10 || col("vec_id") % 5 =!= 4)
    val appends = e.filter(col("vec_id") >= 10 && col("vec_id") % 5 === 4)
    val nAppend = appends.count()
    assert(nAppend > 0, "fixture produced no append wave")
    val retractIds = e
      .filter(col("vec_id") >= 10 && col("vec_id") % 11 === 3)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(retractIds.nonEmpty, "fixture produced no retraction wave")

    // maintained path: build on base, then maintain
    val idxA = tmpDir("ivf_maint")
    Similarity.ivfBuild(spark, idxA, base)
    val centsBefore = spark.read.parquet(s"$idxA/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toList))
      .sortBy(_._1).toList
    val filesBefore = graft.sources.ZoneMapSource.zoneRows(idxA).size
    Similarity.ivfAppend(spark, idxA, appends, waveId = 0L)
    Similarity.ivfRetract(spark, idxA, retractIds)
    // the quantizer was NOT retrained ...
    val centsAfter = spark.read.parquet(s"$idxA/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toList))
      .sortBy(_._1).toList
    assert(centsAfter == centsBefore, "maintenance retrained centroids")
    // ... and the append wave landed as NEW batches, no rewrites
    val filesAfter = graft.sources.ZoneMapSource.zoneRows(idxA).size
    assert(filesAfter > filesBefore,
      s"append wave added no files ($filesBefore -> $filesAfter)")

    // reference path: from-scratch rebuild of the LIVE set with the
    // SAME persisted quantizer
    val live = e.filter(col("vec_id") < 10 || col("vec_id") % 11 =!= 3)
    val idxB = tmpDir("ivf_rebuild")
    Similarity.ivfBuildWith(spark, idxB, live,
      spark.read.parquet(s"$idxA/centroids"))

    def serve(idx: String) =
      Similarity.ivfServe(spark, sfDir, idx).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3)))
        .sortBy(t => (t._1, t._3)).toList
    val maintained = serve(idxA)
    val rebuilt = serve(idxB)
    assert(maintained == rebuilt,
      s"maintained index diverged from same-quantizer rebuild:\n" +
        s"maintained=$maintained\nrebuilt=$rebuilt")
    // retracted ids must be gone from the maintained serve results
    assert(!maintained.exists(t => retractIds(t._2)),
      "a retracted vector survived as a neighbor")

    // REPLAY IDEMPOTENCE: a redelivered append wave (same waveId, same
    // data — the at-least-once contract) overwrites its own batches
    // instead of double-appending under a fresh id
    def listing(idx: String): List[String] =
      graft.sources.ZoneMapSource.zoneRows(idx)
        .map(_.file).sorted.toList
    val filesAfterWave = listing(idxA)
    Similarity.ivfAppend(spark, idxA, appends, waveId = 0L)
    assert(listing(idxA) == filesAfterWave,
      "replayed wave changed the file set")
    assert(serve(idxA) == maintained, "replayed wave changed the serve")

    // COMPACTION: fold retractions + re-cluster — the serve is
    // row-identical over FEWER files (one per wave per cell before,
    // one Z-tile after), and with K = 8 cells each compacted file
    // stays cell-pure so runtime pruning keeps its selectivity
    val nBefore = listing(idxA).size
    Similarity.ivfCompact(spark, idxA)
    val nAfter = listing(idxA).size
    assert(nAfter < nBefore,
      s"compaction did not shrink the file set ($nBefore -> $nAfter)")
    assert(serve(idxA) == maintained,
      "compaction changed the serve results")
  }

  test("the retraction-bearing change feed DRIVES the index: +1 rows " +
    "become append waves, -1 rows become retractions, and the served " +
    "top-k equals a same-quantizer rebuild of the live corpus") {
    import graft.operators.Similarity
    import graft.streaming.Streaming
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // the corpus MEMBERSHIP lives in a zone table (rid = vec_id); the
    // vectors themselves are looked up by id — the CDF tells the index
    // WHICH vectors exist, exactly what maintenance needs
    val corpus = tmpDir("ivf_feed_corpus")
    def members(p: Int) = e.filter(col("vec_id") % 3 === p)
      .select(col("vec_id").as("rid"),
        (col("vec_id") % 8).as("a"), col("vec_id").as("b"))
    Streaming.zoneIngestBatch(members(0), 0L, corpus)
    Streaming.zoneIngestBatch(members(1), 1L, corpus)
    // index built on the base membership; the consumer's watermark is
    // (batch <= 1, dv gen -1)
    val baseIds = spark.read.format("graft.sources.ZoneMapSource")
      .load(corpus).select(col("rid")).collect().map(_.getLong(0)).toSet
    val idx = tmpDir("ivf_feed_idx")
    Similarity.ivfBuild(spark, idx,
      e.filter(col("vec_id").isin(baseIds.toSeq: _*)))
    // corpus evolves: a third wave lands, then a delete
    Streaming.zoneIngestBatch(members(2), 2L, corpus)
    Streaming.dvDelete(spark, corpus, (rid, _, _) => rid % 13 == 2)
    // maintenance consumes the FEED, not the table: +1 rows append
    // (wave id = the feed window), -1 rows retract
    val feed = Streaming.zoneChangesFeed(spark, corpus, 1L, -1L)
      .select(col("rid"), col("op")).collect()
    val appendIds = feed.filter(_.getInt(1) == 1).map(_.getLong(0)).toSet
    val retractIds = feed.filter(_.getInt(1) == -1).map(_.getLong(0)).toSet
    assert(appendIds.nonEmpty && retractIds.nonEmpty,
      s"feed produced no work: +${appendIds.size} -${retractIds.size}")
    Similarity.ivfAppend(spark, idx,
      e.filter(col("vec_id").isin(appendIds.toSeq: _*)), waveId = 0L)
    Similarity.ivfRetract(spark, idx, retractIds)
    // the maintained index must serve exactly like a same-quantizer
    // rebuild of the LIVE membership (dv-applied read of the corpus)
    val liveIds = spark.read.format("graft.sources.ZoneMapSource")
      .load(corpus).select(col("rid")).collect().map(_.getLong(0)).toSet
    assert(liveIds == (baseIds ++ appendIds) -- retractIds,
      "feed-derived membership diverged from the table read")
    val idxRef = tmpDir("ivf_feed_ref")
    Similarity.ivfBuildWith(spark, idxRef,
      e.filter(col("vec_id").isin(liveIds.toSeq: _*)),
      spark.read.parquet(s"$idx/centroids"))
    def serveOf(i: String) = Similarity.ivfServe(spark, sfDir, i)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).sortBy(t => (t._1, t._3)).toList
    assert(serveOf(idx) == serveOf(idxRef),
      "feed-driven maintenance diverged from the live-corpus rebuild")
  }
}
