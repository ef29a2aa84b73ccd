package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThanOrEqual, StringContains}

import graft.sources.{ZoneBox, ZoneMapSource}

/** The DSv2 zone-map source: pruning must be a PLANNING decision —
  * visible in the plan, partition count == surviving files, pushdown
  * conservative, results exact. */
class ZoneMapSourceSpec extends SparkSpec {

  private lazy val table: String = {
    val dir = tmpDir("zonemap_dsv2")
    val rows = Tables(spark, sfDir, "lineitem").selectExpr(
      "l_orderkey * 10 + l_linenumber AS rid",
      "l_partkey AS a", "l_suppkey AS b")
    (0 until 3).foreach { w =>
      graft.streaming.Streaming.zoneIngestBatch(
        rows.filter(pmod(col("rid"), lit(3)) === w), w.toLong, dir)
    }
    graft.streaming.Streaming.zoneOptimize(spark, dir)
    dir
  }

  private def rows = Tables(spark, sfDir, "lineitem").selectExpr(
    "l_orderkey * 10 + l_linenumber AS rid",
    "l_partkey AS a", "l_suppkey AS b")

  private def v2 = spark.read.format("graft.sources.ZoneMapSource")
    .load(table)

  /** Domain-relative middle-quarter box (the spec constants rule:
    * sf0.001's b domain is tiny, so derive, don't hardcode). */
  private lazy val box: (Long, Long, Long, Long) = {
    val r = rows.agg(min(col("a")), max(col("a")),
      min(col("b")), max(col("b"))).collect()(0)
    val (amin, amax, bmin, bmax) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    (amin + (amax - amin + 1) / 4, amin + (amax - amin + 1) / 2 - 1,
      bmin + (bmax - bmin + 1) / 4, bmin + (bmax - bmin + 1) / 2 - 1)
  }

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def batchScan(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    df.collect() // finalize AQE
    finalPlan(df.queryExecution.executedPlan).collectLeaves()
      .collect { case b: BatchScanExec => b } match {
        case Seq(one) => one
        case other => fail(s"expected one BatchScan, got $other")
      }
  }

  test("box scan: pruning lands in-plan (kept < total in the BatchScan " +
    "description, pushed filters listed) and results equal the direct " +
    "filter exactly") {
    val (alo, ahi, blo, bhi) = box
    val df = v2.filter(
      col("a").between(alo, ahi) && col("b").between(blo, bhi))
    val scan = batchScan(df)
    val desc = scan.scan.description()
    assert(desc.contains("graft_zonemap"), desc)
    val kept = raw"zones kept (\d+)/(\d+)".r.findFirstMatchIn(desc)
      .getOrElse(fail(s"no kept/total in: $desc"))
    val (k, n) = (kept.group(1).toInt, kept.group(2).toInt)
    assert(k < n, s"box scan pruned nothing: $desc")
    assert(desc.contains(s"GreaterThanOrEqual(a,$alo)"), desc)
    assert(desc.contains(s"LessThanOrEqual(b,$bhi)"), desc)
    // partition count == surviving part-files (one task per kept file)
    val keptFiles = graft.sources.ZoneMapSource.zoneRows(table)
      .filter(z => z.la <= ahi && z.ha >= alo && z.lb <= bhi && z.hb >= blo)
      .flatMap(z => ZoneMapSource.partFiles(table, z.file))
    assert(scan.inputRDD.getNumPartitions == keptFiles.size)
    // exactness: residual filter re-applies the box within kept files
    val expect = rows.filter(
      col("a").between(alo, ahi) && col("b").between(blo, bhi))
    assert(df.count() == expect.count())
    assert(df.agg(sum(col("rid")), sum(col("a")), sum(col("b")))
      .collect()(0) ==
      expect.agg(sum(col("rid")), sum(col("a")), sum(col("b")))
        .collect()(0))
  }

  test("unfiltered scan keeps every zone and returns every row") {
    val df = v2
    val scan = batchScan(df)
    val desc = scan.scan.description()
    val kept = raw"zones kept (\d+)/(\d+)".r.findFirstMatchIn(desc).get
    assert(kept.group(1) == kept.group(2), desc)
    assert(df.count() == rows.count())
  }

  test("projection pushdown reaches the scan: a single-column read " +
    "plans a single-column BatchScan") {
    val df = v2.select(col("a"))
    val scan = batchScan(df)
    assert(scan.output.map(_.name) == Seq("a"), scan.output)
    assert(df.agg(sum(col("a"))).collect()(0).getLong(0) ==
      rows.agg(sum(col("a"))).collect()(0).getLong(0))
  }

  test("zero-column projection (count(*)) still counts every row") {
    assert(v2.count() == rows.count())
  }

  test("planning statistics come from the surviving zone rows") {
    val (alo, ahi, blo, bhi) = box
    val df = v2.filter(
      col("a").between(alo, ahi) && col("b").between(blo, bhi))
    val scan = batchScan(df).scan
    val stats = scan.asInstanceOf[
      org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    val keptN = graft.sources.ZoneMapSource.zoneRows(table)
      .filter(z => z.la <= ahi && z.ha >= alo && z.lb <= bhi && z.hb >= blo)
      .map(_.n).sum
    assert(stats.numRows.getAsLong == keptN)
    assert(stats.sizeInBytes.getAsLong > 0)
    // the estimate bounds the true row count (zones are supersets of
    // the exact box)
    assert(keptN >= df.count())
  }

  test("ZoneBox folds filters conservatively: strict bounds widen to " +
    "inclusive, non-integral and foreign columns are ignored") {
    val b1 = ZoneBox.from(Seq(
      GreaterThan("a", 10L), LessThanOrEqual("a", 90),
      EqualTo("b", 7L), IsNotNull("a"),
      StringContains("a", "x"), GreaterThanOrEqual("rid", 5L)))
    // GreaterThan folds to an INCLUSIVE lower bound (file granularity
    // cannot exploit openness; conservative = correct)
    assert(b1.alo == 10L && b1.ahi == 90L)
    assert(b1.blo == 7L && b1.bhi == 7L)
    assert(!ZoneBox.prunable(StringContains("a", "x")))
    assert(!ZoneBox.prunable(EqualTo("rid", 1L)))
    assert(ZoneBox.prunable(IsNotNull("b")))
    // a double literal must not prune (zone stats are integral)
    assert(ZoneBox.from(Seq(EqualTo("a", 1.5))) == ZoneBox.all)
  }

  test("post-optimize ingest: a new batch is visible through the v2 " +
    "source next to the optimized generation") {
    val dir = tmpDir("zonemap_dsv2_mix")
    (0 until 2).foreach { w =>
      graft.streaming.Streaming.zoneIngestBatch(
        rows.filter(pmod(col("rid"), lit(2)) === w), w.toLong, dir)
    }
    graft.streaming.Streaming.zoneOptimize(spark, dir)
    graft.streaming.Streaming.zoneIngestBatch(
      rows.filter(pmod(col("rid"), lit(2)) === 0)
        .selectExpr("rid + 1000000000 AS rid", "a", "b"), 5L, dir)
    val df = spark.read.format("graft.sources.ZoneMapSource").load(dir)
    assert(df.count() ==
      rows.count() + rows.filter(pmod(col("rid"), lit(2)) === 0).count())
  }
}
