package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // local-iteration overrides (the driver sets neither): bench a subset
    // of queries, or measure a different window-buffer threshold
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // fail fast on typos: a misspelled name would silently bench an
    // empty set and "confirm" a fix against a 0-query run
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.mkString(",")}")
    }
    val winBuf = sys.env.getOrElse("SPARK_GRAFT_WINBUF", "4096")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Window buffers: Spark keeps the first 4096 rows of a window
      // partition in an in-memory array and falls back to a
      // spill-capable UnsafeExternalSorter beyond it. r3 raised the
      // in-memory threshold to 1M rows and the round bench recorded
      // q_window_ntile at 4.6s; r4 measured both settings 3x head to
      // head and found NO reproducible difference (~0.45s either way —
      // the 4.6s was a measurement artifact), so the threshold is back
      // at the default: it buys nothing here and the default keeps the
      // spill-capable path, which is what survives a skewed partition
      // at scale. The spill THRESHOLD (when the sorter goes to disk)
      // stays raised — that one only defers disk I/O.
      .config("spark.sql.windowExec.buffer.in.memory.threshold", winBuf)
      .config("spark.sql.windowExec.buffer.spill.threshold", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM once before timing: scheduler + codegen + parquet
    // footer/metadata caches, so query 1 doesn't pay session start-up.
    Tables.names.foreach(n => Tables(spark, sfDir, n).count())
    // noop sink forces FULL materialization of every output column —
    // a bare count() would let Catalyst prune the computed projections
    // and under-report the real work.
    // A crashed query (OOM, analysis error) must not masquerade as a
    // fast sample: time-to-failure would win the min and the bench
    // would report success. Each sample carries an ok flag; failures
    // are reported per query in the emitted JSON.
    def timeOne(name: String, fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      // each invocation caches fresh self-join intermediates; clear so
      // dead blocks from prior runs can't pollute the timing
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(200))
          false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // min-of-3, with the three samples INTERLEAVED across the suite:
    // pass 1 runs every query once, then pass 2, then pass 3, and the
    // reported number is the min per query across passes. The r4 driver
    // artifact showed why back-to-back sampling is not noise-proof: a
    // sustained (~minute-long) host-steal window covers all three
    // consecutive samples of the same query and inflates its min by
    // 10-30×. With the passes spread over the whole suite (~30s each),
    // a contiguous noise window can poison at most ONE sample of any
    // given query, and the min discards it.
    // name-sorted Seq (a Map would re-hash the order away) so the
    // emitted per-query map diffs cleanly across rounds
    val qlist = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Host-noise fingerprint: loadavg and the cumulative steal ticks
    // (/proc/stat cpu field 8) bracket the run. A driver artifact whose
    // totals disagree with a judge re-run (r4, r6: uniform ~1.3×
    // inflation) is then self-diagnosing — high loadavg / a large steal
    // delta in the JSON says "noisy host", no re-run needed.
    def loadavg(): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim
        .split(" ").take(3).mkString(",")
      catch { case _: Exception => "" }
    def stealTicks(): Long =
      try {
        val cpu = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/stat"))).linesIterator.next()
        val f = cpu.trim.split("\\s+")
        if (f.length > 8) f(8).toLong else -1L
      } catch { case _: Exception => -1L }
    val loadStart = loadavg()
    val stealStart = stealTicks()
    val passes = Seq.fill(3)(qlist.map { case (name, fn) => name -> timeOne(name, fn) })
    val loadEnd = loadavg()
    val stealDelta =
      { val e = stealTicks(); if (e >= 0 && stealStart >= 0) e - stealStart else -1L }
    // per-pass wall totals (successful or not — this is a noise probe,
    // not a score): if pass totals spread far beyond the min-based
    // headline, the host was unstable during the run
    val passTotals = passes.map(_.map(_._2._1).sum)
    // min over SUCCESSFUL samples only; a query with zero successes
    // keeps its (meaningless) fastest failure time but lands on the
    // failed list, so the artifact can never read as a clean run.
    val results = qlist.map { case (name, _) =>
      val samples = passes.map(_.find(_._1 == name).get._2)
      val okTimes = samples.collect { case (t, true) => t }
      name -> (if (okTimes.nonEmpty) okTimes.min else samples.map(_._1).min)
    }
    // any failed sample puts the query on the list — a crash is signal
    // (noise slows queries down, it doesn't throw), even if another
    // pass succeeded and supplied a valid min
    val failed = qlist.map(_._1).filter { name =>
      passes.exists(_.find(_._1 == name).get._2._2 == false)
    }
    // values rounded to ms so the single JSON line stays short — the
    // driver tail-captures stdout and must see the whole map
    def ms(v: Double): Double = math.round(v * 1000) / 1000.0
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val passesJson = passTotals.map(ms).mkString("[", ",", "]")
    val noise =
      s""""passes":$passesJson,"load_start":"$loadStart","load_end":"$loadEnd","steal_ticks":$stealDelta"""
    val line =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec",$noise,"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}"""
    // The driver tail-captures stdout; r2/r3/r4 all had the full line's
    // LEADING fields clipped by the capture window (parsed: null three
    // rounds running). Defense in depth, in order:
    //   1. the full line (with the per-query map) twice, so a complete
    //      copy lands inside any window that covers the map at all;
    //   2. the full line persisted to BENCH_LOCAL.json — guarded, so a
    //      write failure (full disk, unwritable cwd) can never destroy
    //      the stdout channel after minutes of completed queries;
    //   3. a SHORT total-only JSON line as the very LAST stdout output:
    //      whatever the capture window's size, it always starts at the
    //      tail, so a <120-byte final line is unclippable — the driver
    //      can always parse at least the headline total.
    println(line)
    println(line)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] BENCH_LOCAL.json not written: ${e.getMessage}")
    }
    // Full per-query artifact (r8 VERDICT item 4): the driver's stdout
    // tail capture truncates to the last ~80 of 281 per-query timings,
    // leaving the heavy q_graph_*/q_dedup_* families invisible in
    // round-over-round comparisons. Persist EVERY query's min AND all
    // three raw pass samples (pretty-printed, one query per line, so
    // git diffs rank regressions directly) — same guarded write as
    // BENCH_LOCAL.json: a disk failure must not kill the stdout channel.
    // Skipped on SPARK_GRAFT_ONLY subset runs: the committed artifact
    // represents the FULL suite, and a 3-query dev loop must not
    // clobber it (it did once — the restore commit after dccfaaa).
    if (only.isEmpty) try {
      val perQuery = qlist.map { case (name, _) =>
        val samples = passes.map(_.find(_._1 == name).get._2)
        val raw = samples.map(s => ms(s._1)).mkString("[", ",", "]")
        val okAll = samples.forall(_._2)
        val mn = results.find(_._1 == name).get._2
        s"""  "$name": {"min":${ms(mn)},"passes":$raw,"ok":$okAll}"""
      }.mkString(",\n")
      val body = s"""{"sf":"$sfDir","unit":"sec","steal_ticks":$stealDelta,
        |"queries":{
        |$perQuery
        |}}""".stripMargin
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_per_query.json"),
        (body + "\n").getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(
        s"[bench] bench_per_query.json not written: ${e.getMessage}")
    }
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"passes":$passesJson,"steal_ticks":$stealDelta,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
