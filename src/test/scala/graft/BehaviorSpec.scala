package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the behavioral-analytics operators (Behavior.scala)
  * beyond the driver's DuckDB hash compare: invariants that must hold on
  * ANY event log, checked on the real sf0.001 data. */
class BehaviorSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("q_seq_match equals a sequential automaton walk with no regex " +
    "engine in the loop") {
    // independent derivation: re-order each user's events imperatively,
    // walk the code string with a hand-rolled automaton (conversion
    // flag, error-run counter, click-streak max) — pins the ordered
    // fold AND the regexes' non-overlap semantics against logic that
    // shares neither the window nor java.util.regex with the query
    val raw = Tables(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = raw.groupBy(_._1).map { case (u, rs) =>
      val seq = rs.sortBy(r => (r._2, r._3)).map(_._4.head).mkString
      var conv = 0; var inV = false
      var frus = 0; var eRun = 0
      var maxC = 0; var cRun = 0
      for (ch <- seq) {
        if (ch == 'v' && !inV) inV = true
        else if (ch == 'p' && inV) { conv += 1; inV = false }
        if (ch == 'e') { eRun += 1; if (eRun == 2) frus += 1 }
        else eRun = 0
        if (ch == 'c') { cRun += 1; maxC = math.max(maxC, cRun) }
        else cRun = 0
      }
      u -> ((seq.length.toLong, conv.toLong, frus.toLong, maxC.toLong))
    }
    val got = SparkEntry.queries("q_seq_match")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected, s"automaton disagrees: ${
      expected.collect { case (u, e) if got.get(u) != Some(e) =>
        s"$u: $e vs ${got.get(u)}" }.take(3).mkString("; ")}")
    // the fixture must actually exercise every measure
    assert(expected.values.exists(_._2 > 0), "no conversions in fixture")
    assert(expected.values.exists(_._3 > 0), "no error runs in fixture")
    assert(expected.values.exists(_._4 >= 2), "no click streaks in fixture")
  }

  test("q_ts_decompose equals a sequential re-derivation over a hand-built " +
    "calendar, trend defined exactly on full 7-day neighborhoods") {
    // independent derivation: rebuild the day rollup imperatively, walk
    // the calendar with a map lookup (no window, no explode), and
    // re-derive trend/seasonal/mad with plain Scala arithmetic — pins
    // the bounded-explode trend against the textbook centered MA and
    // the weekday alignment against java.time's ISO numbering
    val roll = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"),
        to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val expected = roll.groupBy(_._1).flatMap { case (et, rows) =>
      val byDay = rows.map(r => r._2 -> r._3).toMap
      val det = for {
        (day, cnt) <- byDay.toSeq
        window = (-3 to 3).map(o => byDay.get(day.plusDays(o.toLong)))
        if window.forall(_.isDefined)
      } yield {
        val trend =
          math.floor(window.flatten.sum * 1e6 / 7 + 0.5).toLong
        (day.getDayOfWeek.getValue - 1, cnt * 1000000L - trend)
      }
      det.groupBy(_._1).map { case (dw, ds) =>
        val n = ds.length.toLong
        val seasonal = math.floor(ds.map(_._2).sum * 1e0 / n + 0.5).toLong
        val mad = math.floor(
          ds.map(d => math.abs(d._2 - seasonal)).sum * 1e0 / n + 0.5).toLong
        (et, dw) -> ((n, seasonal, mad))
      }
    }
    val got = SparkEntry.queries("q_ts_decompose")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected, s"decompose diverged: ${
      expected.collect { case (k, e) if got.get(k) != Some(e) =>
        s"$k: $e vs ${got.get(k)}" }.take(3).mkString("; ")}")
    // the fixture must exercise the edge-drop: some days lack a trend
    val nDays = roll.groupBy(_._1).map { case (_, rs) => rs.length }.sum
    assert(expected.values.map(_._1).sum < nDays,
      "no day was dropped by the full-window rule — fixture too uniform")
  }

  test("q_funnel stages are monotonically non-increasing") {
    val r = run("q_funnel").collect()
    assert(r.length == 1)
    val row = r.head
    val Seq(s, v, c, p) = Seq("n_signup", "n_view", "n_click", "n_purchase")
      .map(n => row.getLong(row.fieldIndex(n)))
    assert(s >= v && v >= c && c >= p,
      s"funnel must narrow: $s >= $v >= $c >= $p")
    assert(s > 0, "at least one user must enter the funnel")
  }

  test("q_cohort_retention: offset-0 cell counts every cohort member " +
    "and no offset is negative") {
    val rows = run("q_cohort_retention").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(1) >= 0), "first-touch week IS an active week")
    // Σ over offset-0 cells = number of distinct users
    val users = Tables(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    val atZero = rows.filter(_.getInt(1) == 0).map(_.getLong(2)).sum
    assert(atZero == users, s"offset-0 total $atZero != $users users")
    // retention can never exceed the cohort's own size
    val byCohort = rows.groupBy(_.getDate(0)).view.mapValues { rs =>
      (rs.filter(_.getInt(1) == 0).map(_.getLong(2)).sum,
        rs.map(_.getLong(2)).max)
    }
    byCohort.foreach { case (cw, (size, maxCell)) =>
      assert(maxCell <= size, s"cohort $cw: cell $maxCell > cohort size $size")
    }
  }

  test("q_scd2 intervals tile each user's timeline: every event falls in " +
    "exactly the interval carrying its type") {
    val scd = run("q_scd2")
    val ev = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_type").as("ev_type"), col("ts"))
    // join each event to the SCD2 row covering its timestamp; the
    // covering row's type must equal the event's type (NULL valid_to =
    // open interval). Events AT a boundary belong to the new interval.
    val covered = ev.join(scd, Seq("user_id"))
      .filter(col("ts") >= col("valid_from") &&
        (col("valid_to").isNull || col("ts") < col("valid_to")))
    val n = ev.count()
    assert(covered.count() == n, "each event must be covered exactly once")
    assert(covered.filter(col("ev_type") =!= col("event_type")).count() == 0,
      "the covering interval must carry the event's type")
    // exactly one open interval per user (the current state)
    val open = scd.filter(col("valid_to").isNull)
      .groupBy(col("user_id")).count()
    assert(open.filter(col("count") =!= 1).count() == 0)
  }

  test("q_ts_fill densifies to each user's full day span and forward-fill " +
    "leaves no interior nulls") {
    val filled = run("q_ts_fill").cache()
    try {
      // span check: per user, row count == days between min and max + 1
      val bad = filled.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          (datediff(max(col("d")), min(col("d"))) + 1).as("span"))
        .filter(col("n") =!= col("span"))
      assert(bad.count() == 0, "spine must be dense per user")
      // the first row per user is a real observation, so after the
      // running fill no row can be null
      assert(filled.filter(col("v_filled").isNull).count() == 0)
    } finally filled.unpersist()
  }

  test("q_split is a partition of documents, stable under corpus growth") {
    val total = Tables(spark, sfDir, "documents").count()
    val splits = run("q_split").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.values.sum == total, "splits must partition the corpus")
    assert(splits.keySet == Set("train", "valid", "test"))
    // growth stability: the assignment of a doc depends only on its id —
    // recomputing on a PREFIX of the corpus must agree on every shared id
    val docs = Tables(spark, sfDir, "documents")
    val b = graft.functions.TextAnalysis.h32(col("doc_id").cast("string")) % 10
    val full = docs.select(col("doc_id"), b.as("b"))
    val prefix = docs.filter(col("doc_id") < 50).select(col("doc_id"), b.as("b"))
    val disagree = full.join(prefix, Seq("doc_id"))
      .filter(full("b") =!= prefix("b"))
    assert(disagree.count() == 0)
  }

  test("q_mix_sources: full-rate tier keeps everything, kept never " +
    "exceeds total, rates order the tiers") {
    val rows = run("q_mix_sources").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.length == 20)
    rows.foreach { case (src, total, kept) =>
      assert(kept <= total, s"$src kept $kept > total $total")
    }
    def tierFrac(lo: Int, hi: Int): Double = {
      val t = rows.filter { case (s, _, _) => val i = s.drop(3).toInt
        i >= lo && i < hi }
      t.map(_._3).sum.toDouble / t.map(_._2).sum
    }
    assert(tierFrac(0, 5) == 1.0, "rate-1.0 tier must keep every doc")
    // sampled tiers must order by rate (wide tolerance — small strata);
    // every adjacent tier pair is pinned so no threshold can swap
    assert(tierFrac(0, 5) > tierFrac(5, 10) &&
      tierFrac(5, 10) > tierFrac(10, 15) &&
      tierFrac(10, 15) > tierFrac(15, 20),
      s"tier keep-fractions out of order")
  }

  test("q_active_trailing: trailing-7d actives bound daily actives and " +
    "total users, one row per day of the span") {
    val wau = run("q_active_trailing").collect()
      .map(r => r.getDate(0) -> r.getLong(1)).toMap
    val ev = Tables(spark, sfDir, "events")
    val daily = ev.select(to_date(date_trunc("day", col("ts"))).as("day"),
        col("user_id")).distinct()
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
      .collect().map(r => r.getDate(0) -> r.getLong(1)).toMap
    val users = ev.select(col("user_id")).distinct().count()
    assert(wau.nonEmpty && wau.size >= daily.size)
    daily.foreach { case (day, dau) =>
      assert(wau(day) >= dau, s"$day: wau ${wau(day)} < dau $dau")
    }
    wau.values.foreach(w => assert(w <= users))
  }

  test("q_anomaly_zscore: outliers are rare and max_z clears the cut " +
    "only when outliers exist") {
    val rows = run("q_anomaly_zscore").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, outliers, maxZ) =
        (r.getLong(1), r.getLong(2), r.getDouble(3))
      // Chebyshev: P(|z|>3) <= 1/9; real feeds sit far under it
      assert(outliers <= total / 9,
        s"${r.getString(0)}: $outliers outliers of $total")
      assert((outliers > 0) == (maxZ > 3.0),
        s"${r.getString(0)}: outlier count and max_z disagree")
    }
  }

  test("q_funnel plans as two aggregates and no join; q_active_trailing's " +
    "horizon is a broadcast, never a shuffled cartesian") {
    val funnel = run("q_funnel")
    funnel.collect()
    val fp = funnel.queryExecution.executedPlan.toString
    assert(!fp.contains("Join"), "funnel must never self-join per stage")
    assert(fp.contains("HashAggregate"), fp.take(500))
    val active = run("q_active_trailing")
    active.collect()
    val ap = active.queryExecution.executedPlan.toString
    // the 1-row horizon rides a broadcast (the control-plane crossJoin
    // pattern); what must NEVER appear is a shuffled cartesian product
    assert(ap.contains("BroadcastExchange"), ap.take(500))
    assert(!ap.contains("CartesianProduct"), ap.take(500))
  }

  test("q_link_fuzzy: pairs are blocked, deduped, within threshold") {
    val rows = run("q_link_fuzzy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, bn, d) = (r.getString(0), r.getString(1), r.getInt(2))
      assert(a < bn, "pair must be ordered (half-matrix)")
      assert(d >= 1 && d <= 3, s"distance $d out of band")
      // the query blocks on the SECOND token (split(name,' ')[1]) — pin
      // that token, not .last, so the assertion tracks the blocking key
      // even if names ever grow a third token
      assert(a.split(" ")(1) == bn.split(" ")(1),
        "pairs must share the blocking token (the second word)")
    }
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length
      == rows.length, "no duplicate pairs")
  }

  test("q_shuffle_global: shards partition the corpus, positions are dense " +
    "0..n-1 per shard, and shard assignment is growth-stable") {
    val rows = run("q_shuffle_global").collect()
    val docs = Tables(spark, sfDir, "documents").count()
    assert(rows.length == docs, "every document gets exactly one slot")
    val byShard = rows.groupBy(_.getLong(1))
    byShard.foreach { case (shard, rs) =>
      val pos = rs.map(_.getLong(2)).sorted
      assert(pos.head == 0 && pos.last == rs.length - 1 &&
        pos.distinct.length == rs.length,
        s"shard $shard positions must be dense 0..${rs.length - 1}")
    }
    // growth stability: the shard is a function of the id alone, so the
    // same doc_id must land in the same shard no matter the corpus size
    val half = rows.filter(_.getLong(0) % 2 == 0)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(r => half.contains(r.getLong(0))).foreach { r =>
      assert(half(r.getLong(0)) == r.getLong(1))
    }
  }

  test("q_table_diff classifies exactly the constructed changes") {
    val rows = run("q_table_diff").collect()
    val byChange = rows.groupBy(_.getString(1))
    val keys = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    // the derivation's own arithmetic is the ground truth
    val expInsert = keys.count(k => k % 11 == 3 && k % 13 != 5)
    val expDelete = keys.count(k => k % 13 == 5 && k % 11 != 3)
    val expUpdate = keys.count(k => k % 7 == 2 && k % 11 != 3 && k % 13 != 5)
    assert(byChange.get("insert").map(_.length).getOrElse(0) == expInsert)
    assert(byChange.get("delete").map(_.length).getOrElse(0) == expDelete)
    assert(byChange.get("update").map(_.length).getOrElse(0) == expUpdate)
    byChange.getOrElse("insert", Array.empty[org.apache.spark.sql.Row])
      .foreach(r => assert(r.isNullAt(2) && !r.isNullAt(3)))
    byChange.getOrElse("delete", Array.empty[org.apache.spark.sql.Row])
      .foreach(r => assert(!r.isNullAt(2) && r.isNullAt(3)))
    byChange.getOrElse("update", Array.empty[org.apache.spark.sql.Row])
      .foreach { r =>
        assert(r.getDouble(3) - r.getDouble(2) == 1000.0,
          "updates are exactly the +1000 reprice")
        assert(r.getString(5) == "9-REPRICED")
      }
  }

  test("q_anomaly_mad: MAD bound caps the anomaly rate and the flag " +
    "agrees with the max ratio") {
    val rows = run("q_anomaly_mad").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, madm, nAnom, maxRatio) =
        (r.getLong(1), r.getDouble(3), r.getLong(4), r.getDouble(5))
      assert(madm >= 0.0)
      // by definition of the median of deviations, at most half the rows
      // can exceed 1·MAD — a fortiori 4.4478·MAD
      assert(nAnom <= (total + 1) / 2,
        s"${r.getString(0)}: $nAnom anomalies of $total breaks the MAD bound")
      assert((nAnom > 0) == (maxRatio > 4.4478),
        s"${r.getString(0)}: anomaly count and max ratio disagree")
    }
  }

  test("q_interval_union matches a per-user brute-force interval merge") {
    val rows = run("q_interval_union").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.length == rows.length, "one row per user")
    val iv = Tables(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts"))
          + (lit(60) + col("event_id") % 540) * lit(1000000L)).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(rows.length == iv.size, "every user with events gets a row")
    rows.foreach { case (u, nIslands, covered) =>
      // textbook sequential merge (touching intervals coalesce, same as
      // the query's strict s > prev_max island break)
      var islands = List.empty[(Long, Long)]
      iv(u).map(t => (t._2, t._3)).sortBy(identity).foreach { case (s0, e0) =>
        islands match {
          case (a, b) :: tail if s0 <= b =>
            islands = (a, math.max(b, e0)) :: tail
          case _ => islands = (s0, e0) :: islands
        }
      }
      assert(islands.length == nIslands, s"user $u: island count")
      assert(islands.map(i => i._2 - i._1).sum == covered,
        s"user $u: covered time")
    }
  }

  test("q_mix_allocate sums to exactly the budget and stays within one " +
    "slot of true proportionality") {
    val rows = SparkEntry.queries("q_mix_allocate")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val w = rows.map(_._2).sum
    assert(rows.map(_._4).sum == 100000L,
      "largest-remainder allocation must hit the budget exactly")
    rows.foreach { case (src, chars, quota, alloc) =>
      assert(alloc == quota || alloc == quota + 1, s"$src: +1 at most")
      val exact = 100000.0 * chars / w
      assert(math.abs(alloc - exact) < 1.0,
        s"$src: $alloc vs exact share $exact — quota rule violated")
    }
  }

  test("q_audit_fk finds exactly the injected violations") {
    val rows = run("q_audit_fk").collect()
    assert(rows.length == 3, "one row per audited relation")
    val byRel = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // ground truth from the injection arithmetic itself (dim keys are
    // dense, so remapped keys are orphans iff out of the dim's domain —
    // which +1000000 / +500000 / negation all guarantee)
    val okeys = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val (nRows, nNull, nOrphan, nKeys) = byRel("orders.o_custkey->customer")
    assert(nRows == okeys.length)
    assert(nNull == okeys.count(_ % 101 == 11))
    assert(nOrphan == okeys.count(k => k % 101 != 11 && k % 97 == 13))
    assert(nKeys > 0 && nKeys <= nOrphan)
    Seq("lineitem.l_partkey->part", "lineitem.l_suppkey->supplier")
      .foreach { rel =>
        val (n, nn, no, nk) = byRel(rel)
        assert(nn == 0, s"$rel: no NULLs injected")
        assert(no > 0 && nk > 0 && nk <= no && no < n, s"$rel: orphans")
      }
  }

  test("q_pref_btl: ratings are positive with mean 1, and the win ledger " +
    "is conserved (Σ wins = Σ matches / 2)") {
    val rows = run("q_pref_btl").collect()
    assert(rows.length > 1, "need at least two items under comparison")
    val ratings = rows.map(r => r.getDouble(r.fieldIndex("rating")))
    assert(ratings.forall(_ > 0), "BTL strengths are strictly positive")
    // the model fixes the scale gauge at mean 1 (ratings are ratios)
    assert(math.abs(ratings.sum / ratings.length - 1.0) < 1e-6,
      s"mean-1 normalization: ${ratings.sum / ratings.length}")
    val wins = rows.map(r => r.getLong(r.fieldIndex("wins"))).sum
    val matches = rows.map(r => r.getLong(r.fieldIndex("n_matches"))).sum
    // every comparison appears twice in the symmetrized ledger (once per
    // orientation) and contributes exactly one win in total
    assert(matches % 2 == 0 && wins * 2 == matches,
      s"conservation: 2*$wins != $matches")
    rows.foreach { r =>
      val (w, n) = (r.getLong(r.fieldIndex("wins")),
        r.getLong(r.fieldIndex("n_matches")))
      assert(w >= 0 && w <= n, s"${r.getString(0)}: wins $w outside [0,$n]")
    }
  }

  test("q_ts_cusum matches a sequential changepoint re-derivation") {
    val rows = SparkEntry.queries("q_ts_cusum")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val daily = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1)
    assert(rows.keySet == daily.keySet, "one changepoint row per type")
    daily.foreach { case (et, recs) =>
      val series = recs.map(t => (t._2, t._3)).sortBy(_._1)
      val n = series.length.toLong
      val tot = series.map(_._2).sum
      // n·S_d = n·prefix_d − d·T, argmax |·| with earliest-day tie-break
      var ps = 0L
      val scored = series.zipWithIndex.map { case ((day, x), i0) =>
        ps += x
        (day, math.abs(n * ps - (i0 + 1) * tot))
      }
      val (cpDay, cpS) = scored.minBy { case (day, s) => (-s, day) }
      val r = rows(et)
      assert(r.getAs[Long]("n_days") == n && r.getAs[Long]("total") == tot,
        s"$et: series shape")
      assert(r.getAs[java.sql.Date]("cp_day").toString == cpDay,
        s"$et: changepoint ${r.getAs[java.sql.Date]("cp_day")} != $cpDay")
      assert(r.getAs[Long]("cusum_max") == cpS, s"$et: peak statistic")
    }
  }

  test("q_shard_rendezvous: movers go ONLY to the new shard") {
    val rows = SparkEntry.queries("q_shard_rendezvous")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("s8"), r.getAs[Long]("s9"),
        r.getAs[Long]("n")))
    val total = rows.map(_._3).sum
    assert(total == Tables(spark, sfDir, "documents").count())
    // THE rendezvous property: adding shard 8 moves a document only if
    // the new shard's score wins — every (s8 != s9) row must land on 8
    rows.filter { case (s8, s9, _) => s8 != s9 }.foreach {
      case (s8, s9, n) =>
        assert(s9 == 8L, s"($s8 -> $s9, n=$n) moved to an OLD shard")
    }
    // and the stable majority stays put (movement ≈ 1/9, bound loosely)
    val moved = rows.filter(r => r._1 != r._2).map(_._3).sum
    assert(moved * 3 < total, s"$moved/$total moved — far above 1/9")
    assert(moved > 0, "no movement at all — shard 9 never wins?")
  }

  test("q_mix_waterfill: allocations exhaust the budget max-min fairly") {
    val rows = SparkEntry.queries("q_mix_waterfill")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("demand"), r.getAs[Long]("alloc"),
        r.getAs[Boolean]("capped")))
    val totalDemand = rows.map(_._1).sum
    // exact budget exhaustion: Σ alloc = ⌊Σ demand / 2⌋, bit-exact
    assert(rows.map(_._2).sum == totalDemand / 2)
    // feasibility: nobody gets more than they asked for
    rows.foreach { case (d, a, _) => assert(a <= d, s"alloc $a > demand $d") }
    // max-min fairness: capped sources sit within one unit of a common
    // level, and every uncapped demand is below every capped allocation
    val capped = rows.filter(_._3).map(_._2)
    assert(capped.nonEmpty, "budget = half the mass must cap someone")
    assert(capped.max - capped.min <= 1, s"level not flat: $capped")
    val uncapped = rows.filterNot(_._3).map(_._1)
    if (uncapped.nonEmpty)
      assert(uncapped.max <= capped.min + 1,
        "an unmet smaller demand would violate max-min fairness")
  }

  test("q_anonymity histogram partitions the customer table") {
    val rows = SparkEntry.queries("q_anonymity")(spark, sfDir).collect()
    val nCust = Tables(spark, sfDir, "customer").count()
    // every customer sits in exactly one equivalence class
    assert(rows.map(r => r.getAs[Long]("n_rows")).sum == nCust)
    assert(rows.map(r => r.getAs[Long]("class_k") *
      r.getAs[Long]("n_classes")).sum == nCust)
    rows.foreach { r =>
      val (k, l) = (r.getAs[Long]("class_k"), r.getAs[Long]("min_l"))
      // a class of size k offers between 1 and k sensitive values
      assert(l >= 1 && l <= k, s"k=$k: min_l $l outside [1,$k]")
    }
  }

  test("q_cdc_apply: split-merge equals global latest-wins; kinds are " +
    "consistent with the midpoint split") {
    val r = run("q_cdc_apply").collect()
    // one row per key, kinds from the closed set
    val keys = r.map(_.getLong(0))
    assert(keys.distinct.length == keys.length)
    val kinds = Set("carry", "update", "insert", "delete", "delete_noop")
    assert(r.forall(row => kinds(row.getString(1))))
    // tombstoned keys carry no state; live keys always do
    r.foreach { row =>
      val dead = row.getString(1).startsWith("delete")
      assert(row.isNullAt(2) == dead && row.isNullAt(4) == dead,
        s"state nullity disagrees with kind ${row.getString(1)}")
    }
    // THE MERGE THEOREM: applying the changelog half onto the snapshot
    // half must equal latest-wins over the unsplit stream — live keys,
    // their state type and state timestamp, row for row.
    val ev = Tables(spark, sfDir, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val global = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.get(2))).toSet
    val live = r.filter(row => !row.getString(1).startsWith("delete"))
      .map(row => (row.getLong(0), row.getString(2), row.get(4))).toSet
    assert(live == global,
      "split-merge result diverges from global latest-wins")
  }

  test("q_compact_plan matches a per-month brute-force quota packing") {
    val target = 1000000000L
    val ev = Tables(spark, sfDir, "orders")
      .groupBy(to_date(date_trunc("day", col("o_orderdate"))).as("d"))
      .agg(sum(floor(col("o_totalprice") * lit(100e0) + lit(0.5))
        .cast("long")).as("bytes"), count(lit(1)).as("n_rows"))
      .withColumn("part", to_date(date_trunc("month", col("d"))))
      .collect()
      .map(x => (x.getDate(3), x.getDate(0), x.getLong(1), x.getLong(2)))
    // brute-force: walk each month's files in day order, assign the
    // quota window the running total lands in
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (part, files) =>
      var cum = 0L
      files.sortBy(_._2.toString).map { case (_, d, bytes, n) =>
        cum += bytes
        ((part, (cum - 1) / target), (d, bytes, n))
      }
    }.groupBy(_._1).map { case ((part, grp), fs) =>
      val v = fs.map(_._2)
      (part.toString, grp, v.length.toLong, v.map(_._2).sum,
        v.map(_._3).sum, v.map(_._1.toString).min, v.map(_._1.toString).max)
    }.toSet
    val got = run("q_compact_plan").collect().map { row =>
      (row.getDate(0).toString, row.getLong(1), row.getLong(2),
        row.getLong(3), row.getLong(4), row.getDate(5).toString,
        row.getDate(6).toString)
    }.toSet
    assert(got == expect, "quota packing diverges from brute force")
  }
}
