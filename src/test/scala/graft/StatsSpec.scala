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

  test("q_stats_anova matches a direct driver-side computation and " +
    "Welch agrees with classic F under near-homoscedasticity") {
    val row = SparkEntry.queries("q_stats_anova")(spark, sfDir)
      .collect().head
    val n = row.getLong(row.fieldIndex("n"))
    val f = row.getDouble(row.fieldIndex("f_stat"))
    val eta2 = row.getDouble(row.fieldIndex("eta2"))
    val welch = row.getDouble(row.fieldIndex("welch_f"))
    // independent reference: plain double arithmetic over the collected
    // table (textbook formulas, no pivot/fold tricks)
    val xs = Tables(spark, sfDir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => r.getString(0) -> math.floor(r.getDouble(1)))
    val byG = xs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byG.size == 5 && n == xs.length)
    val grand = xs.map(_._2).sum / xs.length
    val ssb = byG.values.map(v =>
      v.length * math.pow(v.map(identity).sum / v.length - grand, 2)).sum
    val ssw = byG.values.map(v => {
      val m = v.sum / v.length; v.map(x => (x - m) * (x - m)).sum
    }).sum
    val fRef = (ssb / 4) / (ssw / (xs.length - 5))
    val etaRef = ssb / (ssb + ssw)
    assert(math.abs(f - fRef) < 1e-4 * math.max(1, math.abs(fRef)),
      s"F $f vs $fRef")
    assert(math.abs(eta2 - etaRef) < 1e-6, s"eta2 $eta2 vs $etaRef")
    // TPC-H-ish uniform totals per priority: group variances are near
    // equal and groups near balanced, so Welch must land close to F
    assert(welch > 0 || welch <= 0) // defined (not NaN)
    assert(math.abs(welch - f) < 0.2 * math.max(1.0, math.abs(f)),
      s"welch $welch vs classic $f")
  }

  test("q_geo_geohash equals textbook bisection (exact integer bounds) " +
    "and q_geo_haversine is symmetric with a sane horizon") {
    val B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    // textbook geohash: alternating lon/lat bisection, exact integer
    // comparisons via cross-multiplication (no float midpoints)
    def classic(latC: Long, lonC: Long): String = {
      val bits = new Array[Int](30)
      var (latLo, latHi, lonLo, lonHi) = (0L, 32768L, 0L, 32768L)
      for (i <- 0 until 30) {
        if (i % 2 == 0) { // lon bit first
          val mid = (lonLo + lonHi) / 2
          if (lonC * 32768 >= mid * 36000) { bits(i) = 1; lonLo = mid }
          else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (latC * 32768 >= mid * 18000) { bits(i) = 1; latLo = mid }
          else latHi = mid
        }
      }
      (0 until 6).map { c =>
        B32(bits.slice(c * 5, c * 5 + 5).foldLeft(0)(_ * 2 + _))
      }.mkString
    }
    val rows = SparkEntry.queries("q_geo_geohash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    rows.foreach { case (id, cell, _) =>
      assert(cell == classic((id * 37) % 18000, (id * 73) % 36000),
        s"id $id cell $cell != bisection reference")
    }
    // occupancy column is consistent with the actual groups
    val byCell = rows.groupBy(_._2).view.mapValues(_.length).toMap
    rows.foreach { case (_, cell, n) => assert(n == byCell(cell)) }
    // haversine: (p, c) within radius implies (c, p) within radius
    // when both are probes; all distances in (0, 500)
    val hv = SparkEntry.queries("q_geo_haversine")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hv.nonEmpty)
    hv.foreach { case (_, _, d) => assert(d > 0 && d < 500) }
    val probePairs = hv.filter(t => t._2 < 8).map(t => (t._1, t._2)).toSet
    probePairs.foreach { case (a, b) =>
      assert(probePairs((b, a)), s"asymmetric pair ($a,$b)")
    }
  }

  test("q_layout_zorder: z-clustered zone maps prune the box workload; " +
    "round-robin zone maps cannot prune at all") {
    val rows = SparkEntry.queries("q_layout_zorder")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val total = Tables(spark, sfDir, "lineitem").count()
    val (zF, zScan, zRows) = rows("zorder")
    val (nF, nScan, nRows) = rows("natural")
    // round-robin files all span the full key range: every box query
    // scans every file — 16 queries x n_files, 16x the corpus
    assert(nScan == 16 * nF, s"natural pruned? $nScan vs ${16 * nF}")
    assert(nRows == 16 * total)
    // the 16 boxes partition the (a, b) rectangle; with 8x8 z-tiles
    // aligned on the same quarter-span grid, each row is scanned
    // EXACTLY once across the workload
    assert(zRows == total, s"z-order rows scanned $zRows != $total")
    assert(zScan < nScan / 4,
      s"z-order should skip most file reads: $zScan vs $nScan")
    assert(zF <= 64 && nF == 64)
  }

  test("q_ml_logreg matches a driver-side replay of the quantized " +
    "Newton iterations and at least learns the class prior") {
    val row = SparkEntry.queries("q_ml_logreg")(spark, sfDir)
      .collect().head
    val n = row.getLong(row.fieldIndex("n"))
    val nCorrect = row.getLong(row.fieldIndex("n_correct"))
    val got = Array(
      row.getDouble(row.fieldIndex("w_icept")),
      row.getDouble(row.fieldIndex("w_qty")),
      row.getDouble(row.fieldIndex("w_disc")))
    assert(got.forall(w => !w.isNaN && !w.isInfinite),
      s"weights degenerate: ${got.mkString(",")}")
    val rows = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"))
      .collect().map(r => (
        if (r.getString(0) == "R") 1.0 else 0.0,
        r.getDouble(1),
        math.floor(r.getDouble(2) * 100.0 + 0.5)))
    assert(n == rows.length)
    // replay: same algebraic sigmoid, same 2^-20 quantization, same
    // lambda=1 ridge Newton solve — the JVM runs the identical IEEE
    // ops, so agreement should be essentially exact
    val Q = 1048576.0
    var w = Array(0.0, 0.0, 0.0)
    for (_ <- 0 until 2) {
      val s = new Array[Long](9)
      rows.foreach { case (y, x1, x2) =>
        val z = w(0) + w(1) * x1 + w(2) * x2
        val az = math.abs(z)
        val p = 0.5 + 0.5 * z / (1.0 + az)
        val d = 0.5 / ((1.0 + az) * (1.0 + az))
        val terms = Array(y - p, (y - p) * x1, (y - p) * x2,
          d, d * x1, d * x2, d * x1 * x1, d * x1 * x2, d * x2 * x2)
        var i = 0
        while (i < 9) {
          s(i) += math.floor(terms(i) * Q + 0.5).toLong; i += 1
        }
      }
      val Array(g0, g1, g2, h00, h01, h02, h11, h12, h22) =
        s.map(_.toDouble / Q)
      val (a, b, c, dd, e, f) =
        (h00 + 1.0, h01, h02, h11 + 1.0, h12, h22 + 1.0)
      val (u, v, ww) = (g0, g1, g2)
      val det = a * (dd * f - e * e) - b * (b * f - e * c) +
        c * (b * e - dd * c)
      val det0 = u * (dd * f - e * e) - b * (v * f - e * ww) +
        c * (v * e - dd * ww)
      val det1 = a * (v * f - e * ww) - u * (b * f - e * c) +
        c * (b * ww - v * c)
      val det2 = a * (dd * ww - e * v) - b * (b * ww - v * c) +
        u * (b * e - dd * c)
      w = Array(w(0) + det0 / det, w(1) + det1 / det, w(2) + det2 / det)
    }
    got.zip(w).foreach { case (g, r) =>
      assert(math.abs(g - r) < 1e-6, s"weight $g vs replay $r")
    }
    // an intercept-bearing Newton fit cannot score below the majority
    // class prior
    val majority = math.max(rows.count(_._1 == 1.0),
      rows.count(_._1 == 0.0))
    assert(nCorrect >= majority, s"$nCorrect < majority $majority")
  }

  test("q_stats_bootstrap: intervals are ordered, bracket the point " +
    "estimate, and the Poisson weights have unit mean") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_stats_bootstrap")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, est, lo, hi) =>
      assert(lo <= hi, s"$src: lo $lo > hi $hi")
      // with 32 resamples the 2nd/31st order statistics bracket the
      // sample mean unless the metric distribution is pathological —
      // on this corpus every source must bracket
      assert(lo <= est && est <= hi, s"$src: est $est outside [$lo, $hi]")
    }
    // the deterministic inverse-CDF draw must actually BE Poisson(1):
    // mean weight ≈ 1 (law of large numbers over docs × resamples)
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"))
      .collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(sx: String): Long = {
      val d = md.digest(sx.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val cdf = Array.tabulate(4) { k =>
      (0 to k).map(j => math.exp(-1.0) /
        (1 to j).foldLeft(1.0)(_ * _)).sum
    }.map(c => (c * math.pow(2.0, 60)).toLong)
    val ws = for (id <- docs; b <- 0 until 32) yield {
      val h = h60(s"bs:$b:$id")
      cdf.indexWhere(h < _) match { case -1 => 4; case k => k }
    }
    val mean = ws.map(_.toLong).sum.toDouble / ws.length
    assert(math.abs(mean - 1.0) < 0.05, s"weight mean $mean far from 1")
  }

  test("q_ml_adaboost matches a driver-side sequential replay of the " +
    "3 boosting rounds exactly, every round's alpha is positive, and " +
    "the ensemble beats the class prior") {
    val got = SparkEntry.queries("q_ml_adaboost")(spark, sfDir)
      .collect()
      .map { r =>
        def l(c: String): Long =
          r.getAs[Number](r.fieldIndex(c)).longValue()
        (l("round"), l("cf"), l("ct"), l("cp"), l("err_u"),
          l("alpha_u"), l("n_correct"))
      }.sortBy(_._1)
    assert(got.length == 3)
    // sequential replay: identical integer features, hidden rule,
    // mu-unit weights, argmin tie-break, sqrt multipliers, renorm
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val (id, tx) = (r.getLong(0), r.getString(1))
        def occ(wd: String): Long =
          ((tx.length - tx.replace(wd, "").length) / wd.length).toLong
        val (f1, f2, f3) = (occ("scan"), occ("join"), tx.length / 64L)
        val y = if (3 * f1 + 2 * f2 - f3 + id % 5 >= 7) 1L else -1L
        (Array(f1, f2, f3), y)
      }
    var w = Array.fill(docs.length)(1000000L)
    var score = Array.fill(docs.length)(0L)
    val grid = for (id <- 0 until 96) yield
      (id / 32 + 1, (id % 32) / 2, if (id % 2 == 0) 1 else -1)
    for (r <- 1 to 3) {
      val scored = grid.map { case (cf, ct, cp) =>
        var err = 0L; var tot = 0L
        docs.indices.foreach { i =>
          val fv = docs(i)._1(cf - 1)
          val h = if ((fv > ct) == (cp == 1)) 1L else -1L
          if (h != docs(i)._2) err += w(i)
          tot += w(i)
        }
        (err, cf, ct, cp, tot)
      }
      val (err, cf, ct, cp, tot) = scored.min
      val ratio = (tot - err + 1).toDouble / (err + 1).toDouble
      val alphaU = math.floor(math.log(ratio) * 500000.0).toLong
      assert(alphaU > 0, s"round $r alpha $alphaU not positive")
      val mp = math.floor(math.sqrt(ratio) * 1000000.0).toLong
      val mm = math.floor(1000000.0 / math.sqrt(ratio)).toLong
      docs.indices.foreach { i =>
        val fv = docs(i)._1(cf - 1)
        val h = if ((fv > ct) == (cp == 1)) 1L else -1L
        w(i) = math.floor(w(i).toDouble *
          (if (h != docs(i)._2) mp else mm).toDouble / 1000000.0).toLong
        score(i) += alphaU * h
      }
      val wsum = w.sum
      w = w.map(x => math.floor(
        x.toDouble * (docs.length.toDouble * 1000000.0) /
          wsum.toDouble).toLong)
      val nCorrect = docs.indices.count(i =>
        (score(i) > 0) == (docs(i)._2 == 1)).toLong
      assert(got(r - 1) ==
        ((r.toLong, cf.toLong, ct.toLong, cp.toLong, err, alphaU,
          nCorrect)),
        s"round $r: engine ${got(r - 1)} vs replay " +
          s"(${(r, cf, ct, cp, err, alphaU, nCorrect)})")
    }
    // the boosted ensemble must beat always-predicting the majority
    val prior = math.max(docs.count(_._2 == 1), docs.count(_._2 == -1))
    assert(got.last._7 > prior,
      s"ensemble ${got.last._7} does not beat the prior $prior")
  }

  test("q_ml_isotonic: the minimax fit replays exactly, is monotone by " +
    "construction, and agrees with sequential PAV within quantization") {
    val got = SparkEntry.queries("q_ml_isotonic")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("bin")),
        r.getLong(r.fieldIndex("w")), r.getLong(r.fieldIndex("s")),
        r.getLong(r.fieldIndex("fit_u"))))
      .sortBy(_._1)
    // bin stats straight from the corpus
    val bins = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val (id, len) = (r.getLong(0), r.getString(1).length.toLong)
        val b = math.min(63L, len / 16)
        (b, if ((id * 11 + len) % 64 < b) 1L else 0L)
      }
      .groupBy(_._1).map { case (b, xs) =>
        (b, xs.length.toLong, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    assert(got.map(x => (x._1, x._2, x._3)).toSeq ==
      bins.map(x => (x._1, x._2, x._3)))
    // exact minimax replay (same inner integer quantization)
    val present = bins.map(_._1)
    def q(j: Long, k: Long): Long = {
      val in = bins.filter(b => b._1 >= j && b._1 <= k)
      (in.map(_._3).sum * 1000000L) / in.map(_._2).sum
    }
    val replay = present.map { i =>
      (0L to i).filter(j => present.exists(_ >= j)).map { j =>
        (i to 63L).filter(k => bins.exists(b => b._1 >= j && b._1 <= k))
          .map(k => q(j, k)).min
      }.max
    }
    assert(got.map(_._4).toSeq == replay, s"${got.map(_._4).toSeq}")
    // monotone: the j-set grows, the k-set shrinks
    assert(got.map(_._4).toSeq == got.map(_._4).sorted.toSeq)
    // PAV agreement: sequential pool-adjacent-violators on the exact
    // rationals gives block means; inner quantization moves a bin by
    // at most one micro-unit
    var blocks = bins.map(b => (b._2, b._3, List(b._1))).toList
    var changed = true
    while (changed) {
      changed = false
      blocks = blocks.foldLeft(List.empty[(Long, Long, List[Long])]) {
        case (acc @ ((w0, s0, ids0) :: rest), (w1, s1, ids1)) =>
          // violation if rate0 > rate1 (cross-multiplied, exact)
          if (s0 * w1 > s1 * w0) {
            changed = true
            (w0 + w1, s0 + s1, ids0 ++ ids1) :: rest
          } else (w1, s1, ids1) :: acc
        case (Nil, b) => List(b)
      }.reverse
    }
    val pav = blocks.flatMap { case (w, sTot, ids) =>
      ids.map(_ -> (sTot * 1000000L) / w) }.toMap
    got.foreach { case (b, _, _, fit) =>
      assert(math.abs(fit - pav(b)) <= 1L,
        s"bin $b: minimax $fit vs PAV ${pav(b)}")
    }
  }

  test("q_ml_als matches a driver-side sequential replay of all four " +
    "half-sweeps and training RMSE descends") {
    val got = SparkEntry.queries("q_ml_als")(spark, sfDir).collect()
    assert(got.nonEmpty)
    val rmse1 = got.head.getLong(got.head.fieldIndex("rmse1_u"))
    val rmse2 = got.head.getLong(got.head.fieldIndex("rmse2_u"))
    assert(got.forall(r => r.getLong(r.fieldIndex("rmse1_u")) == rmse1))
    // ALS is coordinate descent on the regularized objective; with the
    // λ·n_k ridge the full-sweep RMSE must not increase, and on this
    // fixture it strictly descends
    assert(rmse2 < rmse1, s"rmse did not descend: $rmse1 -> $rmse2")
    // exact sequential replay with the identical quantization grids
    val Q = 1048576.0
    val U = 1000000.0
    def qi(e: Double): Long = math.floor(e * Q + 0.5).toLong
    val ratings = Tables(spark, sfDir, "lineitem")
      .selectExpr("CAST(l_suppkey AS BIGINT) AS u",
        "CAST(l_partkey % 64 AS BIGINT) AS i",
        "CAST(floor(l_quantity + 0.5e0) AS BIGINT) AS q")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1)
      .map { case ((u, i), xs) =>
        (u, i, xs.map(_._2).sum.toDouble / xs.length.toDouble) }
      .toSeq
    var itf: Map[Long, (Long, Long)] = ratings.map(_._2).distinct
      .map(i => i -> ((i * 2654435761L) % 1000 * 1000 + 500000,
        (i * 40503 + 17) % 1000 * 1000 + 500000)).toMap
    var usf: Map[Long, (Long, Long)] = Map.empty
    def half(fixed: Map[Long, (Long, Long)], byUser: Boolean)
        : Map[Long, (Long, Long)] =
      ratings.groupBy(r => if (byUser) r._1 else r._2).map {
        case (k, rs) =>
          var (sa00, sa01, sa11, sb0, sb1) = (0L, 0L, 0L, 0L, 0L)
          rs.foreach { case (u, i, r) =>
            val (p0, p1) = fixed(if (byUser) i else u)
            val g0 = p0.toDouble / U
            val g1 = p1.toDouble / U
            sa00 += qi(g0 * g0); sa01 += qi(g0 * g1); sa11 += qi(g1 * g1)
            sb0 += qi(g0 * r); sb1 += qi(g1 * r)
          }
          val nk = rs.length.toDouble
          val m00 = sa00.toDouble / Q + nk * 0.1
          val m01 = sa01.toDouble / Q
          val m11 = sa11.toDouble / Q + nk * 0.1
          val v0 = sb0.toDouble / Q
          val v1 = sb1.toDouble / Q
          val det = m00 * m11 - m01 * m01
          val d0 = v0 * m11 - v1 * m01
          val d1 = m00 * v1 - m01 * v0
          k -> (math.floor(d0 / det * U + 0.5).toLong,
            math.floor(d1 / det * U + 0.5).toLong)
      }
    def rmse(us: Map[Long, (Long, Long)], it: Map[Long, (Long, Long)])
        : Long = {
      val se2 = ratings.map { case (u, i, r) =>
        val (up0, up1) = us(u)
        val (ip0, ip1) = it(i)
        val e = r - (up0.toDouble / U * (ip0.toDouble / U) +
          up1.toDouble / U * (ip1.toDouble / U))
        qi(e * e)
      }.sum
      math.floor(math.sqrt(se2.toDouble / Q / ratings.length.toDouble) *
        U + 0.5).toLong
    }
    usf = half(itf, byUser = true)
    itf = half(usf, byUser = false)
    val r1 = rmse(usf, itf)
    usf = half(itf, byUser = true)
    itf = half(usf, byUser = false)
    val r2 = rmse(usf, itf)
    assert(r1 == rmse1 && r2 == rmse2, s"replay ($r1, $r2) vs engine")
    val gotF = got.map(r => r.getLong(r.fieldIndex("i")) ->
      (r.getLong(r.fieldIndex("if0_u")), r.getLong(r.fieldIndex("if1_u"))))
      .toMap
    assert(gotF == itf, "item factors diverge from the sequential replay")
  }

  test("q_ml_conformal: q̂ is the exact ⌈0.9(n+1)⌉-th calibration " +
    "residual and test coverage lands near the nominal level") {
    val row = SparkEntry.queries("q_ml_conformal")(spark, sfDir)
      .collect().head
    def l(n: String) = row.getLong(row.fieldIndex(n))
    val (nCal, k, qhat) = (l("n_cal"), l("k"), l("qhat_u"))
    assert(k == math.ceil((nCal + 1).toDouble * 0.9).toLong)
    // independent replay: folds, moments, model, residual order stat
    val rows = Tables(spark, sfDir, "lineitem")
      .selectExpr("l_orderkey * 8 + l_linenumber AS rid",
        "(l_orderkey * 7 + l_linenumber) % 10 AS fold",
        "CAST(floor(l_quantity + 0.5e0) AS BIGINT) AS x",
        "CAST(floor(l_extendedprice + 0.5e0) AS BIGINT) AS y")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tr = rows.filter(_._2 < 6)
    val n = tr.length.toDouble
    val (sx, sy) = (tr.map(_._3).sum.toDouble, tr.map(_._4).sum.toDouble)
    val sxy = tr.map(r => r._3 * r._4).sum.toDouble
    val sxx = tr.map(r => r._3 * r._3).sum.toDouble
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = sy / n - b * (sx / n)
    def score(r: (Long, Long, Long, Long)): Long =
      math.floor(math.abs(r._4.toDouble - (a + b * r._3.toDouble)) *
        1000000.0 + 0.5).toLong
    val cal = rows.filter(r => r._2 >= 6 && r._2 < 8)
      .map(r => (score(r), r._1)).sorted
    assert(cal.length.toLong == nCal)
    assert(cal((k - 1).toInt)._1 == qhat, "q̂ is not the k-th score")
    // split-conformal guarantee: ≥ 0.9 coverage in expectation over
    // exchangeable folds — allow finite-sample slack on 600 rows
    val cov = l("n_cov").toDouble / l("n_test").toDouble
    assert(cov > 0.8 && cov <= 1.0, s"coverage $cov")
  }

  test("q_ml_ransac matches a driver-side sequential replay: hash-drawn " +
    "samples, consensus argmax, exact-moment refit") {
    val row = SparkEntry.queries("q_ml_ransac")(spark, sfDir)
      .collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(sx: String): Long = java.lang.Long.parseLong(
      md.digest(sx.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString.take(15), 16)
    val rows = Tables(spark, sfDir, "lineitem")
      .selectExpr("l_orderkey * 8 + l_linenumber AS rid",
        "CAST(floor(l_quantity + 0.5e0) AS BIGINT) AS x",
        "CAST(floor(l_extendedprice + 0.5e0) AS BIGINT) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val tau = 5000L * 1000000L
    val mix = 0x9E3779B97F4A7C15L >>> 7
    val cands = (0 until 16).map { k =>
      def pick(salt: String) =
        rows.map(r => ((h60(s"ra:$salt:${r._1}") ^ (k * mix),
          r._2, r._3), r))
          .minBy(_._1)._2
      val (a1, a2) = (pick("a"), pick("b"))
      if (a1._2 == a2._2) (k, 0.0, 0.0, true)
      else {
        val cb = (a2._3 - a1._3).toDouble / (a2._2 - a1._2).toDouble
        (k, a1._3.toDouble - cb * a1._2.toDouble, cb, false)
      }
    }
    def rU(y: Long, x: Long, ca: Double, cb: Double): Long =
      math.floor(math.abs(y.toDouble - (ca + cb * x.toDouble)) * 1e6 +
        0.5).toLong
    val scored = cands.map { case (k, ca, cb, degen) =>
      val n = if (degen) -1L
      else rows.count(r => rU(r._3, r._2, ca, cb) <= tau).toLong
      (k, ca, cb, n)
    }
    val win = scored.minBy(c => (-c._4, c._1))
    assert(row.getLong(row.fieldIndex("best_k")) == win._1)
    assert(row.getLong(row.fieldIndex("n_inliers")) == win._4)
    // refit on the winner's inliers with the exact moment form
    val in = rows.filter(r => rU(r._3, r._2, win._2, win._3) <= tau)
    val n = in.length.toDouble
    val (sx, sy) = (in.map(_._2).sum.toDouble, in.map(_._3).sum.toDouble)
    val sxy = in.map(r => r._2 * r._3).sum.toDouble
    val sxx = in.map(r => r._2 * r._2).sum.toDouble
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = sy / n - b * (sx / n)
    def rnd(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(row.getLong(row.fieldIndex("n_refit")) == in.length.toLong)
    assert(row.getDouble(row.fieldIndex("b_r")) == rnd(b))
    assert(row.getDouble(row.fieldIndex("a_r")) == rnd(a))
  }

  test("q_ml_gbt matches a sequential boosting replay and the SSE " +
    "strictly descends across rounds") {
    val rows = SparkEntry.queries("q_ml_gbt")(spark, sfDir)
      .orderBy("round").collect()
    assert(rows.length == 3)
    val sses = rows.map(_.getLong(rows.head.fieldIndex("sse_q")))
    assert(sses(0) > sses(1) && sses(1) > sses(2),
      s"SSE not descending: ${sses.toSeq}")
    // sequential replay with the identical quantization
    val data = Tables(spark, sfDir, "lineitem")
      .selectExpr("CAST(floor(l_quantity + 0.5e0) AS BIGINT) AS x1",
        "CAST(floor(l_discount * 100.0e0 + 0.5e0) AS BIGINT) AS x2",
        "CAST(floor(l_extendedprice * 1000.0e0 + 0.5e0) AS BIGINT) AS ym")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mu = math.floor(
      data.map(_._3).sum.toDouble / data.length.toDouble + 0.5).toLong
    var e = data.map { case (x1, x2, ym) => (x1, x2, ym - mu) }
    for (k <- 0 until 3) {
      val cands = (0L until 32L).map { c =>
        val f = if (c < 16) 0L else 1L
        val tt = if (c < 16) c * 3 + 2 else c - 16
        val (l, rr) = e.partition(d =>
          (if (f == 0) d._1 else d._2) <= tt)
        val (sl, nl) = (l.map(_._3).sum, l.length.toLong)
        val (sr, nr) = (rr.map(_._3).sum, rr.length.toLong)
        val gain = if (nl == 0 || nr == 0) -1.0
        else sl.toDouble * sl.toDouble / nl.toDouble +
          sr.toDouble * sr.toDouble / nr.toDouble
        (c, f, tt, sl, nl, sr, nr, gain)
      }
      val b = cands.minBy(x => (-x._8, x._1))
      val row = rows(k)
      assert(row.getLong(row.fieldIndex("bc")) == b._1,
        s"round ${k + 1} stump ${row.getLong(row.fieldIndex("bc"))}" +
          s" != ${b._1}")
      def leaf(s: Long, n: Long): Long =
        if (n == 0) 0L
        else math.floor(s.toDouble / n.toDouble + 0.5).toLong
      val (lml, lmr) = (leaf(b._4, b._5), leaf(b._6, b._7))
      assert(row.getLong(row.fieldIndex("lml")) == lml)
      assert(row.getLong(row.fieldIndex("lmr")) == lmr)
      e = e.map { case (x1, x2, ev) =>
        val lv = if ((if (b._2 == 0) x1 else x2) <= b._3) lml else lmr
        (x1, x2,
          math.floor(ev.toDouble - lv.toDouble * 0.5 + 0.5).toLong)
      }
      val sse = e.map(d => math.floor(
        d._3.toDouble * d._3.toDouble / 1e6 + 0.5).toLong).sum
      assert(row.getLong(row.fieldIndex("sse_q")) == sse,
        s"round ${k + 1} SSE")
    }
  }

  test("q_ab_permutation: the p-value counts exactly the hash " +
    "re-labelings beating the observed delta") {
    val row = SparkEntry.queries("q_ab_permutation")(spark, sfDir)
      .collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(sx: String): Long = java.lang.Long.parseLong(
      md.digest(sx.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString.take(15), 16)
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("doc_id", "CAST(n_chars AS BIGINT) AS xv").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def delta(arm: Long => Long): Double = {
      val g = docs.groupBy(d => arm(d._1))
      g(0L).map(_._2).sum.toDouble / g(0L).length.toDouble -
        g(1L).map(_._2).sum.toDouble / g(1L).length.toDouble
    }
    val dObs = delta(id => h60(s"pm:obs:$id") % 2)
    val nGe = (0 until 64).count { b =>
      math.abs(delta(id => h60(s"pm:$b:$id") % 2)) >= math.abs(dObs)
    }
    assert(row.getLong(row.fieldIndex("n_ge")) == nGe.toLong)
    val p = row.getDouble(row.fieldIndex("p_r"))
    assert(p == math.floor((nGe + 1).toDouble / 65.0 * 1e6 + 0.5) / 1e6)
    assert(p >= 1.0 / 65.0 && p <= 1.0)
  }

  test("q_eval_passk: estimator replays exactly per source and is " +
    "monotone in k") {
    val got = SparkEntry.queries("q_eval_passk")(spark, sfDir).collect()
      .map(r => r.getString(r.fieldIndex("source")) ->
        (r.getLong(r.fieldIndex("n_docs")),
          r.getLong(r.fieldIndex("pass1_u")),
          r.getLong(r.fieldIndex("pass5_u")),
          r.getLong(r.fieldIndex("pass10_u"))))
      .toMap
    // more attempts can only help: pass@1 ≤ pass@5 ≤ pass@10
    got.values.foreach { case (_, p1, p5, p10) =>
      assert(p1 <= p5 && p5 <= p10, s"non-monotone: $p1 $p5 $p10")
    }
    // exact replay of the combinatorial estimator
    def passU(c: Long, k: Int): Long = {
      val num = (0 until k).map(j => 16L - c - j).product.toDouble
      val den = (0 until k).map(j => 16L - j).product.toDouble
      1000000L - math.floor(num / den * 1000000.0 + 0.5).toLong
    }
    val ref = Tables(spark, sfDir, "documents")
      .selectExpr("source", "(doc_id * 13 + n_chars) % 17 AS c").collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (src, xs) =>
        val cs = xs.map(_._2)
        def mean(k: Int): Long = math.floor(
          cs.map(passU(_, k)).sum.toDouble / cs.length.toDouble +
            0.5).toLong
        src -> (cs.length.toLong, mean(1), mean(5), mean(10))
      }
    assert(got == ref, s"engine $got vs replay $ref")
  }

  test("q_stats_kruskal: H matches a driver-side tie-corrected rank " +
    "computation and the correction only scales it up") {
    val row = SparkEntry.queries("q_stats_kruskal")(spark, sfDir)
      .collect().head
    val n = row.getLong(row.fieldIndex("n"))
    val h = row.getDouble(row.fieldIndex("h_stat"))
    val hc = row.getDouble(row.fieldIndex("h_corr"))
    assert(hc >= h, "tie correction must not shrink H")
    // independent replay: midranks over the binned metric
    val xs = Tables(spark, sfDir, "orders")
      .selectExpr("o_orderpriority",
        "CAST(floor(o_totalprice / 1000.0e0) AS BIGINT) AS x").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(xs.length.toLong == n)
    val byBin = xs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val bins = byBin.keys.toSeq.sorted
    val pre = bins.scanLeft(0L)((acc, b) => acc + byBin(b)).init
    val rank = bins.zip(pre).map { case (b, p) =>
      b -> (p + (byBin(b) + 1) / 2.0) }.toMap // tie-averaged midrank
    val groups = xs.groupBy(_._1)
    val nn = xs.length.toDouble
    val s = groups.values.map { g =>
      val rs = g.map(x => rank(x._2)).sum
      rs * rs / g.length.toDouble
    }.sum
    val hRef = 12.0 * s / (nn * (nn + 1.0)) - 3.0 * (nn + 1.0)
    val tie = byBin.values.map(t => t * t * t - t).sum.toDouble
    val hcRef = hRef / (1.0 - tie / (nn * nn * nn - nn))
    // replay folds differ in order → compare within rounding slack
    assert(math.abs(h - hRef) < 1e-4, s"H $h vs $hRef")
    assert(math.abs(hc - hcRef) < 1e-4, s"Hc $hc vs $hcRef")
  }
}
