package graft

import org.apache.spark.sql.functions._

/** Dedup/text operator properties beyond the oracle: idempotence,
  * partition-complement identities, cross-operator agreement on the
  * planted near-duplicates. */
class DedupSpec extends SparkSpec {

  test("exact dedup is idempotent") {
    val docs = Tables(spark, sfDir, "documents")
    val once = docs.dropDuplicates("text")
    val twice = once.dropDuplicates("text")
    assert(once.count() == twice.count())
  }

  test("filter(p) and filter(!p) partition the input") {
    val li = Tables(spark, sfDir, "lineitem")
    val p = col("l_quantity") > 25
    val n = li.count()
    assert(li.filter(p).count() + li.filter(!p || p.isNull).count() == n)
  }

  test("connected components: chain, triangle, and isolated pair") {
    import spark.implicits._
    // a 40-node chain exercises the pointer jumping (diameter 39 must
    // converge well inside the 20-round cap), plus a triangle and a
    // disjoint 2-node component
    val chain = (0L until 39L).map(i => (i, i + 1))
    val triangle = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val pair = Seq((200L, 201L))
    val pairs = (chain ++ triangle ++ pair).toDF("id_a", "id_b")
    val cc = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cc.size == 40 + 3 + 2)
    for (i <- 0L until 40L) assert(cc(i) == (0L, 40L), s"chain node $i: ${cc(i)}")
    for (i <- Seq(100L, 101L, 102L)) assert(cc(i) == (100L, 3L))
    for (i <- Seq(200L, 201L)) assert(cc(i) == (200L, 2L))
  }

  test("connected components: reliable checkpoint dir path (cluster mode)") {
    import spark.implicits._
    // same graph semantics through df.checkpoint() against a real
    // checkpoint directory — the fault-tolerant mode a cluster run uses
    // instead of executor-local localCheckpoint
    val ckpt = tmpDir("cc_ckpt")
    val pairs = (Seq((0L, 1L), (1L, 2L), (2L, 3L)) ++ Seq((10L, 11L)))
      .toDF("id_a", "id_b")
    val cc = graft.operators.Dedup
      .connectedComponents(pairs, checkpointDir = Some(ckpt))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (i <- 0L to 3L) assert(cc(i) == (0L, 4L), s"node $i: ${cc(i)}")
    for (i <- Seq(10L, 11L)) assert(cc(i) == (10L, 2L))
    // the reliable checkpoint actually wrote to the directory
    assert(new java.io.File(ckpt).listFiles().nonEmpty)
  }

  test("minhash agreement is high exactly on high-Jaccard pairs") {
    // every exact-Jaccard ≥0.8 pair must be found by MinHash-LSH at the
    // 10/16 agreement threshold (recall-1 parameterization), on sf0.001
    val ngram = SparkEntry.queries("q_dedup_ngram")(spark, sfDir)
      .select(col("id_a"), col("id_b"))
    val minhash = SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
      .select(col("id_a"), col("id_b"))
    val missed = ngram.exceptAll(minhash).count()
    assert(missed == 0, s"$missed high-Jaccard pairs missed by MinHash-LSH")
  }

  test("ppjoin prefix filtering: fewer candidates than the full shingle " +
    "join, identical verified output") {
    // exactness: the prefix-filtered join must emit exactly the pairs the
    // plain formulation emits (the oracle pins this cross-engine at
    // sf0.01; this pins it in-engine at sf0.001, plus the reduction —
    // the REASON the operator exists)
    val ngram = SparkEntry.queries("q_dedup_ngram")(spark, sfDir)
    val ppjoin = SparkEntry.queries("q_dedup_ppjoin")(spark, sfDir)
    assert(ngram.exceptAll(ppjoin).count() == 0 &&
      ppjoin.exceptAll(ngram).count() == 0,
      "prefix filtering changed the verified pair set")
    val sh = graft.operators.Dedup.shinglesOf(
        Tables(spark, sfDir, "documents"))
      .select(col("doc_id"),
        graft.functions.TextAnalysis.h60(col("shingle")).as("sid")).cache()
    try {
      val prefixCand = graft.operators.Dedup.ppjoinCandidates(sh).count()
      val a = sh.select(col("doc_id").as("id_a"), col("sid"))
      val b = sh.select(col("doc_id").as("id_b"), col("sid").as("sid_b"))
      val fullCand = a.join(b,
          col("sid") === col("sid_b") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct().count()
      assert(prefixCand < fullCand,
        s"prefix filter did not reduce candidates: $prefixCand vs $fullCand")
      // soundness floor: candidates must still cover every emitted pair
      assert(prefixCand >= ppjoin.count(), "fewer candidates than results")
    } finally sh.unpersist()
  }

  test("simhash pairs are symmetric-free and ordered") {
    val sh = SparkEntry.queries("q_dedup_simhash")(spark, sfDir).collect()
    sh.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be ordered id_a < id_b")
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 3)
    }
  }

  test("union of complements reconstructs set ops") {
    val c = Tables(spark, sfDir, "customer")
      .select(col("c_custkey").as("k")).distinct()
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_custkey").as("k")).distinct()
    val inter = c.intersect(o).count()
    val exceptN = c.except(o).count()
    assert(inter + exceptN == c.count())
  }

  test("exact-substring dedup removes every token a duplicated 4-gram " +
    "covers, and only those") {
    import spark.implicits._
    // "a b c d" is the one span in >= 2 distinct docs: it covers
    // tokens 1-4 of doc 1 (start 1), tokens 2-5 of doc 2 (start 2),
    // and ALL of doc 4 (fully removed -> cleaned ''). Doc 3 is shorter
    // than a window and must pass through untouched; every other span
    // ("b c d e", "x a b c", ...) is unique and removes nothing.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x a b c d y"),
      (3L, "p q r"),
      (4L, "a b c d")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.substrDedup(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((6L, 4L, "e f")), out(1L).toString)
    assert(out(2L) == ((6L, 4L, "x y")), out(2L).toString)
    assert(out(3L) == ((3L, 0L, "p q r")), out(3L).toString)
    assert(out(4L) == ((4L, 4L, "")), out(4L).toString)
    // a WITHIN-document repeat is not cross-document duplication:
    // the >= 2 DISTINCT docs rule leaves a self-repeating doc intact
    val solo = Seq((9L, "m n o p m n o p")).toDF("doc_id", "text")
    val soloOut = graft.operators.Dedup.substrDedup(solo)
      .collect().map(r => (r.getLong(2), r.getString(3))).head
    assert(soloOut == ((0L, "m n o p m n o p")), soloOut.toString)
  }

  test("exact-substring window parameter generalizes beyond the 4-token " +
    "default (W=2 and W=5 pinned by hand)") {
    import spark.implicits._
    // W=2: the only cross-doc bigram is "a b". Coverage [i-1, i]:
    // doc 1 (start 1) loses tokens 1-2, doc 2 (start 2) loses 2-3;
    // doc 3 is shorter than the window and passes through. An
    // implementation that silently kept the 4-token arithmetic would
    // find NO duplicated span here (no shared 4-gram) and remove
    // nothing — so these expectations fail loudly on regression.
    val w2docs = Seq(
      (1L, "a b c"),
      (2L, "z a b"),
      (3L, "c")).toDF("doc_id", "text")
    val w2 = graft.operators.Dedup.substrDedup(w2docs, window = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(w2(1L) == ((3L, 2L, "c")), w2(1L).toString)
    assert(w2(2L) == ((3L, 2L, "z")), w2(2L).toString)
    assert(w2(3L) == ((1L, 0L, "c")), w2(3L).toString)
    // W=5: shared span "a b c d e" (doc 1 start 1, doc 2 start 2);
    // coverage [i-4, i] removes tokens 1-5 of doc 1 and 2-6 of doc 2.
    // Under the DEFAULT W=4 this corpus shares "a b c d" AND
    // "b c d e" and doc 2 would also lose token 1 — distinct output,
    // so a parameter ignored in either direction is caught.
    val w5docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "q a b c d e")).toDF("doc_id", "text")
    val w5 = graft.operators.Dedup.substrDedup(w5docs, window = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(w5(1L) == ((7L, 5L, "f g")), w5(1L).toString)
    assert(w5(2L) == ((6L, 5L, "q")), w5(2L).toString)
  }

  test("q_link_align: the wavefront equals textbook row-major " +
    "Smith-Waterman per customer and segment stats replay exactly") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_link_align")(spark, sfDir).collect()
      .map(r => r.getString(r.fieldIndex("seg")) ->
        (r.getLong(r.fieldIndex("n")),
          r.getLong(r.fieldIndex("mean_sw_u")),
          r.getLong(r.fieldIndex("max_sw")),
          r.getLong(r.fieldIndex("min_sw"))))
      .toMap
    def sw(a: String, b: String): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length) {
        val m = if (a(i - 1) == b(j - 1)) 2 else -1
        dp(i)(j) = math.max(0, math.max(dp(i - 1)(j - 1) + m,
          math.max(dp(i - 1)(j) - 1, dp(i)(j - 1) - 1)))
        best = math.max(best, dp(i)(j))
      }
      best
    }
    val per = Tables(spark, sfDir, "customer")
      .selectExpr("c_custkey", "c_mktsegment", "c_name").collect()
      .map { r =>
        val (id, seg, nm) =
          (r.getLong(0), r.getString(1), r.getString(2))
        val b = nm.zipWithIndex.flatMap { case (ch, i0) =>
          val i = i0 + 1
          if ((id + i) % 9 == 0) None
          else if ((id + i) % 5 == 0) Some('x')
          else Some(ch)
        }.mkString
        seg -> sw(nm, b).toLong
      }
    per.groupBy(_._1).foreach { case (seg, xs) =>
      val vs = xs.map(_._2)
      val (n, mean, mx, mn) = got(seg)
      assert(n == vs.length.toLong, s"$seg n")
      assert(mean == math.floor(
        vs.sum.toDouble / vs.length.toDouble * 1e6 + 0.5).toLong,
        s"$seg mean")
      assert(mx == vs.max && mn == vs.min, s"$seg extremes")
    }
    // local alignment must beat the corruption: names share long runs
    got.values.foreach { case (_, mean, _, _) =>
      assert(mean > 2000000L, "mean local alignment below 2 matches?")
    }
  }

  test("soundex fragment reproduces the textbook vectors and the " +
    "SMITH/SMYTH blocking property") {
    import graft.operators.Dedup
    val frag = Dedup.soundexSql("w", duck = false)
    val vectors = Seq("ROBERT" -> "R163", "PFISTER" -> "P236",
      "TYMCZAK" -> "T522", "JACKSON" -> "J250",
      "SMITH" -> "S530", "SMYTH" -> "S530", "WASHINGTON" -> "W252")
    val words = vectors.map(_._1)
    val got = spark.sql(
      s"SELECT w, $frag AS code FROM VALUES ${words.map(w => s"('$w')")
        .mkString(", ")} AS t(w)")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vectors.foreach { case (w, want) =>
      assert(got(w) == want, s"$w -> ${got(w)}, want $want")
    }
  }

  test("soundex fragment equals an independent Scala reference on " +
    "generated letter strings") {
    import graft.operators.Dedup
    // reference: the same variant (no h/w transparency), written as the
    // textbook per-character walk rather than translate/regex pipelines
    def ref(w: String): String = {
      val code = "01230120022455012623010202"
      val digits = w.map(c => code(c - 'A'))
      val collapsed = digits.foldLeft("") { (acc, d) =>
        if (acc.nonEmpty && acc.last == d) acc else acc + d
      }
      val tail = collapsed.drop(1).filter(_ != '0')
      w.head.toString + (tail + "000").take(3)
    }
    val words = (1 to 120).map { k =>
      (0 until (3 + k % 6)).map { i =>
        ('A' + ((k * 31 + i * 17 + i * i * 7) % 26)).toChar
      }.mkString
    }.distinct
    val frag = Dedup.soundexSql("w", duck = false)
    val got = spark.sql(
      s"SELECT w, $frag AS code FROM VALUES ${words.map(w => s"('$w')")
        .mkString(", ")} AS t(w)")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.foreach { w =>
      assert(got(w) == ref(w), s"$w -> ${got(w)}, ref ${ref(w)}")
    }
  }
}
