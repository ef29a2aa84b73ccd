package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Align

/** Pins the native alignment kernels against independent textbook
  * DPs: [[Align.lcsLength]] (bit-parallel Allison–Dix/CIPR — the
  * multi-word carry chain is the part worth distrusting) against the
  * O(n·m) LCS table, [[Align.swScore]] against the plain
  * Smith–Waterman table, across word-boundary lengths (63/64/65/129)
  * and randomized sequences, plus codegen survival over a real scan. */
class AlignSpec extends SparkSpec {

  private def arr(xs: Seq[String]): ArrayData =
    new GenericArrayData(xs.map(x =>
      if (x == null) null else UTF8String.fromString(x)).toArray[Any])

  /** Textbook O(n·m) LCS with SQL null semantics (null matches
    * nothing, including null). */
  private def lcsNaive(a: Seq[String], b: Seq[String]): Int = {
    val n = a.length; val m = b.length
    val dp = Array.ofDim[Int](n + 1, m + 1)
    for (i <- 1 to n; j <- 1 to m) {
      val eq = a(i - 1) != null && b(j - 1) != null &&
        a(i - 1) == b(j - 1)
      dp(i)(j) =
        if (eq) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    }
    dp(n)(m)
  }

  /** Textbook Smith–Waterman with floor 0 and all-cells max. */
  private def swNaive(a: Seq[String], b: Seq[String],
      mS: Int, mm: Int, g: Int): Int = {
    val n = a.length; val m = b.length
    val dp = Array.ofDim[Int](n + 1, m + 1)
    var best = 0
    for (i <- 1 to n; j <- 1 to m) {
      val eq = a(i - 1) != null && b(j - 1) != null &&
        a(i - 1) == b(j - 1)
      val sc = math.max(0, math.max(
        dp(i - 1)(j - 1) + (if (eq) mS else mm),
        math.max(dp(i - 1)(j) + g, dp(i)(j - 1) + g)))
      dp(i)(j) = sc
      if (sc > best) best = sc
    }
    best
  }

  private val rnd = new scala.util.Random(20260816L)
  private def randomSeq(len: Int, alphabet: Int): Seq[String] =
    Seq.fill(len)(s"w${rnd.nextInt(alphabet)}")

  test("bit-parallel LCS equals the textbook table at word-boundary " +
    "lengths and random alphabets") {
    // the multi-word carry chain only exercises past 64 positions of
    // the FIRST argument — sweep both sides across the boundary
    for (n <- Seq(0, 1, 5, 63, 64, 65, 100, 129, 200);
         m <- Seq(0, 1, 7, 64, 130);
         alphabet <- Seq(2, 5, 40)) {
      val a = randomSeq(n, alphabet)
      val b = randomSeq(m, alphabet)
      assert(Align.lcsLength(arr(a), arr(b)) == lcsNaive(a, b),
        s"n=$n m=$m alphabet=$alphabet")
    }
    // worst-case carry pressure: identical long runs (V + U saturates)
    val run = Seq.fill(190)("x")
    assert(Align.lcsLength(arr(run), arr(run)) == 190)
    assert(Align.lcsLength(arr(run), arr(Seq.fill(70)("x"))) == 70)
  }

  test("LCS null semantics: a null element matches nothing, " +
    "including another null") {
    val a = Seq("a", null, "b")
    val b = Seq(null, "a", "b")
    assert(Align.lcsLength(arr(a), arr(b)) == 2)
    assert(Align.lcsLength(arr(Seq[String](null, null)),
      arr(Seq[String](null, null))) == 0)
  }

  test("Smith–Waterman kernel equals the textbook table, including " +
    "the floor and all-cells max") {
    for (n <- Seq(0, 1, 9, 30); m <- Seq(0, 1, 8, 33);
         alphabet <- Seq(2, 6)) {
      val a = randomSeq(n, alphabet)
      val b = randomSeq(m, alphabet)
      assert(Align.swScore(arr(a), arr(b), 2, -1, -1) ==
        swNaive(a, b, 2, -1, -1), s"n=$n m=$m alphabet=$alphabet")
      assert(Align.swScore(arr(a), arr(b), 3, -2, -1) ==
        swNaive(a, b, 3, -2, -1), s"params2 n=$n m=$m")
    }
    // the local property: unrelated prefixes cost nothing
    val core = Seq("m", "a", "t", "c", "h")
    val aa = Seq("z", "z", "z") ++ core
    val bb = core ++ Seq("q", "q")
    assert(Align.swScore(arr(aa), arr(bb), 2, -1, -1) == 10)
  }

  test("chrF kernel equals a naive multiset reference across orders, " +
    "edges and the effective-order sentinel") {
    def naive(c: String, r: String): Long = {
      val per = (1 to 6).flatMap { n =>
        val cg = (0 to c.length - n).map(i => c.substring(i, i + n))
        val rg = (0 to r.length - n).map(i => r.substring(i, i + n))
        if (cg.isEmpty && rg.isEmpty) None
        else {
          val cc = cg.groupBy(identity).map { case (k, v) => k -> v.size }
          val m = rg.groupBy(identity).map { case (k, v) =>
            math.min(v.size, cc.getOrElse(k, 0))
          }.sum.toLong
          Some((5L * m * 1000000L) / (4L * rg.size + cg.size))
        }
      }
      if (per.isEmpty) -1L else per.sum / per.size
    }
    def k(c: String, r: String): Long =
      Align.chrfU(UTF8String.fromString(c), UTF8String.fromString(r))
    val rnd2 = new scala.util.Random(77L)
    for (lc <- Seq(0, 1, 3, 5, 7, 40, 120); lr <- Seq(0, 2, 6, 41);
         alpha <- Seq(2, 4)) {
      val c = (0 until lc).map(_ => ('a' + rnd2.nextInt(alpha)).toChar)
        .mkString
      val r = (0 until lr).map(_ => ('a' + rnd2.nextInt(alpha)).toChar)
        .mkString
      assert(k(c, r) == naive(c, r), s"lc=$lc lr=$lr alpha=$alpha")
    }
    assert(k("", "") == -1L, "no grams at any order must sentinel")
    assert(k("abc", "abc") == 1000000L, "identical strings score 1.0")
    assert(k("abc", "xyz") == 0L, "disjoint alphabets score 0")
  }

  test("both expressions survive whole-stage codegen over a real scan " +
    "and null input arrays yield null") {
    graft.functions.Align.register(spark)
    val df = Tables(spark, sfDir, "part")
      .selectExpr("p_partkey", "split(p_name, ' ') AS a",
        "slice(split(p_name, ' '), 2, 3) AS b")
      .selectExpr("p_partkey", "a", "b",
        "graft_lcs_len(a, b) AS lcs",
        "graft_sw_score(a, b, 2, -1, -1) AS sw")
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    // pin the GENERATED CALLS, not just a codegen stage
    assert(codegen.contains("graft.functions.Align.lcsLength"), codegen)
    assert(codegen.contains("graft.functions.Align.swScore"), codegen)
    df.collect().foreach { r =>
      val a = r.getSeq[String](1)
      val b = r.getSeq[String](2)
      assert(r.getInt(3) == lcsNaive(a, b), s"lcs row ${r.getLong(0)}")
      assert(r.getInt(4) == swNaive(a, b, 2, -1, -1),
        s"sw row ${r.getLong(0)}")
    }
    val nulls = spark.sql(
      "SELECT graft_lcs_len(CAST(NULL AS ARRAY<STRING>), array('a')) n1," +
        " graft_sw_score(array('a'), CAST(NULL AS ARRAY<STRING>)," +
        " 2, -1, -1) n2").collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }
}
