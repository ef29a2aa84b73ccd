package graft.functions

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Approximate distinct counting (SURVEY.md §2B): the custom [[HllSketch]]
  * UDAF and Spark's built-in HLL++ (`approx_count_distinct`), both
  * cross-checked against the exact distinct count.
  *
  * The oracle trick: sketch internals are engine-specific, so the query
  * emits per-group BOOLEAN accuracy verdicts (|approx − exact| ≤ tol·exact)
  * alongside the exact count; the DuckDB oracle then asserts `true` per
  * group. That turns an "unverifiable" approximate operator into a hard
  * hash-compared check of its accuracy contract.
  */
object Approx {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_agg_approx",
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_exact,
        |  true AS hll_ok,
        |  true AS builtin_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      HllSketch.register(s)
      // The exact distinct and the two sketches aggregate SEPARATELY and
      // join on the 3-row group key: mixing a distinct aggregate with
      // imperative sketch aggregates in one plan made Catalyst run an
      // Expand (2x rows) through the row-at-a-time ObjectHashAggregate;
      // split, the exact side keeps whole-stage codegen and the sketch
      // side sees each row once. (Measured 3.5x faster on the sf0.1
      // bench — 2.2s down to ~0.6s; results identical.)
      val li = Tables(s, dir, "lineitem")
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_exact"))
      val sketches = li.groupBy(col("l_returnflag"))
        .agg(
          expr("graft_hll(l_partkey)").as("hll"),
          approx_count_distinct(col("l_partkey")).as("adc"))
      exact.join(broadcast(sketches), "l_returnflag")
        .select(
          col("l_returnflag"), col("nd_exact"),
          (abs(col("hll") - col("nd_exact")) <= col("nd_exact") * 0.05)
            .as("hll_ok"),
          (abs(col("adc") - col("nd_exact")) <= col("nd_exact") * 0.10)
            .as("builtin_ok"))
    },

    // ------------------------------------------------------------------
    // Heavy hitters via the space-saving FreqSketch UDAF, over a
    // deliberately skewed stream derived from lineitem (two hot tokens
    // carrying ~70% of rows + a ~15k-distinct cold tail that forces
    // constant counter eviction). Exact heavy-hitter counting shuffles
    // one row per DISTINCT token — the vocabulary; the sketch shuffles
    // m=16 counters per partition. Same verdict-oracle trick as the HLL
    // check: sketch contents are merge-order-dependent for borderline
    // items, but the algorithm GUARANTEES any item above n/m is present
    // with true count in [count − err, count] — so the query emits
    // those booleans for the (deterministic) exact-heavy token set and
    // the oracle asserts them.
    QueryDef(
      "q_agg_heavyhitters",
      """WITH s AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 7
        |    THEN 'hot' || CAST(l_orderkey % 2 AS VARCHAR)
        |    ELSE 'cold' || CAST(l_orderkey AS VARCHAR) END AS tok
        |  FROM lineitem),
        |cnt AS (SELECT tok, count(*) AS c FROM s GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM s)
        |SELECT tok, true AS present, true AS bounds_ok
        |FROM cnt, n WHERE c >= 3.0 * n / 16""".stripMargin) { (s, dir) =>
      FreqSketch.register(s)
      // feeds three branches (sketch, total, exact heavy counts) —
      // cache so the scan + token derivation runs once
      val toks = Tables(s, dir, "lineitem").select(
        when(col("l_orderkey") % 10 < 7,
          concat(lit("hot"), (col("l_orderkey") % 2).cast("string")))
          .otherwise(concat(lit("cold"), col("l_orderkey").cast("string")))
          .as("tok"))
        .cache()
      val entries = toks.agg(expr("graft_freq(tok, 16)").as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item").as("s_item"), col("e.count").as("s_count"),
          col("e.err").as("s_err"))
      val total = toks.agg(count(lit(1)).as("n"))
      val heavy = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(total))
        .filter(col("c") >= lit(3.0) * col("n") / 16)
      heavy.join(broadcast(entries), col("tok") === col("s_item"), "left")
        .select(col("tok"),
          col("s_item").isNotNull.as("present"),
          coalesce(col("s_count") >= col("c") &&
            col("s_count") - col("s_err") <= col("c"), lit(false))
            .as("bounds_ok"))
    },

    // ------------------------------------------------------------------
    // Sketch TABLE: the pre-aggregation pattern that makes distinct
    // counting cheap at 100 TB. Phase 1 sketches each month's customers
    // into a fixed-size HLL binary (Spark's built-in DataSketches
    // hll_sketch_agg) and PERSISTS the 80-row sketch table to parquet;
    // phase 2 answers a coarser rollup (distinct customers per YEAR) by
    // union-merging the stored monthly sketches — never re-reading the
    // raw fact table. At scale the nightly job maintains the sketch
    // table incrementally and any ad-hoc date-range distinct query costs
    // rows-of-sketch-table, not a fact scan + key shuffle. Merge is
    // register-wise max, so the estimate is independent of merge order —
    // same verdict-oracle trick as q_agg_approx: the query emits the
    // exact count and an accuracy boolean, DuckDB asserts them.
    QueryDef(
      "q_agg_sketch_table",
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  count(DISTINCT o_custkey) AS nd_exact,
        |  true AS sketch_ok
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      val tmp = s"/tmp/graft_sketch_table_${dir.hashCode.toHexString}"
      val orders = Tables(s, dir, "orders")
      orders
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
      val est = s.read.parquet(tmp)
        .groupBy(year(col("month")).as("yr"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      val exact = orders
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(countDistinct(col("o_custkey")).as("nd_exact"))
      exact.join(broadcast(est), "yr")
        .select(col("yr"), col("nd_exact"),
          (abs(col("est") - col("nd_exact")) <= col("nd_exact") * 0.05)
            .as("sketch_ok"))
    },

    // ------------------------------------------------------------------
    // EXACT distinct counting that still never shuffles keys: Spark's
    // bitmap aggregates. Keys hash into 32k-bit buckets
    // (bitmap_bucket_number / bitmap_bit_position); each (group, bucket)
    // builds a fixed ≤4 KiB bitmap (bitmap_construct_agg), coarser
    // rollups OR the stored bitmaps together (bitmap_or_agg) and
    // popcount (bitmap_count). Per-year distinct here re-aggregates the
    // per-MONTH bitmaps — the same persisted-pre-aggregation pattern as
    // q_agg_sketch_table but with an exact answer, so the oracle compares
    // values directly, no accuracy verdict needed. The shuffle ships one
    // bitmap per touched bucket: for dense integer keys that is
    // |keyspace|/32768 bitmaps per group, independent of row count — the
    // 100 TB trade is bitmaps-∝-keyspace (exact) vs HLL's fixed 4 KiB
    // (approximate).
    QueryDef(
      "q_agg_bitmap",
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  count(DISTINCT o_custkey) AS nd
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      val m = Tables(s, dir, "orders").select(
        year(col("o_orderdate")).as("yr"),
        date_trunc("month", col("o_orderdate")).as("month"),
        col("o_custkey"))
      val perMonthBucket = m
        .groupBy(col("yr"), col("month"),
          expr("bitmap_bucket_number(o_custkey)").as("bucket"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))")
          .as("bm"))
      val perYearBucket = perMonthBucket
        .groupBy(col("yr"), col("bucket"))
        .agg(expr("bitmap_or_agg(bm)").as("bm"))
      perYearBucket.groupBy(col("yr"))
        .agg(sum(expr("bitmap_count(bm)")).as("nd"))
    },

    // ------------------------------------------------------------------
    // Theta-sketch set algebra: |customers active in BOTH 1996 and
    // 1997| from two per-year sketches — the overlap/retention question
    // stored HLLs cannot answer (HLL registers only union). Each year
    // aggregates to one ≤32 KiB KMV sketch; the intersection is a
    // single scalar expression over the two 1-row aggregates (the
    // crossJoin is 1×1 control plane, like q_text_tfidf's corpus
    // count). At 100 TB the sketches come from the persisted sketch
    // table, so the overlap query reads K rows, not the fact table.
    // Verdict oracle as with every sketch: exact intersection count +
    // an accuracy boolean (exact-mode sketches ⇒ the estimate IS exact,
    // but the contract stays the ±5% bound).
    QueryDef(
      "q_agg_theta",
      """SELECT count(*) AS n_both, true AS theta_ok FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)""".stripMargin) { (s, dir) =>
      ThetaSketch.register(s)
      val o = Tables(s, dir, "orders")
      def custs(yr: Int) =
        o.filter(year(col("o_orderdate")) === yr).select(col("o_custkey"))
      val sk96 = custs(1996).agg(expr("graft_theta(o_custkey)").as("sk96"))
      val sk97 = custs(1997).agg(expr("graft_theta(o_custkey)").as("sk97"))
      val est = sk96.crossJoin(broadcast(sk97))
        .select(expr("graft_theta_intersect(sk96, sk97)").as("est"))
      val exact = custs(1996).intersect(custs(1997))
        .agg(count(lit(1)).as("n_both"))
      exact.crossJoin(broadcast(est))
        .select(col("n_both"),
          (abs(col("est") - col("n_both")) <= col("n_both") * 0.05)
            .as("theta_ok"))
    },

    // ------------------------------------------------------------------
    // Count-min sketch (Cormode & Muthukrishnan 2005) built DECLARATIVELY
    // as a table — the "sketch as relation" pattern: d=4 hash rows ×
    // w=256 buckets, cell (i,b) = Σ counts of tokens with h_i(tok)=b,
    // point estimate = min_i cell(i, h_i(tok)). Because the hash
    // functions are the repo's deterministic md5-based h60, the whole
    // sketch — construction AND every estimate — is a pure function of
    // the data, so the oracle replays it exactly instead of settling
    // for an accuracy verdict: the output pins n_tokens whose estimate
    // is exact, the total and max overestimate (CM never underestimates
    // — a hash mismatch here would catch either engine breaking the
    // one-sided guarantee). Scale shape: the corpus collapses to vocab
    // counts first (map-combinable, Heaps-sublinear output); the 4×
    // fan-out, the 1024-cell sketch, and the probe join all run over
    // the vocabulary, never the corpus; the sketch table itself is 1024
    // rows at ANY corpus size — the point of the structure.
    QueryDef(
      "q_agg_cmsketch",
      s"""WITH wt AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS c FROM wt WHERE w <> '' GROUP BY 1),
        |fan AS (
        |  SELECT w, c, i,
        |    ${TextAnalysis.h60sql(
            "'cm' || CAST(i AS VARCHAR) || ':' || w")} % 256 AS b
        |  FROM wc, (SELECT unnest([0, 1, 2, 3]) AS i) hs),
        |cm AS (SELECT i, b, CAST(sum(c) AS BIGINT) AS s
        |       FROM fan GROUP BY 1, 2),
        |est AS (
        |  SELECT f.w, f.c, min(cm.s) AS e
        |  FROM fan f JOIN cm ON f.i = cm.i AND f.b = cm.b
        |  GROUP BY 1, 2)
        |SELECT count(*) AS n_tokens,
        |  count(CASE WHEN e = c THEN 1 END) AS n_exact,
        |  CAST(sum(e - c) AS BIGINT) AS total_over,
        |  max(e - c) AS max_over
        |FROM est""".stripMargin) { (s, dir) =>
      val wc = Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      // 4-way hash fan-out over the vocabulary (NOT the corpus)
      val fan = wc.select(col("w"), col("c"),
          explode(sequence(lit(0), lit(3))).as("i"))
        .withColumn("b",
          TextAnalysis.h60(concat(lit("cm"), col("i").cast("string"),
            lit(":"), col("w"))) % 256)
      val cm = fan.groupBy(col("i"), col("b")).agg(sum(col("c")).as("s"))
      // probe every vocab token back through the sketch; min over rows
      val est = fan.join(cm, Seq("i", "b"))
        .groupBy(col("w"), col("c")).agg(min(col("s")).as("e"))
      est.agg(count(lit(1)).as("n_tokens"),
        count(when(col("e") === col("c"), 1)).as("n_exact"),
        sum(col("e") - col("c")).as("total_over"),
        max(col("e") - col("c")).as("max_over"))
    }
  )
}
