package graft.operators

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second TPC-H flagship wave (SURVEY.md §2B "joins/aggregation" depth):
  * Q7, Q12, Q14, Q17, Q19, Q22 — the remaining queries expressible on this
  * dataset's columns (Q2/Q9/Q11/Q16/Q20 need `partsupp`, which TESTDATA.md
  * does not ship). Where the generator omits a column the official query
  * uses (`l_shipmode`, `p_container`, `c_phone`), the adaptation keeps the
  * query's defining PLAN SHAPE — the thing the flagship exists to pin —
  * and swaps in an equivalent column of the same role; each header notes
  * the substitution.
  *
  * Scale notes (100 TB design): every query here keeps exactly one
  * fact-grain shuffle (the lineitem⋈orders SMJ or a per-key window/agg),
  * broadcasts only schema-bounded or 1-row relations, and pre-aggregates
  * the fact grain BEFORE attaching growing dimensions (the Q10 move).
  */
object TpchExtra {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // TPC-H Q7 (volume shipping): revenue flowing between two nations,
    // by supplier-nation × customer-nation × ship year. The scale plan:
    // the two-year ship-date filter prunes lineitem at the scan; the
    // supplier side resolves to a nation name BEFORE the fact join (100
    // suppliers ⋈ 25 nations — both schema-bounded broadcasts); then ONE
    // fact⋈fact SMJ (lineitem⋈orders) fixes the order grain, and the
    // customer dimension attaches only AFTER revenue is pre-aggregated
    // to (custkey, supp_nation, year) — orders-of-magnitude fewer rows
    // than lineitem, the same late-dimension move as Q10. The
    // nation-pair disjunction filters supplier rows at the broadcast and
    // customer rows at the post-agg join, so neither fact scan carries
    // non-qualifying nations further than its first join.
    QueryDef(
      "q_tpch_q7",
      s"""SELECT supp_nation, cust_nation, l_year,
        |  ${Num.sql("sum(volume)", 2)} AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |    l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |    AND c_nationkey = n2.n_nationkey
        |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
        |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val pairNations = Seq("NATION_3", "NATION_7")
      val nat = t(s, dir, "nation")
        .filter(col("n_name").isin(pairNations: _*))
        .select(col("n_nationkey"), col("n_name"))
      val supp = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"), col("supp_nation"), col("l_year"))
        .agg(sum(col("volume")).as("vol"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(Num.r(sum(col("vol")), 2).as("revenue"))
    },

    // ------------------------------------------------------------------
    // TPC-H Q12 shape (shipping-priority pivot). The official query
    // groups by `l_shipmode`; this dataset has no ship mode, so the
    // same role — a low-cardinality lineitem categorical — is played by
    // `l_linestatus`. The defining shape is untouched: ONE fact⋈fact
    // SMJ, then a conditional CASE pivot splitting order priorities
    // into high/low counts inside a map-combinable aggregate — the
    // pattern every "pivot a fact by a dim attribute" report reduces
    // to. Counts CAST to BIGINT on the oracle side (DuckDB widens
    // sum(int) to HUGEINT — the q_split lesson).
    QueryDef(
      "q_tpch_q12",
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val hi = Seq("1-URGENT", "2-HIGH")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linestatus"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      li.hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin(hi: _*), 1).otherwise(0))
            .as("high_line_count"),
          // mirrors the oracle's NOT IN ... THEN 1 ELSE 0 exactly: a
          // NULL priority is NULL under !isin → ELSE 0 in both engines
          // (the complementary otherwise(1) would count NULLs here
          // while the oracle's NOT IN would not)
          sum(when(!col("o_orderpriority").isin(hi: _*), 1).otherwise(0))
            .as("low_line_count"))
    },

    // ------------------------------------------------------------------
    // TPC-H Q14 (promotion effect): what fraction of a month's revenue
    // came from promo parts? (`p_type` here is a flat category, so the
    // official `LIKE 'PROMO%'` is equality.) Shape: a month-pruned
    // lineitem scan ⋈ broadcast part, closed by ONE global conditional
    // aggregate producing a single row — numerator and denominator in
    // the same pass, never two scans. At 100 TB the part broadcast is
    // the only data movement besides the pruned scan itself.
    QueryDef(
      "q_tpch_q14",
      s"""SELECT ${Num.sql(
          "100.0 * sum(CASE WHEN p_type = 'PROMO' " +
            "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) / " +
            "sum(l_extendedprice * (1 - l_discount))", 6)} AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin) {
      (s, dir) =>
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
          .select(col("l_partkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        val part = t(s, dir, "part").select(col("p_partkey"), col("p_type"))
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .agg(Num.r(
            lit(100.0) * sum(when(col("p_type") === "PROMO", col("rev"))
              .otherwise(0.0)) / sum(col("rev")), 6).as("promo_revenue"))
    },

    // ------------------------------------------------------------------
    // TPC-H Q17 (small-quantity-order revenue): yearly revenue lost if
    // small orders (below 20% of a part's average order quantity) were
    // dropped, for one brand's small parts (`p_size <= 10` standing in
    // for the official `p_container` bucket). The textbook form is a
    // correlated scalar subquery per lineitem row — the oracle runs
    // exactly that. The scale plan dissolves it into ONE window: after
    // the broadcast part filter restricts lines to the brand's parts,
    // `avg(l_quantity) OVER (PARTITION BY l_partkey)` computes every
    // per-part threshold in a single partkey shuffle (per-part groups
    // are bounded by order multiplicity, so no skew ceiling), and the
    // comparison + global sum close in the same stage — the fact table
    // is scanned once and shuffled once, vs. the subquery's two scans.
    QueryDef(
      "q_tpch_q17",
      s"""SELECT ${Num.sql("sum(l_extendedprice) / 7.0", 2)} AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#13' AND p_size <= 10
        |  AND l_quantity < 0.2 * (
        |    SELECT avg(l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val part = t(s, dir, "part")
          .filter(col("p_brand") === "Brand#13" && col("p_size") <= 10)
          .select(col("p_partkey"))
        val li = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        val w = Window.partitionBy(col("l_partkey"))
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .withColumn("avg_q", avg(col("l_quantity")).over(w))
          .filter(col("l_quantity") < lit(0.2) * col("avg_q"))
          .agg(Num.r(sum(col("l_extendedprice")) / lit(7.0), 2)
            .as("avg_yearly"))
    },

    // ------------------------------------------------------------------
    // TPC-H Q19 (discounted revenue, disjunctive predicates): three
    // brand/size/quantity conjunctions OR-ed together — the classic
    // test of whether an engine pushes a disjunction's common equi-key
    // through and prunes each side. (`p_size` ranges stand in for the
    // official `p_container` lists; `l_shipmode/shipinstruct` have no
    // analogue and are dropped from every arm equally.) The plan to
    // demand: the part-only half of the disjunction prunes the
    // broadcast BEFORE the join, the equi-key (partkey) stays a hash
    // join key — never a nested loop over the OR — and the mixed
    // part×lineitem arms evaluate as a post-join filter inside the same
    // codegen stage, closing to a single-row conditional sum.
    QueryDef(
      "q_tpch_q19",
      s"""SELECT ${Num.sql("sum(l_extendedprice * (1 - l_discount))", 2)}
        |    AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity >= 1 AND l_quantity <= 15)
        |  OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 25
        |    AND l_quantity >= 10 AND l_quantity <= 25)
        |  OR (p_brand = 'Brand#7' AND p_size BETWEEN 20 AND 50
        |    AND l_quantity >= 20 AND l_quantity <= 35)""".stripMargin) {
      (s, dir) =>
        val partPred =
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 10)) ||
            (col("p_brand") === "Brand#20" && col("p_size").between(10, 25)) ||
            (col("p_brand") === "Brand#7" && col("p_size").between(20, 50))
        val part = t(s, dir, "part")
          .filter(partPred)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        val li = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_quantity"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        val mixedPred =
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
            col("l_quantity") >= 1 && col("l_quantity") <= 15) ||
            (col("p_brand") === "Brand#20" && col("p_size").between(10, 25) &&
              col("l_quantity") >= 10 && col("l_quantity") <= 25) ||
            (col("p_brand") === "Brand#7" && col("p_size").between(20, 50) &&
              col("l_quantity") >= 20 && col("l_quantity") <= 35)
        li.join(broadcast(part),
            col("l_partkey") === col("p_partkey") && mixedPred)
          .agg(Num.r(sum(col("rev")), 2).as("revenue"))
    },

    // ------------------------------------------------------------------
    // TPC-H Q4 (order-priority checking): orders in a quarter with at
    // least one LATE line, counted by priority. (The official lateness
    // test l_commitdate < l_receiptdate maps to shipping >60 days after
    // the order — the same role, a per-line lateness predicate
    // correlated with the order.) The defining shape: a correlated
    // EXISTS that must plan as a LEFT SEMI join — the fact table probes
    // once, no line ever duplicates an order row, and the quarter
    // filter prunes orders at the scan before the semi probe.
    QueryDef(
      "q_tpch_q4",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 60 DAY"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },

    // ------------------------------------------------------------------
    // TPC-H Q6 (forecasting revenue change) — the canonical PUSHDOWN
    // benchmark: no joins at all, just three range predicates that must
    // all reach the parquet scan (date window, discount band, quantity
    // cap) feeding a single-row sum. At 100 TB this query IS its scan:
    // with the filters pushed, row groups outside the ship-date year
    // never leave storage; PlanSpec pins all three in PushedFilters.
    QueryDef(
      "q_tpch_q6",
      s"""SELECT ${Num.sql("sum(l_extendedprice * l_discount)", 2)}
        |    AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(Num.r(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"))
    },

    // ------------------------------------------------------------------
    // TPC-H Q8 (national market share): of the promo-part trade flowing
    // into ASIA customers over two years, what share did NATION_3's
    // suppliers carry, per order year? The deepest join tree in the
    // suite (part, supplier, lineitem, orders, customer, nation×2,
    // region) with the Q7/Q10 scale layering: part and supplier→nation
    // resolve into broadcasts BEFORE the single lineitem⋈orders SMJ,
    // volume is pre-aggregated to (custkey, year, supp_nation) — far
    // below line grain — and only then does the customer→nation→region
    // membership filter attach. The share is a conditional-sum ratio in
    // one final tiny aggregate, never two passes.
    QueryDef(
      "q_tpch_q8",
      s"""SELECT o_year,
        |  ${Num.sql(
          "sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) " +
            "/ sum(volume)", 6)} AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |    l_extendedprice * (1 - l_discount) AS volume,
        |    n2.n_name AS nation
        |  FROM part, supplier, lineitem, orders, customer,
        |    nation n1, nation n2, region
        |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND c_nationkey = n1.n_nationkey
        |    AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |    AND s_nationkey = n2.n_nationkey
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    AND p_type = 'PROMO') all_nations
        |GROUP BY o_year""".stripMargin) { (s, dir) =>
      val part = t(s, dir, "part")
        .filter(col("p_type") === "PROMO").select(col("p_partkey"))
      val nat = t(s, dir, "nation")
      val supp = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(nat.select(col("n_nationkey"),
          col("n_name").as("nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("nation"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("volume"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      val asiaCust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(nat.select(col("n_nationkey"), col("n_regionkey"))
          .join(broadcast(t(s, dir, "region")
            .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      li.hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"), col("o_year"), col("nation"))
        .agg(sum(col("volume")).as("vol"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_year"))
        .agg(Num.r(
          sum(when(col("nation") === "NATION_3", col("vol")).otherwise(0.0))
            / sum(col("vol")), 6).as("mkt_share"))
    },

    // ------------------------------------------------------------------
    // TPC-H Q13 (customer order-count distribution): how many customers
    // placed 0, 1, 2, … qualifying orders? (The official o_comment
    // NOT-LIKE exclusion maps to an order-priority exclusion — same
    // role, a right-side predicate that must live INSIDE the left
    // join.) The defining shape: a LEFT OUTER join whose right-side
    // filter must NOT drop order-less customers, then TWO stacked
    // aggregations — per-customer counts, then the distribution of
    // those counts. Both aggregates are map-combinable and the second
    // runs on at-most-|distinct counts| groups.
    QueryDef(
      "q_tpch_q13",
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT OUTER JOIN orders o
        |    ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY 1) c_orders
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer").select(col("c_custkey"))
      // the right-side predicate pre-filters orders — equivalent to the
      // ON-clause placement for a LEFT join, and it pushes to the scan
      val ord = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select(col("o_orderkey"), col("o_custkey"))
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },

    // ------------------------------------------------------------------
    // TPC-H Q15 (top supplier): the supplier(s) whose quarter revenue
    // equals the maximum — the aggregate-then-scalar-max shape. Revenue
    // is ROUNDED before the max comparison in BOTH engines: the
    // winner's identity must not hinge on sub-cent summation-order
    // noise, and ties at the rounded value surface identically (the
    // official query has the same tie semantics). One map-combinable
    // revenue aggregate, a 1-row max broadcast back over it, and the
    // supplier dim attaches to the (usually single-row) winner set.
    QueryDef(
      "q_tpch_q15",
      s"""WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    ${Num.sql("sum(l_extendedprice * (1 - l_discount))", 2)}
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)"""
        .stripMargin) { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(Num.r(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          2).as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    },

    // ------------------------------------------------------------------
    // TPC-H Q22 (global sales opportunity): well-funded customers who
    // never ordered, grouped by geography. (`c_nationkey` plays the
    // official `substring(c_phone,1,2)` country code — same role, a
    // customer-attribute group key; and "never ordered" is scoped to
    // orders since 2000, this dataset's analogue of the official 7-year
    // recency window — unscoped, every well-funded customer here has
    // SOME order and the result is the empty set, a vacuous oracle
    // row.) Three classic shapes in one query,
    // each with its scale story: the uncorrelated scalar AVG is a 1-row
    // broadcast (never a re-scan per row); the NOT EXISTS is a LEFT
    // ANTI join against orders shuffling on custkey; and the final
    // per-nation rollup is its own (map-combinable) exchange to ~25
    // groups — a different key than the anti join's, but the partial
    // aggregation means only ~25·partitions rows move. Counts CAST to
    // BIGINT in the oracle (HUGEINT armor).
    QueryDef(
      "q_tpch_q22",
      s"""SELECT c_nationkey AS cntry,
        |  CAST(count(*) AS BIGINT) AS numcust,
        |  ${Num.sql("sum(c_acctbal)", 2)} AS totacctbal
        |FROM customer
        |WHERE c_nationkey IN (3, 7, 13, 17, 19, 23)
        |  AND c_acctbal > (
        |    SELECT avg(c_acctbal) FROM customer
        |    WHERE c_acctbal > 0.0
        |      AND c_nationkey IN (3, 7, 13, 17, 19, 23))
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val nations = Seq(3, 7, 13, 17, 19, 23)
      val sel = t(s, dir, "customer")
        .filter(col("c_nationkey").isin(nations: _*))
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val avgPos = sel.filter(col("c_acctbal") > 0.0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      sel.crossJoin(broadcast(avgPos))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntry"))
        .agg(count(lit(1)).as("numcust"),
          Num.r(sum(col("c_acctbal")), 2).as("totacctbal"))
    }
  )
}
