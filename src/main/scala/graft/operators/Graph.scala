package graft.operators

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics beyond connected components ([[Dedup.connectedComponents]]):
  * PageRank over the part↔supplier bipartite graph derived from the fact
  * table. Link-graph centrality is a standard corpus-quality signal in
  * web-scale training pipelines (rank sources by authority before
  * sampling), and its Spark shape is the canonical iterative keyed join:
  *
  *   - node ids are LONGS (2·partkey for parts, 2·suppkey+1 for
  *     suppliers) — an id scheme, not a display string: long keys hash,
  *     shuffle, and cache at a fraction of the cost of concat'd strings
  *     (measured: the string-id version spent most of its time building
  *     the adjacency cache);
  *   - the adjacency (symmetrized edges + out-degree) is hash-partitioned
  *     by src ONCE and cached; every iteration reuses that partitioning;
  *   - one iteration = adj ⋈ ranks (shuffle_hash, build = the |V|-sized
  *     rank side) → groupBy dst (map-combinable sum) — cost scales with
  *     |E|, never |V|², and nothing re-sorts or re-shuffles the cached
  *     |E| rows. The hint matters twice: without it the planner picks a
  *     sort-merge join and re-sorts the cached adjacency EVERY iteration,
  *     and unlike `broadcast(ranks)` the hash join still holds when |V|
  *     is beyond broadcast size at 100 TB;
  *   - the iteration count is FIXED (k=3) and the loop is unrolled into
  *     one lazy plan: depth-3 plans don't need the checkpoint machinery
  *     the open-ended components loop carries;
  *   - the graph is symmetric by construction, so there are no dangling
  *     nodes (every node has out-degree ≥ 1) and rank mass is conserved
  *     (GraphSpec pins Σpr = 1) — the one PageRank subtlety that
  *     silently corrupts results at any scale if ignored.
  *
  * The oracle replays the SAME fixed iterations as generated DuckDB CTEs
  * (pr1..pr3), the pattern the trained-k-means oracle established:
  * deterministic initialization + a fixed iteration count makes an
  * iterative algorithm hash-checkable cross-engine. Rounding is at 1e-9
  * (not the usual 1e-6) because ranks live at the 1/|V| ≈ 5e-4 scale —
  * six decimals would keep only two significant digits; float
  * summation-order noise is ~1e-15, six orders below the rounding step.
  */
object Graph {

  private val damping = 0.85
  private val iters = 3

  /** One PageRank step as a DuckDB CTE over the previous rank relation:
    * pr_k(v) = (1-d)/N + d·Σ_{u→v} pr_{k-1}(u)/deg(u). */
  private def stepSql(k: Int): String =
    s"""pr$k AS (
      |  SELECT e.dst AS node,
      |    ${1 - damping}/max(nn.n) + $damping*sum(p.pr/d.d) AS pr
      |  FROM edges e
      |  JOIN pr${k - 1} p ON e.src = p.node
      |  JOIN deg d ON e.src = d.src, nn
      |  GROUP BY 1)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_graph_pagerank",
      s"""WITH e0 AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |edges AS (
        |  SELECT 2*l_partkey AS src, 2*l_suppkey + 1 AS dst FROM e0
        |  UNION ALL
        |  SELECT 2*l_suppkey + 1 AS src, 2*l_partkey AS dst FROM e0),
        |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM deg),
        |pr0 AS (SELECT src AS node, 1.0/nn.n AS pr FROM deg, nn),
        |${(1 to iters).map(stepSql).mkString(",\n")}
        |SELECT node, ${Num.sql("pr", 9)} AS pr FROM pr$iters""".stripMargin) {
      (s, dir) =>
      val e0 = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val sym = e0
        .select((col("l_partkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .union(e0.select((col("l_suppkey") * 2 + 1).as("src"),
          (col("l_partkey") * 2).as("dst")))
      // hash-partition by src once; deg reuses the exchange, the degree
      // join is co-partitioned (shuffle_hash: build the small deg side,
      // no sort of the |E| rows), and the result is THE cached relation
      // every iteration streams. At 100 TB this is the adjacency you'd
      // persist bucketed by src.
      val edges = sym.repartition(col("src"))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      // cache lifetime: every iteration of the ONE returned lazy plan
      // streams this relation; the consumer's action materializes it and
      // Verify/Bench/specs clearCache afterwards (the accepted pattern
      // for caches that feed multiple branches of a returned plan)
      val adj = edges.join(deg.hint("shuffle_hash"), "src").cache()
      // |V| stays IN-PLAN as a broadcast 1-row aggregate (the oracle's
      // `nn` CTE, q_active_trailing's horizon pattern): building the
      // query runs ZERO jobs, so plan-only consumers (PlanSpec's sweep)
      // pay nothing, and the one real action materializes the cached
      // adjacency exactly once instead of after two eager warm-ups.
      // node list + |V| read from the CACHE (not the deg subtree), so
      // the action's only scan of lineitem is the one that fills it
      val nodes = adj.select(col("src")).dropDuplicates("src")
      val nn = nodes.agg(count(lit(1)).as("n"))
      val contrib = (lit(1 - damping) / max(col("n"))) +
        lit(damping) * sum(col("pr") / col("d"))
      var pr: DataFrame = nodes.select(col("src").as("node"))
        .crossJoin(broadcast(nn))
        .select(col("node"), (lit(1.0) / col("n")).as("pr"), col("n"))
      for (_ <- 1 to iters)
        pr = adj.join(pr.hint("shuffle_hash"), adj("src") === pr("node"))
          .groupBy(col("dst"))
          .agg(contrib.as("pr"), max(col("n")).as("n"))
          .select(col("dst").as("node"), col("pr"), col("n"))
      pr.select(col("node"), Num.r(col("pr"), 9).as("pr"))
    }
  )
}
