package graft.operators

import java.security.MessageDigest

import graft.{Num, QueryDef, Tables}
import graft.functions.CosineSimilarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY.md §2B north star).
  *
  * Two plans for the same problem:
  *   - q_knn_brute — exact top-k: broadcast the (small) query set against
  *     the full vector table, score with the codegen'd [[CosineSimilarity]]
  *     expression, keep top-k per query with a ranking window. At 100 TB
  *     the vector side streams through scan→score→partial-topk with no
  *     shuffle of the big side (only k·P ranked rows move).
  *   - q_knn_lsh — the scale path: a 4-bit random-hyperplane (sign-LSH)
  *     bucket computed per vector from plan-time constant ±1 hyperplanes
  *     (md5-derived, so the DuckDB oracle bakes in the same literals);
  *     neighbors are only scored within the query's bucket, turning the
  *     cross join into a keyed equi-join — the candidate set shrinks
  *     ~2^bits× while staying fully deterministic and oracle-checkable.
  */
object Similarity {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  private val Dim = 64
  private val Planes = 4

  /** Deterministic ±1 hyperplane signs: parity of the first md5 byte of
    * "h:j". Plan-time constants on both engines. */
  private val signs: Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(Planes, Dim) { (h, j) =>
      val b = md.digest(s"$h:$j".getBytes("UTF-8"))(0)
      if ((b & 1) == 1) 1.0 else -1.0
    }
  }

  /** Spark: LSH bucket id (0..2^Planes-1) for an embedding column.
    * Shared with [[Dedup]]'s bucketed embedding near-dup. */
  private[operators] def bucketCol(emb: Column): Column =
    (0 until Planes).map { h =>
      val sgn = array(signs(h).map(lit): _*)
      val proj = aggregate(
        zip_with(emb, sgn, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1 << h)).otherwise(lit(0))
    }.reduce(_ + _)

  /** DuckDB: the same bucket id as a SQL fragment over column `e`. */
  private[operators] def bucketSql(e: String): String =
    (0 until Planes).map { h =>
      val lits = signs(h).map(v => if (v > 0) "1.0" else "-1.0")
        .mkString("[", ", ", "]")
      s"""CASE WHEN list_sum(list_transform(range(1, ${Dim + 1}),
         |    j -> CAST($e[j] AS DOUBLE) * ($lits)[j])) >= 0
         |  THEN ${1 << h} ELSE 0 END""".stripMargin
    }.mkString("(", " + ", ")")

  private val cosSql =
    """list_sum(list_transform(range(1, len(q.embedding) + 1),
      |      k -> CAST(q.embedding[k] AS DOUBLE) * CAST(n.embedding[k] AS DOUBLE)))
      |      / sqrt(q.n2 * n.n2)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // Exact brute-force top-5 cosine neighbors for the first 10 vectors.
    // Scored candidates are reduced by the map-side-combinable TopK
    // aggregate, NOT a ranking window: a window would shuffle every
    // scored row to the query's reducer (O(|queries|·N)), while TopK
    // forwards ≤ k pairs per query per partition (O(|queries|·k·P)).
    QueryDef(
      "q_knn_brute",
      s"""WITH e AS (
        |  SELECT vec_id, embedding,
        |    list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
        |  FROM embeddings),
        |s AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, $cosSql AS c
        |  FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id <> q.vec_id),
        |r AS (
        |  SELECT query_id, neighbor_id, c,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY c DESC, neighbor_id ASC) AS rnk
        |  FROM s)
        |SELECT query_id, neighbor_id, rnk, ${Num.sql("c", 6)} AS cos
        |FROM r WHERE rnk <= 5""".stripMargin) { (s, dir) =>
      CosineSimilarity.register(s)
      graft.functions.TopK.register(s)
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val n = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
      n.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", expr("graft_cosine(q_emb, n_emb)"))
        .groupBy(col("query_id"))
        .agg(expr("graft_topk(cos, neighbor_id, 5)").as("top"))
        .select(col("query_id"), posexplode(col("top")))
        .select(col("query_id"), col("col.id").as("neighbor_id"),
          (col("pos") + 1).as("rnk"),
          Num.r(col("col.score"), 6).as("cos"))
    },

    // ------------------------------------------------------------------
    // Sign-LSH bucketed top-3: candidates restricted to the query's bucket.
    QueryDef(
      "q_knn_lsh",
      s"""WITH e AS (
        |  SELECT vec_id, embedding,
        |    list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2,
        |    ${bucketSql("embedding")} AS bucket
        |  FROM embeddings),
        |s AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, $cosSql AS c
        |  FROM e q JOIN e n
        |    ON q.bucket = n.bucket AND q.vec_id < 10 AND n.vec_id <> q.vec_id),
        |r AS (
        |  SELECT query_id, neighbor_id, c,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY c DESC, neighbor_id ASC) AS rnk
        |  FROM s)
        |SELECT query_id, neighbor_id, rnk, ${Num.sql("c", 6)} AS cos
        |FROM r WHERE rnk <= 3""".stripMargin) { (s, dir) =>
      CosineSimilarity.register(s)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          bucketCol(col("embedding")).as("bucket"))
        .cache() // bucket fold feeds both join sides
      val q = e.filter(col("vec_id") < 10).select(
        col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("bucket").as("q_bucket"))
      val n = e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb"), col("bucket"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      n.join(broadcast(q),
          col("q_bucket") === col("bucket") &&
          col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", expr("graft_cosine(q_emb, n_emb)"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("query_id"), col("neighbor_id"), col("rnk"),
          Num.r(col("cos"), 6).as("cos"))
    }
  )
}
