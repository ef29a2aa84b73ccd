package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import scala.util.Random

/** Properties of the deterministic Lloyd trainer behind q_knn_ivf_trained:
  * the spherical k-means objective Σ max-cos must be monotonically
  * non-decreasing per round (assignment maximizes it given centroids, the
  * mean update maximizes it given assignments), and the whole run must be
  * input-determined — same data, same centroids, bit for bit. */
class KmeansSpec extends SparkSpec {

  private def testVectors(n: Int, dim: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new Random(seed)
    // clustered, not uniform: k-means on pure noise has a near-flat
    // objective and would make the monotonicity check vacuous
    val centers = Array.fill(4, dim)(rnd.nextFloat() * 2f - 1f)
    (0L until n).map { i =>
      val c = centers(rnd.nextInt(4))
      (i, c.map(x => x + rnd.nextFloat() * 0.3f))
    }.toDF("vec_id", "embedding")
  }

  test("objective is monotonically non-decreasing over Lloyd rounds") {
    val emb = testVectors(200, 8, seed = 7).cache()
    val objs = (0 to 3).map { iters =>
      Similarity.kmeansObjective(emb,
        Similarity.kmeansCentroids(emb, k = 4, iters = iters))
    }
    objs.sliding(2).foreach { case Seq(a, b) =>
      // 1e-6 slack: the 9-decimal centroid rounding perturbs each round
      assert(b >= a - 1e-6, s"objective regressed: $objs")
    }
    // and training actually moved the needle vs the raw seeds
    assert(objs.last > objs.head, s"training had no effect: $objs")
  }

  test("training is deterministic: two runs agree bit for bit") {
    val emb = testVectors(150, 8, seed = 13).cache()
    def run() = Similarity.kmeansCentroids(emb, k = 4, iters = 2)
      .orderBy(col("cid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    assert(run().toSeq == run().toSeq)
  }

  test("centroids persist to a table and serve identically after reload") {
    // the 100 TB deployment shape SCALING.md describes: training runs as
    // its own job, centroids land in a table, serving reads them back —
    // the round-trip must not perturb a single assignment
    val emb = testVectors(150, 8, seed = 21).cache()
    val trained = Similarity.kmeansCentroids(emb, k = 4, iters = 2)
    val path = tmpDir("kmeans_centroids") + "/cents"
    trained.write.parquet(path)
    val reloaded = spark.read.parquet(path)
    assert(Similarity.kmeansObjective(emb, reloaded) ==
      Similarity.kmeansObjective(emb, trained))
    assert(reloaded.orderBy(col("cid")).collect().toSeq ==
      trained.orderBy(col("cid")).collect().toSeq)
  }

  test("real embeddings: K centroids out, objective improves") {
    val emb = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).cache()
    val trained = Similarity.kmeansCentroids(emb, k = 8, iters = 2)
    assert(trained.count() == 8)
    val seeds = Similarity.kmeansCentroids(emb, k = 8, iters = 0)
    assert(Similarity.kmeansObjective(emb, trained) >=
      Similarity.kmeansObjective(emb, seeds) - 1e-6)
  }

  test("PQ: training reduces total reconstruction error, codes are bounded") {
    // Lloyd on L2 quantization error is monotone: the assignment step
    // minimizes each residual given codebooks, the mean update minimizes
    // the sum given assignments — so trained total error ≤ seed error
    // (1e-6 slack for the 9-decimal centroid rounding)
    val emb = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).cache()
    def totalErr(iters: Int): Double =
      Similarity.pqCode(emb, iters).agg(sum(col("d"))).head().getDouble(0)
    val seedErr = totalErr(0)
    val trainedErr = totalErr(2)
    assert(trainedErr <= seedErr + 1e-6,
      s"PQ training regressed error: $seedErr -> $trainedErr")
    assert(trainedErr < seedErr, "PQ training had no effect")
    // every vector gets exactly one code per subspace, codes in [0, K)
    val coded = Similarity.pqCode(emb, 2).cache()
    val n = emb.count()
    assert(coded.count() == n * 4)
    assert(coded.filter(col("code") < 0 || col("code") >= 4).count() == 0)
    assert(coded.filter(col("d") < 0).count() == 0)
    // deterministic: two trainings agree bit for bit
    val again = Similarity.pqCode(emb, 2)
    assert(coded.except(again).count() == 0 &&
      again.except(coded).count() == 0)
    coded.unpersist(); emb.unpersist()
  }

  test("PCA deflation: components are unit and mutually orthogonal") {
    // properties the q_embed_pca2 hash match alone wouldn't state: the
    // oracle replays the same arithmetic, so a deflation-formula bug
    // could hash-match while producing a useless second component.
    // NOT asserted: variance ordering. The synthetic embeddings have a
    // near-FLAT spectrum (λ2/λ1 ≈ 0.987 measured), so power iteration
    // converges at (λ2/λ1)^t ≈ not-at-all in three fixed rounds, and
    // which high-variance direction ranks first is sampling noise. On
    // a flat spectrum the operator's contract is "two unit, mutually
    // orthogonal, high-variance directions" — exactly what deflation
    // guarantees structurally and what this pin checks.
    val rows = SparkEntry.queries("q_embed_pca2")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val v1 = rows.map(_._2)
    val v2 = rows.map(_._3)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(v1, v1) - 1.0) < 1e-3, s"v1 not unit: ${dot(v1, v1)}")
    assert(math.abs(dot(v2, v2) - 1.0) < 1e-3, s"v2 not unit: ${dot(v2, v2)}")
    // the deflated iterate is orthogonal to v1 up to iteration accuracy
    assert(math.abs(dot(v1, v2)) < 0.05, s"v1·v2 = ${dot(v1, v2)}")
  }
}
