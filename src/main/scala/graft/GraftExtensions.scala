package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, HllSketch}

/** Production wiring for the engine's custom functions: users add
  * `spark.sql.extensions=graft.GraftExtensions` to their session config
  * and get `graft_cosine` / `graft_hll` in every session — the supported
  * SparkSessionExtensions path, vs. the per-session
  * `CosineSimilarity.register(spark)` convenience used inside queries.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(plans.RebalanceBeforeGenerate)
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[functions.TopK].getName, "graft_topk"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 3, "graft_topk takes (score, id, k)")
        functions.TopK(exprs(0), exprs(1), exprs(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "graft_cosine takes exactly 2 arguments")
        CosineSimilarity(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hll"),
      new ExpressionInfo(classOf[HllSketch].getName, "graft_hll"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_hll takes exactly 1 argument")
        HllSketch(exprs.head)
      }))
  }
}
