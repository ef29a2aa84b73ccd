package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan, Repartition}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rebalance a small input before an explode-style
  * fan-out (the `plans/` extension surface — Rule[LogicalPlan] via
  * SparkSessionExtensions.injectOptimizerRule).
  *
  * Motivation observed in this repo's own workloads: a `Generate`
  * (explode of shingles/tokens/frames) over a compact source runs
  * entirely inside the scan's partitioning — a single-row-group parquet
  * file gives ONE task doing all the downstream hash/scoring work while
  * 31 cores idle. Row distribution is not semantics, so the optimizer
  * may insert a round-robin `Repartition` below the Generate whenever
  * the input is small enough that the extra shuffle is trivially cheap
  * against the fan-out it parallelizes.
  *
  * Conservative trigger: the Generate's child must (a) report
  * size-in-bytes stats below `graft.rebalanceGenerate.threshold`
  * (default 64 MiB — small enough that a shuffle costs ~nothing),
  * (b) contain no existing repartition/shuffle boundary, and (c) not
  * itself contain another Generate (outer explode already fans out).
  * Set the threshold conf to 0 to disable.
  */
case class RebalanceBeforeGenerate(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private val ThresholdConf = "graft.rebalanceGenerate.threshold"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = spark.conf.get(ThresholdConf, (64L * 1024 * 1024).toString).toLong
    if (threshold <= 0) return plan
    val parallelism = spark.sessionState.conf.numShufflePartitions
    plan.transformUp {
      case g @ Generate(_, _, _, _, _, child)
          if eligible(child, threshold) =>
        g.copy(child = Repartition(parallelism, shuffle = true, child))
    }
  }

  private def eligible(child: LogicalPlan, threshold: Long): Boolean = {
    val small = child.stats.sizeInBytes <= threshold
    val alreadyShuffled = child.exists {
      case _: Repartition => true
      case r if r.nodeName.contains("Rebalance") => true
      case _ => false
    }
    val nestedGenerate = child.exists { case _: Generate => true; case _ => false }
    small && !alreadyShuffled && !nestedGenerate
  }
}
