package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.HllSketch

/** Opt-in APPROX MODE for distinct counting — the optimizer rewrite
  * every serious warehouse ships behind a flag (BigQuery's
  * `APPROX_COUNT_DISTINCT` pushdown, Snowflake's
  * `USE_APPROX_COUNT_DISTINCT`): with
  * `graft.approxDistinct.enabled=true`, a logical
  * `count(DISTINCT x)` becomes the [[HllSketch]] estimate — same
  * LONG output column, ±~1.6% accuracy (4096 registers), and a
  * fundamentally different 100 TB cost: exact distinct shuffles one
  * row per DISTINCT KEY (the vocabulary/user-id blowup this engine's
  * SCALING.md flags as the canonical unbounded-state shape), while
  * the sketch shuffles 4 KiB per partition per group, full stop.
  *
  * Deliberately narrow trigger — semantics first:
  *   - only `Count` with ONE child, `isDistinct = true`, no FILTER
  *     clause (a filtered rewrite would have to preserve the filter);
  *   - the flag is read per plan invocation, so a session can flip
  *     modes between statements;
  *   - multi-argument count(DISTINCT a, b) and every other distinct
  *     aggregate (sum DISTINCT, avg DISTINCT) pass through untouched —
  *     approximating those silently would change semantics the user
  *     never opted into beyond cardinality estimation.
  *
  * The rewrite runs in the logical optimizer (before physical distinct
  * planning expands the aggregate into the two-exchange Expand shape),
  * so the sketch plan is ONE partial+final hash aggregate.
  * RuleSpec pins: flag off → exact plan untouched; flag on → the plan
  * carries graft_hll, the answer lands within the q_agg_approx ±5%
  * verdict band, grouped and global shapes both rewrite, and the
  * guarded shapes (FILTER, two-child distinct, sum DISTINCT) do not.
  */
case class ApproxDistinctRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private val EnabledConf = "graft.approxDistinct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get(EnabledConf, "false").toBoolean) return plan
    plan.transformUp {
      case a: Aggregate =>
        a.transformExpressions {
          case ae @ AggregateExpression(
              Count(children), _, true, None, _)
              if children.length == 1 &&
                hashableType(children.head.dataType) =>
            AggregateExpression(
              HllSketch(children.head), Complete, isDistinct = false,
              filter = None, resultId = ae.resultId)
        }
    }
  }

  /** Types whose runtime values HllSketch.hashOf hashes by VALUE.
    * Complex types (array/map/struct) pass through to the exact plan:
    * their catalyst containers have identity toString, so sketching
    * them would silently return ~row count and vary across runs. */
  private def hashableType(
      dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType |
          BooleanType | FloatType | DoubleType | StringType |
          BinaryType | DateType | TimestampType | TimestampNTZType =>
        true
      case _: DecimalType => true
      case _ => false
    }
  }
}
