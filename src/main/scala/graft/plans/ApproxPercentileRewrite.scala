package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in APPROX MODE for exact percentiles — the quantile sibling of
  * [[ApproxDistinctRewrite]]: with `graft.approxPercentile.enabled =
  * true`, a logical `percentile(x, f)` becomes
  * `approx_percentile(x, f, 10000)`. The 100 TB argument is the
  * unbounded-state one SCALING.md makes for every value-buffering
  * aggregate: exact percentile BUFFERS EVERY VALUE per group (the
  * aggregation state is the data), while the sketch carries a
  * fixed-size summary per group per partition — map-side combinable,
  * rank error bounded at n/10000 = 0.01%·n.
  *
  * Deliberately narrow trigger, the ApproxDistinctRewrite discipline:
  *   - only the single-percentile `Percentile` with a FOLDABLE
  *     fraction, no FILTER clause, and frequency 1 (a weighted
  *     percentile has no approx counterpart with the same semantics);
  *   - array-of-fractions, DISTINCT, and filtered shapes pass through
  *     untouched — approximating those silently would change more
  *     than the user opted into.
  *
  * The output type changes from exact-percentile's DOUBLE
  * (interpolated) to the sketch's value-typed result ONLY for
  * non-double inputs, which would break resolved plans — so the
  * rewrite fires only when the child is already DoubleType (the
  * common metric shape) and the result type is preserved exactly.
  */
case class ApproxPercentileRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private val EnabledConf = "graft.approxPercentile.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get(EnabledConf, "false").toBoolean) return plan
    plan.transformUp {
      case a: Aggregate =>
        a.transformExpressions {
          case ae @ AggregateExpression(
              p: Percentile, _, false, None, _)
              if p.percentageExpression.foldable &&
                !p.percentageExpression.dataType
                  .isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
                p.child.dataType ==
                  org.apache.spark.sql.types.DoubleType &&
                isUnitFrequency(p) =>
            AggregateExpression(
              new ApproximatePercentile(p.child,
                p.percentageExpression,
                Literal(10000)),
              ae.mode, isDistinct = false, filter = None,
              resultId = ae.resultId)
        }
    }
  }

  private def isUnitFrequency(p: Percentile): Boolean =
    p.frequencyExpression match {
      case Literal(v: Long, _) => v == 1L
      case Literal(v: Int, _) => v == 1
      case _ => false
    }
}
