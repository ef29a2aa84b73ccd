package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
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
  * Exact percentile ALWAYS returns DOUBLE (it interpolates), while
  * the sketch returns the child's own type — naively swapping one
  * for the other on a BIGINT metric would change a resolved plan's
  * output type. The rewrite therefore fires on DoubleType children
  * as-is and on integral children THROUGH an explicit
  * `Cast(child, double)` — the sketch then ranks the same total
  * order (int→double is order-preserving and exact to 2^53) and the
  * aggregate's result type stays DOUBLE either way. Fractional/
  * decimal/interval children still pass through untouched.
  *
  * A descending percentile (`WITHIN GROUP (ORDER BY x DESC)` sets
  * `Percentile.reverse`) is NOT rewritten: approx_percentile has no
  * reverse mode, and rewriting to the ascending sketch at the same
  * fraction would return the wrong tail (f instead of 1−f) — an
  * error class far beyond the opted-in rank tolerance.
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
              if !p.reverse &&
                p.percentageExpression.foldable &&
                !p.percentageExpression.dataType
                  .isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
                rewritableChild(p) &&
                isUnitFrequency(p) =>
            val child =
              if (p.child.dataType ==
                org.apache.spark.sql.types.DoubleType) p.child
              else Cast(p.child, org.apache.spark.sql.types.DoubleType)
            AggregateExpression(
              new ApproximatePercentile(child,
                p.percentageExpression,
                Literal(10000)),
              ae.mode, isDistinct = false, filter = None,
              resultId = ae.resultId)
        }
    }
  }

  private def rewritableChild(p: Percentile): Boolean = {
    import org.apache.spark.sql.types._
    p.child.dataType match {
      case DoubleType | LongType | IntegerType | ShortType | ByteType =>
        true
      case _ => false
    }
  }

  private def isUnitFrequency(p: Percentile): Boolean =
    p.frequencyExpression match {
      case Literal(v: Long, _) => v == 1L
      case Literal(v: Int, _) => v == 1
      case _ => false
    }
}
