package graft.plans

import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.internal.SQLConf

/** Injected CHECK rule (the analysis-time extension surface, next to the
  * optimizer-rule and planner-strategy tiers): when
  * `graft.failOnCartesian=true`, any analyzed plan containing an
  * unconditioned inner/cross join fails immediately with a named error
  * instead of reaching the cluster. On a shared 100 TB deployment this
  * is a governance knob: an accidental cartesian is the one plan shape
  * whose cost is quadratic in INPUT size, and `crossJoinEnabled` alone
  * cannot distinguish a deliberate 1-row control-plane cross join
  * (which a session opts back into by leaving the guard off) from a
  * fat-finger. Default off — the engine's own suite keeps its
  * documented intentional cross joins. */
object CartesianGuard extends (LogicalPlan => Unit) {

  val ConfKey = "graft.failOnCartesian"

  override def apply(plan: LogicalPlan): Unit =
    if (SQLConf.get.getConfString(ConfKey, "false").toBoolean) {
      plan.foreach {
        case j: Join
            if j.condition.isEmpty &&
              (j.joinType == Inner || j.joinType == Cross) =>
          throw new IllegalStateException(
            s"[graft] $ConfKey=true forbids unconditioned " +
              s"${j.joinType.sql} joins: a cartesian product's cost is " +
              "quadratic in input size. Add a join condition, or unset " +
              "the guard for deliberate control-plane cross joins.")
        case _ => ()
      }
    }
}
