package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native as-of join — the deepest extension tier SURVEY §2B names for
  * "the one genuinely custom join": a logical plan node, a planner
  * [[SparkStrategy]], and a physical operator, instead of a composition
  * of built-ins.
  *
  * Semantics: for every left row, the LAST right row (in `(key, ts,
  * tieBreak…)` ascending order) with the same key and `right.ts <=
  * left.ts`; left rows without one keep NULL right columns (left-outer).
  * NULL keys and NULL timestamps never match, per SQL predicate rules.
  *
  * Physical design — why this beats both shipped compositions at scale:
  * the bounded range join (`q_join_asof`) materializes every candidate
  * pair inside the bound before ranking, and the union+window plan
  * (`q_join_asof2`) sorts left+right TOGETHER and carries the window's
  * state machinery. This operator declares
  * `ClusteredDistribution(key)` on both children and per-child
  * `(key, ts)` ordering, so Catalyst's EnsureRequirements co-partitions
  * and sorts each side independently (AQE still free to pick exchange
  * sizes), and execution is one streaming merge pass per partition:
  * O(|L|+|R|) time, O(1) state (a single buffered right row), zero
  * per-pair materialization. The output preserves the left child's
  * partitioning and ordering, so downstream keyed ops reuse both.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Per-session registration (idempotent) — the programmatic twin of
    * wiring [[graft.GraftExtensions]] via `spark.sql.extensions`. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** As-of join by column NAME (resolved against each side's analyzed
    * output). Sides must expose disjoint column names — alias before
    * joining, which is also what guarantees distinct expression ids on
    * a self-join (the analyzer's dedup pass does not descend into a
    * custom node). */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"asof: no column '$name' in [${plan.output.map(_.name).mkString(", ")}]"))
    require(lPlan.output.map(_.exprId).toSet
      .intersect(rPlan.output.map(_.exprId).toSet).isEmpty,
      "asof: left and right share attributes — alias each side's columns first")
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTs), attr(rPlan, rightTs))
    // the merge compares right-side values with orderings built from the
    // LEFT types — a width mismatch would compare garbage silently
    require(lk.dataType == rk.dataType,
      s"asof: key types differ: ${lk.dataType.sql} vs ${rk.dataType.sql}")
    require(lt.dataType == rt.dataType,
      s"asof: ts types differ: ${lt.dataType.sql} vs ${rt.dataType.sql}")
    org.apache.spark.sql.GraftBridge.ofRows(spark, AsOfJoin(
      lPlan, rPlan, lk, rk, lt, rt, rightTieBreak.map(attr(rPlan, _))))
  }
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]. Injected by GraftExtensions
  * (`injectPlannerStrategy`) or per-session via [[AsOfJoin.register]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

/** Streaming-merge as-of join. Children are co-partitioned by key and
  * sorted `(key, ts[, tieBreak…])` by EnsureRequirements; each partition
  * pair is merged in one pass keeping only the latest qualifying right
  * row, so task memory is O(1) regardless of how many right rows precede
  * a left row — the property neither shipped composition has. */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression])
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  // left rows pass through in order, one output row each — both the
  // partitioning and the (key, ts) ordering survive for downstream reuse
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTs, rightTs)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rightOut)
      val lTsProj = UnsafeProjection.create(Seq(lt), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rt), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      // bind against NULLABLE right attrs: the unmatched-row null fill
      // is only honored if the bound references carry nullability
      val resultProj = UnsafeProjection.create(
        allOut, leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      def advance(): Unit = rHead = if (rIter.hasNext) rIter.next() else null
      // the single-row state: the latest consumed qualifying right row
      var lastMatch: InternalRow = null
      var lastKey: UnsafeRow = null
      lIter.map { lRow =>
        val lKeyRow = lKeyProj(lRow) // reused buffer; only read this iteration
        val lKeyNull = lKeyRow.isNullAt(0)
        val lTsRow = lTsProj(lRow)
        val lTsNull = lTsRow.isNullAt(0)
        if (!lKeyNull) {
          // consume right rows that can never match a LATER left row:
          // earlier keys, and same-key rows with ts <= this left ts
          // (left is ts-ascending within key, so they stay superseded)
          var cont = rHead != null
          while (cont) {
            val rKeyRow = rKeyProj(rHead)
            val cmp =
              if (rKeyRow.isNullAt(0)) -1 // null keys sort first, never match
              else keyOrd.compare(rKeyRow, lKeyRow)
            if (cmp < 0) { advance(); cont = rHead != null }
            else if (cmp == 0) {
              val rTsRow = rTsProj(rHead)
              if (!lTsNull && rTsRow.isNullAt(0)) {
                advance(); cont = rHead != null // null ts sorts first, never matches
              } else if (!lTsNull && tsOrd.compare(rTsRow, lTsRow) <= 0) {
                lastMatch = rHead.copy()
                lastKey = rKeyRow.copy()
                advance(); cont = rHead != null
              } else cont = false
            } else cont = false
          }
        }
        val matched = !lKeyNull && lastMatch != null &&
          keyOrd.compare(lastKey, lKeyRow) == 0
        numOutputRows += 1
        if (matched) numMatched += 1
        resultProj(joined(lRow, if (matched) lastMatch else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
