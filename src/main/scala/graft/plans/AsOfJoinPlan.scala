package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator extension (SURVEY.md §7.3 path (c)): backward as-of
  * join as a first-class plan — logical node, planner strategy, and a
  * physical operator with distribution/ordering REQUIREMENTS instead of
  * hand-built shuffles.
  *
  * Semantics (pandas `merge_asof(direction='backward')`, the reference's
  * interval assignment, `/root/reference/src/pipelines/etl.py:27-42`):
  * for each left row, attach the payload of the LATEST right row with
  * equal keys and rightTime <= leftTime; null payload when none precedes.
  *
  * Compared to the composed formulations in [[graft.operators.AsOf]]
  * (union + running `last(ignoreNulls)` window, or broadcast range
  * join), the physical operator declares
  * `ClusteredDistribution`/ascending-sort requirements and lets
  * EnsureRequirements plan the minimal exchanges: each side shuffles
  * once on its keys, sorts once, and a single streaming merge pass joins
  * them — no union row blow-up, no window state, no lead() interval
  * materialization. Per-partition memory is O(1): one held right row.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightPayload: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Build the logical node from resolved frames, mirroring
    * [[graft.operators.AsOf.backward]]'s (by, time, payload) signature.
    * The right side is re-aliased with fresh expression ids so self-joins
    * (both sides filtered from one table — q38's shape) stay unambiguous.
    */
  def frame(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      leftTime: String,
      rightTime: String,
      by: Seq[String],
      rightPayload: Seq[String]): org.apache.spark.sql.DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rAliased = Project(
      right.queryExecution.analyzed.output.map(a => Alias(a, a.name)()),
      right.queryExecution.analyzed)
    def attr(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${out.map(_.name)}"))
    val node = AsOfJoin(
      lPlan, rAliased,
      by.map(attr(lPlan.output, _)), by.map(attr(rAliased.output, _)),
      attr(lPlan.output, leftTime), attr(rAliased.output, rightTime),
      rightPayload.map(attr(rAliased.output, _)))
    org.apache.spark.sql.graft.PlanBuilder.ofRows(left.sparkSession, node)
  }
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; injected via GraftExtensions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, payload) =>
      AsOfJoinExec(lk, rk, lt, rt, payload, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Streaming-merge backward as-of join. Children arrive co-partitioned
  * on the keys and sorted by (keys, time) — both guaranteed by the
  * declared requirements — so one forward pass per partition suffices.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightPayload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // one merge pass preserves the left side's partitioning and order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "rows with an as-of match"))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val payloadAttrs = rightPayload
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val outRows = longMetric("numOutputRows")
    val matchedRows = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime: Expression), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime: Expression), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // bind payload refs as NULLABLE — unmatched lefts read the all-null
      // right row, which the child schema's own nullability may not admit
      val result = UnsafeProjection.create(output, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        private var rRow: InternalRow = advanceRight()
        private var held: InternalRow = _ // latest right row matching heldKey
        private var heldKey: UnsafeRow = _

        private def advanceRight(): InternalRow =
          if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          // consume rights up to (and incl.) the left's (key, time)
          var cont = rRow != null
          while (cont) {
            val rKey = rKeyProj(rRow)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) rRow = advanceRight() // behind: discard
            else if (c == 0 && timeOrd.compare(rTimeProj(rRow), lTime) <= 0) {
              held = rRow.copy() // newest match so far for this key
              heldKey = rKey.copy()
              rRow = advanceRight()
            } else cont = false // right is ahead of this left row
            if (rRow == null) cont = false
          }
          val matched =
            held != null && heldKey != null && keyOrd.compare(heldKey, lKey) == 0
          outRows += 1
          if (matched) matchedRows += 1
          joined(l, if (matched) held else nullRight)
          result(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
