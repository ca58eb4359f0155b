package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, DoubleType, FloatType, IntegerType, LongType, ShortType, TimestampType}

/** Whole-operator extension (SURVEY.md §7.3 path (c)): as-of join as a
  * first-class plan — logical node, planner strategy, and a physical
  * operator with distribution/ordering REQUIREMENTS instead of
  * hand-built shuffles. All three pandas `merge_asof` directions
  * (the reference's interval assignment uses backward,
  * `/root/reference/src/pipelines/etl.py:27-42`):
  *
  *  - `backward`: latest right with rightTime <= leftTime;
  *  - `forward`:  earliest right with rightTime >= leftTime;
  *  - `nearest`:  the temporally closer of the two, ties to backward —
  *    exactly the composed [[graft.operators.AsOf.nearest]] contract.
  *
  * Compared to the composed formulations in [[graft.operators.AsOf]]
  * (union + running `last(ignoreNulls)` window, or broadcast range
  * join), the physical operator declares
  * `ClusteredDistribution`/ascending-sort requirements and lets
  * EnsureRequirements plan the minimal exchanges: each side shuffles
  * once on its keys, sorts once, and a single streaming merge pass joins
  * them — no union row blow-up, no window state, no lead() interval
  * materialization. Per-partition memory is O(1): at most one held
  * backward row and one held forward row.
  *
  * Duplicate right timestamps resolve to the MAX payload (the right
  * sort order includes the payload columns), matching the composed
  * paths' max-payload-struct tiebreak — the winner is deterministic,
  * never shuffle-order-dependent.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightPayload: Seq[Attribute],
    direction: String = AsOfJoin.Backward)
  extends BinaryNode {

  require(AsOfJoin.Directions(direction), s"unknown as-of direction: $direction")

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  val Backward = "backward"
  val Forward = "forward"
  val Nearest = "nearest"
  val Directions: Set[String] = Set(Backward, Forward, Nearest)

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
      rightPayload: Seq[String],
      direction: String = Backward): org.apache.spark.sql.DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rAliased = Project(
      right.queryExecution.analyzed.output.map(a => Alias(a, a.name)()),
      right.queryExecution.analyzed)
    def attr(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${out.map(_.name)}"))
    val lt = attr(lPlan.output, leftTime)
    val rt = attr(rAliased.output, rightTime)
    // EVERY direction needs one time axis and matching key types: the
    // exec compares right-side rows with orderings built from the LEFT
    // attributes' physical types, so a Date-vs-Timestamp mix (which the
    // composed formulations coerce via unionByName) would not error —
    // it would read the wrong bytes and silently mis-join. Refuse here.
    require(lt.dataType == rt.dataType,
      s"as-of exec needs one time axis; got ${lt.dataType} vs ${rt.dataType} " +
        "(the composed AsOf formulations rescale mixed date/timestamp axes)")
    by.foreach { n =>
      val (lk, rk) = (attr(lPlan.output, n), attr(rAliased.output, n))
      require(lk.dataType == rk.dataType,
        s"as-of exec key '$n' type mismatch: ${lk.dataType} vs ${rk.dataType}")
    }
    val node = AsOfJoin(
      lPlan, rAliased,
      by.map(attr(lPlan.output, _)), by.map(attr(rAliased.output, _)),
      lt, rt,
      rightPayload.map(attr(rAliased.output, _)),
      direction)
    org.apache.spark.sql.graft.PlanBuilder.ofRows(left.sparkSession, node)
  }
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; injected via GraftExtensions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, payload, dir) =>
      AsOfJoinExec(lk, rk, lt, rt, payload, dir, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Streaming-merge as-of join. Children arrive co-partitioned on the
  * keys and sorted by (keys, time[, payload]) — both guaranteed by the
  * declared requirements — so one forward pass per partition suffices.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightPayload: Seq[Attribute],
    direction: String,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // the right side additionally sorts by the payload columns so that
  // the last row of a duplicate-timestamp group — the one the merge
  // holds — is the max payload, the same deterministic winner the
  // composed window formulation picks
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    ((rightKeys :+ rightTime) ++ rightPayload).map(SortOrder(_, Ascending)))

  // one merge pass preserves the left side's partitioning and order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "rows with an as-of match"))

  /** Distance comparator for `nearest`: true when the forward
    * candidate is STRICTLY closer to the left time than the backward
    * one (ties go backward, the composed contract). Integral/temporal
    * axes subtract in exact long arithmetic — a double detour rounds
    * operands above 2^53 (epoch-nanos longs are real inputs) and could
    * flip a close comparison that the composed AsOf.nearest, computing
    * in long column math, gets right. Fractional axes compare in their
    * native floating width. Only `nearest` needs this; the frame
    * builder has already required one shared time type.
    */
  private def forwardCloser(
      dt: DataType): (InternalRow, InternalRow, InternalRow) => Boolean = {
    // both distances are non-negative by construction (f is at-or-after
    // the left, b at-or-before), so a negative difference can only mean
    // long overflow (span > 2^63, e.g. mixed-sign epoch-nano extremes);
    // that rare pair re-compares exactly in BigInt instead of silently
    // wrapping to the wrong side
    def viaLong(g: InternalRow => Long) =
      (f: InternalRow, b: InternalRow, l: InternalRow) => {
        val (gf, gb, gl) = (g(f), g(b), g(l))
        val df = gf - gl
        val db = gl - gb
        if (df >= 0 && db >= 0) df < db
        else BigInt(gf) - BigInt(gl) < BigInt(gl) - BigInt(gb)
      }
    dt match {
      case TimestampType | LongType => viaLong(_.getLong(0))
      case DateType | IntegerType => viaLong(_.getInt(0).toLong)
      case ShortType => viaLong(_.getShort(0).toLong)
      case ByteType => viaLong(_.getByte(0).toLong)
      case DoubleType =>
        (f, b, l) => f.getDouble(0) - l.getDouble(0) < l.getDouble(0) - b.getDouble(0)
      case FloatType =>
        (f, b, l) =>
          f.getFloat(0).toDouble - l.getFloat(0) < l.getFloat(0).toDouble - b.getFloat(0)
      case other => throw new IllegalArgumentException(s"non-numeric as-of time type $other")
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val dir = direction
    val outRows = longMetric("numOutputRows")
    val matchedRows = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime: Expression), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime: Expression), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val fCloser = forwardCloser(timeType)
      // bind payload refs as NULLABLE — unmatched lefts read the all-null
      // right row, which the child schema's own nullability may not admit
      val result = UnsafeProjection.create(output, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        private var rRow: InternalRow = advanceRight()
        // backward state: latest right at-or-before the current left
        private var bHeld: InternalRow = _
        private var bKey: UnsafeRow = _
        private var bTime: InternalRow = _
        // forward state: the earliest right at-or-after (strictly after,
        // for nearest) the left it was captured for; within a duplicate
        // timestamp group the LAST member is held (= max payload)
        private var fHeld: InternalRow = _
        private var fKey: UnsafeRow = _
        private var fTime: InternalRow = _

        private def advanceRight(): InternalRow =
          if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        /** Consume rights behind the left cursor. `keepEq`: rights at
          * exactly the left time go to the backward hold (backward /
          * nearest) instead of stopping the scan (forward).
          */
        private def consumeBehind(lKey: UnsafeRow, lTime: InternalRow, keepEq: Boolean): Unit = {
          var cont = rRow != null
          while (cont) {
            val rKey = rKeyProj(rRow)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) rRow = advanceRight() // behind on key: discard
            else if (c == 0) {
              val tc = timeOrd.compare(rTimeProj(rRow), lTime)
              if (tc < 0 || (tc == 0 && keepEq)) {
                bHeld = rRow.copy() // newest at-or-before match so far
                bKey = rKey.copy()
                bTime = rTimeProj(bHeld).copy()
                rRow = advanceRight()
              } else cont = false
            } else cont = false // right is ahead of this left row
            if (rRow == null) cont = false
          }
        }

        /** Refresh the forward hold for this left if it no longer
          * covers it; holds the last member of the next right
          * duplicate-time group (and thereby consumes the group — safe:
          * lefts only move forward, so a consumed group can never serve
          * a later left the hold itself doesn't).
          */
        private def refreshForward(lKey: UnsafeRow, lTime: InternalRow): Unit = {
          val valid = fHeld != null && keyOrd.compare(fKey, lKey) == 0 &&
            timeOrd.compare(fTime, lTime) >= 0
          if (!valid) {
            fHeld = null
            if (rRow != null && keyOrd.compare(rKeyProj(rRow), lKey) == 0) {
              val t = rTimeProj(rRow).copy()
              var inGroup = true
              while (inGroup) {
                fHeld = rRow.copy()
                fKey = rKeyProj(fHeld).copy()
                fTime = t
                rRow = advanceRight()
                inGroup = rRow != null && keyOrd.compare(rKeyProj(rRow), fKey) == 0 &&
                  timeOrd.compare(rTimeProj(rRow), t) == 0
              }
            }
          }
        }

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          val matchRow: InternalRow = dir match {
            case AsOfJoin.Backward =>
              consumeBehind(lKey, lTime, keepEq = true)
              if (bHeld != null && keyOrd.compare(bKey, lKey) == 0) bHeld else null

            case AsOfJoin.Forward =>
              consumeBehind(lKey, lTime, keepEq = false)
              refreshForward(lKey, lTime)
              if (fHeld != null) fHeld else null

            case AsOfJoin.Nearest =>
              // a forward group captured for an earlier left may have
              // fallen at-or-behind this left's time: it is then the
              // newest at-or-before candidate seen so far — promote it
              // before scanning the stream for anything newer
              if (fHeld != null && keyOrd.compare(fKey, lKey) == 0 &&
                  timeOrd.compare(fTime, lTime) <= 0) {
                bHeld = fHeld; bKey = fKey; bTime = fTime
                fHeld = null
              }
              consumeBehind(lKey, lTime, keepEq = true)
              refreshForward(lKey, lTime)
              val b = if (bHeld != null && keyOrd.compare(bKey, lKey) == 0) bHeld else null
              val f = fHeld
              if (b == null) f
              else if (f == null) b
              else {
                // ties (equal distance) resolve to backward — the
                // composed AsOf.nearest contract
                if (fCloser(fTime, bTime, lTime)) f else b
              }
          }
          outRows += 1
          if (matchRow != null) matchedRows += 1
          joined(l, if (matchRow != null) matchRow else nullRight)
          result(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
