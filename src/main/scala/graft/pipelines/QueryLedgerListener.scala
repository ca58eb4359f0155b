package graft.pipelines

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{QueryExecution, ReusedSubqueryExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-query observability for the warehouse run ledger (the
  * operational extension of S7's one-row pipeline log,
  * `EtlJob.appendLog`): a `QueryExecutionListener` that records every
  * completed action's name, output-row metric, wall time, and status.
  *
  * Scale posture: the listener runs on the DRIVER on query-completion
  * callbacks only — it never touches executor hot paths, adds no plan
  * nodes, and buffers into a lock-free queue so a slow ledger sink
  * cannot back-pressure query execution. Flushing to parquet is an
  * explicit, append-only batch write (`flush`), matching the ledger's
  * append-only contract.
  *
  * Registered via `spark.listenerManager.register(listener)` — the
  * same mechanism `spark.sql.queryExecutionListeners` would use on a
  * production cluster's config.
  */
final class QueryLedgerListener extends QueryExecutionListener {

  /** (action, outputRows — -1 when the sink exposes no row metric,
    * wall nanos, status, shuffle bytes written, spill bytes).
    */
  private val events = new ConcurrentLinkedQueue[(String, Long, Long, String, Long, Long)]

  /** Every physical node of the FINAL plan, descending through the AQE
    * wrappers (`AdaptiveSparkPlanExec` and the query stages are leaf
    * nodes whose real subtree hangs off a field, not `children`) AND
    * through subquery expressions (`p.subqueries` — a scalar subquery's
    * exchange writes real shuffle bytes that `children` alone would
    * silently drop from the totals). Reused exchanges and reused
    * subqueries are NOT descended — their metrics belong to the
    * original and would double-count.
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _: ReusedExchangeExec => Seq.empty
      case _: ReusedSubqueryExec => Seq.empty
      case other => other.children
    }
    p +: (inner ++ p.subqueries).flatMap(allNodes)
  }

  /** Sum of a named SQLMetric over the whole plan — the two the ledger
    * keeps are what a 100 TB operator pages on: `shuffleBytesWritten`
    * (every exchange's write volume) and `spillSize` (sort/agg memory
    * pressure). Metric values are already final when the completion
    * callback fires.
    */
  private def sumMetric(plan: SparkPlan, key: String): Long =
    allNodes(plan).flatMap(_.metrics.get(key)).map(_.value).filter(_ > 0).sum

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val plan = qe.executedPlan
    val rows = plan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
    events.add((funcName, rows, durationNs, "ok",
      sumMetric(plan, "shuffleBytesWritten"), sumMetric(plan, "spillSize")))
  }

  override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
    events.add((funcName, -1L, -1L, s"failed: ${e.getClass.getSimpleName}", -1L, -1L))

  /** Number of buffered events (callbacks post asynchronously). */
  def size: Int = events.size

  /** Bounded wait for the async listener bus to drain: polls until the
    * buffered event count stops changing or `maxWaitMs` elapses. Call
    * before a final [[flush]] so in-flight callbacks are captured —
    * and poll THIS, never a Spark action (an action would itself be
    * reported to the listener and self-satisfy the wait).
    */
  def awaitQuiescent(maxWaitMs: Long = 5000L): Unit = {
    var last = -1
    var waited = 0L
    while (size != last && waited < maxWaitMs) {
      last = size
      Thread.sleep(100)
      waited += 100
    }
  }

  /** Snapshot of everything recorded so far, oldest first. */
  def snapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    events.asScala.toSeq
      .toDF("action", "output_rows", "wall_ns", "status", "shuffle_bytes", "spill_bytes")
  }

  /** Append the buffered events to the warehouse ledger dir and remove
    * ONLY what was written. The queue is snapshotted non-destructively
    * first: if the parquet append throws (full disk, transient FS
    * error), every event is still buffered and the flush can be
    * retried — draining first would lose the batch irrecoverably.
    * Returns the number of events flushed.
    */
  def flush(spark: SparkSession, warehouseDir: String): Int = {
    val batch = events.asScala.toSeq
    if (batch.nonEmpty) {
      import spark.implicits._
      batch.toDF("action", "output_rows", "wall_ns", "status", "shuffle_bytes", "spill_bytes")
        .withColumn("logged_at", org.apache.spark.sql.functions.current_timestamp())
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$warehouseDir/QueryLog")
      // written successfully: drop exactly the snapshotted prefix (the
      // queue is append-only, so the head still holds these events)
      var i = 0
      while (i < batch.size) { events.poll(); i += 1 }
    }
    batch.size
  }
}
