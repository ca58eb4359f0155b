package graft.streaming

import graft.operators.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Exactly-once streaming delivery into a snapshot-versioned table.
  *
  * Structured Streaming's `foreachBatch` contract is AT-LEAST-once: the
  * source offsets for an epoch are checkpointed before the batch runs,
  * the epoch's commit marker only after it succeeds, so a crash in
  * between re-delivers the same (batchId, data) on restart. Exactly-once
  * table contents = that at-least-once delivery + an idempotent sink:
  * every micro-batch appends through `Snapshots.commit` with its batch
  * id recorded in the manifest metadata, and a re-delivered batch —
  * id at or below the last recorded one — is recognized and skipped.
  * This is safe because batch ids are monotonically increasing per
  * checkpoint and a replayed epoch carries identical data (the file
  * source re-reads the files pinned in the checkpointed offset), so
  * skipping a recognized id can never drop rows.
  *
  * The snapshot commit is the atomicity anchor: a crash DURING the
  * commit publishes nothing (manifest rename is all-or-nothing), so the
  * replay finds no recorded id and simply delivers again; a crash AFTER
  * the commit but before the checkpoint marker finds the id recorded
  * and no-ops. Either way the table ends up with each batch exactly
  * once — the property StreamingSpec pins by killing a 3-file
  * one-file-per-trigger run in that exact window and restarting it.
  */
object SnapshotSink {

  private val BatchKey = "stream_batch_id"

  /** Largest stream batch id recorded in the table's manifest chain,
    * scanning newest-first. Maintenance commits (compaction,
    * clustering) carry no batch id and are skipped, so interleaved
    * maintenance never resets delivery; a rollback DOES reposition the
    * stream (manifest metadata travels with the restored version — see
    * the note on `Snapshots.MetaPrefix`).
    */
  def lastBatchId(spark: SparkSession, tableDir: String): Option[Long] =
    Snapshots.versions(spark, tableDir).reverseIterator
      .flatMap(v => Snapshots.meta(spark, tableDir, v).get(BatchKey))
      .map(_.toLong)
      .nextOption()

  /** Idempotent micro-batch append: commits once per batch id, no-op on
    * re-delivery. Returns true when the batch was committed, false when
    * it was already durable.
    */
  def appendOnce(batch: DataFrame, tableDir: String, batchId: Long): Boolean = {
    val fresh = !lastBatchId(batch.sparkSession, tableDir).exists(_ >= batchId)
    if (fresh)
      Snapshots.commit(batch, tableDir, meta = Map(BatchKey -> batchId.toString))
    fresh
  }

  /** Drain `stream` into `tableDir` with exactly-once table contents:
    * `foreachBatch` → [[appendOnce]] under `Trigger.AvailableNow`.
    * Blocks until the available input is drained; safe to call again
    * after a crash with the same checkpoint dir — that is the point.
    */
  def deliver(stream: DataFrame, tableDir: String, checkpointDir: String): Unit = {
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: DataFrame, id: Long) => { appendOnce(b, tableDir, id); () })
      .start()
    q.awaitTermination()
  }
}
