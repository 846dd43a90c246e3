package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Imi

/** CONTINUOUS maintenance of the persisted ANN index — the streaming
  * twin of [[Imi.upsertIndex]], completing the ingest family's pattern
  * (every stored artifact gets an incremental path; the index now gets a
  * STREAMING one): each arriving vector delivery is a micro-batch, and
  * each micro-batch is one stored-book assignment + append into the
  * scell-partitioned member table. Because assignment under frozen books
  * is a pure per-row function and append is order-free at read time, the
  * drained artifact is invariant under micro-batch carving and equals
  * the one-delivery upsert — which is why `q_ann_upsert_stream` rides
  * the `q_ann_upsert` DuckDB oracle verbatim.
  *
  * Scale shape: per-trigger work is O(|micro-batch|) assignment folds
  * (2·kSide + 8·16 per row) plus one partitioned append. The stored
  * books come through [[Imi]]'s per-version book cache (r11 next-round
  * #6 — the old per-trigger parquet reload was the last documented
  * waste in the hot path; the cache key is the immutable version
  * subtree, so a reindex publishing a new version invalidates it by
  * construction). Delivery is AT-LEAST-ONCE (foreachBatch retries a
  * failed micro-batch), so the append is the COMMITTED form
  * ([[Imi.upsertIndexCommitted]] — batchId-keyed markers; a retried
  * batch is skipped, preserving the upsert-equals-bulk invariant the
  * gate proves). The file fragmentation this loop accrues is exactly
  * what [[Imi.compactIndex]] (`q_ann_compact`) periodically repairs. */
object IndexUpsertStream {

  /** Drain `deltaStream` (vec_id, emb — a finite replay delivery) into
    * the index at `path` via per-micro-batch stored-book committed
    * upserts. `checkpointLocation` is the deployment knob (restart
    * resumes at the committed offset); the gates pass None — an
    * ephemeral checkpoint, so every invocation replays the fixture in
    * full against the version `persistIndex` just published (whose fresh
    * `_batch_commits` table accepts the replayed batchIds). */
  def run(deltaStream: DataFrame, path: String,
          checkpointLocation: Option[String] = None): Unit = {
    val writer = deltaStream.writeStream
      .outputMode("append")
      .foreachBatch { (ds: Dataset[Row], batchId: Long) =>
        Imi.upsertIndexCommitted(ds.toDF(), path, batchId): Unit
      }
      .trigger(Trigger.AvailableNow())
    // None = ephemeral drain: checkpoint on tmpfs instead of Spark's
    // virtual-disk temporary fallback (see SparkLocal.freshStreamCheckpoint)
    val scratch = checkpointLocation.isEmpty
    val ckpt = checkpointLocation.getOrElse(
      graft.SparkLocal.freshStreamCheckpoint("idx_upsert"))
    val query = writer.option("checkpointLocation", ckpt).start()
    val stopped = query.awaitTermination(120000)
    try require(stopped, "index-upsert drain did not finish")
    finally {
      if (query.isActive) query.stop()
      if (scratch) graft.SparkLocal.removeScratch(ckpt)
    }
  }
}
