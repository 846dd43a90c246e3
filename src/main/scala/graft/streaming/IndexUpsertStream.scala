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
  * (2·kSide + 8·16 per row) plus one partitioned append; the books are
  * reloaded per trigger (driver-small, O(√k·d)) — a long-running
  * deployment would cache them across triggers, but per-trigger reload
  * is the restart-safe shape and costs one ~tens-of-rows parquet read.
  * The file fragmentation this loop accrues is exactly what
  * [[Imi.compactIndex]] (`q_ann_compact`) periodically repairs. */
object IndexUpsertStream {

  /** Drain `deltaStream` (vec_id, emb — a finite replay delivery) into
    * the index at `path` via per-micro-batch stored-book upserts. */
  def run(deltaStream: DataFrame, path: String): Unit = {
    val query = deltaStream.writeStream
      .outputMode("append")
      .foreachBatch { (ds: Dataset[Row], _: Long) =>
        Imi.upsertIndex(ds.toDF(), path): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    val stopped = query.awaitTermination(120000)
    try require(stopped, "index-upsert drain did not finish")
    finally if (query.isActive) query.stop()
  }
}
