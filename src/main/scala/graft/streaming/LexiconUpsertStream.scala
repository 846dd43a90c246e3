package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Retrieval

/** CONTINUOUS maintenance of the persisted BM25 lexicon — the streaming
  * twin of [[Retrieval.upsertLexicon]], completing the same pattern the
  * index already carries ([[IndexUpsertStream]]): each arriving document
  * delivery is a micro-batch, and each micro-batch is one frozen-vocab
  * posting/length append. Because posting rows and lengths are pure
  * per-doc functions of the delivery under the frozen statistics, the
  * drained artifact is invariant under micro-batch carving and equals
  * the one-delivery upsert — which is why `q_lexicon_upsert_stream`
  * rides the `q_bm25_upsert` DuckDB oracle verbatim.
  *
  * Delivery is AT-LEAST-ONCE (foreachBatch retries a failed
  * micro-batch); [[Retrieval.upsertLexicon]]'s batchId-keyed delivery
  * marker plus its doc_id presence check make a retried batch a no-op,
  * preserving the upsert-equals-bulk invariant the gate proves. The file
  * fragmentation this loop accrues lands in the `_frag` ledger and is
  * exactly what [[Retrieval.compactLexicon]] (`q_lexicon_compact`)
  * periodically repairs — the maintenance loop
  * ([[Retrieval.maintainLexicon]]) watches both. */
object LexiconUpsertStream {

  /** Drain `deltaStream` (doc_id, text — a finite replay delivery) into
    * the lexicon at `path` via per-micro-batch committed upserts.
    * `checkpointLocation` is the deployment knob (restart resumes at the
    * committed offset); the gates pass None — an ephemeral checkpoint,
    * so every invocation replays the fixture in full against the version
    * `persistLexicon` just published (whose fresh delivery ledger
    * accepts the replayed batchIds). */
  def run(deltaStream: DataFrame, path: String,
          checkpointLocation: Option[String] = None): Unit = {
    val writer = deltaStream.writeStream
      .outputMode("append")
      .foreachBatch { (ds: Dataset[Row], batchId: Long) =>
        Retrieval.upsertLexicon(ds.toDF(), path,
          deliveryId = s"batch-$batchId"): Unit
      }
      .trigger(Trigger.AvailableNow())
    // None = ephemeral drain: checkpoint on tmpfs instead of Spark's
    // virtual-disk temporary fallback (see SparkLocal.freshStreamCheckpoint)
    val scratch = checkpointLocation.isEmpty
    val ckpt = checkpointLocation.getOrElse(
      graft.SparkLocal.freshStreamCheckpoint("lex_upsert"))
    val query = writer.option("checkpointLocation", ckpt).start()
    val stopped = query.awaitTermination(120000)
    try require(stopped, "lexicon-upsert drain did not finish")
    finally {
      if (query.isActive) query.stop()
      if (scratch) graft.SparkLocal.removeScratch(ckpt)
    }
  }
}
