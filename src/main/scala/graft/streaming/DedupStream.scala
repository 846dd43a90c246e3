package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact dedup ON INGEST — the streaming twin of
  * [[graft.operators.Dedup.exactGroups]] (north-star extension; the
  * reference's streaming surface is processing-time sampling only,
  * SURVEY.md §2.10). A 100 TB pipeline dedups as data ARRIVES: holding the
  * corpus and re-running batch dedup per delivery re-pays the full groupBy
  * every time (q_incr_dedup's batch-proportional screen fixes the COST, but
  * still runs on a schedule); the streaming form keeps the content-hash →
  * (keeper, multiplicity) state resident and folds each micro-batch in.
  *
  * Scale shape: state lives in the state store keyed by content hash —
  * sharded across executors, one ~40-byte row per DISTINCT document, never
  * stream length, and RocksDB-backed state (StateRecoverySpec's config)
  * spills it off-heap. The fold is commutative/associative (min over ids,
  * sum over counts), so arrival order and micro-batch carving CANNOT change
  * the converged state — after any replay of the same document set the
  * state equals the batch `md5 groupBy` exactly, which is what lets
  * `q_dedup_stream` carry a full DuckDB hash gate rather than a rows-only
  * check. Near-dup-on-ingest takes the same shape keyed by (band, minhash
  * slice) — the banded key of [[graft.operators.Dedup]]'s LSH — with the
  * verify step downstream; the exact tier here is what every published
  * ingest stack runs first (it absorbs the mass, r8 LshSkewProof).
  */
object DedupStream {

  final case class DocArrival(h: String, doc_id: Long)

  /** Per-content-hash streaming state: surviving doc (min id seen) and
    * multiplicity so far. `n_copies` strictly increases on every batch that
    * touches the key, so a memory-sink reader picks the final row per hash
    * by max `n_copies` (the emit ordinal, same contract as
    * [[EventTime.UserProfile.n_merges]]). */
  final case class HashGroup(h: String, keeper: Long, n_copies: Long)

  /** Attach the keyed dedup state to a streaming document source
    * (doc_id, text). Emits the updated (hash, keeper, multiplicity) row for
    * every content hash touched in a micro-batch. */
  def groupStream(docs: DataFrame): Dataset[HashGroup] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(md5(col("text")).as("h"), col("doc_id").cast("long"))
      .as[DocArrival]
      .groupByKey(_.h)
      .flatMapGroupsWithState[HashGroup, HashGroup](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (h: String, batch: Iterator[DocArrival], state: GroupState[HashGroup]) =>
          var keeper = state.getOption.map(_.keeper).getOrElse(Long.MaxValue)
          var n = state.getOption.map(_.n_copies).getOrElse(0L)
          batch.foreach { d =>
            n += 1L
            if (d.doc_id < keeper) keeper = d.doc_id
          }
          val next = HashGroup(h, keeper, n)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Drain a STATIC replay source to completion and return the converged
    * dedup state — (h, keeper, n_copies) per distinct document, ordered by
    * hash, which must equal the batch `md5(text) groupBy` bit for bit.
    * `processAllAvailable` is the right termination for a finite replay
    * directory (blocks until every file is consumed); the q_freq_stream
    * stop-at-n machinery is for the reference's unbounded-socket contract
    * and does not apply here. */
  def runReplay(stream: DataFrame, queryName: String): DataFrame = {
    val spark = stream.sparkSession
    val query = groupStream(stream).writeStream
      .queryName(queryName)
      .outputMode("update")
      .format("memory")
      .start()
    try query.processAllAvailable()
    finally query.stop()
    // the memory sink APPENDS one row per (hash, touching batch); the
    // converged row per hash is the one with max n_copies (strictly
    // increasing — each arrival is counted exactly once, so the max is
    // unique and this read is deterministic under any batch carving)
    spark.table(queryName)
      .groupBy("h")
      .agg(max_by(struct(col("n_copies"), col("keeper")), col("n_copies")).as("s"))
      .select(col("h"), col("s.keeper").as("keeper"), col("s.n_copies").as("n_copies"))
      .orderBy("h")
  }
}
