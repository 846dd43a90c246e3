package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Similarity

/** EMBEDDING-space near-dup screen on ingest — the third ingest modality,
  * completing the family: [[DedupStream.runReplay]] (exact, content hash),
  * [[DedupStream.candidateStream]] (lexical, MinHash bands), and this
  * (semantic, sign-LSH over vectors — the SemDedup/paraphrase tier n-gram
  * machinery cannot see).
  *
  * Deployment shape: a stream never trains — each arriving vector PROBES a
  * batch-trained index through [[Similarity.lshStreamBander]], which
  * carries the batch chain's route flip: flat trained cells under the
  * cell cap, the hierarchical product index's packed fine cells past it
  * (bit-identical (cid, band, bv) keys either way; the hierarchical
  * route's streamed/batch candidate equality is spec-forced at gate
  * scale via rawKOverride).
  *
  * State: keyed by (band, cid) — one resident (vec_id, bv) per vector per
  * band per probed cell, exactly the rows the batch band table
  * materializes, sharded by cell. An arrival pairs with residents at
  * Hamming(bv) ≤ 1 — the single-bit multi-probe widening of the batch
  * join (Lv et al.'07) — so each unordered pair surfaces exactly when its
  * later endpoint arrives (Hamming and shared-cell are symmetric, hence
  * carving-invariant). Per-arrival compute is |cell residents| XOR+popcount
  * per band: bounded by cell occupancy, which the index sizing pins
  * (~32·probes), never by corpus size. */
object EmbDedupStream {

  final case class BandArrival(vec_id: Long, cid: Long, band: Int, bv: Long)
  final case class CellResidents(ids: Array[Long], bvs: Array[Long])
  final case class CandPair(a: Long, b: Long)

  private def hd1(x: Long, y: Long): Boolean =
    java.lang.Long.bitCount(x ^ y) <= 1

  /** Attach the keyed cell state to a streaming (vec_id, emb) source.
    * `bander` is the batch-trained index probe from
    * [[Similarity.lshStreamBander]]. Emits one candidate pair per
    * (new arrival × Hamming-≤1 resident) per touched (band, cid) group; a
    * pair colliding in several bands/cells emits once per collision (the
    * batch self-join dedups the same way — `distinct()` downstream). */
  def candidateStream(vecs: DataFrame,
                      bander: DataFrame => DataFrame): Dataset[CandPair] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    bander(vecs)
      .as[BandArrival]
      .groupByKey(r => (r.band, r.cid))
      .flatMapGroupsWithState[CellResidents, CandPair](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), batch: Iterator[BandArrival],
         state: GroupState[CellResidents]) =>
          val st = state.getOption.getOrElse(
            CellResidents(Array.empty[Long], Array.empty[Long]))
          val seen = st.ids.toSet
          // a vector bands once per (band, cid); replays / at-least-once
          // delivery must not re-admit a resident
          val fresh = batch.filter(r => !seen.contains(r.vec_id)).toArray
            .distinctBy(_.vec_id).sortBy(_.vec_id)
          val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
          var i = 0
          while (i < fresh.length) {
            val f = fresh(i)
            var j = 0
            while (j < st.ids.length) {
              if (hd1(f.bv, st.bvs(j))) {
                val r = st.ids(j)
                out += (if (r < f.vec_id) CandPair(r, f.vec_id)
                        else CandPair(f.vec_id, r))
              }
              j += 1
            }
            j = 0
            while (j < i) { // new × new, ids ascending by the sort
              if (hd1(f.bv, fresh(j).bv))
                out += CandPair(fresh(j).vec_id, f.vec_id)
              j += 1
            }
            i += 1
          }
          state.update(CellResidents(st.ids ++ fresh.map(_.vec_id),
            st.bvs ++ fresh.map(_.bv)))
          out.iterator
      }
  }

  /** Drain a STATIC embedding replay through the screen, then verify the
    * emitted candidates with the exact cosine (the shared
    * [[Similarity.verifyCosCandidates]] back half) against the batch
    * corpus. The index is trained batch-side from the same corpus
    * ([[Similarity.lshStreamBander]] — deterministic, so the stream's
    * band keys equal the batch chain's on either route), which makes the
    * result equal the batch [[Similarity.embLshPairs]] bit for bit:
    * `q_emb_stream` rides `q_emb_lsh_pairs`'s DuckDB oracle verbatim. */
  def nearDupReplay(stream: DataFrame, embBatch: DataFrame, queryName: String,
                    threshold: Double = 0.45): DataFrame = {
    val spark = stream.sparkSession
    val bander = Similarity.lshStreamBander(embBatch)
    val query = candidateStream(stream, bander).writeStream
      .queryName(queryName)
      .outputMode("update")
      .format("memory")
      .start()
    try query.processAllAvailable()
    finally query.stop()
    Similarity.verifyCosCandidates(
      spark.table(queryName).distinct(), embBatch, threshold)
  }
}
