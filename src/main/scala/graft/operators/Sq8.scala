package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization — the third compression tier of the ANN
  * family, between raw vectors (512 B at d=64 doubles) and PQ codes
  * (8 B): one byte per dimension (64 B), trained state is just the 2·d
  * per-dimension (min, max) ranges. This is the tier a 100 TB deployment
  * scans when PQ's 64× compression costs too much recall and raw
  * vectors cost too much bandwidth — an 8× read-amplification win with
  * near-exact ranking.
  *
  * Determinism contract: training is per-dimension MIN/MAX (order-free,
  * exact over doubles); encoding is
  *
  *   code = clamp(floor((x − mn)·255/(mx − mn) + 1/2), 0, 255)
  *
  * — every step a correctly-rounded IEEE op on identical inputs, with
  * `floor(v + 1/2)` instead of an engine `round()` so no rounding-mode
  * semantics can diverge (constant dimensions encode 0); scoring is the
  * INTEGER code distance Σ (code_q − code_d)² — exact int64, order-free,
  * so scores and ranks hash bit-identically cross-engine with no float
  * boundary anywhere in the ranking. Code-space L2 equals
  * reconstruction-space L2 up to the per-dimension weights
  * ((mx−mn)/255)², i.e. it IS the tier's serving metric when ranges are
  * comparable across dimensions (the quantization premise) — so the
  * recall gauge measures it against the EXACT squared-L2 top-k, the
  * same truth-metric pairing as [[Similarity.pqRecall]].
  *
  * Scale shape: training aggregates 2·d scalars map-side; encoding is a
  * stateless per-row kernel against the broadcast ranges; serving is a
  * linear scan of 64 B/vector (or cell-blocked through [[Imi]]'s layout
  * like any other payload column). The scan stays in whole-stage
  * codegen — the fold is a Catalyst `aggregate` over int arrays. */
object Sq8 {

  /** Per-dimension quantization ranges: (pos, mn, mx) — the trained
    * state, 64 rows. */
  def ranges(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("emb")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** SQ8 codes as one row per (vec_id, pos): code ∈ [0, 255]. The long
    * (vec_id, pos, code) shape is the gate surface; the serving path
    * keeps codes packed as an array column ([[codesArr]]). */
  def codes(emb: DataFrame): DataFrame = {
    val r = ranges(emb)
    emb.select(col("vec_id"), posexplode(col("emb")).as(Seq("pos", "x")))
      .join(broadcast(r), "pos")
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        quantCol(col("x"), col("mn"), col("mx")).as("code"))
      .orderBy("vec_id", "pos")
  }

  private def quantCol(x: org.apache.spark.sql.Column,
                       mn: org.apache.spark.sql.Column,
                       mx: org.apache.spark.sql.Column) =
    when(mx === mn, 0L).otherwise(
      least(lit(255L), greatest(lit(0L),
        floor((x - mn) * lit(255.0) / (mx - mn) + lit(0.5)))))

  /** The row-wise encode expression over columns `emb` and `rs` (the
    * sorted (pos, mn, mx) ranges array) — shared by [[encodeWith]] and
    * the compaction copy-pass fallback in [[Imi]] (where it sits inside
    * a coalesce, so codegen only evaluates it for rows MISSING a stored
    * code). */
  private[operators] val EncodeExpr: String =
    "zip_with(emb, rs, (x, r) -> " +
      "CASE WHEN r.mx = r.mn THEN CAST(0 AS BIGINT) ELSE " +
      "least(CAST(255 AS BIGINT), greatest(CAST(0 AS BIGINT), " +
      "CAST(floor((x - r.mn) * 255.0D / (r.mx - r.mn) + 0.5D) AS BIGINT)))" +
      " END)"

  /** The 1-row (rs: sorted ranges array) frame [[EncodeExpr]] reads —
    * broadcast-crossJoined onto the rows to encode. */
  private[operators] def rangesRow(ranges: DataFrame): DataFrame =
    ranges
      .select(array_agg(struct(col("pos"), col("mn"), col("mx"))).as("rs"))
      .select(array_sort(col("rs")).as("rs"))

  /** Encode (vec_id, emb) rows against an EXPLICIT ranges table — the
    * form the persisted index tier uses, where the ranges are the STORED
    * trained state rather than retrained per call (the stored-books
    * discipline applied to SQ8). Output (vec_id, qc array<long>, dims in
    * index order). */
  private[operators] def encodeWith(emb: DataFrame,
                                    ranges: DataFrame): DataFrame =
    emb.crossJoin(broadcast(rangesRow(ranges)))
      .select(col("vec_id"), expr(EncodeExpr).as("qc"))

  /** Codes as an array column (vec_id, qcodes array<long>) — the packed
    * serving shape (one row per vector, dims in index order). */
  private def codesArr(emb: DataFrame): DataFrame =
    encodeWith(emb, ranges(emb))

  /** The integer code-space squared distance between two code arrays —
    * shared by the in-query ranking ([[topK]]) and the artifact serve
    * ([[Imi.annSq8Served]]) so the two tiers can never rank differently. */
  private[operators] def d2Col(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (a, b) -> (a - b) * (a - b)), " +
      "CAST(0 AS BIGINT), (acc, v) -> acc + v)")

  /** SQ8 top-k per query (queries = the nq lowest vec_ids, self
    * excluded): (qid, nid, d2, rank), d2 = exact integer code distance
    * Σ (code_q − code_d)², tie-break (d2 asc, nid asc). */
  def topK(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val enc = codesArr(emb)
    val q = enc.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("qc").as("qq"))
    val w = Window.partitionBy("qid").orderBy(col("d2").asc, col("nid").asc)
    enc.select(col("vec_id").as("nid"), col("qc"))
      .crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), d2Col("qc", "qq").as("d2"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "nid", "d2", "rank")
      .orderBy("qid", "rank")
  }

  /** SQ8 recall@k against the EXACT squared-L2 top-k (code-space L2's
    * own metric — the [[Similarity.pqRecall]] truth pairing):
    * (qid, hits, recall). Same sampled-query-set shape as every other
    * recall gauge — truth is |Q|·n work, never all-pairs. */
  def recall(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("emb").as("qv"))
    val wl2 = Window.partitionBy("qid").orderBy(col("d").asc, col("nid").asc)
    val exact = emb.select(col("vec_id").as("nid"), col("emb").as("nv"))
      .crossJoin(broadcast(queries))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        graft.functions.SqDiffSum.sqDiffSum(col("qv"), col("nv")).as("d"))
      .withColumn("rank", row_number().over(wl2))
      .filter(col("rank") <= k)
      .select("qid", "nid")
    val approx = topK(emb, nQueries, k).select("qid", "nid")
    val hits = approx.join(exact, Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    emb.filter(col("vec_id") < nQueries).select(col("vec_id").as("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall"))
      .orderBy("qid")
  }
}
