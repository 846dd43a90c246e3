package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (north-star extension,
  * SURVEY.md §7.1 M7): brute-force cosine top-k as the correctness baseline,
  * an IVF (inverted-file) coarse-quantizer variant as the scale path, and
  * cosine near-dup pairs.
  *
  * The dot products are built-in `zip_with`/`aggregate` column expressions
  * (no UDFs). Queries are always the tiny side and are explicitly
  * `broadcast()` — the candidate table streams by, so the plans hold when
  * candidates are 100 TB: brute force reads each candidate exactly once per
  * query batch; IVF first shrinks the candidate set by the coarse cell
  * assignment (an equi-join on cell id), which is the standard ANN trade —
  * recall for a ~nprobe/ncells scan fraction.
  */
object Similarity {

  /** Cosine similarity between two array<double> columns via the codegen'd
    * [[graft.functions.DotProduct]] expression — a strict left-to-right fold,
    * bit-identical with both the higher-order `aggregate(zip_with(...))`
    * formulation and the DuckDB twin:
    * list_sum(list_transform(list_zip(a,b), x -> x[1]*x[2]))
    *   / (SQRT(list_sum(...a..)) * SQRT(list_sum(...b...))). */
  def cosine(a: Column, b: Column): Column = {
    val dot = graft.functions.DotProduct.dot _
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Per-label centroid of the embedding column, exact and order-independent:
    * each float coordinate is scaled by 2^30 and floored to a BIGINT (a
    * float times a power of two is exactly representable in double, and
    * floor is deterministic), summed in integer arithmetic, then divided
    * back out in two IEEE ops both engines execute identically — the
    * float-sum analogue of the money columns' decimal-first discipline.
    * The 2^-30 quantization (~1e-9) is far below float32 resolution, so the
    * centroid is as accurate as a double mean, without its order dependence.
    * One partial+final hash aggregation over |labels|·dim cells at any
    * scale. Output (label, dim, n, centroid). */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label").cast("long").as("label"),
        posexplode(col("emb")).as(Seq("dim", "e")))
      .groupBy("label", "dim")
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("e") * lit(1073741824.0)).cast("long")).as("qsum"))
      .select(col("label"), col("dim").cast("long").as("dim"), col("n"),
        ((col("qsum").cast("double") / col("n").cast("double")) /
          lit(1073741824.0)).as("centroid"))
      .orderBy("label", "dim")

  /** Deterministic ±1 hyperplanes for [[embLshCodes]]: component (k, d) is
    * +1 iff the md5-derived h60 of "k:d" is odd — the same engine-free coin
    * family as every sampler in this library, so the oracle inlines the
    * identical planes as SQL literals. */
  private[graft] def signPlanes(bits: Int, dim: Int): Seq[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq.tabulate(bits) { k =>
      Array.tabulate(dim) { d =>
        if ((graft.functions.Hashes.h60Jvm(md, s"$k:$d") & 1L) == 1L) 1.0 else -1.0
      }
    }
  }

  /** Sign-random-projection LSH codes — the cosine analogue of MinHash: bit
    * k of a vector's code is [⟨v, s_k⟩ ≥ 0] for deterministic ±1 hyperplane
    * s_k ([[signPlanes]]), so P(bits agree) = 1 − θ/π (Charikar'02) and
    * near-parallel vectors share long code prefixes. One narrow codegen'd
    * projection — `bits` [[graft.functions.DotProduct]] folds per row, no
    * shuffle, no state — which is why this is the embedding sketch a 100 TB
    * corpus computes: 16 bits replace 256 doubles at the exchange.
    * Output (vec_id, code). */
  def embLshCodes(emb: DataFrame, bits: Int = 16, dim: Int = 64): DataFrame =
    emb.select(col("vec_id"), lshCode(bits, dim).as("code")).orderBy("vec_id")

  private def lshCode(bits: Int, dim: Int): Column =
    signPlanes(bits, dim).zipWithIndex.map { case (p, k) =>
      when(graft.functions.DotProduct.dot(col("emb"),
        graft.functions.ArrLit.darr(p)) >= 0.0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Banding parameters for [[embLshPairs]]. r7 verdict finding #1: the old
    * 16-bit code sliced into 4 bands of 4 bits gave a join-key domain of
    * 4·16 = 64 values TOTAL, constant in corpus size — so the candidate
    * self-join was ~n²/8 BY CONSTRUCTION, a full cartesian in disguise at
    * 100 TB. The rebuilt family: [[LshBands]]=16 independent bands of
    * [[LshBandBits]]=8 sign bits each (plane k = band·8+bit from the same
    * md5 [[signPlanes]] family, so the oracle inlines identical literals),
    * COMPOSED with the occupancy-derived IVF cell id ([[ivfK]]). The join
    * key (band, bv, cid) has 16·256·k(n) values — cardinality that GROWS
    * with the corpus — and candidates are bounded by within-cell pair
    * count ≈ n·occupancy, i.e. linear in n, not by a constant collision
    * probability times n². Recall per band for cosine θ is (1−θ/π)⁸ over
    * 16 bands; the same-cell requirement is the SemDedup premise (semantic
    * near-dups share a coarse cell), and `q_emb_lsh_recall` measures the
    * realized recall against the exact all-pairs answer. */
  private[graft] val LshBands = 16
  private[graft] val LshBandBits = 8

  /** Cell multi-probe width for the banded chain: each vector blocks into
    * its 4 nearest coarse cells. Measured loss breakdown on the 144 exact
    * pairs at sf0.1 (k=63 cells): the bands catch 142/144 at hd≤1, so
    * cell-splitting is the whole recall loss — co-residency is 27/144 at
    * p=1, 66 at p=2, 114 at p=4, 142 at p=8 (a cos-0.45 pair is 63° apart
    * and routinely straddles Voronoi boundaries). p=4 is the trade point:
    * recall 0.78 for 4×16·n blocking rows, candidates still
    * ~n·occupancy·p² — linear in corpus size. */
  private[graft] val LshCellProbes = 4

  /** (vec_id, cid, band, bv) — the banded+celled blocking table behind
    * [[embLshPairs]]/[[splitLeakage]]: [[LshCellProbes]]·[[LshBands]]·n
    * rows, never wider. One [[CenterKernels.lshBandRows]] mapPartitions
    * pass over broadcast centers+planes (128 plane folds + k(n) center
    * cosines per row blew the 64 KB codegen limit as plan literals — see
    * [[CenterKernels]]); band value b packs sign bits of planes
    * b·8..b·8+7 little-endian, bit-identical to the literal projection. */
  private[graft] def lshBandTable(emb: DataFrame, dim: Int = 64): DataFrame = {
    val planes = signPlanes(LshBands * LshBandBits, dim)
    val rawK = ivfRawK(emb) // ONE row-count job feeds both branches
    // spread the 128-plane + k-center band kernel (optimization r14 —
    // see Sources.spread; training collects stay on the unspread frame
    // in BOTH branches: flat trains centers on emb, hierarchical trains
    // books on emb via the From-variant — r14 ADVICE)
    val vecs = graft.sources.Sources.spread(
      emb.select(col("vec_id"), col("emb")))
    if (rawK <= IvfMaxCells) {
      val centers = KMeans.trainCenters(emb, rawK.toInt, IvfTrainIters)
      CenterKernels.lshBandRows(vecs, centers, planes, LshBands,
        LshBandBits, LshCellProbes)
    } else {
      // past the flat cap the clamped cell count would stop the key
      // domain growing (the r7 disease one level up) — block on the
      // hierarchical index's FINE cells instead, keeping the SAME
      // [[LshCellProbes]]-cell multi-probe width (2 super × probes/2
      // subs) while the packed fine-cell domain keeps growing ~n/32
      // (ScaleProof `lsh_hier_*` checks read this table directly)
      val (kSide, _) = Imi.dimsFor(rawK)
      Imi.lshBandRowsHierFrom(vecs, Imi.productBooks(emb, kSide), kSide,
        planes, LshBands, LshBandBits,
        pSuper = 2, pSub = math.max(1, LshCellProbes / 2))
    }
  }

  /** Candidate pairs of the banded sign-LSH chain — the pre-verify stage,
    * exposed so ScaleProof can measure candidate growth directly. The
    * equi-join key (band, bv|probe, cid) composes the 8-bit band value with
    * the corpus-scaled coarse cell, so distinct-key cardinality grows with
    * n and candidates stay within-cell-bounded (~n·occupancy·probes²).
    * Single-bit band multi-probe (Lv et al.'07): the lower-id side also
    * probes each band value's 8 one-bit flips, so a pair collides on a band
    * at Hamming distance ≤ 1 — measured band recall at sf0.01 goes 8/14
    * (exact match) → 14/14 (hd≤1) at θ≈63°, for 9× probe-side rows (still
    * linear in n; the probe expansion is plan-side, never materialized). */
  private[graft] def embLshCandidates(emb: DataFrame, dim: Int = 64): DataFrame =
    embLshCandidatesFrom(lshBandTable(emb, dim))

  /** [[embLshCandidates]] from an already-built (and possibly
    * checkpointed) [[lshBandTable]] — lets a caller that also reads the
    * blocking table itself (ScaleProof's `lsh_hier_*` checks) pay the
    * index training exactly once. */
  private[graft] def embLshCandidatesFrom(bands: DataFrame): DataFrame = {
    val probes = bands.select(col("vec_id"), col("cid"), col("band"),
      explode(array((-1 until LshBandBits).map { j =>
        if (j < 0) col("bv") else col("bv").bitwiseXOR(lit(1L << j))
      }: _*)).as("pv"))
    probes.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.pv") === col("y.bv") &&
          col("x.cid") === col("y.cid") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
  }

  /** Banded sign-LSH near-dup pairs — candidates from
    * [[embLshCandidates]] (16×8-bit bands ∧ shared IVF cell — see
    * [[LshBands]] for why the key domain must grow with n), verified with
    * the exact cosine. Recall is the standard LSH/blocking trade (the spec
    * asserts verified pairs ⊆ the exact all-pairs answer;
    * `q_emb_lsh_recall` gauges the realized fraction) and the oracle
    * replays the same bands and pinned cells, so the output is still
    * hash-exact. */
  def embLshPairs(emb: DataFrame, threshold: Double = 0.45,
                  dim: Int = 64): DataFrame =
    verifyCosCandidates(embLshCandidates(emb, dim), emb, threshold)

  /** Exact-cosine verification of a candidate (a, b) pair table — the
    * shared back half of the banded chain: [[embLshPairs]]'s batch
    * self-join AND the streaming embedding ingest screen
    * ([[graft.streaming.EmbDedupStream]]), which emits the same candidate
    * set from keyed cell state. */
  private[graft] def verifyCosCandidates(cand: DataFrame, emb: DataFrame,
                                         threshold: Double,
                                         sorted: Boolean = true): DataFrame = {
    val vecs = emb.select(col("vec_id"), col("emb"))
    val v = cand
      .join(vecs.select(col("vec_id").as("a"), col("emb").as("va")), "a")
      .join(vecs.select(col("vec_id").as("b"), col("emb").as("vb")), "b")
      .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
    // sorting is illegal on a STREAMING frame — the in-stream verified
    // emission (EmbDedupStream.verifiedStream) orders at the drain read
    if (sorted) v.orderBy("a", "b") else v
  }

  /** Batch-trained banding for a STREAMING source — trains the sign-LSH
    * index once from the corpus (a deployment stream never trains; in
    * production the books come off [[Imi.persistIndex]]'s stored artifact)
    * and returns the function that bands any (vec_id, emb) frame with
    * bit-identical (cid, band, bv) keys to [[lshBandTable]], INCLUDING the
    * route flip: flat trained cells under [[IvfMaxCells]], the
    * hierarchical product index's packed fine cells past it (same
    * multi-probe width). `rawKOverride` exists for the route-equivalence
    * spec, which forces the hierarchical path at gate scale. */
  private[graft] def lshStreamBander(embBatch: DataFrame, dim: Int = 64,
      rawKOverride: Option[Long] = None): DataFrame => DataFrame = {
    val planes = signPlanes(LshBands * LshBandBits, dim)
    val rawK = rawKOverride.getOrElse(ivfRawK(embBatch))
    if (rawK <= IvfMaxCells) {
      val centers = KMeans.trainCenters(embBatch, rawK.toInt, IvfTrainIters)
      vecs => CenterKernels.lshBandRows(vecs, centers, planes,
        LshBands, LshBandBits, LshCellProbes)
    } else {
      val (kSide, _) = Imi.dimsFor(rawK)
      val books = Imi.productBooks(embBatch, kSide)
      vecs => Imi.lshBandRowsHierFrom(vecs, books, kSide, planes,
        LshBands, LshBandBits,
        pSuper = 2, pSub = math.max(1, LshCellProbes / 2))
    }
  }

  /** Recall gauge for the banded chain — the number the LSH deployment
    * ships next to its index (the [[annRecall]] counterpart for the pair
    * path): ground truth is the EXACT all-pairs cosine answer
    * ([[neardupCosine]] — affordable at gate scale; at 100 TB the truth
    * side is computed on a sampled sub-corpus exactly like q_ann_recall's
    * sampled queries), found = the banded chain's verified pairs. Verified
    * pairs are a subset of truth by construction (the verify stage applies
    * the same threshold), so recall = n_found/n_true; the join-counted
    * n_hit is reported too, making any subset violation visible in the
    * gate itself. Output one row (n_true, n_found, n_hit, recall). */
  def embLshRecall(emb: DataFrame, threshold: Double = 0.45): DataFrame =
    recallRow(neardupCosine(emb, threshold).select("a", "b"),
      embLshPairs(emb, threshold).select("a", "b"))

  /** The recall-gauge single row (n_true, n_found, n_hit, recall) from an
    * exact truth pair set and a found pair set — shared by both gauges
    * and the lifecycle composition, which computes the (expensive,
    * corpus-quadratic at gate scale) truth ONCE for its two legs. */
  private[graft] def recallRow(exact: DataFrame, found: DataFrame): DataFrame = {
    val hit = found.join(exact, Seq("a", "b"))
    exact.agg(count(lit(1)).as("n_true"))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_true"), col("n_found"), col("n_hit"),
        // zero-guard mirrors the oracle's CASE WHEN n_true = 0: a corpus
        // with no exact pairs reads recall 0.0, not NULL
        when(col("n_true") === 0L, lit(0.0))
          .otherwise(col("n_hit").cast("double") / col("n_true").cast("double"))
          .as("recall"))
  }

  /** The deterministic DRIFTED corpus for the frozen-index decay gauge:
    * the original vectors plus a reversed-coordinate copy (vec_id + 10⁶).
    * Reversal is the cheapest drift that preserves the pair structure
    * exactly — cos(rev a, rev b) = cos(a, b), so the shifted half carries
    * the SAME near-dup pairs as the original — while placing the new mass
    * where the bootstrap-trained cells never saw it (a reversed embedding
    * is uncorrelated with every center trained on the originals). */
  private[graft] def driftedCorpus(emb: DataFrame): DataFrame = {
    val v = emb.select(col("vec_id").cast("long"), col("emb").cast("array<double>"))
    v.unionAll(v.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      reverse(col("emb")).as("emb")))
  }

  /** Recall-DECAY gauge for the frozen-index ingest screen (r10 verdict,
    * "what's missing" #2): the streaming semantic screen probes a
    * batch-trained index and never retrains ([[graft.streaming
    * .EmbDedupStream]]), so as the corpus drifts its realized recall
    * decays silently — this is the reindex-trigger signal a deployment
    * monitors next to the [[graft.streaming.EmbDedupStream.CellCap]] hard
    * stop. The gauge drifts the corpus deterministically
    * ([[driftedCorpus]] — a reversed-coordinate copy whose true pair set
    * mirrors the original's), routes the WHOLE drifted corpus through the
    * index frozen at bootstrap (trained on the ORIGINAL vectors only —
    * [[lshStreamBander]], the very books the streaming screen probes; the
    * candidate set equals the streamed screen's by its carving-invariance
    * contract, spec-asserted), verifies with the exact cosine, and scores
    * against the brute-force truth over the drifted corpus. Compare
    * `recall` here against `q_emb_lsh_recall` (the same gauge at
    * bootstrap, retrained-on-current-corpus): the gap IS the decay; the
    * ScaleProof twin proves frozen < retrained at 10×. Output one row
    * (n_true, n_found, n_hit, recall) — the [[embLshRecall]] shape. */
  def embStreamRecall(emb: DataFrame, threshold: Double = 0.45): DataFrame = {
    val drifted = driftedCorpus(emb)
    val frozen = lshStreamBander(emb) // trained on the BOOTSTRAP corpus only
    val found = verifyCosCandidates(
      embLshCandidatesFrom(frozen(drifted)), drifted, threshold)
      .select("a", "b")
    recallRow(neardupCosine(drifted, threshold).select("a", "b"), found)
  }

  /** Semantic cross-split leakage screen — the DECONTAMINATION gap n-gram
    * overlap cannot see: an eval item that is a paraphrase (near-identical
    * EMBEDDING, different surface form) of a train item inflates eval
    * scores exactly like a verbatim leak. Splits are assigned by salted
    * md5 on vec_id (deterministic, engine-independent); candidate pairs
    * come from the SAME banded sign-LSH chain as [[embLshPairs]]
    * (equi-join on (band, bv, cid) — key cardinality grows with the
    * corpus, so candidates stay ~linear in n), then only pairs CROSSING the
    * split boundary survive, oriented as (eval_id, train_id, cos). At
    * 100 TB this is the standard pre-release eval hygiene pass, and the
    * blocked chain is what makes it affordable. */
  def splitLeakage(emb: DataFrame, threshold: Double = 0.45): DataFrame = {
    def split(id: Column): Column =
      when(graft.functions.Hashes.h60(
        concat(id.cast("string"), lit(":split1"))) % 10 < 8, "train")
        .otherwise("eval")
    embLshPairs(emb, threshold = threshold)
      .withColumn("sa", split(col("a")))
      .withColumn("sb", split(col("b")))
      .filter(col("sa") =!= col("sb"))
      .select(
        when(col("sa") === "eval", col("a")).otherwise(col("b")).as("eval_id"),
        when(col("sa") === "eval", col("b")).otherwise(col("a")).as("train_id"),
        col("cos"))
      .orderBy("eval_id", "train_id")
  }

  /** Per-dimension winsorization audit: exact discrete p1/p99 thresholds
    * (`percentile_disc` — actual data values, no interpolation) and the
    * outlier mass a clip at those thresholds would touch. The report a
    * robust-scaling step reads BEFORE rewriting 100 TB of vectors — per
    * dim, the thresholds and how many values sit outside them. Exact
    * per-dim order statistics are the audit-time path (one explode to
    * (dim, v) and a per-dim sort); the clip itself would then be a narrow
    * codegen'd least/greatest projection. Output (dim, lo, hi, n_lo,
    * n_hi). */
  def embClip(emb: DataFrame): DataFrame = {
    val dv = emb.select(posexplode(col("emb")).as(Seq("pos", "v")))
      .select(col("pos").cast("long").as("dim"), col("v"))
    val th = dv.groupBy("dim").agg(
      expr("percentile_disc(0.01) WITHIN GROUP (ORDER BY v)").as("lo"),
      expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY v)").as("hi"))
    dv.join(th, "dim")
      .groupBy("dim")
      .agg(max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_hi"))
      .orderBy("dim")
  }

  private def queriesOf(emb: DataFrame, nQueries: Int): DataFrame =
    broadcast(emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("emb").as("qv")))

  /** Brute-force cosine top-k: for each query vector (vec_id < nQueries),
    * the k nearest other vectors by cosine. Output (qid, nid, rank, cos). */
  def annBruteForce(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val scored = emb.select(col("vec_id").as("nid"), col("emb").as("nv"))
      .crossJoin(queriesOf(emb, nQueries))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cos")
      .orderBy("qid", "rank")
  }

  /** Hard-negative mining for contrastive training: per query vector, the
    * k MOST similar vectors carrying a DIFFERENT label — the negatives that
    * actually teach a bi-encoder (random negatives are trivially far;
    * same-label "negatives" are false negatives that poison the loss).
    * Same broadcast-queries × streamed-candidates shape as
    * [[annBruteForce]] — linear in corpus, the label filter rides the
    * scoring scan for free — and the blocked/IVF upgrade path is the same
    * one q_ann_ivf documents. Output (qid, nid, nlabel, rank, cos). */
  def hardNegatives(emb: DataFrame, nQueries: Int = 5, k: Int = 5): DataFrame = {
    val q = broadcast(emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("emb").as("qv")))
    val scored = emb
      .select(col("vec_id").as("nid"), col("label").as("nlabel"),
        col("emb").as("nv"))
      .crossJoin(q)
      .filter(col("nid") =!= col("qid") && col("nlabel") =!= col("qlabel"))
      .select(col("qid"), col("nid"), col("nlabel"),
        cosine(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "nid", "nlabel", "rank", "cos")
      .orderBy("qid", "rank")
  }

  /** Mean-reciprocal-rank retrieval evaluation — the ranking-quality
    * number a retrieval deployment reports next to recall: per query, the
    * rank of the FIRST same-label candidate in the full cosine ordering
    * (labels stand in for relevance judgments), and its reciprocal. Uses
    * the same broadcast-queries × streamed-candidates scan as
    * [[annBruteForce]] and the identical total tie-break, so the metric
    * is measured over exactly the ordering the top-k gates verify. The
    * reciprocal is ONE integer division (exact cross-engine); at 100 TB
    * the ordering comes from the retriever's top-k instead of a full
    * rank — the same IVF swap — with first_rank > k reported as a miss.
    * Output (qid, qlabel, first_rank, rr) ordered by qid. */
  def mrr(emb: DataFrame, nQueries: Int = 5): DataFrame = {
    val q = broadcast(emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("emb").as("qv")))
    val scored = emb
      .select(col("vec_id").as("nid"), col("label").as("nlabel"),
        col("emb").as("nv"))
      .crossJoin(q)
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("qlabel"), col("nlabel"),
        cosine(col("qv"), col("nv")).as("cos"), col("nid"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("nlabel") === col("qlabel"))
      .groupBy("qid", "qlabel")
      .agg(min(col("rank")).as("first_rank"))
      .select(col("qid"), col("qlabel"), col("first_rank"),
        (lit(1.0) / col("first_rank").cast("double")).as("rr"))
      .orderBy("qid")
  }

  /** Matryoshka dimension-ablation recall — the evaluation a pipeline runs
    * before truncating stored embeddings (MRL-style nested representations:
    * can the 8/16/32-dim PREFIX stand in for the full 64-dim vector?):
    * per prefix width and query, |prefix-cosine top-k ∩ full-dim top-k|.
    * The ground truth is exactly [[annBruteForce]]'s gated answer, and
    * each prefix chain is the same broadcast-queries × streamed-candidates
    * scan over `slice(emb)` — |dims| linear passes, no pair space, and at
    * 100 TB each pass takes the same IVF swap q_ann_ivf documents. The
    * payoff being measured is real: a 8× narrower prefix is an 8× smaller
    * index and 8× less exchange traffic wherever recall holds. Output
    * (dim, qid, n_overlap, recall) ordered by (dim, qid). */
  def matryoshkaRecall(emb: DataFrame, dims: Seq[Int] = Seq(8, 16, 32),
                       nQueries: Int = 5, k: Int = 10): DataFrame = {
    val full = annBruteForce(emb, nQueries, k)
      .select(col("qid"), col("nid")).withColumn("hit", lit(1L))
    val perDim = dims.map { d =>
      annBruteForce(
        emb.select(col("vec_id"), slice(col("emb"), 1, d).as("emb")),
        nQueries, k)
        .select(lit(d.toLong).as("dim"), col("qid"), col("nid"))
    }.reduce(_.unionAll(_))
    perDim.join(full, Seq("qid", "nid"), "left")
      .groupBy("dim", "qid")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .select(col("dim"), col("qid"), col("n_overlap"),
        (col("n_overlap").cast("double") / lit(k.toDouble)).as("recall"))
      .orderBy("dim", "qid")
  }

  /** Embedding-space anomaly screen: every vector's cosine to its ASSIGNED
    * trained centroid; the `topN` least-similar vectors are the cleaning
    * candidates — garbled or out-of-distribution embeddings sit far from
    * every mass center, and this is the screen that finds them WITHOUT a
    * pair space (n·k literal-center folds, zero exchanges, then a
    * WindowGroupLimit top-N over the scalar scores). Same trained
    * quantizer and pinned-center oracle chain as [[annIvf]], so the gate
    * can never score against a divergent codebook. Output
    * (vec_id, cid, ccos, rank) — rank 1 is the farthest outlier. */
  def embOutliers(emb: DataFrame, topN: Int = 20): DataFrame = {
    val centers = KMeans.trainCenters(emb, ivfK(emb), IvfTrainIters)
    val asn = CenterKernels
      .assignByCos(emb.select(col("vec_id"), col("emb")), centers)
      .select(col("vec_id"), col("cid"), col("ccos"))
    val w = Window.orderBy(col("ccos").asc, col("vec_id").asc)
    asn.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .select("vec_id", "cid", "ccos", "rank")
      .orderBy("rank")
  }

  /** Coarse-quantizer sizing shared by [[annIvf]], [[neardupCosineBlocked]],
    * [[embOutliers]], [[annIvfPq]] and the banded-LSH chain: the cell count
    * GROWS with the corpus at a fixed target mean occupancy
    * (k = ⌈n/[[IvfTargetOccupancy]]⌉). The r7 verdict's scale finding: a
    * k CONSTANT in corpus size makes every within-cell verify
    * (q_neardup_blocked, q_semdedup) grow as n²/k — fast at sf0.1, a full
    * cartesian in disguise at 100 TB. With k ∝ n, within-cell pair work is
    * Σ|cell|² ≈ n·occupancy — linear — while training stays one
    * literal-center assignment pass plus one k·d-cell aggregation per Lloyd
    * round (driver state k·d doubles, still far below data scale: 100 TB of
    * 64-dim vectors is n ≈ 2·10¹¹, k ≈ 6·10⁹ — at THAT point the coarse
    * quantizer itself goes hierarchical: two-level √k super-cells of √k
    * cells each, the IMI/coarse-residual shape, so per-row assignment cost
    * stays 2·√k folds instead of k; [[IvfMaxCells]] marks where this build
    * would switch — assignment itself already runs against broadcast
    * centers with no per-k plan cost, [[CenterKernels]]). The row count
    * n comes from parquet footers / local-relation stats at zero jobs
    * ([[PlanStats.exactRowCount]]); only a statless source pays a count().
    *
    * At the driver's correctness scale (sf0.01, n=500) the derivation gives
    * k = ⌈500/32⌉ = 16 — exactly the pinned [[graft.IvfPins]] codebook, so
    * every DuckDB hash gate verifies the derivation + training end to end
    * (a drifted k trains different centers and fails loudly). */
  private[graft] val IvfTargetOccupancy = 32L
  private[graft] val IvfMaxCells = 4096
  /** The UNCAPPED occupancy-derived cell count max(8, ⌈n/32⌉) — shared by
    * the flat quantizer (which caps it at [[IvfMaxCells]]) and
    * [[Imi.imiDims]]'s √-split (which is how the count keeps growing past
    * the cap), so the two sizings can never drift apart. */
  private[graft] def ivfRawK(emb: DataFrame): Long = {
    val vecs = emb.select(col("vec_id"), col("emb"))
    val n = PlanStats.exactRowCount(vecs).getOrElse(vecs.count())
    math.max(8L, (n + IvfTargetOccupancy - 1) / IvfTargetOccupancy)
  }
  private[graft] def ivfK(emb: DataFrame): Int =
    math.min(IvfMaxCells.toLong, ivfRawK(emb)).toInt
  private[graft] val IvfTrainIters = 2

  /** Nearest-cell assignment against broadcast trained centers: one narrow
    * [[CenterKernels.assignByCos]] mapPartitions pass — zero exchanges, no
    * window — emitting (vec_id, emb, cid). Argmax-cosine with ties toward
    * the lowest cid, same order as the oracle's
    * `ROW_NUMBER() OVER (ORDER BY ccos DESC, cid)`. This is the shape that
    * holds at any corpus size: k grows with n ([[ivfK]]) and broadcast
    * centers have no codegen cliff, where the old literal-center
    * projection blew the 64 KB generated-method limit at k=63. */
  private[graft] def assignCells(vecs: DataFrame,
                                 centers: Seq[(Long, Array[Double])]): DataFrame =
    CenterKernels.assignByCos(vecs, centers)
      .select(col("vec_id"), col("emb"), col("cid"))

  /** IVF-style ANN with a trained occupancy-scaled coarse quantizer
    * ([[KMeans.trainCenters]], k=[[ivfK]]): every vector is assigned to its
    * nearest centroid cell in one broadcast-centers kernel pass
    * ([[assignCells]]); a query probes its `nprobe` nearest cells
    * ([[CenterKernels.probeCells]]) and ranks only their members. The
    * DuckDB oracle pins the sf0.01 trained centers as literals
    * ([[graft.IvfPins]], the `MrfftPins` pattern), so the hash gate
    * verifies sizing + training + assignment + probe end to end. Output
    * (qid, nid, rank). */
  def annIvf(emb: DataFrame, nQueries: Int = 5, k: Int = 10, nprobe: Int = 2): DataFrame = {
    val centers = KMeans.trainCenters(emb, ivfK(emb), IvfTrainIters)
    val cells = assignCells(emb.select(col("vec_id"), col("emb")), centers)
      .select(col("vec_id").as("nid"), col("emb").as("nv"), col("cid"))
    val probes = CenterKernels
      .probeCells(emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id"), col("emb")), centers, nprobe)
      .select(col("vec_id").as("qid"), col("emb").as("qv"), col("cid"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    cells.join(broadcast(probes), "cid")
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos"))
      .groupBy("qid", "nid").agg(max(col("cos")).as("cos")) // mirror the oracle's GROUP BY
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank")
      .orderBy("qid", "rank")
  }

  /** IVF recall@k — the quality measurement an ANN deployment ships next to
    * the index itself: for each query, the fraction of the brute-force
    * cosine top-k ([[annBruteForce]], the ground truth) that the IVF probe
    * ([[annIvf]]) recovered. This is exactly how recall is measured at
    * 100 TB: ground truth is only ever computed for the SAMPLED query set
    * (n·|Q| work, |Q| constant), never all-pairs, so the whole evaluation
    * stays linear in corpus size. The equi-join of the two top-k lists is
    * |Q|·k rows a side; queries with zero recovered neighbors still emit a
    * row (left join against the query list). Output (qid, hits, recall)
    * with recall = hits/k — both engines divide the same small integers, so
    * the double is bit-identical. */
  def annRecall(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
                nprobe: Int = 2): DataFrame = {
    val exact = annBruteForce(emb, nQueries, k).select("qid", "nid")
    val approx = annIvf(emb, nQueries, k, nprobe).select("qid", "nid")
    val hits = approx.join(exact, Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    emb.filter(col("vec_id") < nQueries).select(col("vec_id").as("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall"))
      .orderBy("qid")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, a < b.
    *
    * The pair loop runs as a typed `mapPartitions` kernel against a broadcast
    * copy of the vector table: each partition streams its vectors and scans
    * the broadcast side with tight primitive loops. Catalyst's higher-order
    * `aggregate`/`zip_with` fold is interpreted (no codegen) and ~100x slower
    * on an n²d workload; the kernel computes the SAME left-to-right fold, so
    * results stay bit-identical with the SQL oracle. The broadcast side is
    * vectors-only (n·d doubles) — at corpus sizes past executor memory, block
    * the pair space first (IVF cells of [[annIvf]] or sign-bucket LSH) and
    * apply this kernel per block. */
  def neardupCosine(emb: DataFrame, threshold: Double = 0.45,
                    driverThreshold: Long = 500_000L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col("vec_id").cast("long"), col("emb").cast("array<double>"))
      .as[(Long, Array[Double])]
    // Size gate (same switch as Dedup.connectedComponents): the broadcast of
    // the full vector table is only sane while it fits executor memory
    // (500k x 64-dim doubles ≈ 256 MB). The route is decided from STATISTICS
    // when possible — the optimizer's rowCount (exact for local relations) or
    // the parquet footer record counts (exact when the plan is row-preserving
    // over the scan) — at zero jobs; only a statless source pays the
    // limit(n+1) probe, whose incremental CollectLimit jobs cost a full extra
    // serial pass (the measured r4 q_neardup_cos regression). Past the
    // threshold the exact all-pairs scan is off the table at any layout, so
    // the call routes to the IVF-blocked kernel (the documented 100 TB path;
    // recall < 1 is the standard blocking trade).
    val lim = math.min(driverThreshold, Int.MaxValue - 1L).toInt + 1
    val head = PlanStats.exactRowCount(vecs.toDF()) match {
      case Some(n) if n > driverThreshold => null
      case Some(_) => vecs.collect()
      case None => vecs.limit(lim).collect()
    }
    if (head == null || head.length > driverThreshold)
      return neardupCosineBlocked(emb, threshold)
    val all = spark.sparkContext.broadcast(head.sortBy(_._1))
    // the collected head IS the whole table (the gate proved it): stream it
    // back out of driver memory instead of re-scanning the source, so the
    // query reads its input exactly once
    val out = spark.sparkContext.parallelize(head.toSeq).toDS().mapPartitions { it =>
      val bs = all.value
      it.flatMap { case (a, av) =>
        val na = math.sqrt(dotArr(av, av))
        bs.iterator
          .filter(_._1 > a)
          .map { case (b, bv) =>
            (a, b, dotArr(av, bv) / (na * math.sqrt(dotArr(bv, bv))))
          }
          .filter(_._3 >= threshold)
      }
    }.toDF("a", "b", "cos")
    out.orderBy("a", "b")
  }

  /** Blocked near-duplicate pairs — the 100 TB scale path for
    * [[neardupCosine]]: vectors are first assigned to their nearest coarse
    * cell (the [[annIvf]] quantizer — fixed-k centers trained with
    * [[KMeans.trainCenters]]), and only pairs sharing a cell are scored. The
    * pair space shrinks from n² to Σ|cell|², each cell's block fits one
    * task, and the equi-join on cell id shuffles instead of broadcasting the
    * corpus; because k is constant, assignment stays n·k at any corpus size.
    * Trade: pairs straddling a cell boundary are missed (recall < 1, the
    * standard LSH/IVF-blocking trade); the DuckDB oracle replays the same
    * blocking from the pinned sf0.01 centers ([[graft.IvfPins]]) so the
    * output is still hash-verified. */
  def neardupCosineBlocked(emb: DataFrame, threshold: Double = 0.45): DataFrame = {
    val centers = KMeans.trainCenters(emb, ivfK(emb), IvfTrainIters)
    val cells = assignCells(emb.select(col("vec_id"), col("emb")), centers)
    cells.as("x").join(cells.as("y"),
        col("x.cid") === col("y.cid") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        cosine(col("x.emb"), col("y.emb")).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy("a", "b")
  }

  /** Per-vector symmetric int8 quantization — the storage/interconnect
    * path a 100 TB embedding corpus actually ships (4x smaller than
    * float32, 8x smaller than the float64 working form): scale =
    * max|vᵢ|/127, code = floor(v/scale + 0.5). Output per vector: the
    * scale, the saturated-code count, and the total absolute
    * reconstruction error int64-quantized at 2⁻³⁰ (the
    * [[labelCentroids]] discipline) so the whole thing is hash-exact:
    * every step (division, +0.5, floor, multiply-back, abs) is a single
    * IEEE op both engines execute identically, and the per-element floors
    * are exact integers whose sum is order-free below 2⁵³. Zero vectors
    * quantize to all-zero codes with zero error (scale 0 guard). One
    * narrow per-row pass — no shuffle, no state. */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val scale = array_max(transform(col("emb"), v => abs(v))) / lit(127.0)
    val code: Column => Column = v => floor(v / col("scale") + lit(0.5))
    emb.select(col("vec_id"), col("emb"), scale.as("scale"))
      .select(col("vec_id"), col("scale"),
        when(col("scale") === 0.0, lit(0L)).otherwise(
          size(filter(col("emb"), v => abs(code(v)) === 127.0)).cast("long"))
          .as("n_sat"),
        when(col("scale") === 0.0, lit(0L)).otherwise(
          aggregate(
            transform(col("emb"), v =>
              floor(abs(v - code(v) * col("scale")) * lit(1073741824.0))
                .cast("long")),
            lit(0L), (acc, x) => acc + x)).as("err_q"))
      .orderBy("vec_id")
  }

  // ---- Product quantization (Jégou et al. '11) ----

  private[graft] val PqSubspaces = 8
  private[graft] val PqSubDim = 8 // 64-dim embeddings
  private[graft] val PqCodebookSize = 16
  private[graft] val PqTrainIters = 2

  /** Per-subspace PQ codebooks: the 64-dim space cut into 8 contiguous
    * 8-dim slices, each with its own deterministic k=16 Lloyd codebook —
    * all 8 trained in ONE fused pass per round
    * ([[KMeans.trainSubCenters]], bit-identical to 8 separate
    * [[KMeans.trainCenters]] runs, so the whole train→encode→search chain
    * stays oracle-verifiable; the sf0.01 books are pinned as
    * [[graft.PqPins]] for the DuckDB side). Driver state: 8·16·8 doubles —
    * constant in corpus size. */
  def pqCodebooks(emb: DataFrame): Seq[Seq[(Long, Array[Double])]] =
    KMeans.trainSubCenters(emb, PqSubspaces, PqSubDim,
      PqCodebookSize, PqTrainIters)

  /** Argmin sub-code for subspace `s`: 16 loop-codegen'd
    * [[graft.functions.SqDiffSum]] folds over the slice, struct-min with
    * the (d asc, cid asc) tie-break — the [[KMeans.assign]] discipline. */
  private def subCode(vecCol: Column, s: Int,
                      book: Seq[(Long, Array[Double])]): Column =
    array_min(array(book.map { case (cid, cv) =>
      struct(graft.functions.SqDiffSum.sqDiffSum(
        slice(vecCol, s * PqSubDim + 1, PqSubDim),
        graft.functions.ArrLit.darr(cv)).as("d"), lit(cid).as("cid"))
    }: _*)).getField("cid")

  /** PQ encode: every vector becomes 8 sub-codes — 8 bytes of index
    * payload standing in for 512 bytes of float64 (the compression that
    * lets a 100 TB embedding corpus fit an in-memory ANN tier). One
    * narrow literal-codebook projection: zero exchanges, codes never
    * wider than the input. Output (vec_id, codes). */
  def pqEncode(emb: DataFrame): DataFrame =
    pqEncodeWith(emb, pqCodebooks(emb))

  /** The dumpable form of [[pqEncode]]: the 8 sub-codes (each < 16) packed
    * little-endian into ONE int64 nibble word — the literal 4-bytes-per-
    * vector payload a PQ index ships, and a scalar the hash gate can
    * digest (list columns aren't hashable driver-side). Output
    * (vec_id, code). */
  def pqPackedCodes(emb: DataFrame): DataFrame =
    pqEncode(emb).select(col("vec_id"),
      (0 until PqSubspaces).map(s =>
        col("codes").getItem(s) * lit(1L << (4 * s))).reduce(_ + _).as("code"))
      .orderBy("vec_id")

  /** Encode + pack in ONE literal projection — the int64 nibble word of
    * [[pqPackedCodes]] computed directly from the vector column (the
    * 8-byte candidate payload [[Imi.persistIndex]] stores next to each
    * member). */
  private[graft] def pqPackedCodeCol(books: Seq[Seq[(Long, Array[Double])]],
                                     vecCol: Column): Column =
    (0 until PqSubspaces).map(s =>
      subCode(vecCol, s, books(s)) * lit(1L << (4 * s))).reduce(_ + _)

  /** Reconstruction from a PACKED code word: unpack nibble s with
    * shift+mask, look it up in subspace s's literal codebook map, flatten
    * in subspace order — the read path of a stored ADC tier (identical
    * doubles to [[pqEncodeReconCol]] for the same codes, so a served
    * ranking hash-matches the in-query retrain). */
  private[graft] def pqReconFromPackedCol(books: Seq[Seq[(Long, Array[Double])]],
                                          codeCol: Column): Column =
    flatten(array((0 until PqSubspaces).map { s =>
      element_at(
        map(books(s).flatMap { case (cid, cv) =>
          Seq(lit(cid), graft.functions.ArrLit.darr(cv))
        }: _*),
        shiftright(codeCol, 4 * s).bitwiseAND(lit(15L)))
    }: _*))

  private def pqEncodeWith(emb: DataFrame,
      books: Seq[Seq[(Long, Array[Double])]]): DataFrame =
    emb.select(col("vec_id"),
      array((0 until PqSubspaces).map(s =>
        subCode(col("emb"), s, books(s))): _*).as("codes"))

  /** ADC (asymmetric distance) top-k over PQ codes: the query stays
    * full-precision, every candidate is scored against its RECONSTRUCTION
    * (per-subspace codebook lookup — `element_at` on a literal map, robust
    * to empty-cluster cid gaps), so distances are Σₛ‖qₛ − cₛ‖² computed as
    * ONE [[graft.functions.SqDiffSum]] fold over the flattened 64-dim
    * reconstruction — index order, bit-identical to the oracle's
    * `list_sum` over the concatenated codebook rows. Candidate state is
    * the 8-byte code, not the vector: the scan that reads 64× less than
    * [[annBruteForce]] at 100 TB (and composes with the IVF cells for
    * sublinear probe sets). Output (qid, nid, adc, rank) — the raw ADC
    * distance is part of the hash gate, not just the rank order. */
  /** Reconstruction of a coded vector: per-subspace codebook lookup
    * (`element_at` on a literal map — robust to empty-cluster cid gaps),
    * flattened back to the full 64 dims in subspace order. */
  private def pqReconCol(books: Seq[Seq[(Long, Array[Double])]],
                         codes: Column): Column =
    flatten(array((0 until PqSubspaces).map { s =>
      element_at(
        map(books(s).flatMap { case (cid, cv) =>
          Seq(lit(cid), graft.functions.ArrLit.darr(cv))
        }: _*),
        codes.getItem(s))
    }: _*))

  /** Encode + reconstruct in ONE literal projection — the candidate-side
    * column [[annIvfPq]] ranks against, shared with [[Imi.annImiPq]] so
    * both composed indexes score the identical ADC reconstruction (the
    * deployment's candidate payload is the 8-byte code; the
    * reconstruction is what a scored read of that code costs). */
  private[graft] def pqEncodeReconCol(books: Seq[Seq[(Long, Array[Double])]],
                                      vecCol: Column): Column =
    pqReconCol(books,
      array((0 until PqSubspaces).map(s => subCode(vecCol, s, books(s))): _*))

  def pqAdcTopk(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val books = pqCodebooks(emb)
    val cand = pqEncodeWith(emb, books)
      .select(col("vec_id").as("nid"), pqReconCol(books, col("codes")).as("nv"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("emb").as("qv"))
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("nid").asc)
    cand.crossJoin(broadcast(queries))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        graft.functions.SqDiffSum.sqDiffSum(col("qv"), col("nv")).as("adc"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("adc"), col("rank"))
      .orderBy("qid", "rank")
  }

  /** IVF-PQ — the composed production ANN shape: the trained coarse cells
    * ([[KMeans.trainCenters]], the same quantizer `q_ann_ivf` /
    * `q_neardup_blocked` verify) bound the PROBE SET, and the PQ codes
    * ([[pqCodebooks]]) bound the candidate MEMORY — at 100 TB both are
    * mandatory: the probe bounds how much you read, the codes bound what
    * a read costs. One narrow literal pass computes each vector's cell
    * AND its reconstruction (the candidate table carries 4 B of code
    * payload, never the raw vector); a query probes its `nprobe` nearest
    * cells and ranks members by cosine against reconstructions — the
    * SAME metric and fold as [[annIvf]], with the reconstruction standing
    * in for the raw vector, so the gate isolates exactly the quantization
    * effect. Output (qid, nid, cos, rank). */
  def annIvfPq(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
               nprobe: Int = 2): DataFrame = {
    val centers = KMeans.trainCenters(emb, ivfK(emb), IvfTrainIters)
    val books = pqCodebooks(emb)
    val cand = assignCells(emb.select(col("vec_id"), col("emb")), centers)
      .select(col("vec_id").as("nid"), col("cid"),
        pqEncodeReconCol(books, col("emb")).as("nv"))
    val probes = CenterKernels
      .probeCells(emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id"), col("emb")), centers, nprobe)
      .select(col("vec_id").as("qid"), col("emb").as("qv"), col("cid"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    cand.join(broadcast(probes), "cid")
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos"))
      .groupBy("qid", "nid").agg(max(col("cos")).as("cos")) // mirror the oracle's GROUP BY
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rank"))
      .orderBy("qid", "rank")
  }

  /** PQ recall@k — the quality gauge the 64×-compressed index ships with
    * (the [[annRecall]] counterpart for the ADC path): per query, the
    * fraction of the EXACT squared-L2 top-k (ADC's own metric — cosine
    * ground truth would conflate quantization loss with metric mismatch)
    * that the ADC top-k recovers. Ground truth is only evaluated on the
    * sampled query set — linear in corpus. */
  def pqRecall(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
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
    val approx = pqAdcTopk(emb, nQueries, k).select("qid", "nid")
    val hits = approx.join(exact, Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    emb.filter(col("vec_id") < nQueries).select(col("vec_id").as("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall"))
      .orderBy("qid")
  }

  /** Recall@k of the composed IVF-PQ index against the brute-force cosine
    * ground truth — the number a deployment actually watches, since it
    * folds BOTH loss sources together: probe misses (the IVF side) and
    * quantization error (the PQ side). Completes the
    * {ivf, pq, ivfpq} × {topk, recall} matrix. */
  def ivfPqRecall(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
                  nprobe: Int = 2): DataFrame = {
    val exact = annBruteForce(emb, nQueries, k).select("qid", "nid")
    val approx = annIvfPq(emb, nQueries, k, nprobe).select("qid", "nid")
    val hits = approx.join(exact, Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    emb.filter(col("vec_id") < nQueries).select(col("vec_id").as("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall"))
      .orderBy("qid")
  }

  /** SemDedup-style embedding dedup over the trained IVF cells (Abbas et
    * al. '23: semantic duplicates cluster together, so near-dup removal
    * inside coarse cells approximates global near-dup removal at a
    * fraction of the pair cost): a vector is dropped iff some LOWER-id
    * vector in its cell has cosine ≥ threshold with it — exactly the
    * `b`-side of [[neardupCosineBlocked]]'s verified pairs, so survivors =
    * corpus minus an anti-join against a tiny distinct-drop set. Keeps the
    * deterministic keep-lowest-id rule the exact-dedup family uses. */
  def semdedupSurvivors(emb: DataFrame, threshold: Double = 0.45): DataFrame = {
    val drop = neardupCosineBlocked(emb, threshold)
      .select(col("b").as("vec_id")).distinct()
    emb.select(col("vec_id"))
      .join(drop, Seq("vec_id"), "left_anti")
      .orderBy("vec_id")
  }

  /** Strict left-to-right dot product — the same fold order as the
    * `aggregate(zip_with(...))` column expression and the DuckDB `list_sum`
    * twin, so all three produce bit-identical doubles. */
  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
}
