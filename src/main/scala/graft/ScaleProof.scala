package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{BloomJoin, Curation, DataQuality, Dedup,
  ExactOutliers, Imi, IndexLifecycle, KMeans, Relational, Retrieval,
  Similarity, Sketches, Sq8, TextAnalysis}
import graft.sources.Sources

/** Scale-proof run of the heavy query family at sf1-equivalent volume
  * (10x the bench scale), exercising the size-gated operators' LARGE routes.
  *
  * sf1 testdata does not exist, so the tables are derived from sf0.1 by
  * 10x replication with disjoint key offsets (and disjoint x-tiles for the
  * point table, so outlier density scales instead of stacking 10 points on
  * every coordinate). Two proofs per gated operator:
  *
  *  - the heavy pipeline completes at 10x volume without driver OOM;
  *  - the large-scale route (distributed connected components, IVF-blocked
  *    near-dup) produces the SAME answer as the small route on the same
  *    input — forced via the gate thresholds the operators expose for
  *    exactly this purpose. (At true 100 TB the gates flip on their own;
  *    sf1 is still below both numeric thresholds, which is itself the
  *    honest answer for this scale.)
  *
  * Output: one JSON line of timings + route-equivalence booleans, recorded
  * as a BASELINE.md footnote.
  */
object ScaleProof {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "10").toInt
    val spark = SparkLocal.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def replicate(df: DataFrame, idCol: String, offset: Long): DataFrame =
      df.crossJoin(spark.range(reps).select(col("id").as("_rep")))
        .withColumn(idCol, col(idCol) + col("_rep") * offset)
        .drop("_rep")

    // disjoint x-tiles: each replica occupies its own 51-wide band, so cell
    // and ball structure replicates instead of stacking
    val points = {
      val p = Sources.points2d(spark, sfDir)
      p.crossJoin(spark.range(reps).select(col("id").as("_rep")))
        .select((col("id") + col("_rep") * 100000000L).as("id"),
          (col("x") + col("_rep").cast("double") * 51.0).as("x"), col("y"))
    }
    val docs = replicate(Sources.documents(spark, sfDir), "doc_id", 10000000L)
    val emb = replicate(
      Sources.embeddings(spark, sfDir).select("vec_id", "label", "emb"),
      "vec_id", 10000000L)

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val checks = scala.collection.mutable.LinkedHashMap.empty[String, Boolean]

    val (nPts, tPts) = timed(points.count())
    results += "build_points" -> tPts
    val (nOut, tOutCount) = timed(
      ExactOutliers.outlierCount(points, SparkEntry.D, SparkEntry.M)
        .head().getLong(0))
    results += "exact_outlier_count" -> tOutCount
    val (_, tOut) = timed(
      ExactOutliers.outliers(points, SparkEntry.D, SparkEntry.M, SparkEntry.K)
        .count())
    results += "exact_outliers" -> tOut

    // dedup family at 10x docs: kernel + banded join + verification
    val (lsh, tLsh) = timed {
      val p = Dedup.minhashLshPairs(docs).localCheckpoint()
      (p, p.count())
    }
    results += "minhash_lsh" -> tLsh
    val (nJac, tJac) = timed(Dedup.ngramJaccardPairs(docs).count())
    results += "ngram_jaccard" -> tJac

    // connected components: driver union-find route (default gate) vs the
    // distributed min-label loop (forced), must agree exactly
    val pairs = lsh._1.select("a", "b").localCheckpoint()
    val (ccDriver, tCcD) = timed(
      Dedup.connectedComponents(pairs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    results += "cc_driver_route" -> tCcD
    val (ccDist, tCcX) = timed(
      Dedup.connectedComponents(pairs, driverThreshold = 1L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    results += "cc_distributed_route" -> tCcX
    checks += "cc_routes_agree" -> (ccDriver == ccDist)

    // near-dup cosine: broadcast-kernel route (default gate) vs the
    // IVF-blocked route (forced); blocked recall ≤ exact by construction
    // collected ONCE: the count feeds the blocked-recall check here and
    // the pair SET feeds the banded-LSH subset check below — re-running
    // the O(n²) cosine pass for the set would double the proof's most
    // expensive stage
    val (exactPairSet, tNd) = timed(Similarity.neardupCosine(emb)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val exactPairs = exactPairSet.size.toLong
    results += "neardup_exact_route" -> tNd
    val (blockedPairs, tNdB) = timed(
      Similarity.neardupCosine(emb, driverThreshold = 1L).count())
    results += "neardup_blocked_route" -> tNdB
    checks += "neardup_blocked_recall_le_exact" -> (blockedPairs <= exactPairs)

    // occupancy-derived coarse quantizer at 10x vectors (r7 verdict #2
    // REPLACED the old `ivf_cells_fixed_k` check, which celebrated the
    // quadratic shape): k must GROW as ⌈n/32⌉ so the within-cell verify
    // stays Σ|cell|² ≈ n·occupancy — linear in corpus size — and the
    // realized assignment must keep that promise: every vector assigned,
    // cells ≤ k, and the mean **within-cell pair work** per vector (the
    // quantity that actually multiplies into q_neardup_blocked/q_semdedup
    // cost) bounded by a small multiple of the 32-row occupancy target.
    val nVecs10 = emb.count()
    val (ivfStats, tIvf) = timed {
      val k10 = Similarity.ivfK(emb)
      val centers = KMeans.trainCenters(emb, k10, Similarity.IvfTrainIters)
      val sizes = Similarity.assignCells(emb.select(col("vec_id"), col("emb")), centers)
        .groupBy("cid").count().collect().map(_.getLong(1))
      (k10, sizes)
    }
    results += "ivf_assign_10x" -> tIvf
    val (ivfK10, cellSizes) = ivfStats
    checks += "ivf_k_grows_with_n" ->
      (ivfK10 == math.min(4096L, math.max(8L, (nVecs10 + 31) / 32)).toInt &&
        cellSizes.length <= ivfK10 && cellSizes.sum == nVecs10)
    // Σ|c|²/n = occupancy-weighted mean cell size: the per-vector verify
    // fan-out. 8x the 32-row target tolerates Lloyd imbalance from the
    // k-lowest-id init while still forbidding any n-proportional cell.
    checks += "ivf_occupancy_bounded" ->
      (cellSizes.map(s => s * s).sum.toDouble / nVecs10 <= 8.0 * 32.0)

    // product-space IMI past the flat quantizer's cap (r8, rebuilt r9): a
    // synthetic 160k hash-random corpus puts the occupancy-derived cell
    // count at ⌈160000/32⌉ = 5000 > IvfMaxCells — the regime where the
    // flat quantizer would clamp and the occupancy disease return. The
    // product index must (a) size as the √-split with per-row assignment
    // cost 2·kSide ≪ k, (b) assign every vector, (c) realize MORE fine
    // cells than the flat cap allows, (d) keep the occupancy-weighted
    // mean cell size within Lloyd slack of the 32-row target, and — the
    // r9 structural fix — (e) train codebook STATE that grows ~√n:
    // the realized books hold ≤ 2·⌈√5000⌉ centers total (measured on the
    // trained object itself, so a reverted per-super-cell layout — ~5000
    // sub-centers, O(k·d) driver/broadcast state at 100 TB — fails the
    // check by a factor of ~35).
    val nSyn = 160000L
    val syn = spark.range(nSyn).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        (graft.functions.Hashes.h60(
          concat(col("id").cast("string"), lit(":"), d.cast("string"))) % 2001
          - lit(1000)).cast("double") / lit(1000.0)).as("emb"))
      .localCheckpoint()
    val (k1Syn, k2Syn) = Imi.imiDims(syn)
    val (imiBookCenters, tImiTrain) = timed(
      Imi.productBooks(syn, k1Syn).map(_.size.toLong).sum)
    results += "imi_train_160k" -> tImiTrain
    val (imiSizes, tImi) = timed {
      Imi.imiCells(syn).groupBy("scell", "sub").count()
        .collect().map(_.getLong(2))
    }
    results += "imi_train_assign_160k" -> tImi
    checks += "imi_sizing_past_cap" ->
      (k1Syn.toLong * k2Syn >= 5000L && k1Syn + k2Syn <= 146 &&
        5000L > Similarity.IvfMaxCells)
    checks += "imi_codebook_state_sqrt_n" ->
      (imiBookCenters <= 2L * math.ceil(math.sqrt(5000.0)).toLong &&
        imiBookCenters < 5000L / 10)
    checks += "imi_all_assigned" -> (imiSizes.sum == nSyn)
    checks += "imi_realized_cells_exceed_flat_cap" ->
      (imiSizes.length > Similarity.IvfMaxCells)
    checks += "imi_occupancy_bounded" ->
      (imiSizes.map(s => s * s).sum.toDouble / nSyn <= 4.0 * 32.0)

    // fine-cell BUDGET (r10, the verdict's residual third axis): with the
    // occupancy-pinned sizing, per-row assignment is 2·kSide = 2·⌈√(n/32)⌉
    // folds — O(√n) per row, O(n·√n) to index the corpus. Imi.KSideCap
    // bounds it; the default (4096/half) binds at ~5·10⁸ vectors, so the
    // proof binds a SMALL cap (16/half = 256 fine cells) on the same 160k
    // corpus — the exact regime a 100 TB build is in — and asserts the
    // three capped-budget shapes ON THE BUILT INDEX:
    //  (a) folds/row is pinned at 2·cap — the sizing no longer reads n
    //      (closed form: dimsFor at n and at 100·n give the same kSide,
    //      while the uncapped sizing grows 10×);
    //  (b) every vector still assigns, and occupancy GROWS past the
    //      32-row target instead of the cell count (mean ≥ 32·rawK/cap²
    //      up to Lloyd slack) — the budget trades occupancy, not
    //      coverage;
    //  (c) the index still SERVES: the ADC-ranked within-cell path
    //      (annImiPq — reconstruction reads, the only affordable scan
    //      once cells grow) returns a full top-k for every probe query.
    val capSide = 16
    val rawKSyn = 5000L
    checks += "imi_cap_folds_per_row_stop_growing" -> {
      val atN = Imi.dimsFor(rawKSyn, capSide)._1
      val at100N = Imi.dimsFor(rawKSyn * 100L, capSide)._1
      val uncapped100N = Imi.dimsFor(rawKSyn * 100L)._1
      atN == capSide && at100N == capSide && uncapped100N > 10 * capSide
    }
    val (cappedSizes, tImiCap) = timed {
      val books = Imi.productBooks(syn, capSide)
      Imi.memberTable(syn, books).groupBy("scell", "sub").count()
        .collect().map(_.getLong(2))
    }
    results += "imi_capped_assign_160k" -> tImiCap
    checks += "imi_cap_all_assigned_occupancy_grows" ->
      (cappedSizes.sum == nSyn && cappedSizes.length <= capSide * capSide &&
        cappedSizes.sum.toDouble / cappedSizes.length >= 32.0)
    val (cappedServe, tImiCapServe) = timed(
      Imi.annImiPq(syn, nQueries = 3, k = 10, kSideCap = capSide)
        .groupBy("qid").count().collect().map(_.getLong(1)))
    results += "imi_capped_adc_serve_160k" -> tImiCapServe
    checks += "imi_cap_adc_serves_full_topk" ->
      (cappedServe.length == 3 && cappedServe.forall(_ == 10L))

    // banded-LSH blocking past the cap (r8): on the same synthetic corpus
    // the chain must route its cell key through the product fine cells
    // (packed c1·2²⁰+c2). Both checks read the chain's OWN tables, so a
    // silently-reverted routing branch fails them: the blocking table's
    // distinct cid count must exceed the flat cap (the capped flat route
    // tops out at 4096 cids BY CONSTRUCTION — only the packed fine-cell
    // key can exceed it), and candidates stay LINEAR in n (hash-random
    // vectors are the adversarial case: every pair has ~0.43 expected
    // band collisions, so only the growing cell domain keeps the
    // candidate set from going quadratic). The band table is built ONCE
    // and checkpointed — both the candidate count and the distinct-cid
    // count derive from it, so the timing no longer double-counts the
    // index training (r8 advice #1).
    val (lshHier, tLshHier) = timed {
      val bands = Similarity.lshBandTable(syn).localCheckpoint()
      val cand = Similarity.embLshCandidatesFrom(bands).count()
      val blockingCids = bands.select("cid").distinct().count()
      (cand, blockingCids)
    }
    results += "lsh_hier_blocking_160k" -> tLshHier
    checks += "lsh_hier_blocking_cids_exceed_flat_cap" ->
      (lshHier._2 > Similarity.IvfMaxCells)
    checks += "lsh_hier_candidates_linear" -> (lshHier._1 <= 256L * nSyn)

    // duplicated spans at 10x: every window text recurs in all `reps`
    // copies of its doc, so EVERY full window must be cross-doc duplicated
    // — a sharp closed form for the df join at volume
    val (spanAgg, tSpan) = timed {
      val r = TextAnalysis.dupSpans(docs)
        .agg(sum(col("n_windows")), sum(col("n_dup"))).head()
      (r.getLong(0), r.getLong(1))
    }
    results += "dup_spans_10x" -> tSpan
    checks += "dup_spans_all_duplicated" ->
      (spanAgg._1 > 0L && spanAgg._1 == spanAgg._2)

    // span-dedup TRANSFORM at 10x (r9): with every full window hot (the
    // dup_spans closed form above), the stride-2/width-4 windows cover a
    // doc's tokens contiguously from position 1 through
    // ((n−4) div 2)·2 + 4, so the survivors are EXACTLY the (n−4) mod 2
    // unaligned tail tokens — plus all n for docs too short to window.
    // Sharp per-token closed form over the whole 10x corpus: any
    // off-by-one in coverage marking or a lost/duplicated survivor breaks
    // the equality.
    val (keptTotal10, tLineDedup) = timed(
      TextAnalysis.lineDedup(docs)
        .agg(sum(col("n_toks") - col("n_removed"))).head().getLong(0))
    results += "line_dedup_10x" -> tLineDedup
    val baseTailKept = Sources.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(when(col("n") >= 4, pmod(col("n") - 4, lit(2)))
        .otherwise(col("n")))).head().getLong(0)
    checks += "line_dedup_closed_form" ->
      (keptTotal10 == reps.toLong * baseTailKept)

    // exact-substring dedup at 10x (r10): replication makes EVERY stride-1
    // 4-gram hot (each doc's grams recur verbatim in all `reps` replicas),
    // so coverage is total for every doc long enough to gram — survivors
    // are exactly the docs with < 4 tokens (kept whole), and every
    // covered doc's longest matched span is its ENTIRE token run (the
    // variable-length extension working at full stretch: any break in
    // island merging, coverage marking, or hot-gram detection snaps the
    // equality).
    val (ssd10, tSsd) = timed {
      val r = TextAnalysis.substringDedup(docs)
        .agg(sum(col("n_toks") - col("n_removed")).as("kept"),
          sum(when(col("n_toks") >= 4 && col("max_span") =!= col("n_toks"), 1L)
            .otherwise(0L)).as("partial"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    results += "substring_dedup_10x" -> tSsd
    val baseShortKept = Sources.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(coalesce(sum(when(col("n") < 4, col("n"))), lit(0L)))
      .head().getLong(0)
    checks += "substring_dedup_closed_form" ->
      (ssd10._1 == reps.toLong * baseShortKept && ssd10._2 == 0L)

    // int8 quantization at 10x: a per-vector pure function — total error
    // mass must be EXACTLY reps x the base corpus's
    val (eBase, _) = timed(
      Similarity.quantizeInt8(Sources.embeddings(spark, sfDir))
        .agg(sum("err_q")).head.getLong(0))
    val (e10, tQuant) = timed(
      Similarity.quantizeInt8(emb).agg(sum("err_q")).head.getLong(0))
    results += "emb_quant_10x" -> tQuant
    checks += "emb_quant_err_scales_exactly" -> (e10 == eBase * reps)

    // k-means at 10x vectors: the literal-center plan must hold (the
    // replicated copies share the originals' geometry, so every replica of a
    // vector lands in the same cluster — sizes must be exactly 10x the
    // base run's)
    val (kmBase, _) = timed(
      KMeans.kmeans(Sources.embeddings(spark, sfDir), k = 8, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val (km10, tKm) = timed(
      KMeans.kmeans(emb, k = 8, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    results += "kmeans_10x" -> tKm
    checks += "kmeans_sizes_scale_10x" ->
      // replica init centers differ from the base run's (vec_id<k picks only
      // originals — by construction, since replica ids are offset), so the
      // centers are identical and sizes multiply exactly
      kmBase.forall { case (cid, n) => km10.getOrElse(cid, 0L) == n * reps }

    // bloom decontam at 10x docs: zero-shuffle kernel, 128 KB broadcast
    // regardless of scale; containment vs the exact join must still hold
    val (bloomHits, tBloom) = timed(
      Curation.decontaminateBloom(docs).filter(col("contaminated")).count())
    results += "decontam_bloom_10x" -> tBloom
    val (exactHits, tDecon) = timed(
      Curation.decontaminate(docs).filter(col("contaminated")).count())
    results += "decontam_exact_10x" -> tDecon
    checks += "bloom_contaminated_superset" -> (bloomHits >= exactHits)

    // prefix-filtered exact Jaccard at 10x docs: replicas are exact copies,
    // so the answer has a CLOSED FORM — each doc's `reps` copies form
    // C(reps,2) jaccard-1 pairs, and each base pair crosses into reps² copy
    // pairs (pair similarity depends only on the texts, which replication
    // preserves). Any candidate-pruning bug that loses a pair at volume
    // breaks the equality.
    val (basePrefixPairs, _) = timed(
      Dedup.prefixJaccardPairs(Sources.documents(spark, sfDir)).count())
    val (prefixPairs10, tPrefix) = timed(Dedup.prefixJaccardPairs(docs).count())
    results += "prefix_jaccard_10x" -> tPrefix
    val nShingled = Sources.documents(spark, sfDir)
      .filter(col("text").isNotNull && length(col("text")) >= 9).count()
    checks += "prefix_pairs_closed_form" ->
      (prefixPairs10 ==
        reps.toLong * (reps - 1) / 2 * nShingled + reps.toLong * reps * basePrefixPairs)

    // sampled recall gauge at 10x docs (r9): the tuning loop a 100 TB run
    // re-executes after every banding change must not pay corpus-wide
    // ground truth — lshRecallSampled restricts the exact prefix-join side
    // to pairs touching a deterministic md5-selected 1/4 doc sample. Two
    // checks: the sampled ground truth is a PROPER nonempty subset of the
    // full one (the filter really restricted the quadratic-ish part — a
    // silently-dropped sample predicate fails this), and the sampled
    // recall brackets the full gauge within 0.1 (the estimator tracks the
    // quantity it replaces at volume).
    val (fullRec, tFullRec) = timed(Dedup.lshRecall(docs).collect()(0))
    results += "lsh_recall_full_10x" -> tFullRec
    val (sampRec, tSampRec) = timed(Dedup.lshRecallSampled(docs).collect()(0))
    results += "lsh_recall_sampled_10x" -> tSampRec
    checks += "lsh_recall_sample_proper_subset" ->
      (sampRec.getLong(0) > 0L && sampRec.getLong(0) < fullRec.getLong(0))
    checks += "lsh_recall_sampled_brackets_full" ->
      (math.abs(sampRec.getDouble(2) - fullRec.getDouble(2)) <= 0.1)

    // banded sign-LSH pairs at 10x vectors. The r7-era check asserted an
    // EXACT reps² closed form — which was precisely the disease: with a
    // constant 64-value key domain, every base collision necessarily crossed
    // into reps² copy collisions, so candidates grew quadratically BY
    // CONSTRUCTION (the closed form could not fail). The rebuilt chain keys
    // candidates on (band, bv, cid) with the cell count growing as ⌈n/32⌉,
    // so candidate growth is bounded by within-cell pair mass ≈ n·occupancy
    // — LINEAR in corpus size. Replacement checks:
    //  (1) candidate growth at 10x is ≤ 3·reps× the base count — the linear
    //      bound with Lloyd-imbalance slack; the old constant-key chain grew
    //      ~reps² (100x) and fails this by an order of magnitude;
    //  (2) verified pairs at 10x ⊆ the exact all-pairs answer at 10x (the
    //      blocking may lose pairs, never invent them) — checked as sets,
    //      not counts, against the already-computed exact kernel route.
    val (baseLshCand, _) = timed(
      Similarity.embLshCandidates(Sources.embeddings(spark, sfDir)).count())
    val (lshCand10, tEmbLshC) = timed(Similarity.embLshCandidates(emb).count())
    results += "emb_lsh_candidates_10x" -> tEmbLshC
    checks += "emb_lsh_candidates_linear" ->
      (lshCand10 <= 3L * reps * baseLshCand)
    val (lshPairs10, tEmbLsh) = timed(
      Similarity.embLshPairs(emb).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    results += "emb_lsh_pairs_10x" -> tEmbLsh
    checks += "emb_lsh_verified_subset_exact" ->
      lshPairs10.subsetOf(exactPairSet)

    // triangle counting at 10x docs: every copy family is a reps-clique
    // (C(reps,3) triangles each) and every base triangle crosses into reps³
    // copy triangles, so total participation is bounded below by both — the
    // degree-ordered wedge bound must survive exactly this clique stress
    // coalesce: SUM over an empty (triangle-free) result is NULL, and a
    // sparse corpus must record baseTri = 0, not crash the proof
    val (baseTri, _) = timed(
      Dedup.triangleCounts(Sources.documents(spark, sfDir))
        .agg(coalesce(sum("n_tri"), lit(0L))).head.getLong(0) / 3)
    val (tri10, tTri) = timed(
      Dedup.triangleCounts(docs)
        .agg(coalesce(sum("n_tri"), lit(0L))).head.getLong(0) / 3)
    results += "triangles_10x" -> tTri
    // identical texts → identical simhash → hamming 0, so every doc's copy
    // family is a clique regardless of shingle width (simhash tokenizes on
    // words) — but a NULL-text doc has no simhash node and no family, so
    // the bound counts non-null docs only (same reason nShingled filters);
    // family triangles and crossed base triangles are vertex-disjoint
    // categories, and mixed ones only add — hence the lower bound
    val nDocs = Sources.documents(spark, sfDir)
      .filter(col("text").isNotNull).count()
    val cliqueTri = reps.toLong * (reps - 1) * (reps - 2) / 6
    checks += "triangles_ge_cliques_plus_crossed" ->
      (tri10 >= cliqueTri * nDocs + reps.toLong * reps * reps * baseTri)

    // cross-source leak matrix at 10x docs, two independent assertions:
    // (1) PARTITION — the cells must sum to exactly the verified
    // MinHash-LSH pair count already measured above (lsh), so the two
    // source equi-joins neither drop nor duplicate a single pair; (2) the
    // 10x pair count itself has the same closed form as the prefix join —
    // identical-copy families collide in every band (jaccard 1, never
    // missed) and a base pair missed by banding is missed by all reps²
    // copies alike (signatures are functions of the text, which
    // replication preserves). Splitting them keeps a closed-form failure
    // from being misattributed to the joins and vice versa.
    val (baseMhPairs, _) = timed(
      Dedup.minhashLshPairs(Sources.documents(spark, sfDir)).count())
    val (leakTotal, tLeak) = timed(
      Dedup.crossSourceLeak(docs)
        .agg(coalesce(sum("pairs"), lit(0L))).head.getLong(0))
    results += "source_leak_10x" -> tLeak
    checks += "source_leak_partitions_pairs" -> (leakTotal == lsh._2)
    checks += "mh_pairs_closed_form" ->
      (lsh._2 ==
        reps.toLong * (reps - 1) / 2 * nShingled + reps.toLong * reps * baseMhPairs)

    // incremental ingestion screen at repsx CORPUS with the batch pinned:
    // replicate every non-batch source (ids offset upward), keep the batch
    // rows original — statuses AND witnesses must be IDENTICAL to the base
    // run. Copies are textually identical with larger ids, so a batch doc
    // collides with a replica iff it collides with the original (signatures
    // are functions of the text) and the min-id witness stays the original;
    // a screen that drops or fabricates a candidate at volume breaks the
    // set equality.
    val batchSrc = "src17"
    val baseDocs = Sources.documents(spark, sfDir)
    def screenSet(d: DataFrame) =
      Dedup.incrementalDedup(d, batchSrc).collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val (baseScreen, _) = timed(screenSet(baseDocs))
    val corpusAug = baseDocs.filter(col("source") === batchSrc)
      .unionAll(replicate(
        baseDocs.filter(col("source") =!= batchSrc), "doc_id", 10000000L))
    val (screen10, tIncr) = timed(screenSet(corpusAug))
    results += "incr_screen_10x" -> tIncr
    checks += "incr_screen_invariant" -> (screen10 == baseScreen)

    // sorted-neighborhood (SNM) pairs at repsx on the unique-key sub-corpus
    // (r6 verdict #6: the operator shipped without a volume invariant).
    // Restricting to base docs whose 40-char sort key is globally UNIQUE
    // makes each doc's reps copies a rank-ADJACENT family in the composed
    // global order (identical key; within a key the order is doc_id), so
    // the window-pair count has an exact closed form:
    //  - within-family: Σ_{g=1..w−1}(reps−g) per family, lev 0, always kept;
    //  - cross-family: families hold reps > w−1 members, so only
    //    CONSECUTIVE families in key order can meet inside a window,
    //    contributing exactly C(w,2) boundary pairs iff their 64-char norms
    //    pass the lev gate — computable from the base corpus with one lag.
    // A rank-composition bug (bucket offsets, block probes) that loses or
    // duplicates a window at volume breaks the equality.
    import org.apache.spark.sql.expressions.Window
    val keyedDocs = Sources.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"),
        lower(substring(col("text"), 1, 40)).as("key"),
        lower(substring(col("text"), 1, 64)).as("norm"))
    val uniqKey = keyedDocs
      .withColumn("nk", count(lit(1)).over(Window.partitionBy("key")))
      .filter(col("nk") === 1).drop("nk").localCheckpoint()
    val nFam = uniqKey.count()
    // global lag window over the ≤|base docs| unique-key rows — proof-scale
    // driver work, not a shipped operator shape
    val nAdjacent = uniqKey
      .withColumn("prev", lag(col("norm"), 1).over(Window.orderBy("key")))
      .filter(col("prev").isNotNull &&
        levenshtein(col("prev"), col("norm")) <= 12)
      .count()
    val snW = 8
    require(reps >= snW, s"snm closed form needs reps >= $snW (family " +
      "blocks must insulate non-consecutive families from the window)")
    val famPairs = (1 until snW).map(g => (reps - g).toLong).sum
    val expectedSn =
      nFam * famPairs + nAdjacent * (snW.toLong * (snW - 1) / 2)
    val (snPairs, tSn) = timed(
      Dedup.sortedNeighborPairs(
        replicate(uniqKey.select("doc_id", "text"), "doc_id", 10000000L))
        .count())
    results += "sorted_neighbors_10x" -> tSn
    checks += "snm_pairs_closed_form" -> (snPairs == expectedSn)

    // TF-IDF cosine pairs at repsx with the df cap FIXED — the actual scale
    // contract: boilerplate is excluded by ABSOLUTE df, so at repsx corpus
    // only tokens with base df <= dfCap/reps survive the cap. N div df is
    // invariant under scaling both by reps (floor(kN/kd) = floor(N/d)), so
    // every surviving whole-bit weight, norm and dot product is unchanged
    // and the integer-exact threshold admits precisely the replicated pair
    // set: each vector-bearing doc's copy family is C(reps,2) cos-1 pairs,
    // each base pair crosses into reps² copy pairs. The fixed cap is also
    // the perf proof — posting-join work at repsx is BOUNDED by the cap
    // (never the corpus), the property that keeps it linear at 100 TB.
    // (A scaled cap would instead grow join work reps² — measured 19+ min
    // vs 85 s for the rest of this suite; that design was rejected.)
    val baseCap = 50L / reps
    val (baseTfp, _) = timed(TextAnalysis.tfidfCosinePairs(
      Sources.documents(spark, sfDir), dfCap = baseCap).count())
    val (tfp10, tTfp) = timed(TextAnalysis.tfidfCosinePairs(docs).count())
    results += "tfidf_pairs_10x" -> tTfp
    val nPostDocs = TextAnalysis.tfidfPostings(
        Sources.documents(spark, sfDir), dfCap = baseCap)
      .select("doc_id").distinct().count()
    checks += "tfidf_pairs_closed_form" ->
      (tfp10 ==
        reps.toLong * (reps - 1) / 2 * nPostDocs + reps.toLong * reps * baseTfp)

    // edit-distance pairs at repsx — the r6 scale-killer, staged in r7:
    // copies carry identical texts (same band, same histogram, lev 0), so
    // every short-doc copy family adds C(reps,2) pairs and every base pair
    // crosses into reps² copy pairs. Candidates within length bands grow
    // ~reps² — the check proves the staged verify (histogram prefilter →
    // repartition → banded DP) absorbs exactly the growth that cost 102 s
    // unstaged at 1×.
    val (baseEd, _) = timed(
      Dedup.editDistancePairs(Sources.documents(spark, sfDir)).count())
    val nShort = Sources.documents(spark, sfDir)
      .filter(col("text").isNotNull && length(col("text")) <= 200).count()
    val (ed10, tEd) = timed(Dedup.editDistancePairs(docs).count())
    results += "editdist_pairs_10x" -> tEd
    checks += "editdist_pairs_closed_form" ->
      (ed10 ==
        reps.toLong * (reps - 1) / 2 * nShort + reps.toLong * reps * baseEd)

    // simhash pairs at repsx: copies tokenize to identical 32-bit codes
    // (hamming 0 — same bands, always candidates), so the banded pair set
    // replicates in the same closed form; in-band density grows reps×, so
    // this also stresses the band-bucket join's reps² candidate growth.
    val (baseSim, _) = timed(
      Dedup.simhashPairs(Sources.documents(spark, sfDir)).count())
    val nSim = Dedup.simhash(Sources.documents(spark, sfDir)).count()
    val (sim10, tSim) = timed(Dedup.simhashPairs(docs).count())
    results += "simhash_pairs_10x" -> tSim
    checks += "simhash_pairs_closed_form" ->
      (sim10 ==
        reps.toLong * (reps - 1) / 2 * nSim + reps.toLong * reps * baseSim)

    // PQ at repsx: replication with disjoint vec_ids leaves training
    // EXACTLY invariant — init is the k lowest vec_ids (the rep-0 copies
    // of the base init rows), every cluster's quantized int64 sum and
    // count both multiply by reps, and (reps·q)/(reps·n) is the same IEEE
    // division on exactly-represented operands — so every copy gets its
    // base vector's codes and the packed-code histogram scales exactly
    // reps×.
    val basePq = Similarity.pqPackedCodes(Sources.embeddings(spark, sfDir))
      .groupBy("code").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (pq10, tPq) = timed(
      Similarity.pqPackedCodes(emb).groupBy("code").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    results += "pq_codes_10x" -> tPq
    checks += "pq_hist_scales_exactly" ->
      (pq10 == basePq.map { case (c, n) => c -> n * reps })

    // distributed-CC chain stress (r6 verdict #8): a single path graph is
    // the WORST diameter shape — plain min-label propagation needs one
    // round per hop (a 200k chain would blow any sane maxRounds), while
    // the pointer-jumped loop must close it in ~log₂ rounds. Forced onto
    // the distributed route; the answer is closed-form: one component,
    // every vertex labeled 0.
    val chainN = 200000L
    val chainEdges = spark.range(chainN)
      .select(col("id").as("a"), (col("id") + 1L).as("b"))
    val (ccChain, tChain) = timed(
      Dedup.connectedComponents(chainEdges, driverThreshold = 1L)
        .agg(countDistinct(col("cluster_id")).as("nc"),
          count(lit(1)).as("nv"), max(col("cluster_id")).as("mx")).head())
    results += "cc_chain_stress" -> tChain
    checks += "cc_chain_closed_form" ->
      (ccChain.getLong(0) == 1L && ccChain.getLong(1) == chainN + 1L &&
        ccChain.getLong(2) == 0L)

    // events at reps×: disjoint user/event ids, identical timelines per
    // replica — every per-user sequence operator must replicate in closed
    // form (a broken closed form here means per-user state leaked across
    // the partitioning key, the bug class that only shows at volume)
    val eventsRep = {
      val e = Sources.events(spark, sfDir)
      e.crossJoin(spark.range(reps).select(col("id").as("_rep")))
        .withColumn("user_id", col("user_id") + col("_rep") * 1000000L)
        .withColumn("event_id", col("event_id") + col("_rep") * 100000000L)
        .drop("_rep")
    }
    val eventsBase = Sources.events(spark, sfDir)
    val baseDepths = Relational.funnelOf(eventsBase)
      .groupBy("depth").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (depths10, tFun) = timed(Relational.funnelOf(eventsRep)
      .groupBy("depth").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    results += "funnel_10x" -> tFun
    checks += "funnel_depths_closed_form" ->
      (depths10 == baseDepths.map { case (d, n) => d -> n * reps })

    val baseTrans = Relational.eventTransitionsOf(eventsBase)
      .agg(sum(col("n")).as("n"), sum(col("sum_gap_us")).as("g")).head()
    val (trans10, tTrans) = timed(Relational.eventTransitionsOf(eventsRep)
      .agg(sum(col("n")).as("n"), sum(col("sum_gap_us")).as("g")).head())
    results += "transitions_10x" -> tTrans
    checks += "transitions_scale_exactly" ->
      (trans10.getLong(0) == baseTrans.getLong(0) * reps &&
        trans10.getLong(1) == baseTrans.getLong(1) * reps)

    val baseScd = Relational.scd2HistoryOf(eventsBase).count()
    val (scd10, tScd) = timed(Relational.scd2HistoryOf(eventsRep).count())
    results += "scd2_10x" -> tScd
    checks += "scd2_rows_scale_exactly" -> (scd10 == baseScd * reps)

    val baseCoh = Relational.cohortRetentionOf(eventsBase).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (coh10, tCoh) = timed(Relational.cohortRetentionOf(eventsRep).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap)
    results += "cohorts_10x" -> tCoh
    checks += "cohorts_scale_exactly" ->
      (coh10 == baseCoh.map { case (c, n) => c -> n * reps })

    // bloom semi-join at reps× keys AND probe: the bitset saturates toward
    // its FP ceiling (4·reps·|keys| positions of 2²⁰ bits) but the answer
    // must stay EXACT — false-positive removal belongs to the final join,
    // not the filter. Matching key offsets keep replica orders aligned
    // with their lineitems.
    val ordersRep = replicate(
      Sources.table(spark, sfDir, "orders")
        .select("o_orderkey", "o_totalprice"), "o_orderkey", 100000000L)
    val liRep = replicate(
      Sources.table(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_extendedprice"),
      "l_orderkey", 100000000L)
    val keysRep = ordersRep.filter(col("o_totalprice") > 450000.0)
      .select(col("o_orderkey").as("key"))
    val baseBloom = BloomJoin.bloomSemiJoinRevenueOf(
      Sources.table(spark, sfDir, "orders")
        .filter(col("o_totalprice") > 450000.0)
        .select(col("o_orderkey").as("key")),
      Sources.table(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_extendedprice"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (bloom10, tBloomJoin) = timed(
      BloomJoin.bloomSemiJoinRevenueOf(keysRep, liRep)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    results += "bloom_join_10x" -> tBloomJoin
    checks += "bloom_join_exact_under_saturation" ->
      (bloom10 == baseBloom.map { case (f, n) => f -> n * reps })

    // BPE training under exact replication: every word count scales by
    // reps, so every pair count scales by reps and the argmax sequence —
    // including its (count desc, pair asc) tie-breaks — is invariant. The
    // merge table must be identical with counts multiplied.
    val baseBpe = graft.operators.Bpe.bpeMerges(Sources.documents(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val (bpe10, tBpe) = timed(graft.operators.Bpe.bpeMerges(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))))
    results += "bpe_merges_10x" -> tBpe
    checks += "bpe_merge_sequence_invariant" ->
      (bpe10.toSeq == baseBpe.toSeq.map { case (i, p, m, c) => (i, p, m, c * reps) })

    // per-dimension moment pass under exact replication: counts and both
    // quantized moment sums scale by exactly reps, min/max are invariant —
    // the closed form an order-free integer-sum aggregation must satisfy.
    val baseDim = graft.operators.DataQuality.dimStats(
      Sources.embeddings(spark, sfDir))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))).toMap
    val (dim10, tDim) = timed(graft.operators.DataQuality.dimStats(emb)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))).toMap)
    results += "dim_stats_10x" -> tDim
    checks += "dim_stats_closed_form" ->
      (dim10 == baseDim.map { case (d, (n, s1, s2, mn, mx)) =>
        d -> ((n * reps, s1 * reps, s2 * reps, mn, mx)) })

    // source containment matrix under exact replication: each source's
    // DISTINCT shingle set is unchanged by copying docs (ids shift, sets
    // don't), so every matrix cell — sizes, intersections, containments —
    // must be IDENTICAL at 10x. The strongest kind of invariant: not
    // "scales by reps" but "bit-equal".
    val baseOv = graft.operators.Dedup.sourceOverlap(
      Sources.documents(spark, sfDir))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val (ov10, tOv) = timed(graft.operators.Dedup.sourceOverlap(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap)
    results += "source_overlap_10x" -> tOv
    checks += "source_overlap_invariant" -> (ov10 == baseOv)

    // top duplicated spans under exact replication: every window's counts
    // scale by exactly reps, AND replication promotes single-doc windows
    // over the ≥2-docs threshold (each copy is a distinct doc) — so the
    // 10x top-k equals the base top-k taken WITHOUT the multi-doc filter
    // (minDocs=1), counts multiplied. The closed form deliberately covers
    // that threshold-crossing, not just the easy scaling.
    val baseSpans = graft.operators.TextAnalysis.topSpans(
      Sources.documents(spark, sfDir), minDocs = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (spans10, tSpans) = timed(graft.operators.TextAnalysis.topSpans(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
    results += "top_spans_10x" -> tSpans
    checks += "top_spans_closed_form" ->
      (spans10.toSeq == baseSpans.toSeq.map { case (w, o, d) =>
        (w, o * reps, d * reps) })

    // heavy hitters at reps×: every token count and the total n both scale
    // by reps, so the exact φ-frequent set is IDENTICAL with counts ×reps —
    // and the Misra–Gries screen must not lose a hitter at 10× the stream
    // (the pigeonhole guarantee is partition-count-independent; this is the
    // volume check on it)
    val baseHh = Sketches.heavyHitters(Sources.documents(spark, sfDir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (hh10, tHh) = timed(Sketches.heavyHitters(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    results += "heavy_hitters_10x" -> tHh
    checks += "heavy_hitters_closed_form" ->
      (hh10 == baseHh.map { case (t, c) => t -> c * reps })

    // k-core at reps×: every copy family is a reps-clique (hamming 0), and
    // cliques never peel, so the 2-core swallows EVERY simhash node with
    // within-core degree ≥ reps-1 — the adversarial inversion of the base
    // case (sparse graph, small core). Vertex count is closed-form against
    // the nSim node count measured above.
    val (kc10, tKc) = timed(Dedup.kcore(docs)
      .agg(count(lit(1)).as("nv"), min(col("deg")).as("mind")).head())
    results += "kcore_10x" -> tKc
    checks += "kcore_all_nodes_in_core_at_10x" ->
      (kc10.getLong(0) == nSim * reps && kc10.getLong(1) >= (reps - 1).toLong)

    // PR curve at reps×: per-doc scores are identical, so every bin's
    // (n, tp, fp) scales exactly by reps, and the precision/recall doubles
    // are BIT-identical — (a·reps)/(b·reps) is the same correctly-rounded
    // quotient as a/b when a·reps, b·reps are exactly-represented ints
    val baseCurve = DataQuality.prCurve(Sources.documents(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    val (curve10, tCv) = timed(DataQuality.prCurve(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq)
    results += "pr_curve_10x" -> tCv
    checks += "pr_curve_closed_form" ->
      (curve10 == baseCurve.map { case (b, n, tp, fp, p, rc) =>
        (b, n * reps, tp * reps, fp * reps, p, rc) })

    // source checksums at reps×: counts and char volume scale exactly;
    // the XOR fingerprint of 10 identical copies CANCELS to zero (even
    // multiplicity) — the closed form doubles as the documented caveat
    // that an XOR checksum detects content drift, not duplication (n_docs
    // rides along for exactly that reason)
    val baseCk = DataQuality.sourceChecksums(Sources.documents(spark, sfDir))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (ck10, tCk) = timed(DataQuality.sourceChecksums(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap)
    results += "source_checksums_10x" -> tCk
    checks += "source_checksums_closed_form" ->
      (ck10 == baseCk.map { case (s, (n, x, ch)) =>
        s -> ((n * reps, if (reps % 2 == 0) 0L else x, ch * reps))
      })

    // inverted index at reps×: every df multiplies by reps (replica ids
    // are distinct docs), so the indexed vocabulary at 10× is exactly the
    // base tokens whose df lands the scaled band [ceil(5/reps), 500/reps]
    val baseDfs = TextAnalysis.invertedIndex(
      Sources.documents(spark, sfDir), minDf = 1L, maxDf = Long.MaxValue)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (idx10, tIdx) = timed(TextAnalysis.invertedIndex(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap)
    results += "inverted_index_10x" -> tIdx
    checks += "inverted_index_df_closed_form" ->
      (idx10 == baseDfs.filter { case (_, df) =>
        df * reps >= 5L && df * reps <= 500L
      }.map { case (t, df) => t -> df * reps })

    // grouped top-k at reps×: replicas share their base doc's quality, so
    // every returned row's quality equals the base per-source MAX (the
    // 3 lowest-id replicas of the argmax docs win the total order)
    val baseMaxQ = TextAnalysis.topPerSource(Sources.documents(spark, sfDir), k = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val (top10, tTop) = timed(TextAnalysis.topPerSource(docs).collect()
      .map(r => (r.getString(0), r.getDouble(2))))
    results += "top_per_source_10x" -> tTop
    checks += "top_per_source_max_invariant" ->
      (top10.nonEmpty && top10.forall { case (s, q) => q == baseMaxQ(s) })

    // feature hashing at reps×: every replica doc folds to its base doc's
    // exact vector, so each bucket's corpus-wide mass (and the row count)
    // scales exactly by reps — collisions and all
    def fhSums(d: DataFrame): (Long, Seq[Long]) = {
      val fh = TextAnalysis.featureHash(d)
      val r = fh.agg(count(lit(1)).as("rows"),
        (0 until 8).map(i => sum(col(s"f$i")).as(s"s$i")): _*).head()
      (r.getLong(0), (1 to 8).map(r.getLong(_)))
    }
    val baseFh = fhSums(Sources.documents(spark, sfDir))
    val (fh10, tFh) = timed(fhSums(docs))
    results += "feature_hash_10x" -> tFh
    checks += "feature_hash_sums_closed_form" ->
      (fh10._1 == baseFh._1 * reps &&
        fh10._2 == baseFh._2.map(_ * reps))

    // winsorization audit at reps×: replicating the value multiset leaves
    // every discrete order statistic EXACTLY in place (the p-th smallest of
    // 10 interleaved copies is the same value), so thresholds are invariant
    // and the outlier masses scale exactly by reps
    val baseClip = Similarity.embClip(Sources.embeddings(spark, sfDir)
        .select("vec_id", "label", "emb"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    val (clip10, tClip) = timed(Similarity.embClip(emb).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap)
    results += "emb_clip_10x" -> tClip
    checks += "emb_clip_closed_form" ->
      (clip10 == baseClip.map { case (d, (lo, hi, nl, nh)) =>
        d -> ((lo, hi, nl * reps, nh * reps))
      })

    // k-anonymity at reps×: replication changes only doc_id, so the QI
    // class table is invariant with every population ×reps — and the
    // at_risk set recomputes against the SCALED counts (at 10× no base
    // class stays sub-5 unless it was empty, the honest story that
    // re-identifiability risk falls with corpus growth)
    val baseKa = DataQuality.kAnonymity(Sources.documents(spark, sfDir))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    val (ka10, tKa) = timed(DataQuality.kAnonymity(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap)
    results += "kanonymity_10x" -> tKa
    checks += "kanonymity_closed_form" ->
      (ka10 == baseKa.map { case (k, n) =>
        k -> ((n * reps, n * reps < 5L))
      })

    // diversity at reps×: class structure is invariant, so per axis the
    // class count holds, extrema scale exactly by reps, and top_share is
    // bit-identical ((10·max)/(10·N) rounds the same real as max/N)
    val baseDiv = DataQuality.diversity(Sources.documents(spark, sfDir))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    val (div10, tDiv) = timed(DataQuality.diversity(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap)
    results += "diversity_10x" -> tDiv
    checks += "diversity_closed_form" ->
      (div10 == baseDiv.map { case (a, (nc, nd, mx, mn, ts)) =>
        a -> ((nc, nd * reps, mx * reps, mn * reps, ts))
      })

    // session-g event operators at reps× (disjoint users, identical
    // timelines): per-user shapes replicate rows ×reps with identical
    // stats (streaks, trigram p bit-identical via (r·n)/(r·ctx)); the
    // sweep line STACKS — every netted delta multiplies, so each day's
    // peak is exactly ×reps; stickiness's dau/wau both ×reps so the
    // ratio is bit-identical; Lorenz deciles: 1500 users split evenly,
    // so per-decile users/events ×reps with identical shares
    val baseStk = Relational.stickinessOf(eventsBase).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val (stk10, tStk) = timed(Relational.stickinessOf(eventsRep).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap)
    results += "stickiness_10x" -> tStk
    checks += "stickiness_closed_form" ->
      (stk10 == baseStk.map { case (d, (dau, wau, s)) =>
        d -> ((dau * reps, wau * reps, s))
      })

    val baseStrk = Relational.activeStreaksOf(eventsBase).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val (strk10, tStrk) = timed(Relational.activeStreaksOf(eventsRep)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(identity).view.mapValues(_.length).toMap)
    results += "streaks_10x" -> tStrk
    checks += "streaks_closed_form" ->
      (strk10 == baseStrk.map { case (k, n) => k -> n * reps })

    val baseCcy = Relational.peakConcurrencyOf(eventsBase).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (ccy10, tCcy) = timed(Relational.peakConcurrencyOf(eventsRep)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap)
    results += "concurrency_10x" -> tCcy
    checks += "concurrency_stacks_exactly" ->
      (ccy10 == baseCcy.map { case (d, (ni, pk)) =>
        d -> ((ni * reps, pk * reps))
      })

    val baseEtri = Relational.eventTrigramsOf(eventsBase).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val (etri10, tEtri) = timed(Relational.eventTrigramsOf(eventsRep).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap)
    results += "trigrams_10x" -> tEtri
    checks += "trigrams_closed_form" ->
      (etri10 == baseEtri.map { case (k, (n, cx, p)) =>
        k -> ((n * reps, cx * reps, p))
      })

    val basePar = Relational.paretoDecilesOf(eventsBase).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val (par10, tPar) = timed(Relational.paretoDecilesOf(eventsRep).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap)
    results += "pareto_10x" -> tPar
    checks += "pareto_closed_form" ->
      (par10 == basePar.map { case (d, (nu, ne, ce, sh)) =>
        d -> ((nu * reps, ne * reps, ce * reps, sh))
      })

    // Neyman plan at reps×: counts and char mass scale exactly and the
    // variance numerator scales by reps² (v' = (r·n)(r·sxx) − (r·sx)² =
    // r²·v); the weight is the integer sqrt of that, so w' sits in
    // [r·w, r·w + r−1] — the bracket is the closed form (isqrt(r²v) need
    // not equal r·isqrt(v) exactly)
    val baseNy = Curation.neymanAllocation(Sources.documents(spark, sfDir))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (ny10, tNy) = timed(Curation.neymanAllocation(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap)
    results += "neyman_10x" -> tNy
    checks += "neyman_closed_form" ->
      (ny10.keySet == baseNy.keySet && baseNy.forall { case (s, (n, sx, v, w)) =>
        val (n1, sx1, v1, w1) = ny10(s)
        n1 == n * reps && sx1 == sx * reps &&
          v1 == v * reps * reps && w1 >= w * reps && w1 <= w * reps + reps - 1
      })

    // Ingest dedup (q_dedup_stream) at reps×: the replicated corpus keeps
    // the TEXT domain of the base (doc_ids offset, texts identical), so the
    // converged streaming state must hold exactly |base distinct texts|
    // rows — state scales with DISTINCT documents, not stream length — and
    // per content hash: n_copies' = reps · n_copies (every replica re-emits
    // the group), keeper' = base keeper (replica 0 carries the smallest
    // ids). Streamed in 8 files / 2 per trigger so groups span batches.
    val (dsAgree, tDs) = timed {
      val replay = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_scaleproof_dedup_stream").getAbsolutePath
      docs.select(col("doc_id"), col("text")).repartition(8)
        .write.mode("overwrite").parquet(replay)
      val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 2).parquet(replay)
      val streamed = graft.streaming.DedupStream
        .runReplay(stream, "scaleproof_dedup_stream").localCheckpoint()
      val base = Sources.documents(spark, sfDir)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("b_keeper"), count(lit(1)).as("b_n"))
      val joined = streamed.join(base, Seq("h"), "full")
      val nState = streamed.count()
      val nBase = base.count()
      val violations = joined.filter(
        col("keeper").isNull || col("b_keeper").isNull ||
          col("keeper") =!= col("b_keeper") ||
          col("n_copies") =!= col("b_n") * reps).count()
      (nState == nBase && violations == 0L, nState)
    }
    results += "dedup_stream_10x" -> tDs
    checks += "dedup_stream_closed_form" -> dsAgree._1

    // Incremental index upsert (q_ann_upsert) at reps×: bootstrap the
    // persisted index on the % 4 ≠ 3 split of the replicated corpus,
    // upsert the % 4 = 3 delivery, and prove the three closed forms a
    // 100 TB deployment needs: (1) upsert work is batch-proportional —
    // the member rows appended equal |delta| exactly (the upsert pass
    // reads only the delivery; nothing rescans the corpus); (2) the
    // bootstrap books are bit-unchanged by upsert (the artifact stays
    // frozen); (3) upsert ≡ bulk — the merged member table equals one
    // frozen-book assignment pass over everything, row for row, so the
    // served index is invariant under upsert-vs-bulk construction.
    val (upsertAgree, tUpsert) = timed {
      // persistIndex publishes a fresh version subtree, so a leftover
      // artifact from a prior run cannot leak into this one
      val idx = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_scaleproof_upsert").getAbsolutePath
      val base = emb.filter(col("vec_id") % 4 =!= 3)
      val delta = emb.filter(col("vec_id") % 4 === 3)
      Imi.persistIndex(base, idx)
      val books0 = Imi.loadBooks(spark, idx).map(_.map {
        case (cid, cv) => (cid, cv.toSeq) })
      val nBase = spark.read.parquet(Imi.memberDir(spark, idx)).count()
      Imi.upsertIndex(delta, idx)
      val nMerged = spark.read.parquet(Imi.memberDir(spark, idx)).count()
      val booksAfter = Imi.loadBooks(spark, idx).map(_.map {
        case (cid, cv) => (cid, cv.toSeq) })
      val merged = spark.read
        .schema("vec_id LONG, emb ARRAY<DOUBLE>, sub BIGINT, code LONG, scell BIGINT")
        .parquet(Imi.memberDir(spark, idx)).select("vec_id", "scell", "sub")
      val bulk = Imi.memberTable(emb, Imi.loadBooks(spark, idx))
        .select("vec_id", "scell", "sub")
      val mismatches = merged.unionAll(bulk)
        .groupBy("vec_id", "scell", "sub").count()
        .filter(col("count") =!= 2L).count()
      (nBase == base.count() && nMerged - nBase == delta.count(),
        booksAfter == books0, mismatches == 0L)
    }
    results += "ann_upsert_10x" -> tUpsert
    checks += "ann_upsert_batch_proportional" -> upsertAgree._1
    checks += "ann_upsert_books_frozen" -> upsertAgree._2
    checks += "ann_upsert_equals_bulk" -> upsertAgree._3

    // Frozen-index decay at reps× (q_emb_stream_recall's discrimination
    // proof): on the DRIFTED corpus (originals ∪ reversed copies), the
    // index frozen at bootstrap must realize STRICTLY lower near-dup
    // recall than an index retrained on what the corpus has become —
    // i.e. the gauge discriminates, so it is a real reindex trigger.
    // Truth and candidates are sample-restricted (vec_id % 10 — banding
    // and verification are per-vector/per-pair, so sample-restricted
    // chains equal the full chains ∩ sample², the q_lsh_recall_sampled
    // exactness argument); found ⊆ truth by the shared threshold, so
    // recall compares as found counts over one truth denominator.
    val (decay, tDecay) = timed {
      val drifted = Similarity.driftedCorpus(emb).localCheckpoint()
      // the decayed subpopulation is the DRIFTED (reversed) half — the
      // vectors the frozen index never trained on; identical-replica
      // pairs (cos ≈ 1 ⇒ identical bands/cells ⇒ found by ANY index)
      // are excluded so the gauge reads the paraphrase tier, where
      // routing quality actually matters
      // % 2 keeps enough TRUE pairs in the sample (pair survival is
      // quadratic in the row-sampling rate: 37/144 base pairs at sf0.1,
      // each contributing reps² replica combinations)
      val sample = drifted
        .filter(col("vec_id") % 2 === 0 &&
          (col("vec_id") % 10000000L) >= 1000000L)
        .localCheckpoint()
      def nontrivial(pairs: DataFrame): Long =
        pairs.filter(col("cos") < 0.999).count()
      val nTrue = nontrivial(Similarity.neardupCosine(sample))
      def found(bander: DataFrame => DataFrame): Long =
        nontrivial(Similarity.verifyCosCandidates(
          Similarity.embLshCandidatesFrom(bander(sample)), sample, 0.45))
      val nFrozen = found(Similarity.lshStreamBander(emb))
      val nRetrained = found(Similarity.lshStreamBander(drifted))
      (nTrue, nFrozen, nRetrained)
    }
    results += "emb_recall_decay_10x" -> tDecay
    results += "emb_recall_frozen" ->
      (if (decay._1 == 0) 0.0 else decay._2.toDouble / decay._1)
    results += "emb_recall_retrained" ->
      (if (decay._1 == 0) 0.0 else decay._3.toDouble / decay._1)
    checks += "emb_stream_recall_decays_without_reindex" ->
      (decay._1 > 0 && decay._2 < decay._3)

    // Tombstoned deletes at reps×: the logical delete (serve-time
    // anti-join) must make every deleted member unretrievable at volume,
    // and the physical apply (compaction) must rewrite the layout without
    // them, clear the tombstone table, and serve identically.
    val (forgetAgree, tForget) = timed {
      val idx = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_scaleproof_forget").getAbsolutePath
      Imi.persistIndex(emb, idx)
      Imi.deleteFromIndex(emb.filter(col("vec_id") % 7 === 2), idx)
      val deleted = emb.filter(col("vec_id") % 7 === 2)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val logicalTopk = Imi.annImiServed(emb, idx).collect().toSeq
      val logicalClean = !logicalTopk.exists(r => deleted.contains(r.getLong(1)))
      Imi.compactIndex(spark, idx)
      val tombCleared = Imi.pendingTombstoneFileCount(spark, idx) == 0
      val physLeft = spark.read
        .schema("vec_id LONG, emb ARRAY<DOUBLE>, sub BIGINT, code LONG, scell BIGINT")
        .parquet(Imi.memberDir(spark, idx))
        .filter(col("vec_id") % 7 === 2).count()
      val servedSame = Imi.annImiServed(emb, idx).collect().toSeq == logicalTopk
      (logicalClean, tombCleared && physLeft == 0L && servedSame)
    }
    results += "ann_forget_10x" -> tForget
    checks += "ann_forget_logical_excludes_deleted" -> forgetAgree._1
    checks += "ann_forget_compact_applies_physically" -> forgetAgree._2

    // Drift statistic at reps×: an IN-DISTRIBUTION delivery (the corpus
    // replicated — banding is a pure function of the vector value, so
    // every replica assigns identically) must read TVD = 0 EXACTLY — the
    // trigger never false-alarms — while the reversed-copy drift reads a
    // clearly nonzero TVD (0.102 at gate scale on fine cells).
    val (driftVals, tDrift) = timed {
      val base = Sources.embeddings(spark, sfDir)
      val books = Imi.productBooks(base, Imi.imiDims(base)._1)
      def shares(vecs: DataFrame): Map[(Long, Long), Double] = {
        val rows = Imi.memberTable(
            vecs.select(col("vec_id").cast("long"),
              col("emb").cast("array<double>")), books)
          .groupBy("scell", "sub").count()
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        val tot = rows.map(_._2).sum.toDouble
        rows.map { case (k, n) => k -> (n / tot) }.toMap
      }
      def tvd(a: Map[(Long, Long), Double], b: Map[(Long, Long), Double]) =
        (a.keySet ++ b.keySet).toSeq
          .map(k => math.abs(a.getOrElse(k, 0.0) - b.getOrElse(k, 0.0)) / 2.0)
          .sum
      val boot = shares(base)
      val inDist = shares(emb) // reps× replicas: identical assignment
      val rev = shares(base.select(col("vec_id"),
        reverse(col("emb").cast("array<double>")).as("emb")))
      (tvd(boot, inDist), tvd(boot, rev))
    }
    results += "index_drift_10x" -> tDrift
    results += "drift_tvd_in_distribution" -> driftVals._1
    results += "drift_tvd_reversed" -> driftVals._2
    checks += "index_drift_zero_in_distribution" -> (driftVals._1 == 0.0)
    checks += "index_drift_detects_reversal" -> (driftVals._2 > 0.02)

    // CLOSED lifecycle loop at reps× (r12 — trigger → remedy →
    // re-measure, the q_index_lifecycle composition on the stored
    // artifact): bootstrap at reps×, the reversed-drift delivery's TVD
    // SERVED off the artifact must exceed the trigger threshold (the
    // loop fires at scale, not just at gate scale); after the remedy
    // (retrain on the grown corpus, atomic republish) a delivery drawn
    // from the post-drift distribution must read TVD = 0.0 EXACTLY
    // (assignment under the retrained stored books is a pure function of
    // the vector value). Recall recovery at reps× is the sampled decay
    // check above (emb_stream_recall_decays_without_reindex).
    val (lcVals, tLc) = timed {
      val idx = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_scaleproof_lifecycle").getAbsolutePath
      Imi.persistIndex(emb, idx)
      val tvdFrozen = Imi.driftTvd(Imi.indexDriftServed(emb, idx))
        .head().getAs[Double]("tvd")
      val grown = Similarity.driftedCorpus(emb)
      Imi.persistIndex(grown, idx) // retrain + atomic republish
      val tvdAfter = Imi.driftTvd(Imi.indexDriftServedFrom(grown, idx))
        .head().getAs[Double]("tvd")
      (tvdFrozen, tvdAfter)
    }
    results += "index_lifecycle_10x" -> tLc
    results += "lifecycle_tvd_frozen" -> lcVals._1
    results += "lifecycle_tvd_reindexed" -> lcVals._2
    checks += "index_lifecycle_trigger_fires" ->
      (lcVals._1 > IndexLifecycle.TvdThreshold)
    checks += "index_lifecycle_drift_after_reindex_zero" -> (lcVals._2 == 0.0)

    // Manifest at reps× (r12): the health row must read the replicated
    // artifact EXACTLY — n_members = reps × base, the forget backlog
    // (filtered on the base id, so every replica's copy is requested)
    // = reps × base backlog, live = members − backlog. And because
    // replicas are identical VECTORS with distinct ids, every realized
    // cell's occupancy is a multiple of reps (same vector ⇒ same cell
    // under any frozen books) — a sharp structural form for max_cell.
    val (mfVals, tMf) = timed {
      val idx = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_scaleproof_manifest").getAbsolutePath
      Imi.persistIndex(emb, idx)
      Imi.deleteFromIndex(
        emb.filter((col("vec_id") % 10000000L) % 7 === 2), idx)
      val m = Imi.indexManifest(spark, idx).head()
      (m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3), m.getLong(4))
    }
    val mfBase = Sources.embeddings(spark, sfDir)
      .agg(count(lit(1)), count(when(col("vec_id") % 7 === 2, 1))).head()
    val (mfN, mfPend) = (mfBase.getLong(0), mfBase.getLong(1))
    results += "index_manifest_10x" -> tMf
    checks += "manifest_counts_scale_exactly" ->
      (mfVals._1 == reps * mfN && mfVals._3 == reps * mfPend &&
        mfVals._2 == mfVals._1 - mfVals._3)
    checks += "manifest_max_cell_multiple_of_reps" ->
      (mfVals._5 > 0 && mfVals._5 % reps == 0)

    // Cell-state growth under a FROZEN index (the disease
    // EmbDedupStream.CellCap guards): banding is a pure function of the
    // vector VALUE, so replicating the corpus reps× multiplies every
    // (band, cid) occupancy by exactly reps — the screen's keyed state
    // per cell grows linearly with the corpus while the index stands
    // still. Sharp closed form: max occupancy at reps× == reps × base.
    val (occ, tOcc) = timed {
      val frozen = Similarity.lshStreamBander(
        Sources.embeddings(spark, sfDir))
      def maxOcc(vecs: DataFrame): Long =
        frozen(vecs.select(col("vec_id"), col("emb")))
          .groupBy("band", "cid").count().agg(max("count")).head().getLong(0)
      (maxOcc(Sources.embeddings(spark, sfDir)), maxOcc(emb))
    }
    results += "emb_cell_occupancy_10x" -> tOcc
    checks += "emb_cell_occupancy_scales_with_corpus_frozen" ->
      (occ._2 == occ._1 * reps)

    // Composed ingest pipeline at reps×: replicas are exact duplicates, so
    // stage 1 must absorb ALL of them (keeper = the replica-0 copy, whose
    // ids equal the base ids), and the lexical/semantic stages then see
    // exactly the base run's survivor stream — labels restricted to
    // replica-0 ids equal the base pipeline's labels row for row, and
    // every replica-k>0 doc reads 'exact'. The embedding store is the
    // BASE table on both sides (stage-2 survivors carry base ids), so the
    // semantic stage's trained index is held fixed across the comparison.
    val (pipeAgree, tPipe) = timed {
      val baseDocs = Sources.documents(spark, sfDir)
      val baseEmb = Sources.embeddings(spark, sfDir)
      def replayOf(df: DataFrame, tag: String, cols: String): () => DataFrame = {
        val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_scaleproof_pipe_$tag").getAbsolutePath
        df.repartition(4).write.mode("overwrite").parquet(dir)
        () => spark.readStream.schema(cols)
          .option("maxFilesPerTrigger", 1).parquet(dir)
      }
      val docsR = replayOf(docs.select(col("doc_id").cast("long"), col("text")),
        "docs10", "doc_id BIGINT, text STRING")
      val docsB = replayOf(baseDocs.select(col("doc_id").cast("long"), col("text")),
        "docsbase", "doc_id BIGINT, text STRING")
      val embB = replayOf(baseEmb.select(col("vec_id").cast("long"), col("emb")),
        "embbase", "vec_id BIGINT, emb ARRAY<DOUBLE>")
      val labels10 = graft.streaming.IngestPipeline.run(
          docsR(), docsR(), embB(), docs, baseEmb, "scaleproof_pipe10")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val labelsBase = graft.streaming.IngestPipeline.run(
          docsB(), docsB(), embB(), baseDocs, baseEmb, "scaleproof_pipebase")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val replica0 = labels10.filter { case (id, _) => id < 10000000L }
      val replicasExact = labels10.forall {
        case (id, st) => id < 10000000L || st == "exact"
      }
      (replica0 == labelsBase, replicasExact, labels10.size)
    }
    results += "ingest_pipeline_10x" -> tPipe
    checks += "ingest_pipeline_replica0_equals_base" -> pipeAgree._1
    checks += "ingest_pipeline_replicas_all_exact" -> pipeAgree._2

    // ---- round 13: BM25 / ragPack / SQ8 / token drift closed forms ----

    val baseDocsTab = Sources.documents(spark, sfDir)

    // Self-copy scores for the BM25-family closed forms: at reps× the
    // query docs' replicas are CANDIDATES (self-exclusion is by id, and a
    // replica of the query doc is a different id carrying the same text),
    // so the predictions need the score a copy of query q earns against
    // q's own terms — derived driver-side from the base aggregates with
    // the same integer formula (replication-invariant, so the base-(N, S)
    // evaluation equals the 10× value exactly).
    def bm25SelfScores(): (Map[Long, Long], Map[Long, (String, Long)]) = {
      val bg = Retrieval.bigrams(baseDocsTab.select(col("doc_id"), col("text")))
      val tfAll = bg.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dlTab = bg.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val corp = dlTab.agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).head()
      val (nB, sB) = (corp.getLong(0), corp.getLong(1))
      val dfTab = tfAll.groupBy("tok").agg(count(lit(1)).as("df"))
      val qrows = tfAll.filter(col("doc_id") < 5).join(dfTab, "tok")
        .select("doc_id", "tok", "tf", "df").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val dlQ = dlTab.filter(col("doc_id") < 5).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      def idfOf(df: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(nB / df)
      val scores = qrows.groupBy(_._1).map { case (q, rows) =>
        val terms = rows.toSeq
          .filter { case (_, _, _, df) => df * 10 <= nB && idfOf(df) >= 1 }
          .sortBy(_._2).take(6)
        val dl = dlQ(q)
        q -> terms.map { case (_, _, tf, df) =>
          (idfOf(df) * tf * 44L * sB * 1024L) /
            (20L * tf * sB + 6L * sB + 18L * dl * nB)
        }.sum
      }
      val qMeta = baseDocsTab.filter(col("doc_id") < 5)
        .select(col("doc_id"), col("text"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      (scores, qMeta)
    }
    val (selfScores, qMeta) = bm25SelfScores()

    // BM25 at reps×: under the FRACTIONAL df cap the vocabulary and
    // whole-bit idf are invariant ((R·N) div (R·df) = N div df), and the
    // integer contribution is invariant ((R·A) div (R·B) = A div B since
    // numerator and denominator both carry exactly one factor of S or N).
    // So the FULL 10× scored set is the base scored set expanded: every
    // base candidate appears once per replica with the SAME score, ranked
    // by (score desc, doc_id asc). Both sides collected in full —
    // driver-bounded: ≤ nq·qTerms·(N/10)·reps rows.
    val (bm25Agree, tBm25) = timed {
      val all = Int.MaxValue
      val base = Retrieval.bm25TopK(baseDocsTab, k = all).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // fractional df cap: the indexable set is scale-invariant by
      // construction (R·df·den ≤ R·N ⇔ df·den ≤ N) — no cap scaling needed
      val big = Retrieval.bm25TopK(docs, k = all).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val predicted = base.groupBy(_._1).flatMap { case (qid, rows) =>
        val expanded = (for {
          (_, d, sc) <- rows.toSeq
          j <- 0L until reps.toLong
        } yield (qid, j * 10000000L + d, sc)) ++
          (1L until reps.toLong).map(j =>
            (qid, j * 10000000L + qid, selfScores(qid)))
        expanded.sortBy { case (_, d, sc) => (-sc, d) }
          .zipWithIndex.map { case ((q, d, sc), i) => (q, d, sc, i + 1L) }
      }.toSet
      (predicted == big.toSet, base.length, big.length)
    }
    results += "bm25_10x" -> tBm25
    checks += "bm25_scored_set_closed_form" -> bm25Agree._1

    // the persisted lexicon at reps×: stats/df/idf are invariant under the
    // fractional cap ((R·N) div (R·df) = N div df), so building the artifact
    // on the replicated corpus and serving from its pruned posting
    // buckets must equal the SAME closed-form expansion the in-query
    // check predicts (truncated to the serve's k) — binds tokenize →
    // persist → bucket-pruned read → score → rank at 10× volume
    val (lexAgree, tLex) = timed {
      val lex = java.nio.file.Files
        .createTempDirectory("graft_scaleproof_lex").toString
      Retrieval.persistLexicon(docs, lex)
      // r14: the posting-bucket count must RESPOND to the 10× corpus
      // (corpus-scaled partitioning, r13 verdict #5) while the served
      // ranking stays bit-identical — stored count == the pure formula
      // of the counted posting rows, and above the dev-scale floor
      val postingRows = spark.read.parquet(
        Retrieval.lexTableDirForTest(spark, lex, "postings")).count()
      val storedBuckets = spark.read.parquet(
        Retrieval.lexTableDirForTest(spark, lex, "stats"))
        .select("buckets").head().getLong(0)
      val bucketsRespond =
        storedBuckets == Retrieval.postingBucketCount(postingRows) &&
          storedBuckets > 16L
      val served = Retrieval.bm25Served(docs, lex).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // r14: COMPACT the 10× artifact and re-serve — the frozen-stats
      // rewrite (and its bucket re-derivation) must be score-invisible
      // at 10× volume, not just at the gate scale
      Retrieval.compactLexicon(spark, lex)
      val servedCompacted = Retrieval.bm25Served(docs, lex).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val compactInvisible = servedCompacted == served
      val base = Retrieval.bm25TopK(baseDocsTab, k = Int.MaxValue).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val predicted = base.groupBy(_._1).flatMap { case (qid, rows) =>
        val expanded = (for {
          (_, d, sc) <- rows.toSeq
          j <- 0L until reps.toLong
        } yield (j * 10000000L + d, sc)) ++
          (1L until reps.toLong).map(j =>
            (j * 10000000L + qid, selfScores(qid)))
        expanded.sortBy { case (d, sc) => (-sc, d) }
          .take(10)
          .zipWithIndex.map { case ((d, sc), i) => (qid, d, sc, i + 1L) }
      }.toSet
      (predicted == served, bucketsRespond, compactInvisible)
    }
    results += "bm25_served_10x" -> tLex
    checks += "lexicon_artifact_serve_closed_form" -> lexAgree._1
    checks += "lexicon_bucket_count_scales_with_corpus" -> lexAgree._2
    checks += "lexicon_compaction_score_invisible_10x" -> lexAgree._3

    // ragPack at reps×: replicas carry identical text, so the dup
    // collapse must absorb them — the predicted output is the expanded
    // ranking collapsed to first-occurrence-per-text with the running
    // token sum recomputed over survivors. Derived entirely from the base
    // scored set + base texts/token counts (driver-side on the same
    // bounded candidate sets as above).
    val (ragAgree, tRag) = timed {
      val all = Int.MaxValue
      val base = Retrieval.bm25TopK(baseDocsTab, k = all).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val candIds = base.map(_._2).toSet
      val meta = baseDocsTab
        .filter(col("doc_id").isin(candIds.toSeq: _*))
        .select(col("doc_id"), col("text"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      val predicted = base.groupBy(_._1).flatMap { case (qid, rows) =>
        val expanded = ((for {
          (_, d, sc) <- rows.toSeq
          j <- 0L until reps.toLong
        } yield (j * 10000000L + d, d, sc)) ++
          (1L until reps.toLong).map(j =>
            (j * 10000000L + qid, -1L, selfScores(qid)))
          ).sortBy { case (rid, _, sc) => (-sc, rid) }
        val seen = scala.collection.mutable.Set.empty[String]
        var cum = 0L
        expanded.zipWithIndex.flatMap { case ((rid, baseId, _), i) =>
          val (text, nt) = if (baseId == -1L) qMeta(qid) else meta(baseId)
          if (seen.add(text)) {
            cum += nt
            Some((qid, rid, i + 1L, nt, cum, cum <= 256L))
          } else None
        }
      }.toSet
      val big = Retrieval.ragPack(docs, k = all).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5))).toSet
      (predicted == big, big.size)
    }
    results += "ragpack_10x" -> tRag
    checks += "ragpack_replica_collapse_closed_form" -> ragAgree._1

    // hybrid RRF at reps× (r14): both leg rankings expand predictably —
    // bm25 scores are replication-invariant (the closed form above) and
    // brute cosine is value-identical per replica (same arrays, same
    // arithmetic), with the query's own replicas entering the semantic
    // leg at cos = 1.0 and the lexical leg at the driver-derived self
    // score. Predict each leg's 10× top-k driver-side, fuse with the
    // same integer RRF formula, and the 10× hybrid output must match
    // exactly — binds the fusion join + both leg chains at volume.
    val (hybridAgree, tHybrid) = timed {
      val k = 10
      val off = 10000000L
      val baseEmb = Sources.embeddings(spark, sfDir)
      val baseLex = Retrieval.bm25TopK(baseDocsTab, k = Int.MaxValue).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val baseSem = Similarity.annBruteForce(baseEmb, k = Int.MaxValue).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      val qids = baseLex.map(_._1).toSet ++ baseSem.map(_._1).toSet
      val predicted = qids.flatMap { qid =>
        val lexExp = (for {
          (q, d, sc) <- baseLex.toSeq if q == qid
          j <- 0L until reps.toLong
        } yield (j * off + d, sc)) ++
          (1L until reps.toLong).map(j => (j * off + qid, selfScores(qid)))
        val lexRank = lexExp.sortBy { case (id, sc) => (-sc, id) }
          .take(k).zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
        val semExp = (for {
          (q, n, c) <- baseSem.toSeq if q == qid
          j <- 0L until reps.toLong
        } yield (j * off + n, c)) ++
          (1L until reps.toLong).map(j => (j * off + qid, 1.0))
        val semRank = semExp.sortBy { case (id, c) => (-c, id) }
          .take(k).zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
        val fused = (lexRank.keySet ++ semRank.keySet).toSeq.map { id =>
          (id, lexRank.get(id).map(r => 1000000L / (60L + r)).getOrElse(0L) +
            semRank.get(id).map(r => 1000000L / (60L + r)).getOrElse(0L))
        }
        fused.sortBy { case (id, f) => (-f, id) }.take(k).zipWithIndex
          .map { case ((id, f), i) => (qid, id, f, i + 1L) }
      }
      val big = Retrieval.hybridTopK(docs, emb, k = k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      predicted == big
    }
    results += "hybrid_rrf_10x" -> tHybrid
    checks += "hybrid_rrf_fusion_closed_form" -> hybridAgree

    // SQ8 at reps×: replication leaves every per-dimension (min, max)
    // in place, so ranges are invariant and each replica's codes equal
    // its base vector's codes (checked as exact per-dim aggregates).
    val (sq8Agree, tSq8) = timed {
      val baseEmbTab = Sources.embeddings(spark, sfDir)
        .select("vec_id", "label", "emb")
      val baseRg = Sq8.ranges(baseEmbTab).collect()
        .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      val bigRg = Sq8.ranges(emb).collect()
        .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      val baseSums = Sq8.codes(baseEmbTab).groupBy("pos")
        .agg(count(lit(1)).as("n"), sum("code").as("sc")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val bigSums = Sq8.codes(emb).groupBy("pos")
        .agg(count(lit(1)).as("n"), sum("code").as("sc")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val rangesOk = bigRg == baseRg
      val codesOk = bigSums == baseSums.map { case (p, (n, sc)) =>
        p -> ((n * reps, sc * reps))
      }
      // full serving ranking: base pairs expand with invariant integer
      // d2; the query's OWN replicas (nid = qid + j·1e7, j ≥ 1) join the
      // candidate set at d2 = 0 — the closed form merges them in
      val all = Int.MaxValue
      val basePairs = Sq8.topK(baseEmbTab, k = all).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val predicted = basePairs.groupBy(_._1).flatMap { case (qid, rows) =>
        val expanded = (for {
          (_, n, d2) <- rows.toSeq
          j <- 0L until reps.toLong
        } yield (j * 10000000L + n, d2)) ++
          (1L until reps.toLong).map(j => (j * 10000000L + qid, 0L))
        expanded.sortBy { case (n, d2) => (d2, n) }
          .zipWithIndex.map { case ((n, d2), i) => (qid, n, d2, i + 1L) }
      }.toSet
      val bigPairs = Sq8.topK(emb, k = all).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      (rangesOk, codesOk, predicted == bigPairs)
    }
    results += "sq8_10x" -> tSq8
    checks += "sq8_ranges_invariant" -> sq8Agree._1
    checks += "sq8_codes_scale_exactly" -> sq8Agree._2
    checks += "sq8_full_ranking_closed_form" -> sq8Agree._3

    // streaming drift at reps×: the keyed (source, token) count fold is a
    // pure commutative sum, so draining the REPLICATED replay must equal
    // the batch monitor on the replicated corpus row for row — the
    // large-volume route equivalence the ingest family proves for every
    // streaming twin
    val (driftStreamAgree, tDriftStream) = timed {
      val replay = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_scaleproof_drift10").getAbsolutePath
      docs.select(col("doc_id").cast("long"), col("text"), col("source"))
        .repartition(8).write.mode("overwrite").parquet(replay)
      val stream = spark.readStream
        .schema("doc_id BIGINT, text STRING, source STRING")
        .option("maxFilesPerTrigger", 1).parquet(replay)
      val streamed = graft.streaming.DriftStream
        .tokenDriftReplay(stream, "scaleproof_drift10").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = DataQuality.tokenDriftBySource(docs).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      streamed == batch
    }
    results += "token_drift_stream_10x" -> tDriftStream
    checks += "token_drift_stream_equals_batch_at_10x" -> driftStreamAgree

    // SQ8 served from a 10×-persisted artifact: ranges are min/max —
    // invariant under replication — so stored codes replicate and the
    // artifact serve must equal the closed-form expansion of the BASE
    // full ranking (query self-copies joining at d2 = 0), truncated to
    // the serve's k. Binds training → persist → artifact scan → rank at
    // 10× volume in one check.
    val (sq8ServedAgree, tSq8Served) = timed {
      val idx = java.nio.file.Files
        .createTempDirectory("graft_scaleproof_sq8").toString
      Imi.persistIndex(emb, idx, withSq8 = true)
      val served = Imi.annSq8Served(emb, idx).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val basePairs = Sq8.topK(Sources.embeddings(spark, sfDir)
          .select("vec_id", "label", "emb"), k = Int.MaxValue).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val predicted = basePairs.groupBy(_._1).flatMap { case (qid, rows) =>
        val expanded = (for {
          (_, n, d2) <- rows.toSeq
          j <- 0L until reps.toLong
        } yield (j * 10000000L + n, d2)) ++
          (1L until reps.toLong).map(j => (j * 10000000L + qid, 0L))
        expanded.sortBy { case (n, d2) => (d2, n) }
          .take(10)
          .zipWithIndex.map { case ((n, d2), i) => (qid, n, d2, i + 1L) }
      }.toSet
      predicted == served
    }
    results += "sq8_served_10x" -> tSq8Served
    checks += "sq8_artifact_serve_closed_form" -> sq8ServedAgree

    // token drift at reps×: every count carries one factor of reps, so
    // the integer numerator scales by reps² exactly and the tvd double
    // recomputes from the scaled int64s (replayed here op for op).
    val (tokDriftAgree, tTokDrift) = timed {
      val base = DataQuality.tokenDriftBySource(baseDocsTab).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val sAllBase = base.values.map(_._1).sum
      val big = DataQuality.tokenDriftBySource(docs).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val r2 = reps.toLong * reps
      (big == base.map { case (src, (n, num, _)) =>
        val (n10, num10) = (n * reps, num * r2)
        src -> ((n10, num10,
          num10.toDouble / (2.0 * (sAllBase * reps).toDouble * n10.toDouble)))
      }, big.size)
    }
    results += "token_drift_10x" -> tTokDrift
    checks += "token_drift_closed_form" -> tokDriftAgree._1

    val total = results.values.sum
    def fmt(d: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    val rj = results.map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString(",")
    val cj = checks.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"metric":"scale_proof","sf_equiv":"sf${0.1 * reps}","reps":$reps,""" +
      s""""n_points":$nPts,"n_exact_outliers":$nOut,"n_lsh_pairs":${lsh._2},""" +
      s""""n_ngram_pairs":$nJac,"n_cc_vertices":${ccDriver.size},""" +
      s""""n_neardup_exact":$exactPairs,"n_neardup_blocked":$blockedPairs,""" +
      s""""times":{$rj},"checks":{$cj},"total_s":${fmt(total)}}""")
    spark.stop()
    if (checks.exists(!_._2)) sys.exit(1)
  }
}
