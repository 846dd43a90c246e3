package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level (IMI-style) hierarchical coarse quantizer — the documented
  * continuation of [[Similarity.ivfK]] past [[Similarity.IvfMaxCells]]:
  * a single-level quantizer sized at k = ⌈n/32⌉ needs k per-row center
  * folds at assignment time, so once the cap clamps k the occupancy
  * disease returns (cells grow with n again). The hierarchical shape
  * keeps BOTH properties at any corpus size: k1 = ⌈√k⌉ super-cells, each
  * with its own k2 = ⌈k/k1⌉ sub-codebook, so total cells ≈ k grows with
  * n (fixed target occupancy) while per-row assignment cost is k1 + k2 ≈
  * 2√k folds instead of k — at n = 2·10¹¹ (100 TB of 64-dim vectors)
  * that is ~1.6·10⁵ folds per row instead of 6·10⁹. This is the inverted
  * multi-index / coarse-residual shape (Babenko & Lempitsky '12) with
  * plain (non-residual) sub-codebooks, consistent with [[Similarity]]'s
  * cosine metric at both levels.
  *
  * Determinism (full DuckDB hash gates, [[graft.ImiPins]]): level-1
  * centers are [[KMeans.trainCenters]] (k-lowest-vec_id init, exact
  * quantized-integer means); level-2 books are trained by the same
  * discipline FUSED across all super-cells in one pass per Lloyd round —
  * init for super-cell s is its k2 lowest-vec_id members (sub ids
  * 0..k2−1 in that order), each round one [[CenterKernels]] assignment
  * pass plus ONE hash aggregation over (scell, sub, dim) quantized sums.
  * Driver state: k1·k2·d doubles per round — ~k·d, same as the flat
  * quantizer it replaces. All folds/orderings are the
  * [[CenterKernels]] bit-equality contract, so the sf0.01 training
  * output pins as oracle literals and the gates verify sizing + both
  * training levels + assignment + probe end to end. */
object Imi {

  private val Q30 = 1073741824.0 // 2^30 — the shared centroid quantization

  private[graft] val ImiTrainIters = 2

  /** (k1, k2): √-split of the occupancy-derived total cell count
    * ([[Similarity.ivfRawK]] — the same UNCAPPED sizing the flat quantizer
    * clamps, so the two can never drift). At sf0.01 (n=500): k=16 →
    * (4, 4); at sf0.1 (n=2000): k=63 → (8, 8). */
  private[graft] def imiDims(emb: DataFrame): (Int, Int) =
    dimsFor(Similarity.ivfRawK(emb))

  /** The √-split itself, for callers that already paid the row-count job. */
  private[graft] def dimsFor(k: Long): (Int, Int) = {
    val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
    val k2 = ((k + k1 - 1) / k1).toInt
    (k1, k2)
  }

  /** Level-1 assignment (vec_id, emb, scell), checkpointed once per chain
    * — reused by sub-training rounds AND the member table. */
  private def superAssign(emb: DataFrame,
      superCenters: Seq[(Long, Array[Double])]): DataFrame =
    CenterKernels.assignByCos(emb.select(col("vec_id"), col("emb")), superCenters)
      .select(col("vec_id"), col("emb"), col("cid").as("scell"))
      .localCheckpoint()

  /** Fused per-super-cell Lloyd: all k1 sub-codebooks trained together —
    * one broadcast-books assignment pass + one (scell, sub, dim)
    * aggregation per round, never a per-cell job loop. Returns
    * scell → ordered (sub, center) book; cells with fewer than k2 members
    * get shorter books, empty cells none. */
  private[graft] def trainSubBooks(asn: DataFrame, k2: Int,
      iters: Int): Map[Long, Array[(Long, Array[Double])]] = {
    val spark = asn.sparkSession
    import spark.implicits._
    val wInit = Window.partitionBy("scell").orderBy("vec_id")
    var books: Map[Long, Array[(Long, Array[Double])]] = asn
      .withColumn("rn", row_number().over(wInit))
      .filter(col("rn") <= k2)
      .select(col("scell"), (col("rn") - 1).cast("long").as("sub"), col("emb"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1)
      .map { case (sc, rs) => sc -> rs.sortBy(_._2).map(t => (t._2, t._3)) }
    var round = 1
    while (round < iters) {
      val bc = spark.sparkContext.broadcast(
        books.map { case (sc, b) => sc -> CenterKernels.prep(b.toSeq) })
      val assigned = asn
        .select(col("vec_id").cast("long"), col("emb").cast("array<double>"),
          col("scell").cast("long"))
        .as[(Long, Array[Double], Long)]
        .mapPartitions { it =>
          val bks = bc.value
          it.map { case (_, v, sc) =>
            val (sub, _) = CenterKernels.nearestByCos(v, bks(sc))
            (sc, sub, v)
          }
        }
        .toDF("scell", "sub", "emb")
      val rows = assigned
        .select(col("scell"), col("sub"), posexplode(col("emb")).as(Seq("dim", "e")))
        .groupBy("scell", "sub", "dim")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("e") * lit(Q30)).cast("long")).as("qsum"))
        .select(col("scell"), col("sub"), col("dim"),
          ((col("qsum").cast("double") / col("n").cast("double")) / lit(Q30))
            .as("c"))
        .collect()
      books = rows.groupBy(_.getLong(0)).map { case (sc, rs) =>
        sc -> rs.groupBy(_.getLong(1)).map { case (sub, ds) =>
          val arr = new Array[Double](ds.map(_.getInt(2)).max + 1)
          ds.foreach(d => arr(d.getInt(2)) = d.getDouble(3))
          (sub, arr)
        }.toArray.sortBy(_._1)
      }
      round += 1
    }
    books
  }

  /** The trained two-level index of a chain: (superCenters, subBooks,
    * level-1 assignment). */
  private def trained(emb: DataFrame):
      (Seq[(Long, Array[Double])], Map[Long, Array[(Long, Array[Double])]], DataFrame) = {
    val (k1, k2) = imiDims(emb)
    trainedFor(emb, k1, k2)
  }

  private def trainedFor(emb: DataFrame, k1: Int, k2: Int):
      (Seq[(Long, Array[Double])], Map[Long, Array[(Long, Array[Double])]], DataFrame) = {
    val superCenters = KMeans.trainCenters(emb, k1, Similarity.IvfTrainIters)
    val asn = superAssign(emb, superCenters)
    (superCenters, trainSubBooks(asn, k2, ImiTrainIters), asn)
  }

  /** Member table (vec_id, emb, scell, sub): one more broadcast-books
    * kernel pass over the level-1 assignment. */
  private def members(asn: DataFrame,
      books: Map[Long, Array[(Long, Array[Double])]]): DataFrame = {
    val spark = asn.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      books.map { case (sc, b) => sc -> CenterKernels.prep(b.toSeq) })
    asn.select(col("vec_id").cast("long"), col("emb").cast("array<double>"),
        col("scell").cast("long"))
      .as[(Long, Array[Double], Long)]
      .mapPartitions { it =>
        val bks = bc.value
        it.map { case (id, v, sc) =>
          val (sub, _) = CenterKernels.nearestByCos(v, bks(sc))
          (id, v, sc, sub)
        }
      }
      .toDF("vec_id", "emb", "scell", "sub")
  }

  /** IMI ANN: a query probes its `nprobeSuper` nearest super-cells, and
    * within each its `nprobeSub` nearest sub-cells — candidate set =
    * members of ≤ nprobeSuper·nprobeSub fine cells out of ~k, ranked by
    * exact cosine. Output (qid, nid, rank) — the [[Similarity.annIvf]]
    * contract on the hierarchical index. */
  def annImi(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
             nprobeSuper: Int = 2, nprobeSub: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (superCenters, books, asn) = trained(emb)
    val cand = members(asn, books)
      .select(col("vec_id").as("nid"), col("emb").as("nv"),
        col("scell"), col("sub"))
    val bcSup = spark.sparkContext.broadcast(CenterKernels.prep(superCenters))
    val bcBooks = spark.sparkContext.broadcast(
      books.map { case (sc, b) => sc -> CenterKernels.prep(b.toSeq) })
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").cast("long"), col("emb").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val sup = bcSup.value
        val bks = bcBooks.value
        it.flatMap { case (qid, qv) =>
          CenterKernels.topCellsByCos(qv, sup, nprobeSuper).iterator.flatMap { sc =>
            // a super-cell can train empty (no members at level 1) — it
            // then has no book and contributes no probes
            bks.get(sc).iterator.flatMap { book =>
              CenterKernels.topCellsByCos(qv, book, nprobeSub).iterator
                .map(sub => (qid, qv, sc, sub))
            }
          }
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
    * [[Similarity.annRecall]] contract on the hierarchical index, folding
    * both loss sources (super-cell and sub-cell probe misses) together.
    * Output (qid, hits, recall). */
  def imiRecall(emb: DataFrame, nQueries: Int = 5, k: Int = 10,
                nprobeSuper: Int = 2, nprobeSub: Int = 2): DataFrame = {
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
  private[graft] def imiCells(emb: DataFrame): DataFrame = {
    val (_, books, asn) = trained(emb)
    members(asn, books).select("vec_id", "scell", "sub")
  }

  /** Fine-cell id packing for consumers that need ONE growing cell key
    * (the banded-LSH blocking past the flat cap): scell·2²⁰ + sub —
    * collision-free while k2 < 2²⁰ (k2 = ⌈√k⌉ reaches 2²⁰ only past
    * k = 10¹², far beyond any real corpus; the require keeps it honest). */
  private[graft] def packCid(scell: Long, sub: Long, k2: Int): Long = {
    require(k2 < (1 << 20), s"fine-cell packing overflow: k2=$k2")
    (scell << 20) | sub
  }

  /** Hierarchical banded-LSH blocking table (vec_id, cid, band, bv) —
    * [[CenterKernels.lshBandRows]] with the flat cell probe replaced by
    * the fine-cell multi-probe (`pSuper` nearest super-cells × `pSub`
    * nearest subs within each, cid = [[packCid]] so the key domain keeps
    * growing ~k where the flat cap would freeze it). One fused kernel
    * pass: each vector computes its band values ONCE (not per probed
    * cell) and its probe set against the broadcast two-level index.
    * `rawK` is the caller's already-computed [[Similarity.ivfRawK]] — no
    * second row-count job. */
  private[graft] def lshBandRowsHier(emb: DataFrame, rawK: Long,
      planes: Seq[Array[Double]], bands: Int, bandBits: Int,
      pSuper: Int, pSub: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (k1, k2) = dimsFor(rawK)
    val (superCenters, books, _) = trainedFor(emb, k1, k2)
    val bcSup = spark.sparkContext.broadcast(CenterKernels.prep(superCenters))
    val bcBooks = spark.sparkContext.broadcast(
      books.map { case (sc, b) => sc -> CenterKernels.prep(b.toSeq) })
    val bcP = spark.sparkContext.broadcast(planes.toArray)
    emb.select(col("vec_id").cast("long"), col("emb").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val sup = bcSup.value
        val bks = bcBooks.value
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
          CenterKernels.topCellsByCos(v, sup, pSuper).iterator.flatMap { sc =>
            // a super-cell can train empty (no members at level 1) — it
            // then has no book and contributes no probe cells
            bks.get(sc).iterator.flatMap { book =>
              CenterKernels.topCellsByCos(v, book, pSub).iterator
                .flatMap { sub =>
                  val cid = packCid(sc, sub, k2)
                  (0 until bands).iterator.map(b2 => (id, cid, b2, bvs(b2)))
                }
            }
          }
        }
      }
      .toDF("vec_id", "cid", "band", "bv")
  }

  /** Index-structure report (scell, n_subs, n_members): per super-cell,
    * its trained sub-codebook size and member count — the occupancy view
    * an IMI deployment monitors (a fat super-cell means the √-split needs
    * retraining). |k1| rows. */
  def imiStats(emb: DataFrame): DataFrame = {
    val (_, books, asn) = trained(emb)
    val spark = emb.sparkSession
    val bookSizes = spark.createDataFrame(
      books.toSeq.sortBy(_._1).map { case (sc, b) => (sc, b.length.toLong) })
      .toDF("scell", "n_subs")
    asn.groupBy("scell").agg(count(lit(1)).as("n_members"))
      .join(bookSizes, Seq("scell"))
      .select(col("scell"), col("n_subs"), col("n_members"))
      .orderBy("scell")
  }
}
