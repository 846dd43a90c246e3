package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Broadcast-centers assignment kernels — the scale form of every
  * "nearest trained center" pass ([[KMeans.assign]], [[Similarity]] cell
  * assignment / probe / banded-LSH blocking).
  *
  * Why not plan literals (r8): with the coarse quantizer sized to the
  * corpus (k = ⌈n/32⌉, [[Similarity.ivfK]]), the literal-center projection
  * that was fine at k=16 grew to k=63 centers × 64 dims (+128 LSH planes in
  * the banded chain) in ONE generated method — past the JVM's 64 KB limit,
  * so whole-stage codegen bailed and the stage ran interpreted: measured
  * 9–16 s per banded-LSH query at sf0.1 on 2 000 rows, pure
  * compile-attempt-and-fallback overhead. Constant-array literals
  * ([[graft.functions.ArrLit]]) shrank the tree but not under the limit.
  * The fix is the shape a 1000-executor cluster needs anyway, since k
  * grows with n and plan literals cannot: centers ride an explicit
  * `SparkContext.broadcast` (k·d doubles — tiny at any corpus size) and
  * each partition scans them in a tight primitive loop via
  * `mapPartitions`. One narrow pass, zero exchanges, no codegen cliff at
  * any k.
  *
  * Bit-equality contract (what keeps every pinned-center DuckDB oracle
  * unchanged): [[dot]]/[[sqDiffSum]] are the identical strict
  * left-to-right min-length folds as the codegen'd
  * [[graft.functions.DotProduct]]/[[graft.functions.SqDiffSum]]
  * expressions; cosine divides in the same `dot / (sqrt·sqrt)` order as
  * [[Similarity.cosine]]; argmin/sort replicate Spark's struct ordering on
  * (double, cid) — [[cmpD]] is SQLOrderingUtil.compareDoubles semantics
  * (NaN greatest and self-equal, -0.0 = 0.0) with the cid asc tie-break.
  * Every double that leaves a kernel is the same bit pattern the literal
  * projection produced. */
private[graft] object CenterKernels {

  /** Strict left-to-right min-length dot fold —
    * [[graft.functions.DotProduct.nullSafeEval]] exactly. */
  def dot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Strict left-to-right min-length Σ(aᵢ−bᵢ)² fold —
    * [[graft.functions.SqDiffSum.nullSafeEval]] exactly. */
  def sqDiffSum(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Spark SQL double ordering (SQLOrderingUtil.compareDoubles): total
    * order with NaN greatest and equal to itself, and -0.0 = 0.0 — the
    * ordering `array_min`/`array_sort` apply to the (nc, cid) structs the
    * kernels replace. */
  def cmpD(a: Double, b: Double): Int =
    if (a < b) -1
    else if (a > b) 1
    else {
      val an = java.lang.Double.isNaN(a)
      val bn = java.lang.Double.isNaN(b)
      if (an == bn) 0 else if (an) 1 else -1
    }

  /** A prepared center: id, vector, and its precomputed norm
    * √(dot(c,c)) — the same fold the literal form evaluated per row, so
    * hoisting it is bit-free. */
  final case class C(cid: Long, vec: Array[Double], norm: Double)

  def prep(centers: Seq[(Long, Array[Double])]): Array[C] =
    centers.map { case (cid, cv) => C(cid, cv, math.sqrt(dot(cv, cv))) }.toArray

  /** argmin over (−cos, cid) — `array_min(centerStructs(...))` semantics.
    * Returns (cid, −cos) so callers can recover ccos by exact negation. */
  def nearestByCos(v: Array[Double], cs: Array[C]): (Long, Double) = {
    require(cs.nonEmpty, "argmin over an empty center set (untrained codebook?)")
    val nv = math.sqrt(dot(v, v))
    var bestNc = 0.0
    var bestCid = 0L
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      val nc = -(dot(v, c.vec) / (nv * c.norm))
      if (i == 0 || {
            val d = cmpD(nc, bestNc)
            d < 0 || (d == 0 && c.cid < bestCid)
          }) { bestNc = nc; bestCid = c.cid }
      i += 1
    }
    (bestCid, bestNc)
  }

  /** The `p` nearest cells by cosine, in (−cos, cid) ascending order —
    * `slice(array_sort(centerStructs(...)), 1, p)` semantics. */
  def topCellsByCos(v: Array[Double], cs: Array[C], p: Int): Array[Long] = {
    val nv = math.sqrt(dot(v, v))
    val scored = new Array[(Double, Long)](cs.length)
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      scored(i) = (-(dot(v, c.vec) / (nv * c.norm)), c.cid)
      i += 1
    }
    java.util.Arrays.sort(scored, new java.util.Comparator[(Double, Long)] {
      def compare(x: (Double, Long), y: (Double, Long)): Int = {
        val d = cmpD(x._1, y._1)
        if (d != 0) d else java.lang.Long.compare(x._2, y._2)
      }
    })
    scored.take(math.min(p, scored.length)).map(_._2)
  }

  private val dCidOrder = new java.util.Comparator[(Double, Long)] {
    def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val d = cmpD(x._1, y._1)
      if (d != 0) d else java.lang.Long.compare(x._2, y._2)
    }
  }

  /** All cells scored by squared L2, in (d, cid) ascending order — the
    * [[nearestByL2]] metric under the same total order ([[cmpD]] then
    * cid asc), as a sorted list (the product-IMI half-space scan). */
  def scoredByL2(v: Array[Double],
                 cs: Array[(Long, Array[Double])]): Array[(Double, Long)] = {
    val scored = new Array[(Double, Long)](cs.length)
    var i = 0
    while (i < cs.length) {
      scored(i) = (sqDiffSum(v, cs(i)._2), cs(i)._1)
      i += 1
    }
    java.util.Arrays.sort(scored, dCidOrder)
    scored
  }

  /** The `p` nearest cells by squared L2, in (d, cid) ascending order —
    * the [[topCellsByCos]] contract on the [[nearestByL2]] metric. */
  def topCellsByL2(v: Array[Double], cs: Array[(Long, Array[Double])],
                   p: Int): Array[Long] =
    scoredByL2(v, cs).take(math.min(p, cs.length)).map(_._2)

  /** The `t` joint-nearest product fine cells (c1, c2) by d1+d2 over two
    * sorted half-space scans — the multi-sequence algorithm of the
    * inverted multi-index (Babenko & Lempitsky '12): because
    * d1(v,c1) + d2(v,c2) = ‖v − (c1⊕c2)‖², this ranks the kSide² virtual
    * product centers by FULL-dimension distance while only ever touching
    * a staircase frontier of the (i, j) grid — O(t log t) pops after the
    * two kSide-fold scans, never kSide² work. Tie handling matches the
    * oracle's global `ORDER BY d, c1, c2`: the walk keeps popping while
    * the frontier minimum still EQUALS the t-th smallest sum (grid
    * monotonicity guarantees no undiscovered cell can beat a frontier
    * cell), then the collected plateau sorts under the full (d, c1, c2)
    * order. Exact-double sum ties across distinct trained cells are
    * astronomically rare on real data, but the gate contract is equality,
    * not "almost always". */
  def topFineCells(s1: Array[(Double, Long)], s2: Array[(Double, Long)],
                   t: Int): Array[(Long, Long)] = {
    if (s1.isEmpty || s2.isEmpty || t <= 0) return Array.empty
    // min-heap over frontier cells by sum (ties by grid position — the
    // final sort applies the contract order)
    val ord = new Ordering[(Double, Int, Int)] {
      def compare(x: (Double, Int, Int), y: (Double, Int, Int)): Int = {
        val d = cmpD(x._1, y._1)
        if (d != 0) d
        else {
          val c = Integer.compare(x._2, y._2)
          if (c != 0) c else Integer.compare(x._3, y._3)
        }
      }
    }
    val pq = scala.collection.mutable.PriorityQueue.empty[(Double, Int, Int)](ord.reverse)
    val seen = scala.collection.mutable.HashSet.empty[Long]
    def push(i: Int, j: Int): Unit =
      if (i < s1.length && j < s2.length && seen.add(i.toLong * s2.length + j))
        pq.enqueue((s1(i)._1 + s2(j)._1, i, j))
    push(0, 0)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long, Long)]
    var cutoff = Double.NaN // the t-th smallest popped sum (NaN = cmpD-greatest)
    while (pq.nonEmpty && (out.length < t || cmpD(pq.head._1, cutoff) == 0)) {
      val (sum, i, j) = pq.dequeue()
      out += ((sum, s1(i)._2, s2(j)._2))
      if (out.length == t) cutoff = sum
      push(i + 1, j)
      push(i, j + 1)
    }
    out.sortInPlace()(new Ordering[(Double, Long, Long)] {
      def compare(x: (Double, Long, Long), y: (Double, Long, Long)): Int = {
        val d = cmpD(x._1, y._1)
        if (d != 0) d
        else {
          val c = java.lang.Long.compare(x._2, y._2)
          if (c != 0) c else java.lang.Long.compare(x._3, y._3)
        }
      }
    })
    out.take(t).map(c => (c._2, c._3)).toArray
  }

  /** argmin over (d, cid) with d = Σ(vᵢ−cᵢ)² —
    * `array_min(struct(sqDiffSum, cid))` semantics. Returns (cid, d). */
  def nearestByL2(v: Array[Double], cs: Array[(Long, Array[Double])]): (Long, Double) = {
    require(cs.nonEmpty, "argmin over an empty center set (untrained codebook?)")
    var bestD = 0.0
    var bestCid = 0L
    var i = 0
    while (i < cs.length) {
      val d = sqDiffSum(v, cs(i)._2)
      if (i == 0 || {
            val c = cmpD(d, bestD)
            c < 0 || (c == 0 && cs(i)._1 < bestCid)
          }) { bestD = d; bestCid = cs(i)._1 }
      i += 1
    }
    (bestCid, bestD)
  }

  /** (vec_id, emb, cid, ccos): nearest-by-cosine cell assignment of a
    * (vec_id, emb) table against broadcast centers — one narrow
    * mapPartitions pass, zero exchanges. */
  def assignByCos(vecs: DataFrame, centers: Seq[(Long, Array[Double])]): DataFrame = {
    val spark = vecs.sparkSession
    val bc = spark.sparkContext.broadcast(prep(centers))
    import spark.implicits._
    vecs.select(col("vec_id").cast("long"), col("emb").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          val (cid, nc) = nearestByCos(v, cs)
          (id, v, cid, -nc)
        }
      }
      .toDF("vec_id", "emb", "cid", "ccos")
  }

  /** (vec_id, emb, cid, d): nearest-by-squared-L2 assignment —
    * [[KMeans.assign]]'s kernel. */
  def assignByL2(vecs: DataFrame, centers: Seq[(Long, Array[Double])]): DataFrame = {
    val spark = vecs.sparkSession
    val bc = spark.sparkContext.broadcast(
      centers.map { case (cid, cv) => (cid, cv) }.toArray)
    import spark.implicits._
    vecs.select(col("vec_id").cast("long"), col("emb").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          val (cid, d) = nearestByL2(v, cs)
          (id, v, cid, d)
        }
      }
      .toDF("vec_id", "emb", "cid", "d")
  }

  /** (id, emb, cid) × p rows: each input row exploded to its `p` nearest
    * cells — the IVF multi-probe table ([[Similarity.annIvf]]'s query
    * probes, the banded-LSH chain's cell blocking). */
  def probeCells(vecs: DataFrame, centers: Seq[(Long, Array[Double])],
                 p: Int): DataFrame = {
    val spark = vecs.sparkSession
    val bc = spark.sparkContext.broadcast(prep(centers))
    import spark.implicits._
    vecs.select(col("vec_id").cast("long"), col("emb").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (id, v) =>
          topCellsByCos(v, cs, p).iterator.map(cid => (id, v, cid))
        }
      }
      .toDF("vec_id", "emb", "cid")
  }

  /** The banded-LSH blocking table (vec_id, cid, band, bv): per vector,
    * its `p` nearest coarse cells × one 8-bit sign band value per band
    * (bit j of band b is [⟨v, plane(b·bits+j)⟩ ≥ 0]). Folds and cell
    * order identical to the literal-plane/center projection it replaces;
    * output is p·bands rows per vector, never wider. */
  def lshBandRows(vecs: DataFrame, centers: Seq[(Long, Array[Double])],
                  planes: Seq[Array[Double]], bands: Int, bandBits: Int,
                  p: Int): DataFrame = {
    val spark = vecs.sparkSession
    val bcC = spark.sparkContext.broadcast(prep(centers))
    val bcP = spark.sparkContext.broadcast(planes.toArray)
    import spark.implicits._
    vecs.select(col("vec_id").cast("long"), col("emb").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cs = bcC.value
        val ps = bcP.value
        it.flatMap { case (id, v) =>
          val cells = topCellsByCos(v, cs, p)
          val bvs = new Array[Long](bands)
          var b = 0
          while (b < bands) {
            var bv = 0L
            var j = 0
            while (j < bandBits) {
              if (dot(v, ps(b * bandBits + j)) >= 0.0) bv |= (1L << j)
              j += 1
            }
            bvs(b) = bv
            b += 1
          }
          for (cid <- cells.iterator; b2 <- (0 until bands).iterator)
            yield (id, cid, b2, bvs(b2))
        }
      }
      .toDF("vec_id", "cid", "band", "bv")
  }
}
