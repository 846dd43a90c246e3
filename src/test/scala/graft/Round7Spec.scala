package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, Sketches, TextAnalysis}
import graft.sources.Sources

/** Round-7 widening: the mergeable histogram quantile sketch, the
  * pointer-jumped distributed connected-components loop, sparse TF-IDF
  * cosine pairs, and the product-quantization ANN family. */
class Round7Spec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"
  private val qs = Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("histogram sketch shards re-merge to the whole-corpus quantiles") {
    val ev = Sources.events(spark, dir).localCheckpoint()
    val whole = Sketches.quantileSketch(ev, "event_type", "value")
    // shard by event parity, build a sketch per shard, merge by summation —
    // the associativity contract that makes the state mergeable at all
    val shardA = Sketches.histogramSketch(
      ev.filter(col("event_id") % 2 === 0), "event_type", "value", 5.0)
    val shardB = Sketches.histogramSketch(
      ev.filter(col("event_id") % 2 === 1), "event_type", "value", 5.0)
    val merged = shardA.unionAll(shardB)
      .groupBy("event_type", "bucket").agg(sum(col("cnt")).as("cnt"))
    val viaMerge =
      Sketches.quantilesFromSketch(merged, "event_type", 5.0, qs)
    assert(rows(viaMerge) === rows(whole))
  }

  test("sketch quantile brackets the exact discrete percentile by one bucket") {
    val ev = Sources.events(spark, dir)
    val sk = Sketches.quantileSketch(ev, "event_type", "value")
      .select("event_type", "p50").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (g, v) =>
      val est = sk(g)
      // upper-edge convention: the estimate is the upper edge of the bucket
      // holding the q-th value — strictly above it, by at most one width
      assert(est > v && est <= v + 5.0, s"group $g: est $est vs exact $v")
    }
  }

  test("tf-idf cosine pairs: whole-bit idf, boilerplate zeroed, exact threshold") {
    import spark.implicits._
    // N=4. "common" is in every doc: N div df = 1 → 0 bits → excluded.
    // alpha/beta df=2 → 1 bit; gamma df=1 → 2 bits. tf multiplies: doc 1's
    // doubled alpha weighs 2. Vectors: d1=(alpha 2, beta 1) ss=5,
    // d2=(alpha 1, beta 1, gamma 2) ss=6, d3/d4 share no scored token with
    // anyone. Only pair: (1,2) num=3, (2·3)²=36 ≥ 5·6 → cos=3/√30 kept.
    val docs = Seq(
      (1L, "alpha alpha beta common"),
      (2L, "alpha beta gamma common"),
      (3L, "delta epsilon common"),
      (4L, "zeta eta common")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfCosinePairs(docs).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 2L, 3L)))
    assert(r.getDouble(3) === 3.0 / math.sqrt(30.0))
  }

  test("fused one-pass PQ training equals per-subspace Lloyd training") {
    import org.apache.spark.sql.functions.slice
    val emb = Sources.embeddings(spark, dir)
    val fused = Similarity.pqCodebooks(emb)
    val separate = (0 until 8).map { s =>
      graft.operators.KMeans.trainCenters(
        emb.select(col("vec_id"), slice(col("emb"), s * 8 + 1, 8).as("emb")),
        16, 2)
    }
    assert(fused.map(_.map { case (c, v) => (c, v.toSeq) })
      === separate.map(_.map { case (c, v) => (c, v.toSeq) }))
  }

  test("pq: packed codes are 8 nibbles; adc equals a driver-side recompute") {
    val emb = Sources.embeddings(spark, dir).localCheckpoint()
    val packed = Similarity.pqPackedCodes(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed.size === emb.count())
    assert(packed.values.forall(c => c >= 0L && c < (1L << 32)))

    // independent driver-side replay of encode + reconstruct + ADC: unpack
    // each candidate's nibbles, look the sub-centroids up in the trained
    // books, and fold sq-diffs in index order — must equal the engine's
    // SqDiffSum doubles BITWISE, proving the map-lookup reconstruction
    // and the packed codes describe the same index
    val books = Similarity.pqCodebooks(emb).map(_.toMap)
    val vecs = emb.select("vec_id", "emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def adc(qv: Array[Double], code: Long): Double = {
      var s = 0.0
      for (sub <- 0 until 8) {
        val cv = books(sub)((code >> (4 * sub)) & 15L)
        var i = 0
        while (i < 8) {
          val d = qv(sub * 8 + i) - cv(i); s += d * d; i += 1
        }
      }
      s
    }
    val got = Similarity.pqAdcTopk(emb).collect()
    assert(got.length === 50) // 5 queries x top-10
    got.foreach { r =>
      val (qid, nid, a, rank) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(nid != qid && rank >= 1L && rank <= 10L)
      assert(a === adc(vecs(qid), packed(nid)), s"adc mismatch q$qid n$nid")
    }

    val rec = Similarity.pqRecall(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rec.length === 5)
    rec.foreach { case (_, hits, recall) =>
      assert(hits >= 0L && hits <= 10L && recall === hits / 10.0)
    }

    // ivfpq: same driver-side replay for the composed index — each ranked
    // cos must equal the cosine of the query against the candidate's
    // reconstruction, folded in index order
    def reconOf(code: Long): Array[Double] =
      (0 until 8).flatMap(sub => books(sub)((code >> (4 * sub)) & 15L)).toArray
    def cosOf(q: Array[Double], r: Array[Double]): Double = {
      var dot = 0.0; var nq = 0.0; var nr = 0.0; var i = 0
      while (i < 64) { dot += q(i) * r(i); nq += q(i) * q(i); nr += r(i) * r(i); i += 1 }
      dot / (math.sqrt(nq) * math.sqrt(nr))
    }
    val comboRec = Similarity.ivfPqRecall(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(comboRec.length === 5)
    comboRec.foreach { case (_, hits, recall) =>
      assert(hits >= 0L && hits <= 10L && recall === hits / 10.0)
    }

    val ivfpq = Similarity.annIvfPq(emb).collect()
    assert(ivfpq.length === 50)
    ivfpq.foreach { r =>
      val (qid, nid, c, rank) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(nid != qid && rank >= 1L && rank <= 10L)
      assert(c === cosOf(vecs(qid), reconOf(packed(nid))),
        s"ivfpq cos mismatch q$qid n$nid")
    }
  }

  private def cc(edges: Seq[(Long, Long)], driverThreshold: Long,
                 maxRounds: Int = 100): Set[(Long, Long)] = {
    import spark.implicits._
    Dedup.connectedComponents(edges.toDF("a", "b"), maxRounds,
        driverThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("distributed CC equals the driver union-find on adversarial shapes") {
    val chain = (0L until 200L).map(i => (i, i + 1))
    val star = (1L to 50L).map(i => (0L, i))
    val clique = for (i <- 0L until 12L; j <- i + 1 until 12L) yield (i, j)
    // two components + id gaps + reversed pair order
    val split = Seq((5L, 3L), (3L, 9L), (100L, 102L), (101L, 102L))
    for (g <- Seq(chain, star, clique, split)) {
      val viaDriver = cc(g, driverThreshold = 4_000_000L)
      val viaDistributed = cc(g, driverThreshold = 1L)
      assert(viaDistributed === viaDriver)
    }
  }

  test("pointer jumping closes a 5000-edge chain well under its diameter") {
    // neighbor-only min-label propagation needs one round per hop (5000);
    // the jumped loop must converge within 30 — convergence inside that
    // budget (no IllegalStateException) plus the closed-form answer IS the
    // O(log diameter) evidence
    val chain = (0L until 5000L).map(i => (i, i + 1))
    val labels = cc(chain, driverThreshold = 1L, maxRounds = 30)
    assert(labels.size === 5001 && labels.forall(_._2 == 0L))
  }
}
