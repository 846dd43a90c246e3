package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Imi
import graft.sources.Sources

/** Round-10 hardening: the IMI fine-cell budget (KSideCap — assignment
  * compute stops growing with n), the ADC-ranked within-cell serving
  * shape the cap requires, the persisted train/serve loop (stored books
  * = pinned books; served ranking = self-contained retrain), and the
  * SortedInterCount analysis-time type contract. */
class Round10Spec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"
  private val pinDir = "/root/testdata/sf0.01"

  test("dimsFor caps the sqrt-split: folds/row stops growing past the budget") {
    // below the cap: the uncapped sqrt-split (gate-scale sizing unchanged)
    assert(Imi.dimsFor(16L) === ((4, 4)))
    assert(Imi.dimsFor(63L) === ((8, 8)))
    // at/past the cap: kSide pins at the budget while raw k keeps growing
    // 100x — per-row assignment work (2*kSide half-dim folds) is constant
    val cap = Imi.KSideCap
    assert(Imi.dimsFor(cap.toLong * cap * 4) === ((cap, cap)))
    assert(Imi.dimsFor(cap.toLong * cap * 400) === ((cap, cap)))
    // the parameterized budget ScaleProof binds on a corpus this machine
    // can hold behaves identically
    assert(Imi.dimsFor(5000L, 16) === ((16, 16)))
    assert(Imi.dimsFor(500000L, 16) === ((16, 16)))
    // and the uncapped sizing at those k would have kept growing
    assert(Imi.dimsFor(500000L)._1 > 10 * 16)
    // the default budget keeps the packed (c1,c2) key collision-free
    // unconditionally
    assert(Imi.KSideCap < (1 << 20))
  }

  test("persisted index books equal the pinned sf0.01 books") {
    val emb = Sources.embeddings(spark, pinDir)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_r10_idx").toString
    val trained = Imi.persistIndex(emb, idx)
    val reloaded = Imi.loadBooks(spark, idx)
    // the parquet round trip is lossless: reloaded == trained, exactly
    assert(reloaded.length === trained.length)
    trained.zip(reloaded).foreach { case (t, r) =>
      assert(t.map(_._1) === r.map(_._1))
      t.zip(r).foreach { case ((_, tv), (_, rv)) =>
        assert(tv.toSeq === rv.toSeq)
      }
    }
    // and the stored artifact IS the pinned oracle state: any drift in
    // sizing/training/persistence breaks this before the hash gates do
    val pins = Seq(ImiPins.b1K4I2, ImiPins.b2K4I2)
    assert(reloaded.length === pins.length)
    reloaded.zip(pins).foreach { case (r, p) =>
      assert(r.map(_._1) === p.map(_._1))
      r.zip(p).foreach { case ((_, rv), (_, pv)) =>
        assert(rv.toSeq === pv)
      }
    }
    // the compressed tier's stored state pins the same way: reloaded PQ
    // sub-books equal the PqPins literals the q_pq_* oracles replay
    val pqReloaded = Imi.loadPqBooks(spark, idx)
    val pqPins = PqPins.embeddingsM8K16I2
    assert(pqReloaded.length === pqPins.length)
    pqReloaded.zip(pqPins.map(_._2)).foreach { case (r, p) =>
      assert(r.map(_._1) === p.map(_._1))
      r.zip(p).foreach { case ((_, rv), (_, pv)) =>
        assert(rv.toSeq === pv)
      }
    }
  }

  test("serving the stored packed codes matches the in-query ADC retrain") {
    val emb = Sources.embeddings(spark, dir)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_r10_adc_serve").toString
    Imi.persistIndex(emb, idx)
    val served = Imi.annImiPqServed(emb, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)), r.getLong(3)))
    val retrain = Imi.annImiPq(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)), r.getLong(3)))
    // raw-bits compare: the stored-code reconstruction must be the SAME
    // doubles the in-query encode produces, not approximately so
    assert(served.toSeq === retrain.toSeq)
  }

  test("serving the stored artifact matches the self-contained retrain") {
    val emb = Sources.embeddings(spark, dir)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_r10_serve").toString
    Imi.persistIndex(emb, idx)
    val served = Imi.annImiServed(emb, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val retrain = Imi.annImi(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(served.toSeq === retrain.toSeq)
    // the members layout is scell-partitioned parquet (directory-level
    // pruning for a probe's cells)
    val memberDirs = new java.io.File(Imi.memberDir(spark, idx)).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(memberDirs.nonEmpty && memberDirs.forall(_.startsWith("scell=")))
  }

  test("ADC-ranked IMI serves a full top-k under a binding cap") {
    val emb = Sources.embeddings(spark, dir)
    // cap=2: 4 fine cells for a corpus whose raw sizing wants 8+ — the
    // capped regime (occupancy grows, assignment folds pinned at 2*2)
    val capped = Imi.annImiPq(emb, nQueries = 3, k = 5, kSideCap = 2)
      .collect()
    assert(capped.length === 15)
    val byQ = capped.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getLong(3)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      // cosine against a PQ reconstruction is a real cosine: in [-1, 1]
      rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12))
    }
    // uncapped ADC variant agrees with the oracle-gated default params
    val dflt = Imi.annImiPq(emb).collect()
    assert(dflt.nonEmpty && dflt.forall(_.getLong(3) <= 10L))
  }

  test("substringDedup catches a shared run that straddles the fixed window grid") {
    import spark.implicits._
    // "a b c d" sits at start 2 in doc 0 and start 1 in doc 1: the
    // width-4/stride-2 grid of lineDedup windows neither doc at those
    // offsets identically (no common window), so the fixed grid removes
    // NOTHING — while the stride-1 variable-length detector must remove
    // exactly the 4 shared tokens from each doc, with max_span = 4.
    val docs = Seq(
      (0L, "x1 x2 a b c d y1 y2"),
      (1L, "z1 a b c d w1 w2 w3")).toDF("doc_id", "text")
    val fixed = graft.operators.TextAnalysis.lineDedup(docs)
      .agg(sum("n_removed")).head().getLong(0)
    assert(fixed === 0L)
    val md = java.security.MessageDigest.getInstance("MD5")
    val got = graft.operators.TextAnalysis.substringDedup(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(0L) === ((8L, 4L, 4L,
      graft.functions.Hashes.h60Jvm(md, "x1 x2 y1 y2"))))
    assert(got(1L) === ((8L, 4L, 4L,
      graft.functions.Hashes.h60Jvm(md, "z1 w1 w2 w3"))))
    // and overlapping repeats MERGE into one variable-length span:
    // "a b c d e" shared => 5 covered positions from two hot grams
    val docs2 = Seq(
      (0L, "a b c d e t1 t2 t3"),
      (1L, "s1 s2 s3 a b c d e")).toDF("doc_id", "text")
    val got2 = graft.operators.TextAnalysis.substringDedup(docs2).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    assert(got2(0L) === ((5L, 5L)))
    assert(got2(1L) === ((5L, 5L)))
    // degenerate inputs: empty corpus and sub-minLen docs survive whole
    val short = Seq((7L, "just three toks")).toDF("doc_id", "text")
    val s = graft.operators.TextAnalysis.substringDedup(short).head()
    assert(s.getLong(1) === 3L && s.getLong(2) === 0L && s.getLong(3) === 0L)
    assert(graft.operators.TextAnalysis
      .substringDedup(docs.filter(lit(false))).count() === 0L)
  }

  test("L1Dist equals the interpreted aggregate(zip_with(abs)) fold") {
    import spark.implicits._
    val rows = Seq(
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),
      (Array(0L, 5L, 0L), Array(5L, 0L, 5L)),
      (Array(Long.MaxValue / 2, 0L), Array(0L, Long.MaxValue / 2)),
      (Array(-3L, 4L), Array(4L, -3L)),
      (Array.empty[Long], Array(1L))).toDF("a", "b")
    rows.select(
        graft.functions.L1Dist.l1Dist(col("a"), col("b")).as("k"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => abs(x - y)),
          lit(0L), (acc, v) => acc + v).as("e"))
      .collect()
      // zip_with of unequal lengths pads with null -> null sum; the kernel
      // folds the common prefix instead — compare only equal-length rows
      .filter(!_.isNullAt(1))
      .foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // the prefilter it implements is admissible end to end: the staged
    // edit-distance operator's output on the fixture corpus is identical
    // to a prefilter-free brute recomputation
    val docs = Sources.documents(spark, dir)
    val staged = graft.operators.Dedup.editDistancePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val d = docs.filter(col("text").isNotNull && length(col("text")) <= 200)
      .select(col("doc_id").cast("long").as("id"), lower(col("text")).as("t"),
        length(col("text")).cast("long").as("len"))
    val brute = d.as("x").join(d.as("y"),
        col("x.id") < col("y.id") &&
          abs(col("x.len") - col("y.len")) <= 16)
      .select(col("x.id"), col("y.id"),
        levenshtein(col("x.t"), col("y.t")).cast("long").as("lev"))
      .filter(col("lev") <= 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(staged.toSet === brute.toSet)
  }

  test("SortedInterCount rejects non-array<bigint> inputs at analysis time") {
    import spark.implicits._
    val df = Seq((Array(1, 2, 3), Array(2, 3, 4))).toDF("a", "b")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.SortedInterCount
        .sortedInterCount(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<bigint>"))
  }

  test("docSignatures emits strictly increasing hs (sorted AND distinct)") {
    import spark.implicits._
    val docs = graft.operators.Dedup.docSignatures(
      Sources.documents(spark, dir), h = 16, k = 9)
    val bad = docs.select(col("hs")).as[Array[Long]].collect()
      .count(a => a.indices.drop(1).exists(i => a(i) <= a(i - 1)))
    assert(bad === 0, "every hs must be strictly increasing")
    // and c is exactly |hs| — the unconditional contract the
    // SortedInterCount merge and every hash-keyed oracle twin count
    val cBad = docs.filter(col("c") =!= size(col("hs"))).count()
    assert(cBad === 0L)
  }

  test("streaming dedup state converges to the batch groupBy under cross-batch duplicates") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[(Long, String)]
    val df = ms.toDF().select(col("_1").as("doc_id"), col("_2").as("text"))
    val q = graft.streaming.DedupStream.groupStream(df).writeStream
      .queryName("t_dedup_stream").outputMode("update").format("memory").start()
    // duplicate group "aaa" spans all three micro-batches; keeper arrives
    // LAST (id 1 in batch 3), so a first-arrival-wins bug would keep 7
    ms.addData((7L, "aaa"), (3L, "bbb"))
    q.processAllAvailable()
    ms.addData((9L, "aaa"), (4L, "ccc"), (5L, "bbb"))
    q.processAllAvailable()
    ms.addData((1L, "aaa"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_dedup_stream")
      .groupBy("h")
      .agg(max_by(struct(col("n_copies"), col("keeper")), col("n_copies")).as("s"))
      .select(col("h"), col("s.keeper"), col("s.n_copies"))
      .as[(String, Long, Long)].collect().toSet
    val batch = Seq((7L, "aaa"), (3L, "bbb"), (9L, "aaa"), (4L, "ccc"),
        (5L, "bbb"), (1L, "aaa")).toDF("doc_id", "text")
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === batch)
    assert(got.exists { case (_, keeper, n) => keeper == 1L && n == 3L },
      "the aaa group must keep id 1 with multiplicity 3")
  }

  test("streaming near-dup screen equals the batch LSH under cross-batch arrival") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // two near-identical docs long enough to shingle (k=9), arriving in
    // DIFFERENT micro-batches, plus an unrelated doc: the pair must surface
    // from bucket state, not within-batch collision
    val d1 = "the quick brown fox jumps over the lazy dog again and again"
    val d2 = "the quick brown fox jumps over the lazy dog again and again!"
    val d3 = "completely unrelated content with nothing shared at all here"
    val ms = MemoryStream[(Long, String)]
    val df = ms.toDF().select(col("_1").as("doc_id"), col("_2").as("text"))
    val q = graft.streaming.DedupStream.candidateStream(df).writeStream
      .queryName("t_neardup_stream").outputMode("update").format("memory").start()
    ms.addData((10L, d1), (30L, d3))
    q.processAllAvailable()
    ms.addData((20L, d2))
    q.processAllAvailable()
    q.stop()
    val cands = spark.table("t_neardup_stream").distinct()
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((10L, 20L)),
      s"cross-batch near-dup pair must surface from bucket state, got $cands")
    assert(!cands.exists(p => p._1 == 30L || p._2 == 30L),
      s"unrelated doc must not pair, got $cands")

    // gate-scale end-to-end: the full replay screen equals the batch LSH
    val docs = Sources.documents(spark, dir)
    val batchPairs = graft.operators.Dedup.minhashLshPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val replay = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_neardup_spec").getAbsolutePath
    docs.select(col("doc_id").cast("long"), col("text"))
      .repartition(4).write.mode("overwrite").parquet(replay)
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(replay)
    val streamed = graft.streaming.DedupStream
      .nearDupReplay(stream, docs, "t_neardup_replay")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed === batchPairs,
      "ingest screen must converge to the batch minhashLshPairs exactly")
  }

  test("streaming embedding screen equals the batch sign-LSH chain") {
    val emb = Sources.embeddings(spark, dir)
    val batch = graft.operators.Similarity.embLshPairs(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val replay = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_emb_stream_spec").getAbsolutePath
    emb.select(col("vec_id").cast("long"), col("emb"))
      .repartition(4).write.mode("overwrite").parquet(replay)
    val stream = spark.readStream.schema("vec_id BIGINT, emb ARRAY<DOUBLE>")
      .option("maxFilesPerTrigger", 1).parquet(replay)
    val streamed = graft.streaming.EmbDedupStream
      .nearDupReplay(stream, emb, "t_emb_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed === batch,
      "embedding ingest screen must converge to the batch embLshPairs exactly")
    assert(batch.nonEmpty, "fixture must exercise at least one pair")
  }

  test("streaming embedding screen matches the batch chain on the HIERARCHICAL route") {
    import graft.operators.{Imi, Similarity}
    // force the product-index route at gate scale: rawK past IvfMaxCells
    val emb = Sources.embeddings(spark, pinDir)
    val rawK = 4097L
    val planes = Similarity.signPlanes(
      Similarity.LshBands * Similarity.LshBandBits, 64)
    val batchBands = Imi.lshBandRowsHier(
      emb.select(col("vec_id"), col("emb")), rawK, planes,
      Similarity.LshBands, Similarity.LshBandBits,
      pSuper = 2, pSub = math.max(1, Similarity.LshCellProbes / 2))
    val batchCands = Similarity.embLshCandidatesFrom(batchBands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchCands.nonEmpty,
      "fixture must produce hierarchical-route candidates or the test is vacuous")
    val replay = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_emb_hier_spec").getAbsolutePath
    emb.select(col("vec_id").cast("long"), col("emb"))
      .repartition(4).write.mode("overwrite").parquet(replay)
    val stream = spark.readStream.schema("vec_id BIGINT, emb ARRAY<DOUBLE>")
      .option("maxFilesPerTrigger", 1).parquet(replay)
    val bander = Similarity.lshStreamBander(emb, rawKOverride = Some(rawK))
    val q = graft.streaming.EmbDedupStream.candidateStream(stream, bander)
      .writeStream.queryName("t_emb_hier").outputMode("update")
      .format("memory").start()
    try q.processAllAvailable() finally q.stop()
    import spark.implicits._
    val streamed = spark.table("t_emb_hier").distinct()
      .as[(Long, Long)].collect().toSet
    assert(streamed === batchCands,
      "hierarchical-route ingest screen must emit the batch candidate set exactly")
  }

  test("statestore read-back of the drained checkpoint equals the batch groupBy") {
    import spark.implicits._
    val replay = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_state_audit_spec").getAbsolutePath
    val docs = Sources.documents(spark, dir)
    docs.select(col("doc_id").cast("long"), col("text"))
      .repartition(4).write.mode("overwrite").parquet(replay)
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(replay)
    val audited = graft.streaming.DedupStream.stateAudit(stream)
      .as[(String, Long, Long)].collect().toSeq
    val batch = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy("h").as[(String, Long, Long)].collect().toSeq
    assert(audited === batch,
      "the checkpoint's state store must read back as the converged dedup state")
  }

  test("ingest dedup state survives a checkpointed restart (incl. RocksDB)") {
    import org.apache.spark.sql.streaming.Trigger
    for (provider <- Seq(None,
        Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))) {
      val base = java.nio.file.Files.createTempDirectory("graft_dedup_ckpt").toString
      val (srcDir, ckpt) = (s"$base/src", s"$base/ckpt")
      val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]
      def runOnce(): Unit = {
        provider.foreach(
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
        val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
          .parquet(srcDir)
        val q = graft.streaming.DedupStream.groupStream(stream).writeStream
          .outputMode("update")
          .foreachBatch {
            (ds: org.apache.spark.sql.Dataset[graft.streaming.DedupStream.HashGroup],
             _: Long) =>
              ds.collect().foreach(g => emitted.add((g.h, g.keeper, g.n_copies)))
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        try {
          q.awaitTermination(120000)
          assert(!q.isActive, "AvailableNow query must drain and stop")
        } finally {
          // a timed-out drain must not leak an active query (and its
          // providerClass conf interaction) into later tests (r10 ADVICE)
          if (q.isActive) q.stop()
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
      import spark.implicits._
      // run 1: first copy of "aaa" (id 7) lands, then the query STOPS
      Seq((7L, "aaa"), (3L, "bbb")).toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(srcDir)
      runOnce()
      // run 2: fresh query object, same checkpoint; the second copy (id 9)
      // must merge into RESTORED state — keeper stays 7, count reads 2
      Seq((9L, "aaa")).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(srcDir)
      emitted.clear() // only run-2 emissions witness the restored state
      runOnce()
      val h_aaa = Seq(("x", "aaa")).toDF("k", "text")
        .select(md5(col("text"))).head().getString(0)
      val run2 = emitted.toArray(Array.empty[(String, Long, Long)]).toSet
      assert(run2.contains((h_aaa, 7L, 2L)),
        s"provider=$provider: restored state must fold the post-restart copy " +
          s"onto the pre-stop keeper/count, got $run2")
    }
  }
}
