package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Imi, Similarity}
import graft.sources.Sources

/** Round-11 hardening: the incremental ANN-index upsert (stored-book
  * assignment, append-only members, upsert ≡ bulk invariance), the
  * semantic ingest screen's cell-state cap (loud overflow + never binds
  * at contract parameters), the in-stream verified emission (carving
  * invariance of the verified set), and the frozen-index recall-decay
  * gauge's contracts. */
class Round11Spec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"
  private val pinDir = "/root/testdata/sf0.01"

  // ---- incremental upsert into the persisted index ----

  test("upsert appends exactly the delta, leaves the stored books bit-unchanged") {
    import spark.implicits._
    val emb = Sources.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") % 4 =!= 3)
    val delta = emb.filter(col("vec_id") % 4 === 3)
    val idx = java.nio.file.Files.createTempDirectory("graft_r11_upsert").toString
    Imi.persistIndex(base, idx)
    def bookState() = Imi.loadBooks(spark, idx).map(_.map {
      case (cid, cv) => (cid, cv.toSeq)
    })
    def pqState() = Imi.loadPqBooks(spark, idx).map(_.map {
      case (cid, cv) => (cid, cv.toSeq)
    })
    val (books0, pq0) = (bookState(), pqState())
    val before = spark.read.parquet(Imi.memberDir(spark, idx)).count()
    Imi.upsertIndex(delta, idx)
    // upsert work is the delta's assignment pass: rows appended == |delta|
    val after = spark.read.parquet(Imi.memberDir(spark, idx)).count()
    assert(before === base.count())
    assert(after - before === delta.count())
    // the bootstrap artifact stays frozen: books and PQ sub-books unchanged
    assert(bookState() === books0)
    assert(pqState() === pq0)
  }

  test("upsert == bulk: merged members equal one frozen-book pass; carving-invariant") {
    import spark.implicits._
    val emb = Sources.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") % 4 =!= 3)
    val delta = emb.filter(col("vec_id") % 4 === 3)
    val idxA = java.nio.file.Files.createTempDirectory("graft_r11_upA").toString
    val idxB = java.nio.file.Files.createTempDirectory("graft_r11_upB").toString
    // A: one-delivery upsert; B: the same delta carved into two deliveries
    Imi.persistIndex(base, idxA)
    Imi.upsertIndex(delta, idxA)
    Imi.persistIndex(base, idxB)
    Imi.upsertIndex(delta.filter(col("vec_id") % 8 === 3), idxB)
    Imi.upsertIndex(delta.filter(col("vec_id") % 8 === 7), idxB)
    def members(p: String) = spark.read
      .schema("vec_id LONG, emb ARRAY<DOUBLE>, sub BIGINT, code LONG, scell BIGINT")
      .parquet(Imi.memberDir(spark, p))
      .select(col("vec_id"), col("scell"), col("sub"), col("code"))
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    val (mA, mB) = (members(idxA), members(idxB))
    assert(mA === mB, "delivery carving must not change the merged member table")
    // ... and both equal ONE bulk assignment of everything under the SAME
    // frozen books — per-row assignment under frozen books is a pure
    // function, which is the invariance q_ann_upsert's oracle replays
    val books = Imi.loadBooks(spark, idxA)
    val bulk = Imi.memberTable(emb, books)
      .select(col("vec_id"), col("scell"), col("sub"))
      .as[(Long, Long, Long)].collect().toSet
    assert(mA.map(t => (t._1, t._2, t._3)) === bulk)
    // the served top-k reads the merged artifact identically
    val servedA = Imi.annImiServed(emb, idxA).collect().toSeq
    val servedB = Imi.annImiServed(emb, idxB).collect().toSeq
    assert(servedA === servedB)
    // the compressed tier serves the upserted codes the same way
    val pqA = Imi.annImiPqServed(emb, idxA).collect().toSeq
    val pqB = Imi.annImiPqServed(emb, idxB).collect().toSeq
    assert(pqA === pqB)
  }

  test("compaction shrinks the upserted file set without changing a served row") {
    val emb = Sources.embeddings(spark, dir)
    val idx = java.nio.file.Files.createTempDirectory("graft_r11_compact").toString
    Imi.persistIndex(emb.filter(col("vec_id") % 4 =!= 3), idx)
    Imi.upsertIndex(emb.filter(col("vec_id") % 12 === 3), idx)
    Imi.upsertIndex(emb.filter(col("vec_id") % 12 === 7), idx)
    Imi.upsertIndex(emb.filter(col("vec_id") % 12 === 11), idx)
    def parquetFiles(): Long = java.nio.file.Files
      .walk(java.nio.file.Paths.get(Imi.memberDir(spark, idx)))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val servedBefore = Imi.annImiServed(emb, idx).collect().toSeq
    val filesBefore = parquetFiles()
    Imi.compactIndex(spark, idx)
    val filesAfter = parquetFiles()
    // four write passes collapse into one clustered file set ...
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file set ($filesBefore -> $filesAfter)")
    // ... and the served index is row-identical (the q_ann_compact gate's
    // invariance, asserted here on both tiers)
    assert(Imi.annImiServed(emb, idx).collect().toSeq === servedBefore)
  }

  test("streaming per-batch upserts converge to the one-delivery upsert") {
    import spark.implicits._
    val emb = Sources.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") % 4 =!= 3)
    val delta = emb.filter(col("vec_id") % 4 === 3)
    val idxS = java.nio.file.Files.createTempDirectory("graft_r11_upstream").toString
    val idxO = java.nio.file.Files.createTempDirectory("graft_r11_oneshot").toString
    Imi.persistIndex(base, idxS)
    Imi.persistIndex(base, idxO)
    // the delta carved into 4 micro-batches (1 file per trigger)
    val replay = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_r11_upstream_replay").getAbsolutePath
    delta.select(col("vec_id").cast("long"), col("emb"))
      .repartition(4).write.mode("overwrite").parquet(replay)
    val stream = spark.readStream.schema("vec_id BIGINT, emb ARRAY<DOUBLE>")
      .option("maxFilesPerTrigger", 1).parquet(replay)
    graft.streaming.IndexUpsertStream.run(stream, idxS)
    Imi.upsertIndex(delta, idxO)
    def members(p: String) = spark.read
      .schema("vec_id LONG, emb ARRAY<DOUBLE>, sub BIGINT, code LONG, scell BIGINT")
      .parquet(Imi.memberDir(spark, p))
      .select(col("vec_id"), col("scell"), col("sub"), col("code"))
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(members(idxS) === members(idxO),
      "micro-batch carving must not change the merged member table")
    assert(Imi.annImiServed(emb, idxS).collect().toSeq ===
      Imi.annImiServed(emb, idxO).collect().toSeq)
  }

  test("tombstoned deletes vanish from both serving tiers; compaction applies them physically") {
    import spark.implicits._
    val emb = Sources.embeddings(spark, dir)
    val idx = java.nio.file.Files.createTempDirectory("graft_r11_forget").toString
    Imi.persistIndex(emb, idx)
    Imi.deleteFromIndex(emb.filter(col("vec_id") % 7 === 2), idx)
    val deleted = emb.filter(col("vec_id") % 7 === 2)
      .select(col("vec_id")).as[Long].collect().toSet
    def servedNids(): Set[Long] =
      Imi.annImiServed(emb, idx).select("nid").as[Long].collect().toSet
    def servedPqNids(): Set[Long] =
      Imi.annImiPqServed(emb, idx).select("nid").as[Long].collect().toSet
    val (exactBefore, pqBefore) = (servedNids(), servedPqNids())
    assert(exactBefore.intersect(deleted).isEmpty,
      "logically deleted members must never be retrievable (exact tier)")
    assert(pqBefore.intersect(deleted).isEmpty,
      "logically deleted members must never be retrievable (ADC tier)")
    val exactTopk = Imi.annImiServed(emb, idx).collect().toSeq
    // compaction applies tombstones physically: the member table no
    // longer contains them, the tombstone table is gone, and serving is
    // row-identical to the logical view
    Imi.compactIndex(spark, idx)
    assert(Imi.pendingTombstoneFileCount(spark, idx) === 0,
      "compaction must clear the applied tombstone table")
    val physIds = spark.read
      .schema("vec_id LONG, emb ARRAY<DOUBLE>, sub BIGINT, code LONG, scell BIGINT")
      .parquet(Imi.memberDir(spark, idx)).select("vec_id").as[Long].collect().toSet
    assert(physIds.intersect(deleted).isEmpty,
      "compaction must rewrite the layout without the deleted members")
    assert(Imi.annImiServed(emb, idx).collect().toSeq === exactTopk)
  }

  test("upsert into an untrained index fails loudly") {
    val emb = Sources.embeddings(spark, dir)
    val idx = java.nio.file.Files.createTempDirectory("graft_r11_upEmpty").toString
    Imi.persistIndex(emb.filter(col("vec_id") < 0), idx) // empty bootstrap
    val e = intercept[IllegalArgumentException] {
      Imi.upsertIndex(emb.filter(col("vec_id") % 4 === 3), idx)
    }
    assert(e.getMessage.contains("bootstrap"))
  }

  // ---- semantic ingest screen: cell-state cap ----

  test("emb ingest cell state overflows LOUDLY past the cap, naming the remedy") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // a bander that routes EVERYTHING into one (band, cid) cell — the
    // degenerate frozen index a 100x-grown corpus effectively produces
    val oneCell: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.select(col("vec_id").cast("long"),
        lit(0L).as("cid"), lit(0).as("band"), lit(0L).as("bv"))
    val ms = MemoryStream[(Long, Seq[Double])]
    val df = ms.toDF().select(col("_1").as("vec_id"), col("_2").as("emb"))
    val q = graft.streaming.EmbDedupStream
      .candidateStream(df, oneCell, cellCap = 3).writeStream
      .queryName("t_r11_cellcap").outputMode("update").format("memory").start()
    ms.addData((1L, Seq(1.0)), (2L, Seq(1.0)))
    q.processAllAvailable()
    ms.addData((3L, Seq(1.0)), (4L, Seq(1.0))) // 2+2 > cap=3
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    try {
      val msg = e.getCause.getMessage
      assert(msg.contains("cell overflow") && msg.contains("reindex"),
        s"overflow must be loud and name the remedy, got: $msg")
    } finally if (q.isActive) q.stop()
    spark.catalog.dropTempView("t_r11_cellcap")
  }

  test("the cap never binds at contract parameters at gate scale") {
    val emb = Sources.embeddings(spark, pinDir)
    // max (band, cid) occupancy of the batch band table = the screen's
    // final cell state (residents are exactly the banded rows)
    val maxOcc = Similarity.lshStreamBander(emb)(
        emb.select(col("vec_id"), col("emb")))
      .groupBy("band", "cid").count()
      .agg(max("count")).head().getLong(0)
    assert(maxOcc <= graft.streaming.EmbDedupStream.CellCap / 4,
      s"gate-scale occupancy $maxOcc must clear the cap with headroom")
  }

  // ---- in-stream verified emission ----

  test("verified in-stream emission is carving-invariant and equals the batch verify") {
    val docs = Sources.documents(spark, dir)
    val batch = Dedup.minhashLshPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def carved(parts: Int): Seq[(Long, Long, Double)] = {
      val replay = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_r11_verified_$parts").getAbsolutePath
      docs.select(col("doc_id").cast("long"), col("text"))
        .repartition(parts).write.mode("overwrite").parquet(replay)
      val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1).parquet(replay)
      graft.streaming.DedupStream
        .nearDupReplay(stream, docs, s"t_r11_verified_$parts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    // adversarial carvings: 1 batch (all within-batch) vs 8 batches
    // (pairs straddle state) must both equal the batch verified set
    assert(carved(1) === batch)
    assert(carved(8) === batch)
  }

  test("semantic verified emission is carving-invariant and equals the batch chain") {
    val emb = Sources.embeddings(spark, dir)
    val batch = Similarity.embLshPairs(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def carved(parts: Int): Seq[(Long, Long, Double)] = {
      val replay = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_r11_embver_$parts").getAbsolutePath
      emb.select(col("vec_id").cast("long"), col("emb")).repartition(parts)
        .write.mode("overwrite").parquet(replay)
      val stream = spark.readStream.schema("vec_id BIGINT, emb ARRAY<DOUBLE>")
        .option("maxFilesPerTrigger", 1).parquet(replay)
      graft.streaming.EmbDedupStream
        .nearDupReplay(stream, emb, s"t_r11_embver_$parts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    assert(carved(1) === batch)
    assert(carved(8) === batch)
  }

  // ---- frozen-index recall-decay gauge ----

  test("the decay gauge measures the STREAMED screen's candidate set") {
    import spark.implicits._
    val emb = Sources.embeddings(spark, dir)
    val drifted = Similarity.driftedCorpus(emb)
    val frozen = Similarity.lshStreamBander(emb)
    // the gauge's batch-side candidate set ...
    val gauge = Similarity.embLshCandidatesFrom(frozen(drifted))
      .as[(Long, Long)].collect().toSet
    // ... must equal what the streaming screen emits for the same frozen
    // bander over a carved replay of the drifted corpus
    val replay = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_r11_decay_replay").getAbsolutePath
    drifted.repartition(4).write.mode("overwrite").parquet(replay)
    val stream = spark.readStream.schema("vec_id BIGINT, emb ARRAY<DOUBLE>")
      .option("maxFilesPerTrigger", 1).parquet(replay)
    val q = graft.streaming.EmbDedupStream
      .candidateStream(stream, frozen).writeStream
      .queryName("t_r11_decay").outputMode("update").format("memory").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("t_r11_decay").distinct()
      .as[(Long, Long)].collect().toSet
    spark.catalog.dropTempView("t_r11_decay")
    assert(streamed === gauge,
      "the gauge must describe exactly the candidates the ingest screen screens")
  }

  test("drift statistic contracts: shares are distributions, TVD bounded, zero without drift") {
    import spark.implicits._
    val emb = Sources.embeddings(spark, pinDir)
    val rows = Imi.indexDrift(emb)
      .select("boot_share", "arr_share", "contrib")
      .as[(Double, Double, Double)].collect()
    // both share columns are probability distributions over the cells
    assert(math.abs(rows.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9)
    // contributions are nonnegative and the TVD they sum to is in [0, 1]
    assert(rows.forall(_._3 >= 0.0))
    val tvd = rows.map(_._3).sum
    assert(tvd >= 0.0 && tvd <= 1.0)
    // the gate's deterministic drift must actually register
    assert(tvd > 0.0, "the reversed-copy drift must move the occupancy")
  }

  test("decay gauge contracts: found ⊆ truth; drift preserves the pair structure") {
    val emb = Sources.embeddings(spark, pinDir)
    val row = Similarity.embStreamRecall(emb).head()
    val (nTrue, nFound, nHit, recall) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    // verified pairs apply the SAME threshold as truth => found ⊆ truth
    assert(nHit === nFound)
    assert(nHit <= nTrue)
    assert(recall === (if (nTrue == 0) 0.0 else nHit.toDouble / nTrue))
    // reversal preserves cosine: the drifted truth contains the original
    // truth twice (originals + reversed copies) — the gauge's denominator
    // can never be degenerate while the corpus has any near-dup pair
    val orig = Similarity.neardupCosine(emb).count()
    assert(nTrue >= 2 * orig)
  }
}
