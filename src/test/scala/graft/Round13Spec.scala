package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Imi
import graft.streaming.DedupStream

/** Round-13 closures of the r12 verdict/ADVICE items. First family: the
  * state-audit drain cache. The r12 bench regression (q_state_audit
  * 0.17 → 3.5 s PER REP) was the derived cache key silently never
  * resolving — Spark 4 leaves `readStream.parquet(path)` as an
  * `UnresolvedDataSource` node at construction time, so the
  * `StreamingRelation` pattern match returned None and every call
  * re-drained. These specs pin the key contract OBSERVABLY (via the
  * drain counter), so a plan-shape change can never again degrade to
  * "correct but re-drains every rep" without a red test. */
class Round13Spec extends AnyFunSuite with SharedSpark {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeReplay(dir: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.map(i => (i, s"text_${i % 4}")).toDF("doc_id", "text")
      .coalesce(2).write.mode("overwrite").parquet(dir)
  }

  private def audit(dir: String): Long = {
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(dir)
    DedupStream.stateAudit(stream).count()
  }

  test("state-audit drains ONCE per replay content: second call is a cache hit") {
    val dir = tmp("graft_r13_audit")
    writeReplay(dir, 0L until 40L)
    val before = DedupStream.auditDrains.get()
    val n1 = audit(dir)
    assert(DedupStream.auditDrains.get() === before + 1,
      "first audit of a replay must drain (the key must RESOLVE — an " +
        "unresolved source path would also re-drain here, but the next " +
        "assertion distinguishes the two)")
    val n2 = audit(dir)
    assert(DedupStream.auditDrains.get() === before + 1,
      "second audit of the SAME replay content must reuse the drained " +
        "checkpoint — this is the r12 per-rep 3.5 s regression pinned")
    assert(n1 === n2)
    assert(n1 === 4, "4 distinct texts → 4 state rows")
  }

  test("a rewritten replay at the same path re-drains (content half of the key)") {
    val dir = tmp("graft_r13_audit_rw")
    writeReplay(dir, 0L until 40L)
    audit(dir): Unit
    val before = DedupStream.auditDrains.get()
    // rewrite with DIFFERENT content at the same path — same row count and
    // parquet layout shape, so only the content hash half of the
    // fingerprint is guaranteed to move if sizes/mtimes happen to collide
    import spark.implicits._
    (0L until 40L).map(i => (i, s"other_${i % 5}")).toDF("doc_id", "text")
      .coalesce(2).write.mode("overwrite").parquet(dir)
    val n = audit(dir)
    assert(DedupStream.auditDrains.get() === before + 1,
      "a rewrite at the same path must MISS the cache and re-drain — " +
        "serving the stale checkpoint would report the old corpus state")
    assert(n === 5, "rewritten corpus has 5 distinct texts")
  }

  // ---- the persisted-index lifecycle residuals (r12 ADVICE + verdict) ----

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.sources.Sources.embeddings(spark, dir)
  private def servedNids(idx: String): Set[Long] = {
    import spark.implicits._
    Imi.annImiServed(emb, idx).select("nid").as[Long].collect().toSet
  }
  private def physicalIds(idx: String): Set[Long] = {
    import spark.implicits._
    spark.read
      .schema("vec_id LONG, emb ARRAY<DOUBLE>, sub BIGINT, code LONG, scell BIGINT")
      .parquet(Imi.memberDir(spark, idx)).select("vec_id").as[Long]
      .collect().toSet
  }

  test("a delete whose write lands AFTER a full concurrent compaction is never lost") {
    import spark.implicits._
    val idx = tmp("graft_r13_race")
    Imi.persistIndex(emb, idx)
    val del = emb.filter(col("vec_id") % 7 === 3)
    val delIds = del.select("vec_id").as[Long].collect().toSet
    assert(delIds.nonEmpty)
    // the r12 ADVICE window: the delete resolves the current version,
    // then a compaction runs TO COMPLETION (publish + final straggler
    // sweep) before the tombstone parquet lands — the old subtree the
    // write targets is pruned at the next publish, so without the
    // write-then-re-resolve loop the forget request silently vanishes
    Imi.deleteFromIndexHooked(del, idx, () => Imi.compactIndex(spark, idx))
    assert(servedNids(idx).intersect(delIds).isEmpty,
      "the delete must filter at serve immediately, despite the " +
        "compaction completing inside its resolve->write window")
    assert(Imi.pendingTombstoneFileCount(spark, idx) > 0,
      "the re-resolved append must land in the NEW current version")
    Imi.compactIndex(spark, idx)
    assert(physicalIds(idx).intersect(delIds).isEmpty,
      "the next cycle must apply the tombstone physically")
    assert(Imi.pendingTombstoneFileCount(spark, idx) === 0)
    assert(servedNids(idx).intersect(delIds).isEmpty)
  }

  test("a retried micro-batch whose rows were ALL forgotten is not resurrected") {
    import spark.implicits._
    val idx = tmp("graft_r13_resurrect")
    Imi.persistIndex(emb.filter(col("vec_id") % 4 =!= 3), idx)
    val delta = emb.filter(col("vec_id") % 4 === 3)
    val deltaIds = delta.select("vec_id").as[Long].collect().toSet
    assert(Imi.upsertIndexCommitted(delta, idx, batchId = 11L))
    // forget EVERY row of the batch, then compact: the rows are removed
    // physically and (the r12 ADVICE gap) the version-scoped batch
    // marker used to die with the old version — a retry then saw
    // present == 0 and silently re-appended the forgotten vectors
    Imi.deleteFromIndex(delta.select("vec_id"), idx)
    Imi.compactIndex(spark, idx)
    assert(physicalIds(idx).intersect(deltaIds).isEmpty)
    assert(!Imi.upsertIndexCommitted(delta, idx, batchId = 11L),
      "the carried-forward batch marker must mark the retry as committed")
    assert(physicalIds(idx).intersect(deltaIds).isEmpty,
      "a retried all-forgotten batch must NOT re-append its rows")
    assert(servedNids(idx).intersect(deltaIds).isEmpty)
  }

  test("a re-bootstrapped index at the same path never serves stale cached codebooks") {
    val idx = tmp("graft_r13_reboot")
    // life 1: train on the raw corpus and SERVE (populates the book cache
    // for this path's v0 subtree)
    Imi.persistIndex(emb, idx)
    servedNids(idx): Unit
    // kill the root and re-bootstrap at the SAME path on a corpus whose
    // trained half-space books differ (negated vectors flip every
    // hyperplane side)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(idx), true))
    val emb2 = emb.select(col("vec_id"),
      expr("transform(emb, x -> -x)").as("emb"))
    Imi.persistIndex(emb2, idx)
    // oracle: the SAME artifact bytes copied to a fresh path (no cache
    // entries can exist for it) must serve identically — a stale cached
    // codebook on the original path would assign probe cells under the
    // old books and diverge
    val idx2 = tmp("graft_r13_reboot_copy")
    assert(fs.delete(new org.apache.hadoop.fs.Path(idx2), true))
    assert(org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(idx), fs,
      new org.apache.hadoop.fs.Path(idx2), false,
      spark.sparkContext.hadoopConfiguration))
    val atOriginal = Imi.annImiServed(emb2, idx).collect().toSeq
    val atCopy = Imi.annImiServed(emb2, idx2).collect().toSeq
    assert(atOriginal === atCopy,
      "identical artifact bytes must serve identically regardless of " +
        "what a previous life of the path left in the book cache")
  }

  test("maintenance entry prunes crash junk without touching the published snapshot") {
    val idx = tmp("graft_r13_junk")
    Imi.persistIndex(emb, idx)
    val served = Imi.annImiServed(emb, idx).collect().toSeq
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fabricate a crash loop's residue: several unpublished rewrite
    // subtrees (no marker), which only a successful publish used to prune
    for (v <- Seq(7, 8, 9))
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$idx/v$v/members"))
    assert(Imi.maintainIndex(spark, idx) === "none",
      "a healthy index needs no compaction — junk pruning must not force one")
    for (v <- Seq(7, 8, 9))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/v$v")),
        s"crash junk v$v must be pruned on maintenance entry")
    assert(Imi.annImiServed(emb, idx).collect().toSeq === served,
      "pruning junk must not touch the published snapshot")
  }

  // ---- the SQ8 tier as a citizen of the versioned artifact ----

  test("sq8 tier: compaction preserves the served ranking and applies forgets") {
    import spark.implicits._
    val idx = tmp("graft_r13_sq8_compact")
    Imi.persistIndex(emb.filter(col("vec_id") % 4 =!= 3), idx, withSq8 = true)
    Imi.upsertIndex(emb.filter(col("vec_id") % 4 === 3), idx)
    val del = emb.filter(col("vec_id") % 7 === 2)
    val delIds = del.select("vec_id").as[Long].collect().toSet
    Imi.deleteFromIndex(del.select("vec_id"), idx)
    val before = Imi.annSq8Served(emb, idx).collect().toSeq
    assert(before.map(_.getLong(1)).toSet.intersect(delIds).isEmpty,
      "tombstones must filter the code-table scan logically")
    Imi.compactIndex(spark, idx)
    assert(Imi.annSq8Served(emb, idx).collect().toSeq === before,
      "physical tombstone apply + sq8 rebuild must not change a served row")
  }

  test("sq8 tier: a torn delivery append heals at the next compaction") {
    val idx = tmp("graft_r13_sq8_torn")
    Imi.persistIndex(emb.filter(col("vec_id") % 4 =!= 3), idx, withSq8 = true)
    Imi.upsertIndex(emb.filter(col("vec_id") % 4 === 3), idx)
    val expected = Imi.annSq8Served(emb, idx).collect().toSeq
    // simulate the crash window: the member append of a delivery landed
    // but its sq8 append did not — wipe the whole code table (the most
    // extreme tear) while members stay intact
    val v = Imi.currentIndexVersion(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$idx/v$v/sq8"), true))
    // compaction re-encodes the tier from the live MEMBER rows (the
    // single source of truth) under the carried-forward stored ranges
    Imi.compactIndex(spark, idx)
    assert(Imi.annSq8Served(emb, idx).collect().toSeq === expected,
      "the rebuilt code table must serve exactly what the untorn one did")
  }

  test("sq8 tier: serving a pre-tier artifact fails loudly, not silently empty") {
    val idx = tmp("graft_r13_sq8_old")
    Imi.persistIndex(emb, idx) // tier NOT requested — the pre-tier shape
    val e = intercept[IllegalStateException](Imi.annSq8Served(emb, idx))
    assert(e.getMessage.contains("no SQ8 tier"))
  }

  // ---- index-upsert stream: restart against a REAL checkpoint (r12
  // verdict #4 — the gates use ephemeral checkpoints, so the committed
  // batchId protection was never exercised across an actual resume) ----

  test("index-upsert stream resumes from a real checkpoint without double-append") {
    import spark.implicits._
    val base = tmp("graft_r13_upsert_ckpt")
    val (srcDir, ckpt, idx) = (s"$base/src", s"$base/ckpt", s"$base/idx")
    Imi.persistIndex(emb.filter(col("vec_id") % 4 =!= 3), idx)
    val delta = emb.filter(col("vec_id") % 4 === 3)
      .select(col("vec_id").cast("long"), col("emb"))
    val half1 = delta.filter(col("vec_id") % 8 === 3)
    val half2 = delta.filter(col("vec_id") % 8 === 7)
    def stream() = spark.readStream
      .schema("vec_id BIGINT, emb ARRAY<DOUBLE>")
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    // run 1: drain the first delivery, checkpoint committed
    half1.coalesce(2).write.mode("overwrite").parquet(srcDir)
    graft.streaming.IndexUpsertStream.run(stream(), idx, Some(ckpt))
    val afterFirst = physicalIds(idx)
    // run 2 with NO new data: resume must replay nothing and append nothing
    graft.streaming.IndexUpsertStream.run(stream(), idx, Some(ckpt))
    assert(physicalIds(idx) === afterFirst,
      "a resume with no new files must not re-append the committed batches")
    // run 3: the second delivery lands, the resumed query picks up ONLY it
    half2.coalesce(2).write.mode("append").parquet(srcDir)
    graft.streaming.IndexUpsertStream.run(stream(), idx, Some(ckpt))
    // oracle: one bulk upsert of the full delta into a twin index
    val idxBulk = tmp("graft_r13_upsert_bulk")
    Imi.persistIndex(emb.filter(col("vec_id") % 4 =!= 3), idxBulk)
    Imi.upsertIndex(delta, idxBulk)
    assert(physicalIds(idx) === physicalIds(idxBulk),
      "checkpointed streaming upsert must equal the bulk upsert")
    assert(Imi.annImiServed(emb, idx).collect().toSeq ===
      Imi.annImiServed(emb, idxBulk).collect().toSeq)
  }
}
