package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Imi
import graft.sources.Sources

/** Round-12 hardening of the persisted ANN index as an OPERATED artifact
  * (r11 verdict, next-round #1/#3/#4/#7 and the r11 ADVICE items): the
  * forget/compaction race protocol (a delete landing mid-compaction is
  * never lost), the versioned atomic publish (complete-on-disk before
  * the old tree is touched; readers hold a consistent snapshot across a
  * concurrent compaction), the Hadoop-FileSystem directory management
  * (the whole lifecycle against an explicit `file:`-scheme URI), the
  * insert-only upsert guards, the batchId-committed at-least-once
  * append, and the per-version stored-book cache's reindex
  * invalidation. */
class Round12Spec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Sources.embeddings(spark, dir)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def servedNids(idx: String): Set[Long] = {
    import spark.implicits._
    Imi.annImiServed(emb, idx).select("nid").as[Long].collect().toSet
  }

  // ---- the forget/compaction race (r11 "what's wrong" #1) ----

  test("a delete landing mid-compaction survives: excluded now, applied at the next cycle") {
    import spark.implicits._
    val idx = tmp("graft_r12_race")
    Imi.persistIndex(emb, idx)
    val early = emb.filter(col("vec_id") % 7 === 2)
    val late = emb.filter(col("vec_id") % 7 === 4)
    val earlyIds = early.select("vec_id").as[Long].collect().toSet
    val lateIds = late.select("vec_id").as[Long].collect().toSet
    assert(earlyIds.nonEmpty && lateIds.nonEmpty)
    Imi.deleteFromIndex(early, idx)
    // the late delete lands AFTER compaction snapshots the tombstone file
    // list — the interleaving the old whole-directory clear silently lost
    Imi.compactIndexHooked(spark, idx, () => Imi.deleteFromIndex(late, idx))
    // early: applied physically by this compaction; late: carried forward
    // as a pending tombstone — BOTH must be unretrievable right now
    val served = servedNids(idx)
    assert(served.intersect(earlyIds).isEmpty, "snapshotted deletes must apply")
    assert(served.intersect(lateIds).isEmpty,
      "a delete landing mid-compaction must keep filtering at serve")
    assert(Imi.pendingTombstoneFileCount(spark, idx) > 0,
      "the late tombstone must survive the compaction as pending")
    // physical state after THIS cycle: early gone from the layout, late
    // still present (its physical removal is the NEXT cycle's job)
    val phys = spark.read
      .schema("vec_id LONG, emb ARRAY<DOUBLE>, sub BIGINT, code LONG, scell BIGINT")
      .parquet(Imi.memberDir(spark, idx)).select("vec_id").as[Long].collect().toSet
    assert(phys.intersect(earlyIds).isEmpty)
    assert(lateIds.subsetOf(phys))
    // the next cycle applies the carried tombstone physically and drains it
    Imi.compactIndex(spark, idx)
    assert(Imi.pendingTombstoneFileCount(spark, idx) === 0)
    val phys2 = spark.read
      .schema("vec_id LONG, emb ARRAY<DOUBLE>, sub BIGINT, code LONG, scell BIGINT")
      .parquet(Imi.memberDir(spark, idx)).select("vec_id").as[Long].collect().toSet
    assert(phys2.intersect(lateIds).isEmpty)
    assert(servedNids(idx).intersect(lateIds).isEmpty)
  }

  // ---- versioned atomic publish + serve-during-maintenance ----

  test("a reader held across a concurrent compaction sees one consistent snapshot") {
    val idx = tmp("graft_r12_snap")
    Imi.persistIndex(emb.filter(col("vec_id") % 4 =!= 3), idx)
    Imi.upsertIndex(emb.filter(col("vec_id") % 4 === 3), idx)
    // resolve a reader BEFORE the maintenance op and hold it
    val held = Imi.annImiServed(emb, idx)
    val before = held.collect().toSeq
    Imi.compactIndex(spark, idx)
    // the old version subtree is RETAINED one cycle, so the held reader
    // still collects the complete old snapshot — never a mix, never a
    // missing-file failure
    assert(held.collect().toSeq === before)
    // a NEW reader resolves the published rewrite (row-identical here by
    // compaction's content invariance)
    assert(Imi.annImiServed(emb, idx).collect().toSeq === before)
  }

  test("publish is atomic: junk from a crashed rewrite is ignored, then pruned") {
    val idx = tmp("graft_r12_junk")
    Imi.persistIndex(emb, idx)
    val served = Imi.annImiServed(emb, idx).collect().toSeq
    // simulate a rewrite that died mid-write: a higher-numbered version
    // subtree WITHOUT the publish marker
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$idx/v99/members"))
    // readers never resolve an unpublished subtree
    assert(Imi.annImiServed(emb, idx).collect().toSeq === served)
    // the next publish allocates PAST the junk (never writes into a
    // partial tree) and prunes it
    Imi.compactIndex(spark, idx)
    assert(Imi.memberDir(spark, idx).endsWith("v100/members"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/v99")))
    assert(Imi.annImiServed(emb, idx).collect().toSeq === served)
  }

  // ---- Hadoop FileSystem API (r11 "what's missing" #2) ----

  test("the full index lifecycle runs against an explicit file:-scheme URI") {
    import spark.implicits._
    // java.io.File on a "file:/..." string resolves a ./file:… relative
    // path — this spec fails unless every directory op goes through the
    // Hadoop FileSystem API
    val idx = "file:" + tmp("graft_r12_uri")
    Imi.persistIndex(emb.filter(col("vec_id") % 4 =!= 3), idx)
    Imi.upsertIndex(emb.filter(col("vec_id") % 4 === 3), idx)
    val del = emb.filter(col("vec_id") % 7 === 2)
    val delIds = del.select("vec_id").as[Long].collect().toSet
    Imi.deleteFromIndex(del, idx)
    assert(servedNids(idx).intersect(delIds).isEmpty,
      "tombstones must load (and filter) on a scheme'd path")
    Imi.compactIndex(spark, idx)
    assert(Imi.pendingTombstoneFileCount(spark, idx) === 0)
    assert(servedNids(idx).intersect(delIds).isEmpty)
    assert(Imi.annImiPqServed(emb, idx).count() > 0)
  }

  // ---- insert-only upsert guards (r11 ADVICE #2) ----

  test("re-upserting existing vec_ids fails loudly (insert-only contract)") {
    val idx = tmp("graft_r12_dup")
    Imi.persistIndex(emb.filter(col("vec_id") % 4 =!= 3), idx)
    val delta = emb.filter(col("vec_id") % 4 === 3)
    Imi.upsertIndex(delta, idx)
    val e = intercept[IllegalArgumentException] { Imi.upsertIndex(delta, idx) }
    assert(e.getMessage.contains("insert-only"))
  }

  test("upserting a vec_id with a pending tombstone fails loudly, naming the remedy") {
    val idx = tmp("graft_r12_tomb")
    Imi.persistIndex(emb, idx)
    val del = emb.filter(col("vec_id") % 7 === 2)
    Imi.deleteFromIndex(del, idx)
    val e = intercept[IllegalArgumentException] { Imi.upsertIndex(del, idx) }
    assert(e.getMessage.contains("TOMBSTONES") &&
      e.getMessage.contains("compactIndex"))
  }

  test("a delta with duplicated vec_ids fails loudly") {
    val idx = tmp("graft_r12_selfdup")
    Imi.persistIndex(emb.filter(col("vec_id") % 4 =!= 3), idx)
    val delta = emb.filter(col("vec_id") % 4 === 3)
    val e = intercept[IllegalArgumentException] {
      Imi.upsertIndex(delta.unionAll(delta), idx)
    }
    assert(e.getMessage.contains("duplicated"))
  }

  // ---- batchId-committed upsert (r11 ADVICE #3) ----

  test("a retried micro-batch is skipped; the crash-before-marker window self-heals") {
    val idx = tmp("graft_r12_commit")
    Imi.persistIndex(emb.filter(col("vec_id") % 4 =!= 3), idx)
    val delta = emb.filter(col("vec_id") % 4 === 3)
    def memberCount(): Long =
      spark.read.parquet(Imi.memberDir(spark, idx)).count()
    assert(Imi.upsertIndexCommitted(delta, idx, batchId = 7L))
    val n = memberCount()
    // straight retry (marker present): skipped
    assert(!Imi.upsertIndexCommitted(delta, idx, batchId = 7L))
    assert(memberCount() === n)
    // crash window: append committed but the marker was lost — the retry
    // detects the complete prior append, re-marks, and does NOT duplicate
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(
      Imi.memberDir(spark, idx).stripSuffix("/members") + "/_batch_commits/batch_7")
    assert(fs.delete(marker, false))
    assert(!Imi.upsertIndexCommitted(delta, idx, batchId = 7L))
    assert(fs.exists(marker))
    assert(memberCount() === n)
  }

  // ---- snapshot pinning across a multi-query read session ----

  test("a pinned version reads one snapshot across maintenance; a pruned pin fails loudly") {
    val idx = tmp("graft_r12_pin")
    Imi.persistIndex(emb.filter(col("vec_id") % 4 =!= 3), idx)
    val pinned = Imi.currentIndexVersion(spark, idx)
    val atPin = Imi.annImiServed(emb, idx).collect().toSeq
    // a reindex on different data publishes a new version; the pinned
    // session keeps reading ITS snapshot, a fresh resolve sees the new one
    Imi.persistIndex(emb, idx)
    assert(Imi.annImiServed(emb, idx, version = Some(pinned))
      .collect().toSeq === atPin)
    assert(Imi.annImiServed(emb, idx).collect().toSeq !== atPin)
    // one more maintenance cycle prunes the pinned version: the read
    // fails loudly instead of silently mixing snapshots
    Imi.compactIndex(spark, idx)
    val e = intercept[IllegalStateException] {
      Imi.annImiServed(emb, idx, version = Some(pinned))
    }
    assert(e.getMessage.contains("pruned"))
  }

  // ---- auto-maintenance policy: fragmentation/backlog triggers ----

  test("auto-maintenance compacts on the delivery-count and forget-backlog triggers") {
    import spark.implicits._
    val idx = tmp("graft_r12_maintain")
    Imi.persistIndex(emb.filter(col("vec_id") % 4 =!= 3), idx)
    Imi.upsertIndexCommitted(emb.filter(col("vec_id") % 12 === 3), idx, 0L)
    Imi.upsertIndexCommitted(emb.filter(col("vec_id") % 12 === 7), idx, 1L)
    // at the bound: no action
    assert(Imi.maintainIndex(spark, idx, maxDeliveries = 2) === "none")
    Imi.upsertIndexCommitted(emb.filter(col("vec_id") % 12 === 11), idx, 2L)
    val served = Imi.annImiServed(emb, idx).collect().toSeq
    // past the bound: compacts, serves identically, resets the count
    assert(Imi.maintainIndex(spark, idx, maxDeliveries = 2) === "compact")
    assert(Imi.annImiServed(emb, idx).collect().toSeq === served)
    assert(Imi.maintainIndex(spark, idx, maxDeliveries = 2) === "none")
    // the forget backlog triggers regardless of delivery count, and the
    // compact applies it physically (backlog back to zero)
    val del = emb.filter(col("vec_id") % 7 === 2)
    val delIds = del.select("vec_id").as[Long].collect().toSet
    Imi.deleteFromIndex(del, idx)
    assert(Imi.maintainIndex(spark, idx, maxDeliveries = 2) === "compact")
    assert(Imi.pendingTombstoneFileCount(spark, idx) === 0)
    assert(servedNids(idx).intersect(delIds).isEmpty)
  }

  // ---- stored-book cache: immutable-version keying ----

  test("the book cache serves a version without reloading and a reindex invalidates it") {
    val idx = tmp("graft_r12_cache")
    Imi.persistIndex(emb.filter(col("vec_id") % 4 =!= 3), idx)
    val books0 = Imi.loadBooks(spark, idx)
    // same published version => the cached instance itself comes back
    assert(Imi.loadBooks(spark, idx) eq books0)
    // a reindex publishes a NEW version subtree: fresh key, fresh books
    Imi.persistIndex(emb, idx)
    val books1 = Imi.loadBooks(spark, idx)
    assert(!(books1 eq books0))
    assert(books1.map(_.map { case (c, v) => (c, v.toSeq) }) !=
      books0.map(_.map { case (c, v) => (c, v.toSeq) }))
  }
}
