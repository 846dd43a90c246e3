package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** Round-14 widening: the VERSIONED lexicon artifact (zero-downtime
  * rebuilds, pinned snapshots, crash-junk pruning), at-least-once upsert
  * redelivery, the frozen-vocab new-term blindness contract, corpus-scaled
  * posting buckets, and the free-text query surface. */
class Round14Spec extends AnyFunSuite with SharedSpark {

  private def docsOf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def corpus = docsOf(
    0L -> "needle probe query",
    10L -> "needle probe alpha", 11L -> "needle probe beta gamma",
    12L -> "unrelated words entirely", 13L -> "more unrelated filler",
    14L -> "padding one", 15L -> "padding two")

  private def hfs(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- versioned lexicon lifecycle ----

  test("lexicon rebuild never takes the serve offline: old version serves while a new one builds; pins survive one publish") {
    val docs = corpus
    val lex = java.nio.file.Files.createTempDirectory("graft_r14_lexver").toString
    Retrieval.persistLexicon(docs, lex, dfCapDen = 1L)
    val v0 = Retrieval.currentLexiconVersion(spark, lex)
    val expected = Retrieval.bm25Served(docs, lex, nq = 1).collect().toSeq
    // an in-flight (or crashed) rebuild = an unpublished version subtree;
    // the serve must resolve the published version and not notice
    val fs = hfs(lex)
    val junk = new org.apache.hadoop.fs.Path(s"$lex/v${v0 + 1}/postings")
    fs.mkdirs(junk)
    assert(Retrieval.bm25Served(docs, lex, nq = 1).collect().toSeq === expected,
      "an unpublished subtree must be invisible to the serve")
    // the rebuild publishes a NEW version; the pinned old version keeps
    // serving identically (retained one cycle) and the junk subtree is
    // pruned by the successful publish
    Retrieval.persistLexicon(docs, lex, dfCapDen = 1L)
    val v1 = Retrieval.currentLexiconVersion(spark, lex)
    assert(v1 > v0, "a rebuild must publish a new version")
    assert(!fs.exists(junk.getParent), "publish must prune crashed junk")
    assert(Retrieval.bm25Served(docs, lex, nq = 1, version = Some(v0))
      .collect().toSeq === expected, "the previous version is retained")
    assert(Retrieval.bm25Served(docs, lex, nq = 1).collect().toSeq === expected,
      "same corpus, same cap => the new version serves identically")
    // one more publish: v0 falls out of the retention window — a stale
    // pin must fail LOUDLY, never silently mix snapshots
    Retrieval.persistLexicon(docs, lex, dfCapDen = 1L)
    val e = intercept[IllegalStateException](
      Retrieval.bm25Served(docs, lex, nq = 1, version = Some(v0)).collect())
    assert(e.getMessage.contains("not published"))
  }

  test("maintainLexicon prunes crashed-rebuild junk on entry and rebuilds under the STORED df cap") {
    val docs = corpus
    val lex = java.nio.file.Files.createTempDirectory("graft_r14_lexmx").toString
    // custom cap: with dfCapDen = 1 every term with idf >= 1 indexes; the
    // default cap (10) would empty this toy vocabulary — a rebuild that
    // silently reverted to the default would serve nothing
    Retrieval.persistLexicon(docs, lex, dfCapDen = 1L)
    val before = Retrieval.bm25Served(docs, lex, nq = 1).collect().toSeq
    assert(before.nonEmpty)
    val fs = hfs(lex)
    val junkDir = new org.apache.hadoop.fs.Path(s"$lex/v99")
    fs.mkdirs(junkDir)
    // force the trigger: upsert 2 docs onto a 7-doc stats base (> 1/5).
    // Only ONE carries the query phrase — a second would push
    // df("needle probe") to 5 of 9 and the whole-bit idf to 0, emptying
    // the post-rebuild ranking for reasons unrelated to the cap.
    val delta = docsOf(20L -> "needle probe fresh one",
      21L -> "fresh padding words")
    Retrieval.upsertLexicon(delta, lex, deliveryId = "mx-d1")
    assert(Retrieval.maintainLexicon(docs.union(delta), lex) === "rebuild")
    assert(!fs.exists(junkDir), "maintenance entry must prune junk")
    val after = Retrieval.bm25Served(docs, lex, nq = 1).collect()
    assert(after.nonEmpty,
      "the rebuild must reuse the stored dfCapDen = 1 (the default cap " +
        "would empty the toy vocabulary and serve zero rows)")
    assert(after.map(_.getLong(1)).toSet.contains(20L),
      "rebuilt lexicon retrieves the upserted doc")
  }

  // ---- at-least-once upsert redelivery ----

  test("upsert redelivery is a no-op: marker fast path AND doc_id presence healing") {
    val docs = corpus
    val delta = docsOf(20L -> "needle probe fresh arrival")
    val lex = java.nio.file.Files.createTempDirectory("graft_r14_lexrd").toString
    Retrieval.persistLexicon(docs, lex, dfCapDen = 1L)
    def dlCount = spark.read.parquet(
      Retrieval.lexTableDirForTest(spark, lex, "dl")).count()
    def postingCount = spark.read.parquet(
      Retrieval.lexTableDirForTest(spark, lex, "postings")).count()
    val (dl0, p0) = (dlCount, postingCount)
    assert(Retrieval.upsertLexicon(delta, lex, deliveryId = "d1") === "append")
    val (dl1, p1) = (dlCount, postingCount)
    assert(dl1 === dl0 + 1 && p1 > p0)
    // retried delivery, same id: marker fast path
    assert(Retrieval.upsertLexicon(delta, lex, deliveryId = "d1") === "duplicate")
    assert(dlCount === dl1 && postingCount === p1,
      "a redelivered delivery must append nothing")
    // lost-ack shape: marker missing but appends landed (simulated by a
    // NEW delivery id carrying already-delivered doc_ids) — the presence
    // check re-marks without re-appending
    assert(Retrieval.upsertLexicon(delta, lex, deliveryId = "d2") === "append")
    assert(dlCount === dl1 && postingCount === p1,
      "already-present doc_ids must not append again (lost-ack healing)")
  }

  // ---- frozen-vocab new-term blindness (r13 verdict #7) ----

  test("a delta-only term is invisible until rebuild, then scores") {
    // base corpus never contains the bigram "xylo zephyr"; the delta doc
    // does, and a query doc carrying ONLY that phrase retrieves nothing
    // under the frozen vocabulary — after the rebuild it retrieves the
    // delta doc (the staleness trigger bounds how long blindness lasts)
    val base = docsOf(
      0L -> "xylo zephyr query",
      10L -> "needle probe alpha", 11L -> "needle probe beta",
      12L -> "unrelated words entirely", 13L -> "padding one")
    val delta = docsOf(20L -> "xylo zephyr carrier doc")
    val lex = java.nio.file.Files.createTempDirectory("graft_r14_lexnt").toString
    Retrieval.persistLexicon(base, lex, dfCapDen = 1L)
    Retrieval.upsertLexicon(delta, lex, deliveryId = "nt-d1")
    val all = base.union(delta)
    // blindness is about the VOCAB, not the delta: "xylo zephyr" IS in
    // this artifact's frozen vocabulary (the query doc carried it at
    // bootstrap), so the delta doc's posting rows survive and it
    // retrieves immediately — the vocab-ABSENT case needs a bootstrap
    // corpus that never saw the term
    val baseNoQ = base.filter(col("doc_id") =!= 0L)
    val lex2 = java.nio.file.Files.createTempDirectory("graft_r14_lexnt2").toString
    Retrieval.persistLexicon(baseNoQ, lex2, dfCapDen = 1L)
    Retrieval.upsertLexicon(delta, lex2, deliveryId = "nt-d2")
    val blind = Retrieval.bm25ServedQueries(
      docsOf(0L -> "xylo zephyr query").select(col("doc_id").as("qid"), col("text")),
      lex2).collect()
    assert(blind.isEmpty,
      s"a vocab-absent term must contribute nothing under frozen stats: ${blind.toSeq}")
    Retrieval.persistLexicon(baseNoQ.union(delta), lex2, dfCapDen = 1L)
    val sighted = Retrieval.bm25ServedQueries(
      docsOf(0L -> "xylo zephyr query").select(col("doc_id").as("qid"), col("text")),
      lex2).collect()
    assert(sighted.map(_.getLong(1)).toSet === Set(20L),
      "after rebuild the delta-only term retrieves its carrier")
    // the first artifact (query doc in base) retrieves through the frozen
    // vocab immediately — blindness is about the VOCAB, not the delta
    val hits = Retrieval.bm25Served(all, lex, nq = 1, k = 20).collect()
    assert(hits.map(_.getLong(1)).toSet.contains(20L),
      "a frozen-vocab term delivered by upsert retrieves immediately")
  }

  // ---- corpus-scaled posting buckets ----

  test("postingBucketCount: floor at 16, one bucket per 64Ki rows above it") {
    assert(Retrieval.postingBucketCount(0L) === 16L)
    assert(Retrieval.postingBucketCount(25709L) === 16L)
    assert(Retrieval.postingBucketCount(16L * 65536L) === 16L)
    assert(Retrieval.postingBucketCount(16L * 65536L + 1L) === 17L)
    assert(Retrieval.postingBucketCount(2560000L) === 40L)
  }

  test("the stored bucket count is what the stats table says and what the layout uses") {
    val docs = corpus
    val lex = java.nio.file.Files.createTempDirectory("graft_r14_lexbk").toString
    Retrieval.persistLexicon(docs, lex, dfCapDen = 1L)
    val stats = spark.read.parquet(
      Retrieval.lexTableDirForTest(spark, lex, "stats")).collect().head
    val buckets = stats.getAs[Long]("buckets")
    assert(buckets === 16L, "toy corpus sits at the floor")
    assert(stats.getAs[Long]("df_cap_den") === 1L,
      "the df-cap contract is persisted with the stats")
    // partition discovery infers the bucket dir values as int — cast
    val bucketVals = spark.read.parquet(
      Retrieval.lexTableDirForTest(spark, lex, "postings"))
      .select(col("bucket").cast("long")).distinct().collect().map(_.getLong(0))
    assert(bucketVals.forall(b => b >= 0L && b < buckets))
  }

  // ---- hybrid RRF + MAP ----

  test("hybrid RRF: a doc in BOTH top-k lists outranks docs in only one") {
    import spark.implicits._
    val docs = docsOf(
      0L -> "needle probe query",
      10L -> "needle probe both lists", // lexical hit AND semantic hit
      11L -> "needle probe lexical only",
      12L -> "unrelated words entirely", // semantic hit only
      13L -> "more unrelated filler", 14L -> "padding one")
    // embeddings: 10 and 12 near the query vector, 11/13/14 far
    def v(x: Double, y: Double) = Seq(x, y)
    val emb = Seq(
      0L -> v(1.0, 0.0), 10L -> v(0.99, 0.14), 12L -> v(0.98, 0.2),
      11L -> v(-1.0, 0.1), 13L -> v(-0.9, -0.4), 14L -> v(0.0, -1.0))
      .toDF("vec_id", "emb")
    val out = Retrieval.hybridTopK(docs, emb, nq = 1, k = 5, dfCapDen = 1L)
      .collect().filter(_.getLong(0) == 0L)
    val rankOf = out.map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(rankOf(10L) === 1L,
      s"the doc present in both systems' top-k must fuse to rank 1: ${out.toSeq}")
    assert(rankOf.contains(11L) && rankOf.contains(12L),
      "single-system docs still appear (one-sided contribution)")
    assert(rankOf(10L) < rankOf(11L) && rankOf(10L) < rankOf(12L))
  }

  test("mapEval: perfect prefix retrieval scores ap_scaled == 10^6; AP bounded by 1") {
    // docs 10 and 11 each share the two bigrams of "alpha beta gamma"
    // with the query — both pseudo-relevant (>= 2 shared terms), both
    // retrieved ahead of everything else => AP = 1 exactly:
    //   m = 2; hit 1 at rank 1: (1*1e6) div (1*2) = 500000
    //          hit 2 at rank 2: (2*1e6) div (2*2) = 500000
    val docs = docsOf(
      0L -> "alpha beta gamma",
      10L -> "alpha beta gamma ten",
      11L -> "alpha beta gamma eleven",
      12L -> "unrelated words entirely", 13L -> "padding one",
      14L -> "padding two")
    val out = Retrieval.mapEval(docs, nq = 1, dfCapDen = 1L).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L,
      s"both relevant docs retrieved: $r")
    assert(r.getLong(3) === 1000000L, s"perfect ranking => ap_scaled 1e6: $r")
    assert(r.getDouble(4) === 1.0)
  }

  test("snippets: highest-idf present phrase wins; window centers on it") {
    val docs = docsOf(
      0L -> "rare gem query words",
      10L -> ("lots of common filler words here then the rare gem appears " +
        "and more trailing text follows after it"),
      11L -> "unrelated words entirely", 12L -> "more unrelated filler",
      13L -> "padding one", 14L -> "padding two")
    val out = Retrieval.snippets(docs, nq = 1, dfCapDen = 1L).collect()
    val hit = out.find(_.getLong(1) == 10L)
    assert(hit.isDefined, s"doc 10 must be retrieved and snippeted: ${out.toSeq}")
    val r = hit.get
    assert(r.getString(3) === "rare gem", s"best present phrase: $r")
    val text = "lots of common filler words here then the rare gem appears " +
      "and more trailing text follows after it"
    val pos = text.indexOf("rare gem") + 1
    assert(r.getLong(4) === pos.toLong)
    assert(r.getString(5) === text.substring(pos - 21, pos - 21 + 60),
      s"window = substring(text, pos-20, 60): $r")
  }

  test("hybridServed: both artifacts compose; ranks contiguous per query") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Sources.documents(spark, sf)
    val emb = graft.sources.Sources.embeddings(spark, sf)
    val lex = java.nio.file.Files.createTempDirectory("graft_r14_hylex").toString
    val idx = java.nio.file.Files.createTempDirectory("graft_r14_hyidx").toString
    Retrieval.persistLexicon(docs, lex)
    graft.operators.Imi.persistIndex(emb, idx, withSq8 = true)
    val out = Retrieval.hybridServed(docs, emb, lex, idx).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val ranks = rows.map(_.getLong(3)).sorted.toSeq
      assert(ranks === (1L to ranks.length).toSeq,
        s"contiguous fused ranks for qid $qid: $ranks")
    }
    // every fused row carries a positive integer score
    assert(out.forall(_.getLong(2) > 0L))
  }

  // ---- lexicon compaction ----

  test("compactLexicon: bit-identical serve, frozen stats, carried delivery ledger, new version") {
    val base = corpus
    val d1 = docsOf(20L -> "needle probe fresh one")
    val d2 = docsOf(21L -> "fresh padding words")
    val lex = java.nio.file.Files.createTempDirectory("graft_r14_lexcpt").toString
    Retrieval.persistLexicon(base, lex, dfCapDen = 1L)
    Retrieval.upsertLexicon(d1, lex, deliveryId = "c-d1")
    Retrieval.upsertLexicon(d2, lex, deliveryId = "c-d2")
    val all = base.union(d1).union(d2)
    val before = Retrieval.bm25Served(all, lex, nq = 1, k = 20).collect().toSeq
    val v0 = Retrieval.currentLexiconVersion(spark, lex)
    val statsBefore = spark.read.parquet(
      Retrieval.lexTableDirForTest(spark, lex, "stats"))
      .select("n", "s", "df_cap_den").collect().toSeq
    Retrieval.compactLexicon(spark, lex)
    assert(Retrieval.currentLexiconVersion(spark, lex) > v0,
      "compaction publishes a new version")
    assert(Retrieval.bm25Served(all, lex, nq = 1, k = 20).collect().toSeq
      === before, "compaction must not change a served row")
    assert(spark.read.parquet(
      Retrieval.lexTableDirForTest(spark, lex, "stats"))
      .select("n", "s", "df_cap_den").collect().toSeq === statsBefore,
      "compaction must not touch the frozen statistics or the cap")
    // the carried ledger: a post-compaction redelivery is still a no-op
    assert(Retrieval.upsertLexicon(d1, lex, deliveryId = "c-d1") === "duplicate",
      "the delivery ledger must survive compaction")
  }

  test("maintainLexicon: fragmentation triggers compact when staleness does not warrant a rebuild") {
    // a 16-doc stats base with 3 single-doc deliveries: staleness
    // 3/16 < 1/5 (no rebuild) but deliveries 3 > maxDeliveries 2
    val base = docsOf((0L to 15L).map(i =>
      i -> s"base doc number $i content"): _*)
    val lex = java.nio.file.Files.createTempDirectory("graft_r14_lexfrg").toString
    Retrieval.persistLexicon(base, lex, dfCapDen = 1L)
    (1 to 3).foreach(i => Retrieval.upsertLexicon(
      docsOf((100L + i) -> s"delta doc number $i arrives"),
      lex, deliveryId = s"f-d$i"))
    val v0 = Retrieval.currentLexiconVersion(spark, lex)
    assert(Retrieval.maintainLexicon(base, lex, maxDeliveries = 2) === "compact")
    assert(Retrieval.currentLexiconVersion(spark, lex) > v0)
    // the compaction repaid the fragmentation debt: the version-local
    // _frag ledger reset, so the SAME threshold no longer fires — while
    // the carried dedup ledger still short-circuits redeliveries
    assert(Retrieval.maintainLexicon(base, lex, maxDeliveries = 2) === "none")
    assert(Retrieval.upsertLexicon(
      docsOf(101L -> "delta doc number 1 arrives"), lex,
      deliveryId = "f-d1") === "duplicate")
  }

  test("lexicon-upsert stream resumes from a real checkpoint without double-append") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_r14_lexus").toString
    val (srcDir, ckpt, lex) = (s"$base/src", s"$base/ckpt", s"$base/lex")
    val baseDocs = corpus
    Retrieval.persistLexicon(baseDocs, lex, dfCapDen = 1L)
    val d1 = docsOf(20L -> "needle probe fresh one")
    val d2 = docsOf(21L -> "needle probe fresh two")
    def stream() = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    def dlIds = spark.read.parquet(
      Retrieval.lexTableDirForTest(spark, lex, "dl"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    // run 1: first delivery drains, checkpoint commits
    d1.coalesce(1).write.mode("overwrite").parquet(srcDir)
    graft.streaming.LexiconUpsertStream.run(stream(), lex, Some(ckpt))
    val afterFirst = dlIds
    assert(afterFirst.contains(20L))
    // run 2 with NO new data: resume must append nothing
    graft.streaming.LexiconUpsertStream.run(stream(), lex, Some(ckpt))
    assert(dlIds === afterFirst,
      "a resume with no new files must not re-append committed batches")
    // run 3: second delivery lands; resumed query picks up ONLY it
    d2.coalesce(1).write.mode("append").parquet(srcDir)
    graft.streaming.LexiconUpsertStream.run(stream(), lex, Some(ckpt))
    assert(dlIds === (afterFirst :+ 21L).sorted,
      "checkpointed streaming upsert equals the bulk upsert's doc set")
    val all = baseDocs.union(d1).union(d2)
    assert(Retrieval.bm25Served(all, lex, nq = 1, k = 20).collect()
      .map(_.getLong(1)).toSet.intersect(Set(20L, 21L)) === Set(20L, 21L),
      "both streamed docs retrieve under the frozen stats")
  }

  // ---- SQ8 copy-pass compaction (r13 verdict #4) ----

  test("sq8 tier: a PARTIALLY torn code table heals at compaction — kept codes copied, missing re-encoded") {
    // real 64-dim embeddings: the PQ codebook trainer that persistIndex
    // always runs needs the real subspace shape
    val emb = graft.sources.Sources.embeddings(spark, "/root/testdata/sf0.001")
    val idx = java.nio.file.Files.createTempDirectory("graft_r14_sq8part").toString
    graft.operators.Imi.persistIndex(emb, idx, withSq8 = true)
    val expected = graft.operators.Imi.annSq8Served(emb, idx).collect().toSeq
    // tear a THIRD of the code table out (members intact): the compaction
    // must copy the surviving codes and re-encode only the missing ones
    val v = graft.operators.Imi.currentIndexVersion(spark, idx)
    val sq8Dir = s"$idx/v$v/sq8"
    val surviving = spark.read.schema("vec_id LONG, qc ARRAY<BIGINT>")
      .parquet(sq8Dir).filter(col("vec_id") % 3 =!= 1L).localCheckpoint()
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(sq8Dir), true))
    surviving.write.parquet(sq8Dir)
    graft.operators.Imi.compactIndex(spark, idx)
    assert(graft.operators.Imi.annSq8Served(emb, idx).collect().toSeq === expected,
      "kept codes + re-encoded missing codes must serve exactly the untorn ranking")
  }

  // ---- free-text queries ----

  test("free-text query retrieves by phrase with no self-exclusion; matches the derived surface on the same terms") {
    val docs = docsOf(
      10L -> "needle probe alpha", 11L -> "needle probe beta gamma",
      12L -> "unrelated words entirely", 13L -> "more unrelated filler",
      14L -> "padding one", 15L -> "padding two")
    import spark.implicits._
    val queries = Seq((100L, "needle probe search")).toDF("qid", "text")
    val out = Retrieval.bm25TopKQueries(docs, queries, dfCapDen = 1L).collect()
    assert(out.map(_.getLong(1)).toSet === Set(10L, 11L),
      s"free-text phrase retrieval: ${out.toSeq}")
    // a query equal to a corpus doc retrieves that doc (no exclusion)
    val selfQ = Seq((200L, "needle probe alpha")).toDF("qid", "text")
    val selfOut = Retrieval.bm25TopKQueries(docs, selfQ, dfCapDen = 1L).collect()
    assert(selfOut.map(_.getLong(1)).toSet.contains(10L),
      "a free-text query equal to a corpus doc must retrieve it")
    // served variant agrees with the in-query variant bit-for-bit
    val lex = java.nio.file.Files.createTempDirectory("graft_r14_lexfq").toString
    Retrieval.persistLexicon(docs, lex, dfCapDen = 1L)
    assert(Retrieval.bm25ServedQueries(queries, lex).collect().toSeq ===
      out.toSeq, "served free-text == in-query free-text")
    // ragPackQueries composes on the same hits
    val packed = Retrieval.ragPackQueries(docs, queries, dfCapDen = 1L).collect()
    assert(packed.map(_.getLong(1)).toSet === Set(10L, 11L))
  }
}
