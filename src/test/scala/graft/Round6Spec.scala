package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, KMeans, Multimodal, Relational, Similarity, TextAnalysis}
import graft.sources.Sources

/** Round-6 hardening: the trained fixed-k IVF coarse quantizer (the round-5
  * verdict's one remaining quadratic-in-n shape) and pageRank lineage
  * truncation for long horizons. */
class Round6Spec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  test("IVF cell count scales with corpus size at bounded mean occupancy") {
    // r7 verdict finding #2 inverted the r6 contract: a k CONSTANT in corpus
    // size makes the within-cell verify n²/k — quadratic at 100 TB. The
    // quantizer now derives k from a fixed target occupancy (k = ⌈n/32⌉,
    // floor 8, literal-plan cap 4096), so cells GROW with the corpus and
    // Σ|cell|² stays ~n·occupancy.
    val emb = Sources.embeddings(spark, dir).select("vec_id", "label", "emb")
    val n = emb.count()
    def expectK(rows: Long): Int =
      math.min(4096L, math.max(8L, (rows + 31) / 32)).toInt
    assert(Similarity.ivfK(emb) === expectK(n))
    val emb3 = emb.crossJoin(spark.range(3).select(col("id").as("_rep")))
      .withColumn("vec_id", col("vec_id") + col("_rep") * 10000000L)
      .drop("_rep")
    // 3x the corpus derives ~3x the cells (exact ceil arithmetic) ...
    val k3 = Similarity.ivfK(emb3)
    assert(k3 === expectK(3 * n))
    // ... and the trained assignment keeps mean occupancy at the target:
    // cells ≤ k by construction, non-empty cells ≥ k/4 (Lloyd from the
    // k-lowest-id init may merge some cells, never explode them)
    val centers = KMeans.trainCenters(emb3, k3, Similarity.IvfTrainIters)
    val sizes = Similarity.assignCells(
        emb3.select(col("vec_id"), col("emb")), centers)
      .groupBy("cid").count().collect().map(_.getLong(1))
    assert(sizes.sum === 3 * n)
    assert(sizes.length <= k3 && sizes.length >= k3 / 4)
  }

  test("annIvf: ranks follow cosine order, self excluded, deterministic") {
    val emb = Sources.embeddings(spark, dir)
    val r1 = Similarity.annIvf(emb, nQueries = 3, k = 5).collect()
    val r2 = Similarity.annIvf(emb, nQueries = 3, k = 5).collect()
    assert(r1.toSeq == r2.toSeq, "trained-quantizer ANN must be deterministic")
    assert(r1.nonEmpty && r1.length <= 3 * 5)
    r1.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(!rows.exists(_.getLong(1) == qid), "self excluded")
      val ranks = rows.map(_.getLong(2)).sorted
      assert(ranks.sameElements(1L to ranks.length), "ranks dense from 1")
    }
  }

  test("blocked near-dup pairs are a subset of the exact all-pairs answer") {
    val emb = Sources.embeddings(spark, dir)
    val exact = Similarity.neardupCosine(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.neardupCosineBlocked(emb).collect()
    assert(blocked.map(r => (r.getLong(0), r.getLong(1))).toSet.subsetOf(exact),
      "IVF blocking may lose cross-cell pairs but must never invent them")
    blocked.foreach(r => assert(r.getDouble(2) >= 0.45))
  }

  test("media header parse decodes known-good external byte fixtures") {
    // the canonical 1x1 RGBA PNG header (widely published test vector —
    // NOT produced by our own writer), through the same parser the engine
    // runs per row: signature check, IHDR read, CRC-32 verification
    val png1x1 = Array(
      0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0x00, 0x00, 0x00, 0x0D, 0x49, 0x48, 0x44, 0x52, // len=13, "IHDR"
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01, // 1 x 1
      0x08, 0x06, 0x00, 0x00, 0x00,                   // depth 8, RGBA
      0x1F, 0x15, 0xC4, 0x89                          // published IHDR CRC
    ).map(_.toByte)
    assert(Multimodal.decodeHeader(png1x1) == (("png", 1L, 1L)))
    // JPEG whose SOF0 is NOT the first segment: an APP0/JFIF segment sits
    // in front, so only a real marker walk (not a fixed offset) finds it
    val jfif = Array(
      0xFF, 0xD8,                                     // SOI
      0xFF, 0xE0, 0x00, 0x10,                         // APP0, len 16
      0x4A, 0x46, 0x49, 0x46, 0x00, 0x01, 0x01, 0x00, // "JFIF",version,units
      0x00, 0x01, 0x00, 0x01, 0x00, 0x00,             // density 1x1, no thumb
      0xFF, 0xC0, 0x00, 0x0B, 0x08,                   // SOF0, len 11, 8-bit
      0x01, 0x00, 0x02, 0x80, 0x01,                   // h=256, w=640, 1 comp
      0x01, 0x11, 0x00                                // comp id/sampling/qt
    ).map(_.toByte)
    assert(Multimodal.decodeHeader(jfif) == (("jpeg", 640L, 256L)))
    // corruption fails loudly: flip one IHDR bit and the CRC must reject it
    val bad = png1x1.clone(); bad(16) = (bad(16) ^ 1).toByte
    intercept[IllegalArgumentException](Multimodal.decodeHeader(bad))
  }

  test("dupSpans marks exactly the windows shared across distinct docs") {
    import spark.implicits._
    // doc 1 and 2 share the span "a b c d" (padded to different positions);
    // doc 3 repeats a span internally (must NOT count — df is distinct-doc);
    // doc 4 is too short to carry any width-4 window
    val docs = Seq(
      (1L, "a b c d x y z w"),
      (2L, "p q a b c d"),
      (3L, "k l m n k l m n"),
      (4L, "u v w")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dupSpans(docs, width = 4, stride = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    // doc1 windows: [a b c d][c d x y][x y z w] → 1 dup of 3
    assert(got(1L) == ((3L, 1L, 1.0 / 3.0)))
    // doc2 windows: [p q a b][a b c d] → 1 dup of 2
    assert(got(2L) == ((2L, 1L, 0.5)))
    // doc3 windows: [k l m n][m n k l][k l m n] — "k l m n" twice but only
    // in ONE doc → no window is cross-doc duplicated
    assert(got(3L) == ((3L, 0L, 0.0)))
    assert(!got.contains(4L), "short docs carry no full window")
  }

  test("int8 quantization: error bounded by half a step, zero vector safe") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.27, -1.27, 0.5, 0.0)),
      (1L, Seq(0.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.001, -0.002, 0.0005, 0.002))
    ).toDF("vec_id", "emb")
    val got = Similarity.quantizeInt8(emb).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    // vec 0: scale = 1.27/127 = 0.01; codes ±127 at the extremes
    assert(math.abs(got(0L)._1 - 0.01) < 1e-12)
    assert(got(0L)._2 == 2L, "both extreme coordinates saturate")
    // zero vector: scale 0, no saturation, no error
    assert(got(1L) == ((0.0, 0L, 0L)))
    // per-element error is <= scale/2, so err_q <= dims * scale/2 * 2^30
    got.foreach { case (id, (scale, _, errQ)) =>
      assert(errQ >= 0L &&
        errQ <= math.ceil(4 * (scale / 2) * 1073741824.0).toLong + 4,
        s"vec $id err_q=$errQ out of bound for scale=$scale")
    }
    // real fixture: every vector quantizes, errors all within bound
    val fx = Similarity.quantizeInt8(Sources.embeddings(spark, dir)).collect()
    assert(fx.length == Sources.embeddings(spark, dir).count())
    fx.foreach { r =>
      val bound = math.ceil(64 * (r.getDouble(1) / 2) * 1073741824.0).toLong + 64
      assert(r.getLong(3) <= bound)
    }
  }

  test("semdedup survivors partition the corpus against blocked near-dups") {
    val emb = Sources.embeddings(spark, dir)
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    val pairs = Similarity.neardupCosineBlocked(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val survivors = Similarity.semdedupSurvivors(emb).collect()
      .map(_.getLong(0)).toSet
    val dropped = pairs.map(_._2).toSet
    assert(survivors == all.diff(dropped),
      "survivors must be exactly the corpus minus every pair's b side")
    // the lowest id of every near-dup pair always survives unless it is
    // itself someone's b
    pairs.foreach { case (a, _) =>
      assert(survivors.contains(a) || dropped.contains(a))
    }
  }

  test("containment flags a contained doc that jaccard dilutes away") {
    import spark.implicits._
    val contained = "alpha beta gamma delta epsilon zeta eta theta"
    val container = contained +
      " plus a long unique tail that keeps on going with many extra words" +
      " so the symmetric jaccard similarity drops well below one half"
    val docs = Seq(
      (1L, contained), (2L, container),
      (3L, "completely unrelated text about something else entirely here")
    ).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(docs, dfCap = 20, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(cont.contains((1L, 2L)), "doc 1's shingles all sit inside doc 2")
    assert(cont((1L, 2L)) == 1.0)
    val jac = Dedup.ngramJaccardPairs(docs, dfCap = 20, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)),
      "symmetric jaccard must miss the containment pair at the same strength")
  }

  test("corpus stopwords: df fraction thresholds the vocabulary") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the dog ran"), (3L, "the bird flew"),
      (4L, "a rare xylophone")
    ).toDF("doc_id", "text")
    val sw = TextAnalysis.stopwords(docs, minDfFrac = 0.5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(sw.contains("the") && sw("the") == ((3L, 0.75)))
    assert(!sw.contains("xylophone") && !sw.contains("cat"))
  }

  test("annRecall: one row per query, hits consistent with the two top-k lists") {
    val emb = Sources.embeddings(spark, dir)
    val nQ = 3; val k = 5
    val got = Similarity.annRecall(emb, nQueries = nQ, k = k, nprobe = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == (0L until nQ).toSet, "every query emits exactly one row")
    // recompute the intersection from the two public operators directly
    val exact = Similarity.annBruteForce(emb, nQ, k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.annIvf(emb, nQ, k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (qid, (hits, recall)) =>
      val want = approx.count { case (q, n) => q == qid && exact((q, n)) }
      assert(hits == want.toLong, s"qid=$qid hits")
      assert(recall == hits.toDouble / k, s"qid=$qid recall")
      assert(hits >= 0L && hits <= k)
    }
  }

  test("crossSourceLeak: cells sum to the pair count, sources normalized") {
    import spark.implicits._
    // three sources; near-identical texts within s1 and across s1/s3 (the
    // fixture at sf0.001 has no verified LSH pairs, so build a corpus whose
    // pair structure is known: 1~2 same-source, 3~4 cross-source)
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    val docs = Seq(
      (1L, base + "tail one", "s1"),
      (2L, base + "tail two", "s1"),
      (3L, base + "other a", "s3"),
      (4L, base + "other b", "s2"),
      (5L, "completely different text with nothing shared at all here", "s2")
    ).toDF("doc_id", "text", "source")
    val pairs = Dedup.minhashLshPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val leak = Dedup.crossSourceLeak(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(leak.values.sum == pairs.length.toLong,
      "matrix cells must partition the verified pair set")
    leak.keys.foreach { case (a, b) =>
      assert(a <= b, "source pair must be LEAST/GREATEST normalized") }
    // doc 5 shares nothing: no pair may touch it
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    // the near-identical docs MUST pair (deterministic pipeline, jaccard
    // ≈ 0.9 on this fixture), and each pair lands in its exact cell — the
    // diagonal for the same-source pair, the normalized off-diagonal for
    // the cross-source pair (the matrix's actual purpose)
    assert(pairs.contains((1L, 2L)), "same-source near-dup pair must verify")
    assert(pairs.contains((3L, 4L)), "cross-source near-dup pair must verify")
    assert(leak.getOrElse(("s1", "s1"), 0L) >= 1L, "diagonal cell")
    assert(leak.getOrElse(("s2", "s3"), 0L) >= 1L, "off-diagonal cell")
  }

  test("dedupRetention: per-source counts reconcile with the survivor set") {
    import spark.implicits._
    // known structure: 1~2~3 form one near-identical cluster spanning s1/s2
    // (reps 1 survives), 4 and 5 are unique
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    val docs = Seq(
      (1L, base + "tail one", "s1"),
      (2L, base + "tail two", "s1"),
      (3L, base + "tail three", "s2"),
      (4L, "some entirely different document about other matters here", "s2"),
      (5L, "yet another unique text body with its own words", "s3")
    ).toDF("doc_id", "text", "source")
    val survivors = Dedup.nearDupSurvivors(docs).collect().map(_.getLong(0)).toSet
    val ret = Dedup.dedupRetention(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(ret.keySet == Set("s1", "s2", "s3"), "every source emits a row")
    // totals reconcile against the survivor pipeline exactly, per source
    val bySource = Map("s1" -> Seq(1L, 2L), "s2" -> Seq(3L, 4L), "s3" -> Seq(5L))
    bySource.foreach { case (s, ids) =>
      val (nDocs, nSurv, retention) = ret(s)
      assert(nDocs == ids.length.toLong, s"$s n_docs")
      assert(nSurv == ids.count(survivors).toLong, s"$s n_survivors")
      assert(retention == nSurv.toDouble / nDocs.toDouble, s"$s retention")
    }
    // the cluster dropped someone: at least one source retains < 1.0
    assert(ret.values.exists(_._3 < 1.0), "fixture must drop a duplicate")
  }

  test("pageRank truncates lineage every 10 rounds: iters=25 plans stay shallow") {
    val docs = Sources.documents(spark, dir)
    def planLines(df: DataFrame): Int =
      df.queryExecution.logical.numberedTreeString.linesIterator.length
    val pr5 = Dedup.pageRank(docs, iters = 5)
    val pr25 = Dedup.pageRank(docs, iters = 25)
    // without the round%10 checkpoint the 25-round plan would be ~5x the
    // 5-round plan (each round appends a join+agg); with it, the final plan
    // holds only the rounds since the last checkpoint (21..25) — i.e. the
    // same depth as iters=5 over a shallower (checkpointed) base. This is
    // the structural form of "analysis time stays linear in iters".
    assert(planLines(pr25) <= planLines(pr5),
      s"iters=25 plan (${planLines(pr25)} lines) must not outgrow " +
        s"iters=5 (${planLines(pr5)} lines)")
    val r1 = pr25.collect()
    val r2 = Dedup.pageRank(docs, iters = 25).collect()
    assert(r1.toSeq == r2.toSeq, "long-horizon pageRank must stay deterministic")
    assert(r1.nonEmpty)
  }

  test("incrementalDedup: statuses partition the batch, precedence and witnesses hold") {
    import spark.implicits._
    // handcrafted corpus: d1 in-batch exact-dups corpus d10 AND near-dups
    // d11 (exact must win); d2 near-dups d11 (one char changed of ~40);
    // d3 is novel; d4 is sub-shingle-length (no signature rows — must
    // still classify, as new); d5 exact-dups ONLY within the batch itself
    // (batch-internal dup is NOT a corpus dup — must stay new)
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base, "en", "batch", base.length.toLong),
      (2L, base.replace("again and again", "again and AGAIN"), "en", "batch", base.length.toLong),
      (3L, "completely unrelated text with nothing shared at all here", "en", "batch", 58L),
      (4L, "tiny", "en", "batch", 4L),
      (5L, "batch internal duplicate content right here", "en", "batch", 44L),
      (6L, "batch internal duplicate content right here", "en", "batch", 44L),
      (10L, base, "en", "corpus", base.length.toLong),
      (11L, base.replace("dog", "cat"), "en", "corpus", base.length.toLong),
      (12L, "some other corpus document that matches nobody in the batch", "en", "corpus", 59L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.incrementalDedup(docs, "batch").collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L),
      "every batch doc classified exactly once, corpus docs absent")
    assert(out(1L) == ("exact_dup", 10L), "exact match wins over near")
    assert(out(2L)._1 == "near_dup" && Set(10L, 11L)(out(2L)._2))
    assert(out(3L) == ("new", -1L))
    assert(out(4L) == ("new", -1L), "sub-shingle doc classifies as new")
    assert(out(5L) == ("new", -1L) && out(6L) == ("new", -1L),
      "batch-internal dups are not corpus dups")
  }

  test("incrementalDedup agrees with the self-join pair gate on cross-set pairs") {
    // consistency with minhashLshPairs: a batch doc is near_dup-or-better
    // iff the full self-join pair list contains a verified pair straddling
    // the batch/corpus split (restricted to docs with signatures)
    val docs = Sources.documents(spark, dir)
    val batchSrc = "src3"
    val inc = Dedup.incrementalDedup(docs, batchSrc).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val src = docs.select(col("doc_id").cast("long"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val crossPaired = Dedup.minhashLshPairs(docs).collect().flatMap { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      (src(a) == batchSrc, src(b) == batchSrc) match {
        case (true, false) => Seq(a)
        case (false, true) => Seq(b)
        case _ => Seq.empty
      }
    }.toSet
    val nearOrExact = inc.collect { case (id, s) if s != "new" => id }.toSet
    assert(crossPaired.subsetOf(nearOrExact),
      "every cross-set verified pair endpoint must be flagged by the screen")
    // and a near_dup flag not in the pair list can only come from the exact path
    (nearOrExact -- crossPaired).foreach { id =>
      assert(inc(id) == "exact_dup",
        s"doc $id flagged ${inc(id)} but no cross-set verified pair exists")
    }
  }

  test("unigramScore: whole-bit surprisal from exact bit lengths") {
    import spark.implicits._
    // corpus: "a" x4, "b" x2, "c" x1, "d" x1 → T=8, tbits=3
    // floor_log2: cf(a)=4→2, cf(b)=2→1, cf(c)=cf(d)=1→0
    val docs = Seq(
      (1L, "a a b c", "en", "s", 7L),
      (2L, "a a b d", "en", "s", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.unigramScore(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    // doc 1: tokens a,a,b,c → bits = 2*(3-2) + (3-1) + (3-0) = 7; sum_cf = 4+4+2+1 = 11
    assert(r(1L).getLong(1) == 4L && r(1L).getLong(2) == 11L)
    assert(r(1L).getLong(3) == 7L, "surprisal_bits doc1")
    assert(r(1L).getLong(4) == 1L, "hapax c")
    assert(r(1L).getDouble(6) == 7.0 / 4.0, "mean_bits")
    assert(r(2L).getLong(3) == 7L && r(2L).getLong(4) == 1L)
  }

  test("bigramLift: collocations score above chance, independents near 1") {
    import spark.implicits._
    // "x y" always adjacent (a collocation); "p"/"q" co-occur only by chance
    val rows = (0 until 20).map { i =>
      (i.toLong, if (i % 2 == 0) "x y p x y q x y p" else "p q x y q p q x y",
        "en", "s", 0L)
    }
    val docs = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val lift = TextAnalysis.bigramLift(docs, minCount = 5L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    val xy = lift(("x", "y"))
    assert(xy > 2.0, s"collocation lift $xy must exceed chance")
    // every x is followed by y: p(xy)=p(x) → lift = 1/p(y) exactly; with
    // counts nx=ny, lift = Nu²/(Nb·ny) — sanity-bound it
    lift.get(("q", "p")).foreach(qp => assert(qp < xy))
  }

  test("userProfileUpsert: actions partition users, profiles pick the split-side latest") {
    val out = Relational.userProfileUpsert(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(4))).toMap
    val splitNs = java.time.LocalDate.of(2024, 1, 21).toEpochDay *
      86400L * 1000000000L
    val ev = Sources.events(spark, dir)
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val latestOf = (rows: Seq[(Long, Long, Long)]) =>
      rows.groupBy(_._1).view.mapValues(_.maxBy(e => (e._3, e._2))._2).toMap
    val base = latestOf(ev.filter(_._3 < splitNs).toSeq)
    val batch = latestOf(ev.filter(_._3 >= splitNs).toSeq)
    assert(out.keySet == base.keySet ++ batch.keySet, "one row per known user")
    out.foreach { case (u, (eid, action)) =>
      (base.contains(u), batch.contains(u)) match {
        case (true, true)  => assert(action == "update" && eid == batch(u))
        case (false, true) => assert(action == "insert" && eid == batch(u))
        case (true, false) => assert(action == "keep" && eid == base(u))
        case _ => fail(s"user $u in output but in neither side")
      }
    }
    assert(out.values.exists(_._2 == "update"), "fixture exercises update")
  }

  private val sf01 = "/root/testdata/sf0.01"

  test("sortedNeighborPairs: two-level bucket rank equals one global window") {
    import org.apache.spark.sql.expressions.Window
    val docs = Sources.documents(spark, sf01)
    val got = Dedup.sortedNeighborPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: ONE global window over the same (key, doc_id) total order,
    // theta-joined on rank adjacency — no bucketing anywhere
    val d = docs.filter(col("text").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"),
        lower(substring(col("text"), 1, 40)).as("key"),
        lower(substring(col("text"), 1, 64)).as("norm"))
      .withColumn("rank",
        row_number().over(Window.orderBy("key", "doc_id")).cast("long"))
    val want = d.as("x").join(d.as("y"),
        col("y.rank") > col("x.rank") && col("y.rank") - col("x.rank") <= 7)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        levenshtein(col("x.norm"), col("y.norm")).cast("long").as("lev"))
      .filter(col("lev") <= 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == want.toSet, "SNM pair set must match the global window")
    assert(got.length == got.toSet.size, "each pair emitted exactly once")
    assert(got.nonEmpty, "fixture must exercise the window")
  }

  test("editDistancePairs: band join equals the naive quadratic answer") {
    val docs = Sources.documents(spark, sf01)
    val got = Dedup.editDistancePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val d = docs.filter(col("text").isNotNull && length(col("text")) <= 200)
      .select(col("doc_id").cast("long").as("doc_id"), lower(col("text")).as("t"))
    val want = d.as("x").join(d.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        levenshtein(col("x.t"), col("y.t")).cast("long").as("lev"))
      .filter(col("lev") <= 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == want.toSet,
      "Δ-band candidates must cover every qualifying pair exactly")
    assert(got.length == got.toSet.size, "each pair emitted exactly once")
    assert(got.nonEmpty, "fixture must exercise the band join")
    // order respected: identical short docs are 0 edits apart, and every
    // pair's endpoints differ in length by at most the edit bound
    got.foreach { case (_, _, lev) => assert(lev >= 0 && lev <= 16) }
  }
}
