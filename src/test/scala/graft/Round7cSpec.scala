package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, DataQuality, Dedup, TextAnalysis}
import graft.sources.Sources

/** Round-7 widening (session c): eval-split n-gram novelty screen, checked
  * against a first-principles driver recount on sf0.001. */
class Round7cSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  test("ngram novelty matches a driver recount of split + shingle sets") {
    val docs = Sources.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Set[String] =
      if (t == null || t.length < 9) Set.empty
      else (0 to t.length - 9).map(i => t.substring(i, i + 9)).toSet
    def bucket(id: Long): Long = h60(id.toString) % 10
    val trainSet = docs.filter(d => bucket(d._1) < 8)
      .flatMap(d => shingles(d._2)).toSet
    val expect = docs.filter(d => bucket(d._1) >= 8)
      .map { case (id, t) =>
        val sh = shingles(t)
        id -> ((if (bucket(id) == 8) "val" else "test",
          sh.size.toLong, sh.count(trainSet.contains).toLong))
      }.filter(_._2._2 > 0).toMap
    val rows = Curation.ngramNovelty(Sources.documents(spark, dir)).collect()
    assert(rows.length === expect.size)
    rows.foreach { r =>
      val (id, sp, n, seen, nov) = (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))
      assert((sp, n, seen) === expect(id), s"doc $id")
      assert(nov === 1.0 - seen.toDouble / n.toDouble)
      assert(nov >= 0.0 && nov <= 1.0)
    }
    // the screen is non-vacuous both ways on this corpus: some shingle
    // reuse exists, and not everything is memorized
    assert(rows.exists(_.getLong(3) > 0L))
    assert(rows.exists(r => r.getLong(3) < r.getLong(2)))
  }

  test("top duplicated spans are the true top-k boilerplate windows") {
    val docs = Sources.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wins = docs.flatMap { case (id, t) =>
      val toks = t.split(" ", -1)
      if (toks.length < 4) Seq.empty
      else (0 to (toks.length - 4) / 2)
        .map(w => (id, toks.slice(w * 2, w * 2 + 4).mkString(" ")))
    }
    val byWin = wins.groupBy(_._2).map { case (w, g) =>
      (w, g.length.toLong, g.map(_._1).distinct.length.toLong)
    }.filter(_._3 >= 2)
    val expect = byWin.toSeq.sortBy { case (w, occ, _) => (-occ, w) }.take(20)
    val got = TextAnalysis.topSpans(Sources.documents(spark, dir)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
  }

  test("source overlap matrix matches driver shingle-set containments") {
    val docs = Sources.documents(spark, dir)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(t: String): Set[String] =
      if (t == null || t.length < 9) Set.empty
      else (0 to t.length - 9).map(i => t.substring(i, i + 9)).toSet
    val bySource = docs.groupBy(_._3).map { case (s, g) =>
      s -> g.flatMap(d => shingles(d._2)).map(h60).toSet
    }
    val sources = bySource.keys.toSeq.sorted
    val expect = (for (a <- sources; b <- sources if a != b) yield {
      val na = bySource(a).size.toLong
      val ni = (bySource(a) intersect bySource(b)).size.toLong
      (a, b, na, ni, ni.toDouble / na.toDouble)
    }).toSeq
    val got = Dedup.sourceOverlap(Sources.documents(spark, dir)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expect)
    // non-vacuous: at least one pair intersects
    assert(got.exists(_._4 > 0L))
  }

  test("lang confusion matrix partitions the corpus and tracks langId") {
    val docs = Sources.documents(spark, dir)
    val m = TextAnalysis.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m.values.sum === docs.count())
    // cross-check each cell against the gated per-doc predictions
    val pred = TextAnalysis.langId(docs)
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val decl = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = decl.keys.toSeq
      .map(id => (decl(id), pred(id)))
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    assert(m === expect)
  }

  test("split-drift KS matches a driver recount and brackets in [0,1]") {
    val docs = Sources.documents(spark, dir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def isTr(id: Long): Boolean = h60(id.toString) % 10 < 8
    val tr = docs.filter(d => isTr(d._1)).map(_._2).sorted
    val ho = docs.filter(d => !isTr(d._1)).map(_._2).sorted
    val lens = (tr ++ ho).distinct.sorted
    val dScaled = lens.map { x =>
      math.abs(tr.count(_ <= x).toLong * ho.length.toLong -
        ho.count(_ <= x).toLong * tr.length.toLong)
    }.max
    val r = DataQuality.splitDrift(Sources.documents(spark, dir)).head()
    assert(r.getLong(0) === tr.length.toLong)
    assert(r.getLong(1) === ho.length.toLong)
    assert(r.getLong(2) === dScaled)
    val ks = r.getDouble(3)
    assert(ks === dScaled.toDouble / (tr.length.toLong * ho.length.toLong).toDouble)
    assert(ks >= 0.0 && ks <= 1.0)
    // a hash split should NOT drift much — this doubles as a split sanity
    // gate on the shipped corpus
    assert(ks < 0.25)
  }

  test("embedding norm histogram partitions the vector set") {
    val vecs = Sources.embeddings(spark, dir)
      .select("emb").collect().map(_.getSeq[Double](0))
    val rows = DataQuality.embNorms(Sources.embeddings(spark, dir)).collect()
    assert(rows.map(_.getLong(1)).sum === vecs.length.toLong)
    val sqs = vecs.map(_.foldLeft(0.0)((a, x) => a + x * x))
    val expect = sqs.groupBy(s => math.floor(s * 64.0).toLong)
      .map { case (b, g) => b -> ((g.length.toLong, g.min, g.max)) }
    rows.foreach { r =>
      assert(expect(r.getLong(0)) ===
        ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      // bucket edges are consistent with the stored extremes
      assert(math.floor(r.getDouble(2) * 64.0).toLong === r.getLong(0))
      assert(math.floor(r.getDouble(3) * 64.0).toLong === r.getLong(0))
    }
  }

  test("covariance pass: driver recount, and the diagonal IS dimStats' q2") {
    val vecs = Sources.embeddings(spark, dir)
      .select("emb").collect().map(_.getSeq[Double](0))
    val qs = vecs.map(_.map(v => math.floor(v * 1024.0).toLong).toArray)
    val d = qs.head.length
    val rows = DataQuality.embCovariance(Sources.embeddings(spark, dir))
      .collect()
    assert(rows.length === d * (d + 1) / 2)
    val got = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val n = qs.length.toLong
    for (i <- 0 until d; j <- i until d) {
      val s = qs.map(q => q(i) * q(j)).sum
      val si = qs.map(_(i)).sum
      val sj = qs.map(_(j)).sum
      val cov = s.toDouble / n.toDouble -
        (si.toDouble / n.toDouble) * (sj.toDouble / n.toDouble)
      assert(got((i.toLong, j.toLong)) === ((n, s, cov)), s"cell ($i,$j)")
    }
    // cross-operator invariant: the diagonal is exactly dimStats' q2_sum
    val q2 = DataQuality.dimStats(Sources.embeddings(spark, dir))
      .select("dim", "q2_sum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    q2.foreach { case (dim, s2) => assert(got((dim, dim))._2 === s2) }
  }

  test("rate anomaly: exact median/MAD recount; flag rule holds") {
    val ev = Sources.events(spark, dir)
      .selectExpr("ts div 3600000000000 as h").collect()
      .map(_.getLong(0))
    val counts = ev.groupBy(identity).map { case (h, g) => h -> g.length.toLong }
    def medOf(xs: Seq[Long]): Long = {
      val s = xs.sorted
      // percentile_disc(0.5): smallest value with CDF >= 0.5
      s((math.ceil(s.length * 0.5) - 1).toInt)
    }
    val med = medOf(counts.values.toSeq)
    val mad = medOf(counts.values.map(c => math.abs(c - med)).toSeq)
    val rows = graft.operators.Relational.rateAnomaly(spark, dir).collect()
    assert(rows.length === counts.size)
    rows.foreach { r =>
      val (h, n, m, md, fl) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))
      assert(n === counts(h))
      assert(m === med && md === mad)
      assert(fl === (math.abs(n - med) > mad * 3))
    }
  }

  test("best-of-cluster keeps exactly one max-quality member per cluster") {
    val docs = Sources.documents(spark, dir)
    val best = Dedup.bestOfCluster(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // one survivor per cluster, clusters keyed uniquely
    assert(best.map(_._2).distinct.length === best.length)
    // same survivor COUNT as the min-id policy (same clustering, one per
    // cluster + singletons)
    assert(best.length === Dedup.nearDupSurvivors(docs).count().toInt)
    val labels = Dedup.nearDupClusters(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val qual = graft.operators.TextAnalysis.qualityScore(docs)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expect = labels.groupBy(_._2).map { case (c, g) =>
      val pick = g.map(_._1).minBy(id => (-qual(id), id))
      c -> pick
    }
    val clustered = labels.map(_._1).toSet
    best.foreach { case (id, c, q) =>
      assert(q === qual(id))
      if (clustered.contains(id)) assert(expect(c) === id, s"cluster $c")
      else assert(c === id) // singleton is its own representative
    }
    // the policy genuinely differs from min-id somewhere on this corpus
    val minIdPicks = labels.groupBy(_._2).map { case (c, g) => c -> g.map(_._1).min }
    assert(expect.exists { case (c, id) => minIdPicks(c) != id })
  }

  test("quality-band dup profile partitions the corpus; dup mass is exact") {
    val docs = Sources.documents(spark, dir)
    val rows = Curation.qualityDupProfile(docs).collect()
    assert(rows.map(_.getLong(1)).sum === docs.count())
    val nDistinctTexts = docs.select("text").distinct().count()
    assert(rows.map(_.getLong(2)).sum === docs.count() - nDistinctTexts)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) === r.getLong(2).toDouble / r.getLong(1).toDouble)
    }
  }

  test("lsh tuning summary agrees with the gated pair list") {
    val docs = Sources.documents(spark, dir)
    val r = Dedup.lshTuning(docs).head()
    val (nDocs, nCand, nVer, prec) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nVer === Dedup.minhashLshPairs(docs).count())
    assert(nCand >= nVer && nVer > 0L)
    assert(prec === nVer.toDouble / nCand.toDouble)
    // signature domain = docs long enough to carry a 9-gram
    assert(nDocs === docs.filter(length(col("text")) >= 9).count())
  }

  test("text-norm audit: identity on clean text, exact counts on dirty") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "clean single spaced text"),
      (2L, "two  spaces and   three"),
      (3L, "\ttab\tstart and end "),
      (4L, "café résumé")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.textNormAudit(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(5)))).toMap
    assert(got(1L) === ((0L, 0L, 0L, false)))
    assert(got(2L) === ((0L, 2L, 0L, true)))
    assert(got(3L) === ((2L, 0L, 0L, true)))
    assert(got(4L) === ((0L, 0L, 3L, false))) // é×3, counted per code point
    // real corpus: fingerprint of an unchanged doc equals the raw text hash
    val corpus = Sources.documents(spark, dir)
    val audit = TextAnalysis.textNormAudit(corpus)
    val rawFp = corpus.select(col("doc_id"),
      graft.functions.Hashes.h60(col("text")).as("fp"))
    val joined = audit.join(rawFp, "doc_id")
      .filter(!col("changed") && col("norm_fp") =!= col("fp"))
    assert(joined.count() === 0L)
  }

  test("length-matched resampling: exact thresholds and kept counts") {
    val docs = Sources.documents(spark, dir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def coin(id: Long): Long = h60(id.toString)
    val sided = docs.map { case (id, nc) =>
      (nc / 100, coin(id) % 10 < 8, coin(id) % 1048576, id)
    }
    val tTr = sided.count(_._2).toLong
    val tHo = sided.count(!_._2).toLong
    val rows = Curation.lengthMatchSample(Sources.documents(spark, dir))
      .collect()
    val byBand = sided.groupBy(_._1)
    assert(rows.length === byBand.size)
    rows.foreach { r =>
      val (band, nTr, nHo, thr, nKept) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val g = byBand(band)
      assert(nTr === g.count(_._2).toLong)
      assert(nHo === g.count(!_._2).toLong)
      val expectThr = if (nTr == 0L) 0L
        else math.min(1048576L, (1048576L * nHo * tTr) / (tHo * nTr))
      assert(thr === expectThr)
      assert(nKept === g.count(x => x._2 && x._3 < thr).toLong)
      assert(nKept <= nTr)
      if (thr == 1048576L) assert(nKept === nTr) // uncapped band keeps all
    }
  }

  test("lsh recall intersects the two gated pair lists exactly") {
    val docs = Sources.documents(spark, dir)
    val exact = Dedup.prefixJaccardPairs(docs).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r = Dedup.lshRecall(docs).head()
    assert(r.getLong(0) === exact.size.toLong)
    assert(r.getLong(1) === (exact intersect lsh).size.toLong)
    assert(r.getDouble(2) ===
      (exact intersect lsh).size.toDouble / exact.size.toDouble)
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
  }

  test("oov rate: driver recount under a small vocab; top-k is honored") {
    val k = 20
    val docs = Sources.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val cf = docs.flatMap(_._2).groupBy(identity)
      .map { case (t, g) => t -> g.length.toLong }
    val vocab = cf.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
      .map(_._1).toSet
    val rows = TextAnalysis.oovRate(Sources.documents(spark, dir), k)
      .collect()
    assert(rows.length === docs.length)
    rows.foreach { r =>
      val (id, n, oov, frac) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val toks = docs.find(_._1 == id).get._2
      assert(n === toks.length.toLong)
      assert(oov === toks.count(t => !vocab.contains(t)).toLong)
      assert(frac === oov.toDouble / n.toDouble)
    }
  }

  test("key-skew profile partitions keys and rows into log2 bands") {
    val ev = Sources.events(spark, dir).select("user_id").collect()
      .map(_.getLong(0))
    val counts = ev.groupBy(identity).map { case (u, g) => u -> g.length.toLong }
    def flog2(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val expect = counts.values.groupBy(c => flog2(c).toLong)
      .map { case (b, g) => b -> ((g.size.toLong, g.sum, g.max)) }
    val rows = graft.operators.Skew
      .keySkewProfile(Sources.events(spark, dir), "user_id").collect()
    assert(rows.length === expect.size)
    rows.foreach { r =>
      assert(expect(r.getLong(0)) ===
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
    }
    assert(rows.map(_.getLong(2)).sum === ev.length.toLong)
  }

  test("windowed co-occurrence lift matches a driver recount") {
    val docs = Sources.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    val toks = docs.map(_.split(" ", -1))
    val uni = toks.flatten.groupBy(identity)
      .map { case (t, g) => t -> g.length.toLong }
    val nu = uni.values.sum
    val allPairs = toks.filter(_.length >= 2).flatMap { t =>
      (1 to 2).flatMap { d =>
        (0 until t.length - d).map { i =>
          val (x, y) = (t(i), t(i + d))
          if (x <= y) (x, y) else (y, x)
        }
      }
    }
    val np = allPairs.length.toLong
    val cab = allPairs.groupBy(identity)
      .map { case (p, g) => p -> g.length.toLong }
      .filter(_._2 >= 5L)
    val rows = TextAnalysis.cooccurLift(Sources.documents(spark, dir))
      .collect()
    assert(rows.length === cab.size)
    rows.foreach { r =>
      val (wa, wb, c, ca, cb, lift) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(cab((wa, wb)) === c, s"pair ($wa,$wb)")
      assert(ca === uni(wa) && cb === uni(wb))
      assert(lift === (c.toDouble / np.toDouble) /
        ((ca.toDouble / nu.toDouble) * (cb.toDouble / nu.toDouble)))
    }
  }

  test("join-cardinality estimate equals the actual join to the row") {
    val r = graft.operators.Relational.joinCardCheck(spark, dir).head()
    assert(r.getBoolean(2))
    val o = Sources.table(spark, dir, "orders")
    val l = Sources.table(spark, dir, "lineitem")
    val actual = o.join(l,
      o("o_orderkey") === l("l_orderkey")).count()
    assert(r.getLong(0) === actual && r.getLong(1) === actual)
  }

  test("session stats partition q_sessions exactly") {
    val sessions = graft.operators.Relational.sessionize(spark, dir)
      .select("n_events", "duration_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def flog2(x: Long) = (63 - java.lang.Long.numberOfLeadingZeros(x)).toLong
    def medOf(xs: Seq[Long]): Long = {
      val s = xs.sorted; s((math.ceil(s.length * 0.5) - 1).toInt)
    }
    val expect = sessions.groupBy(s => flog2(s._1)).map { case (b, g) =>
      b -> ((g.length.toLong, g.map(_._1).sum, g.map(_._2).max,
        medOf(g.map(_._2).toSeq)))
    }
    val rows = graft.operators.Relational.sessionStats(spark, dir).collect()
    assert(rows.length === expect.size)
    rows.foreach { r =>
      assert(expect(r.getLong(0)) ===
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    }
    assert(rows.map(_.getLong(1)).sum === sessions.length.toLong)
  }

  test("keyword search returns the true integer-idf top-k") {
    val terms = Seq("data", "model", "learning")
    val docs = Sources.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    def flog2(x: Long) = (63 - java.lang.Long.numberOfLeadingZeros(x)).toLong
    val nd = docs.length.toLong
    val df = terms.map(t =>
      t -> docs.count(_._2.contains(t)).toLong).toMap
    val scored = docs.map { case (id, toks) =>
      val hits = terms.filter(toks.contains)
      val score = hits.map(t =>
        toks.count(_ == t).toLong * (flog2(nd) - flog2(df(t)))).sum
      (id, hits.length.toLong, score)
    }.filter(_._2 > 0)
    val expect = scored.sortBy { case (id, _, s) => (-s, id) }.take(10).toSeq
    val got = TextAnalysis.keywordSearch(Sources.documents(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
  }

  test("dataset card numbers are each first-principles exact") {
    val docs = Sources.documents(spark, dir)
    val r = TextAnalysis.datasetCard(docs).head()
    val toks = docs.select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
    assert(r.getLong(0) === docs.count())
    assert(r.getLong(1) === toks.length.toLong)
    assert(r.getLong(2) === toks.distinct.length.toLong)
    assert(r.getLong(3) === docs.select("lang").distinct().count())
    assert(r.getLong(4) === docs.select("source").distinct().count())
    assert(r.getLong(5) ===
      docs.count() - docs.select("text").distinct().count())
    assert(r.getDouble(7) === toks.length.toDouble / docs.count().toDouble)
  }

  test("packing stats: bins partition the doc stream; fill is exact") {
    val docs = Sources.documents(spark, dir)
    val packed = Curation.packSequences(docs).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))) // lang, n_tok, bin
    val rows = Curation.packingStats(docs).collect()
    val byLang = packed.groupBy(_._1)
    assert(rows.length === byLang.size)
    rows.foreach { r =>
      val (lang, nBins, nFull, nTok, fill) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))
      val g = byLang(lang)
      val bins = g.map(_._3).distinct
      assert(nBins === bins.length.toLong)
      assert(nFull === bins.count(_ < bins.max).toLong)
      assert(nTok === g.map(_._2).sum)
      assert(fill === nTok.toDouble / (nBins * 2048L).toDouble)
      // every closed bin is within one doc's overshoot of the budget:
      // fill can exceed 1 per bin (a doc straddles), but never the mean
      assert(fill > 0.0)
    }
  }

  test("pair similarity histogram partitions the verified pair list") {
    val docs = Sources.documents(spark, dir)
    val pairs = Dedup.minhashLshPairs(docs).select("jaccard").collect()
      .map(_.getDouble(0))
    val expect = pairs.groupBy(j => math.floor(j * 20.0).toLong)
      .map { case (b, g) => b -> ((g.length.toLong, g.min, g.max)) }
    val rows = Dedup.pairSimHistogram(docs).collect()
    assert(rows.length === expect.size)
    rows.foreach { r =>
      assert(expect(r.getLong(0)) ===
        ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
    }
    assert(rows.map(_.getLong(1)).sum === pairs.length.toLong)
  }

  test("per-dimension stats match a driver recount of quantized moments") {
    val vecs = Sources.embeddings(spark, dir)
      .select("emb").collect().map(_.getSeq[Double](0))
    val d = vecs.head.length
    val rows = DataQuality.dimStats(Sources.embeddings(spark, dir)).collect()
    assert(rows.length === d)
    rows.foreach { r =>
      val dim = r.getLong(0).toInt
      val col = vecs.map(_(dim))
      val q = col.map(v => math.floor(v * 1024.0).toLong)
      assert(r.getLong(1) === vecs.length.toLong)
      assert(r.getLong(2) === q.sum)
      assert(r.getLong(3) === q.map(x => x * x).sum)
      assert(r.getDouble(4) === col.min)
      assert(r.getDouble(5) === col.max)
      assert(r.getDouble(6) === q.sum.toDouble / vecs.length.toDouble)
    }
  }
}
