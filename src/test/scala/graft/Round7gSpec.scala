package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, DataQuality, TextAnalysis}
import graft.sources.Sources

/** Round-7 widening (session g): k-anonymity audit, corpus-balance
  * diversity report, contamination attribution, and CCNet-style per-lang
  * perplexity terciles — invariant checks plus first-principles driver
  * recounts.
  */
class Round7gSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"
  private val d01 = "/root/testdata/sf0.01"

  test("k-anonymity classes partition the corpus and the flag is exactly n<k") {
    val docs = Sources.documents(spark, dir)
    val rows = DataQuality.kAnonymity(docs, k = 5L).collect()
    // the QI classes partition the corpus: populations sum to |docs|
    assert(rows.map(_.getLong(3)).sum === docs.count())
    // flag is exactly the sub-k predicate, and both sides are populated
    rows.foreach(r => assert(r.getBoolean(4) === (r.getLong(3) < 5L)))
    assert(rows.exists(_.getBoolean(4)), "fixture must have sub-k classes")
    // class keys are unique (it IS a grouping)
    val keys = rows.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(keys.distinct.length === keys.length)
  }

  test("diversity entropy sits in [0, tbits] per doc and extrema are exact") {
    val docs = Sources.documents(spark, d01)
    val n = docs.count()
    val rows = Curation0.diversityRows(spark, d01)
    assert(rows.map(_._1).sorted.toSeq === Seq("lang", "source"))
    for ((axis, nClasses, nDocs, maxC, minC, topShare, bits, bpd) <- rows) {
      assert(nDocs === n)
      // driver recount of the class extrema
      val counts = docs.groupBy(axis).count().collect().map(_.getLong(1))
      assert(counts.length === nClasses)
      assert(maxC === counts.max && minC === counts.min)
      assert(topShare === maxC.toDouble / nDocs.toDouble)
      // whole-bit entropy bounds: 0 <= H <= n * floor_log2(n)
      val tbits = 63 - java.lang.Long.numberOfLeadingZeros(n)
      assert(bits >= 0L && bits <= n * tbits)
      assert(bpd === bits.toDouble / nDocs.toDouble)
      // more classes -> more entropy on this fixture (source has ~20
      // classes vs lang's 5)
    }
    val byAxis = rows.map(r => r._1 -> r._7).toMap
    assert(byAxis("source") > byAxis("lang"))
  }

  test("contamination attribution covers exactly the contaminated set") {
    val docs = Sources.documents(spark, d01)
    val contaminated = Curation.decontaminate(docs)
      .filter(col("contaminated")).select("doc_id", "n_shingles", "n_hit")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val attr = Curation.contamAttribution(docs).collect()
    assert(attr.map(_.getLong(0)).toSet === contaminated.keySet)
    attr.foreach { r =>
      val (nSh, nHit) = contaminated(r.getLong(0))
      assert(r.getLong(1) === nSh && r.getLong(2) === nHit)
      // the attributed bench doc shares at least one shingle and never
      // more than the doc has hits for
      assert(r.getLong(4) >= 1L && r.getLong(4) <= nHit)
      // witness is a benchmark doc by the split rule
      assert(r.getLong(3) % 97 === 0L)
    }
  }

  test("matryoshka recall is bounded, complete, and grows with prefix width") {
    val rows = graft.operators.Similarity
      .matryoshkaRecall(Sources.embeddings(spark, d01)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // complete grid: every (dim, query) cell reports
    assert(rows.map(r => (r._1, r._2)).toSet ===
      (for (d <- Seq(8L, 16L, 32L); q <- 0L until 5L) yield (d, q)).toSet)
    rows.foreach { case (_, _, ov, rec) =>
      assert(ov >= 0L && ov <= 10L)
      assert(rec === ov.toDouble / 10.0)
    }
    // wider prefixes recover more of the full-dim top-10 in aggregate —
    // the MRL premise the ablation exists to measure
    val byDim = rows.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._3).sum }
    assert(byDim(8L) < byDim(16L) && byDim(16L) < byDim(32L),
      s"aggregate overlap not increasing: $byDim")
  }

  test("neyman allocation matches a driver recount and respects the budget") {
    val docs = Sources.documents(spark, d01)
    val base = docs.select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    val rows = Curation.neymanAllocation(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSet === base.keySet)
    val wTot = rows.map(_._5).sum
    for ((src, n, sx, v, w, alloc) <- rows) {
      val xs = base(src).map(_._2)
      assert(n === xs.length && sx === xs.sum)
      // exact integer variance numerator n·Σx² − (Σx)²
      assert(v === n * xs.map(x => x * x).sum - sx * sx)
      // w is the integer sqrt of v
      assert(w * w <= v && (w + 1) * (w + 1) > v)
      assert(alloc === (100L * w) / wTot)
    }
    // floor allocations never overspend the budget, and the plan spends
    // most of it (sum within |strata| of the target)
    val spent = rows.map(_._6).sum
    assert(spent <= 100L && spent >= 100L - rows.length)
  }

  test("mrr equals a first-principles driver recompute of the full ordering") {
    val emb = Sources.embeddings(spark, d01)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * y(i); i += 1 }; s
      }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val expected = emb.filter(_._1 < 5).map { case (qid, qv, qlabel) =>
      val ranked = emb.filter(_._1 != qid)
        .map { case (nid, nv, nl) => (nid, nl, cos(qv, nv)) }
        .sortBy { case (nid, _, c) => (-c, nid) }
      val first = ranked.indexWhere(_._2 == qlabel) + 1
      (qid, qlabel, first.toLong, 1.0 / first)
    }.sortBy(_._1).toSeq
    val got = graft.operators.Similarity.mrr(Sources.embeddings(spark, d01))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    // non-vacuous: on this fixture not every query's nearest neighbor
    // shares its label (else MRR degenerates to 1.0 everywhere)
    assert(got.exists(_._3 > 1L), s"fixture too easy: $got")
  }

  test("forget audit balances counts and the survivor fingerprint moves") {
    val docs = Sources.documents(spark, d01)
    val rows = DataQuality.forgetAudit(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._2).sum === docs.count())
    rows.foreach { case (_, nb, nd, na, _) => assert(nb === nd + na) }
    // the deletion list is non-empty at this sf and every deleted row is
    // really absent from the fingerprint: recompute the survivor XOR
    assert(rows.map(_._3).sum > 0L)
    val h = docs.select(col("source"), col("doc_id"),
        graft.functions.Hashes.h60(
          concat_ws(":", col("doc_id"), col("text"))).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = h.filter(_._2 % 101 != 0).groupBy(_._1)
      .map { case (s, xs) => s -> xs.map(_._3).reduce(_ ^ _) }
    rows.foreach { case (s, _, nd, na, x) =>
      assert(x === (if (na == 0) 0L else expected(s)))
      // where something was deleted, the audit fingerprint differs from
      // the keep-everything fingerprint (the residue detector is live)
      if (nd > 0) {
        val all = h.filter(_._1 == s).map(_._3).reduce(_ ^ _)
        assert(x !== all, s"source $s: deletion did not move the fingerprint")
      }
    }
  }

  test("robust stats pick real elements and the winsorized sum recomputes") {
    val docs = Sources.documents(spark, d01)
    val base = docs.select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val rows = DataQuality.robustStats(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.map(_._1).toSet === base.keySet)
    for ((src, n, p01, p50, p99, ws, wm) <- rows) {
      val xs = base(src)
      assert(n === xs.length)
      // discrete percentiles are actual elements, ordered
      assert(xs.contains(p01) && xs.contains(p50) && xs.contains(p99))
      assert(p01 <= p50 && p50 <= p99)
      // winsorized sum recomputes exactly from the clip
      assert(ws === xs.map(x => math.max(p01, math.min(p99, x))).sum)
      assert(wm === ws.toDouble / n.toDouble)
    }
  }

  test("burstiness equals the implicit-zeros dispersion recomputed in the driver") {
    val docs = Sources.documents(spark, d01)
    val n = docs.count()
    val tf = TextAnalysis.tokens(docs).groupBy("doc_id", "tok").count()
      .collect().map(r => (r.getString(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = TextAnalysis.burstiness(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSet === tf.keySet)
    for ((tok, df, total, m2, vmr) <- rows) {
      val ms = tf(tok)
      assert(df === ms.length && total === ms.sum &&
        m2 === ms.map(m => m * m).sum)
      assert(vmr === (n * m2 - total * total).toDouble / (n * total).toDouble)
    }
    // the dispersion signal separates tokens frequency cannot: on this
    // fixture every token is super-Poisson (clumped), but the SPREAD is
    // wide — the ranking the signal exists for is non-degenerate
    val vmrs = rows.map(_._5)
    assert(vmrs.max > 1.0 && vmrs.max > 1.2 * vmrs.min,
      s"vmr spread degenerate: min=${vmrs.min} max=${vmrs.max}")
  }

  test("mp4 box walk round-trips and survives an interposed free box") {
    import graft.operators.Multimodal
    val payload = Array.fill(20)(0x42.toByte)
    val mp4 = Multimodal.mp4Bytes(1000, 2500, payload)
    assert(mp4.length === 140 + 20)
    val (nb, ts, dur, mdat) = Multimodal.decodeMp4(mp4)
    assert((nb, ts, dur, mdat) === ((3L, 1000L, 2500L, 20L)))
    // real muxers emit free/skip boxes between ftyp and moov: splice one
    // in and the walker must still reach mvhd (fixed offsets would not)
    val free = Array[Byte](0, 0, 0, 8) ++ "free".getBytes("US-ASCII")
    val spliced = mp4.slice(0, 16) ++ free ++ mp4.slice(16, mp4.length)
    val (nb2, ts2, dur2, mdat2) = Multimodal.decodeMp4(spliced)
    assert((nb2, ts2, dur2, mdat2) === ((4L, 1000L, 2500L, 20L)))
    // a non-BMFF blob fails loudly, not with garbage metadata
    intercept[IllegalArgumentException] {
      Multimodal.decodeMp4("definitely not a movie file".getBytes("US-ASCII"))
    }
    // the fixture pipeline agrees with first principles
    val meta = Multimodal.videoMeta(Sources.documents(spark, dir)).collect()
    assert(meta.nonEmpty)
    meta.foreach { r =>
      val n = r.getAs[Long]("n_bytes") - 140
      assert(r.getAs[Long]("mdat_bytes") === n)
      assert(r.getAs[Long]("duration_ticks") === n * 25)
      assert(r.getAs[Long]("timescale") === 600 + (n * 7) % 9000)
      assert(r.getAs[Long]("duration_ms") ===
        n * 25 * 1000 / (600 + (n * 7) % 9000))
    }
  }

  test("incremental view merge is consistent and the batch is non-vacuous") {
    val docs = Sources.documents(spark, d01)
    val rows = graft.operators.Relational.incrementalView(spark, d01)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    // the identity holds on every key — this is the gate's core claim
    rows.foreach { case (lang, _, _, ok) => assert(ok, s"merge != recompute for $lang") }
    assert(rows.map(_._2).sum === docs.count())
    // non-vacuous: the batch stand-in actually contributes rows, so the
    // merge path exercised a real delta, not an empty join side
    assert(docs.filter(col("doc_id") % 10 === 0).count() > 0L)
    assert(docs.filter(col("doc_id") % 10 =!= 0).count() > 0L)
  }

  test("stickiness recomputes from the user-day table and sits in (0, 1]") {
    val ud = Sources.events(spark, d01)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = graft.operators.Relational.stickiness(spark, d01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet === ud.map(_._2).toSet)
    for ((day, dau, wau, st) <- rows) {
      assert(dau === ud.filter(_._2 == day).map(_._1).distinct.length)
      assert(wau === ud.filter(x => x._2 >= day - 6 && x._2 <= day)
        .map(_._1).distinct.length)
      assert(dau <= wau && st === dau.toDouble / wau.toDouble)
      assert(st > 0.0 && st <= 1.0)
    }
    // non-degenerate: somewhere the weekly window exceeds a single day's
    // actives, else the ratio never leaves 1.0
    assert(rows.exists(_._4 < 1.0))
  }

  test("event trigrams recompute from driver-sorted per-user timelines") {
    val ev = Sources.events(spark, d01)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val tris = ev.groupBy(_._1).values.flatMap { xs =>
      xs.sortBy(x => (x._2, x._3)).map(_._4).sliding(3).filter(_.length == 3)
        .map(s => (s(0), s(1), s(2)))
    }.toSeq
    val ctx = tris.groupBy(t => (t._1, t._2)).view.mapValues(_.size).toMap
    val expected = tris.groupBy(identity).collect {
      case (t, xs) if xs.size >= 5 =>
        (t._1, t._2, t._3, xs.size.toLong, ctx((t._1, t._2)).toLong,
          xs.size.toDouble / ctx((t._1, t._2)).toDouble)
    }.toSeq.sortBy(t => (t._1, t._2, t._3))
    val got = graft.operators.Relational.eventTrigrams(spark, d01).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    // conditional probabilities per context sum to <= 1 (min-support
    // truncates the tail, never inflates)
    got.groupBy(t => (t._1, t._2)).foreach { case (_, xs) =>
      assert(xs.map(_._6).sum <= 1.0 + 1e-12)
    }
  }

  test("streaks recompute from driver islands over the user-day set") {
    val ud = Sources.events(spark, d01)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = ud.groupBy(_._1).map { case (u, xs) =>
      val days = xs.map(_._2).sorted
      // island lengths via consecutive grouping: day - index is constant
      // within a run of consecutive days
      val lens = days.zipWithIndex.groupBy { case (d, i) => d - i }
        .values.map(_.length.toLong).toSeq
      (u, days.length.toLong, lens.size.toLong, lens.max)
    }.toSeq.sortBy(_._1)
    val got = graft.operators.Relational.activeStreaks(spark, d01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    // non-degenerate fixture: some user has a multi-day streak AND a gap
    assert(got.exists(_._4 >= 2L) && got.exists(g => g._3 >= 2L))
  }

  test("peak concurrency matches a driver sweep with netted instants") {
    val dayNs = 86400000000000L
    val ivs = Sources.events(spark, d01).select(col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(0) + 1800000000000L))
    val segs = ivs.flatMap { case (s, e) =>
      (s / dayNs to (e - 1) / dayNs).map(day =>
        (day, math.max(s, day * dayNs), math.min(e, (day + 1) * dayNs)))
    }
    val expected = segs.groupBy(_._1).map { case (day, xs) =>
      val deltas = (xs.map(x => (x._2, 1L)) ++ xs.map(x => (x._3, -1L)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      val peaks = deltas.scanLeft(0L)(_ + _._2).drop(1)
      (day, xs.length.toLong, peaks.max)
    }.toSeq.sortBy(_._1)
    val got = graft.operators.Relational.peakConcurrency(spark, d01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // overlap actually occurs (peak > 1 somewhere) or the sweep is vacuous
    assert(got.exists(_._3 > 1L))
  }

  test("pareto deciles concentrate activity and close at share 1.0") {
    val got = graft.operators.Relational.paretoDeciles(spark, d01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.map(_._1).toSeq === (1L to 10L))
    // cum_events is the running sum and the curve closes at exactly 1.0
    assert(got.map(_._3).sum === got.last._4)
    assert(got.last._5 === 1.0)
    // deciles are ranked by activity: per-decile event mass non-increasing
    got.map(_._3).sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    // concentration is real: the top decile out-produces the bottom
    assert(got.head._3 > got.last._3)
  }

  test("holdout LM covers exactly the eval split and accounts every bigram") {
    val docs = Sources.documents(spark, d01)
    val evalIds = docs.select(col("doc_id"),
        (graft.functions.Hashes.h60(col("doc_id").cast("string")) % 10 < 8)
          .as("is_tr"))
      .filter(!col("is_tr")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val nToks = TextAnalysis.tokens(docs).groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = TextAnalysis.holdoutLmScore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exactly the eval docs with >= 2 tokens are scored
    assert(rows.map(_._1).toSet ===
      evalIds.filter(id => nToks.getOrElse(id, 0L) >= 2L))
    rows.foreach { case (id, nb, ns, no) =>
      // every bigram is either scored or OOV, and the count is n_tokens-1
      assert(nb === ns + no)
      assert(nb === nToks(id) - 1)
    }
    // the fixture's 31-token shared vocabulary scores every eval bigram
    // (n_oov = 0 corpus-wide) — so the OOV path is proven on a
    // constructed corpus below, not here
    assert(rows.map(_._3).sum > 0L, "nothing scored — train side vacuous")

    // OOV path: an eval-split doc carrying a bigram no train doc has —
    // pick ids by replaying the operator's own hash coin
    def isTr(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 10 < 8
    }
    val trainId = (1L to 200L).find(isTr).get
    val evalId = (1L to 200L).find(!isTr(_)).get
    val spk = spark
    import spk.implicits._
    val tiny = Seq(
      (trainId, "alpha beta alpha beta", "en", "s0", 21L),
      (evalId, "alpha beta gamma delta", "en", "s0", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.holdoutLmScore(tiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // eval doc: bigrams (alpha,beta) scored; (beta,gamma), (gamma,delta) OOV
    assert(got.toSeq === Seq((evalId, 3L, 1L, 2L)))
  }

  test("signal correlation equals a driver Spearman over the joined signals") {
    val docs = Sources.documents(spark, d01)
    val q = TextAnalysis.qualityScore(docs).select("doc_id", "quality")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val l = TextAnalysis.lmScore(docs).select("doc_id", "bits_per_bigram")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ids = q.keySet.intersect(l.keySet).toSeq
    val r1 = ids.sortBy(id => (-q(id), id)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val r2 = ids.sortBy(id => (l(id), id)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val sd2 = ids.map(id => { val d = r1(id) - r2(id); d * d }).sum
    val n = ids.length.toLong
    val row = TextAnalysis.signalCorrelation(docs).head()
    assert(row.getLong(0) === n && row.getLong(1) === sd2)
    assert(row.getDouble(2) === 1.0 - (sd2 * 6L).toDouble / (n * (n * n - 1L)).toDouble)
    assert(row.getDouble(2) >= -1.0 && row.getDouble(2) <= 1.0)
  }

  test("coverage grid is complete, counts recompute, and gaps are real") {
    val docs = Sources.documents(spark, d01)
    val langs = docs.select("lang").distinct().count()
    val sources = docs.select("source").distinct().count()
    val rows = DataQuality.coverageGaps(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    // the grid is the FULL cross product — absent combinations included
    assert(rows.length.toLong === langs * sources)
    assert(rows.map(_._3).sum === docs.count())
    rows.foreach { case (_, _, n, missing) => assert(missing === (n == 0L)) }
    // the fixture really has holes (sf0.01 showed 97 of 100 cells filled)
    assert(rows.exists(_._4), "no coverage gaps — grid audit vacuous")
    // every flagged gap is genuinely absent from the corpus
    val present = docs.select("lang", "source").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    rows.filter(_._4).foreach { case (l, s, _, _) =>
      assert(!present((l, s)))
    }
  }

  test("dedup token savings reconcile with retention and the token table") {
    val docs = Sources.documents(spark, d01)
    val rows = graft.operators.Dedup.dedupTokenSavings(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // token masses balance per source and total token mass matches tokens()
    rows.foreach { case (_, tb, td, ta, sv) =>
      assert(tb === td + ta)
      assert(sv === td.toDouble / tb.toDouble)
    }
    assert(rows.map(_._2).sum === TextAnalysis.tokens(docs).count())
    // doc-level retention and token-level savings describe the SAME run:
    // a source drops tokens iff it drops documents
    val ret = graft.operators.Dedup.dedupRetention(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1) - r.getLong(2))).toMap
    rows.foreach { case (src, _, td, _, _) =>
      assert((td > 0L) === (ret(src) > 0L),
        s"$src: token and doc drops disagree")
    }
    assert(rows.exists(_._3 > 0L), "no source drops tokens — dedup vacuous")
  }

  test("augmentation is replayable, partition-invariant, and ~10% dropout") {
    val docs = Sources.documents(spark, d01)
    val a1 = TextAnalysis.augmentDropout(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // replayable: a second run over a different partitioning is identical
    val a2 = TextAnalysis.augmentDropout(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a1.sortBy(_._1).toSeq === a2.sortBy(_._1).toSeq)
    // dropout rate: hash coins land in the 10% band within loose bounds
    val total = a1.map(_._2).sum.toDouble
    val kept = a1.map(_._3).sum.toDouble
    assert(kept / total > 0.85 && kept / total < 0.95,
      s"dropout rate off: kept ${kept / total}")
    // the salt changes the view: a different salt produces different coins
    val b = TextAnalysis.augmentDropout(docs, salt = "aug2").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val fp1 = a1.map(r => r._1 -> r._4).toMap
    assert(b.exists { case (id, fp) => fp1(id) != fp },
      "salt does not move any fingerprint")
    // and a driver replay of one doc's coins agrees exactly
    val one = docs.orderBy("doc_id").select("doc_id", "text").head()
    val toks = one.getString(1).split(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 15), 16)
    val keptDriver = toks.zipWithIndex.count { case (_, i) =>
      h60(s"${one.getLong(0)}:$i:aug1") % 10 != 0
    }
    assert(a1.find(_._1 == one.getLong(0)).get._3 === keptDriver.toLong)
  }

  test("assortativity recomputes from the pair list and is 1.0 on cliques") {
    val docs = Sources.documents(spark, d01)
    val pairs = graft.operators.Dedup.minhashLshPairs(docs)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val directed = pairs.flatMap(p => Seq(p, p.swap))
    val deg = directed.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val m = directed.length.toLong
    val sx = directed.map(e => deg(e._1)).sum
    val sxx = directed.map(e => deg(e._1) * deg(e._1)).sum
    val sxy = directed.map(e => deg(e._1) * deg(e._2)).sum
    val row = graft.operators.Dedup.assortativity(docs).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      === ((m, sx, sxx, sxy)))
    assert(row.getDouble(4) ===
      (m * sxy - sx * sx).toDouble / (m * sxx - sx * sx).toDouble)
    // the fixture's duplication is exact-copy cliques: within a clique all
    // degrees are equal, so dx = dy on every edge and r is EXACTLY 1.0 —
    // the theorem doubles as the non-vacuity check (any broken degree
    // join would move it off 1)
    assert(row.getDouble(4) === 1.0)
  }

  test("ccnet terciles are balanced per lang and ordered by score") {
    val docs = Sources.documents(spark, d01)
    val rows = Curation.ccnetBuckets(docs).collect()
      .map(r => (r.getString(1), r.getDouble(3), r.getString(4)))
    // every scored doc gets a bucket; the scored set is lmScore's domain
    assert(rows.length === TextAnalysis.lmScore(docs).count())
    for ((lang, perLang) <- rows.groupBy(_._1)) {
      val sizes = perLang.groupBy(_._3).map { case (b, xs) => b -> xs.length }
      assert(sizes.keySet.subsetOf(Set("head", "middle", "tail")))
      // ntile balance: bucket sizes differ by at most 1
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$lang terciles unbalanced: $sizes")
      // score ordering: head <= middle <= tail at the boundaries
      def scores(b: String) = perLang.filter(_._3 == b).map(_._2)
      if (sizes.contains("head") && sizes.contains("middle"))
        assert(scores("head").max <= scores("middle").min)
      if (sizes.contains("middle") && sizes.contains("tail"))
        assert(scores("middle").max <= scores("tail").min)
    }
  }
}

/** Row-tuple helper kept outside the suite so the test body stays legible. */
private object Curation0 {
  def diversityRows(spark: org.apache.spark.sql.SparkSession, dir: String)
      : Array[(String, Long, Long, Long, Long, Double, Long, Double)] =
    DataQuality.diversity(Sources.documents(spark, dir)).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6), r.getDouble(7)))
}
