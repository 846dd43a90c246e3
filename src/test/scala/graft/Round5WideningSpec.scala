package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, KMeans, Relational, Sketches,
  TextAnalysis}
import graft.sources.Sources

/** Round-5 widening: k-means (Lloyd), value histogram, pair-graph degrees,
  * pattern scrub, partitioned-parquet sink round trip. */
class Round5WideningSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  test("kmeans partitions the table and is deterministic") {
    val emb = Sources.embeddings(spark, dir)
    val total = emb.count()
    val r1 = KMeans.kmeans(emb, k = 8, iters = 2).collect()
    val r2 = KMeans.kmeans(emb, k = 8, iters = 2).collect()
    assert(r1.toSeq == r2.toSeq, "same input must give identical clusters")
    assert(r1.map(_.getLong(1)).sum == total, "cluster sizes partition the table")
    assert(r1.map(_.getLong(0)).toSet.subsetOf((0L until 8L).toSet))
  }

  test("kmeans cost is non-increasing over Lloyd rounds") {
    val emb = Sources.embeddings(spark, dir)
    def cost(iters: Int): Long =
      KMeans.kmeans(emb, k = 8, iters = iters).agg(sum("qcost")).head.getLong(0)
    val c1 = cost(1); val c2 = cost(2); val c3 = cost(3)
    // quantization (floor at 2^-20 resolution) can only shave < n ulps off
    // each sum — allow that slack while asserting the Lloyd descent property
    val slack = 2000L
    assert(c2 <= c1 + slack, s"round 2 cost $c2 above round 1 $c1")
    assert(c3 <= c2 + slack, s"round 3 cost $c3 above round 2 $c2")
  }

  test("value histogram bins cover every event exactly once") {
    val h = Relational.valueHistogram(spark, dir).collect()
    val total = Sources.events(spark, dir).count()
    assert(h.map(_.getLong(1)).sum == total)
    assert(h.map(_.getLong(0)).toSeq == h.map(_.getLong(0)).toSeq.sorted)
  }

  test("pair degrees sum to twice the verified pair count") {
    val docs = Sources.documents(spark, dir)
    val pairs = Dedup.minhashLshPairs(docs).count()
    val deg = Dedup.pairDegrees(docs).agg(sum("degree")).head.getLong(0)
    assert(deg == 2 * pairs)
  }

  test("scrub counts and redacted length are consistent") {
    val s = TextAnalysis.scrub(Sources.documents(spark, dir))
    val src = Sources.documents(spark, dir).select(col("doc_id"),
      length(col("text")).cast("long").as("len"))
    val joined = s.join(src, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nEmail, nNum, nTerm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val scrubLen = r.getLong(4); val len = r.getAs[Long]("len")
      if (nEmail + nNum + nTerm == 0) assert(scrubLen == len)
      // 'spark' (5 chars) -> '<TERM>' (6): redaction grows each hit by 1
      if (nEmail + nNum == 0) assert(scrubLen == len + nTerm)
    }
    // the forbidden-term pattern must actually fire on this corpus
    assert(joined.map(_.getLong(3)).sum > 0)
  }

  test("bloom decontamination has no false negatives vs the exact join") {
    val docs = Sources.documents(spark, dir)
    val exact = Curation.decontaminate(docs)
      .select(col("doc_id"), col("n_hit")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Curation.decontaminateBloom(docs)
      .select(col("doc_id"), col("n_bloom_hit")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom.keySet == exact.keySet, "same train-doc universe")
    exact.foreach { case (id, nHit) =>
      assert(bloom(id) >= nHit,
        s"doc $id: bloom hits ${bloom(id)} below exact $nHit (false negative)")
    }
  }

  test("count-min estimates are sound and deterministic") {
    val docs = Sources.documents(spark, dir)
    val r1 = Sketches.cmsTokenEstimates(docs).collect()
    assert(r1.nonEmpty)
    r1.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"token ${r.getString(0)}: est ${r.getLong(2)} below exact ${r.getLong(1)}")
    }
    val r2 = Sketches.cmsTokenEstimates(docs).collect()
    assert(r1.toSeq == r2.toSeq)
  }

  test("hll estimate lands within the b=8 error envelope of the exact count") {
    val r = Sketches.hllDistinct(Sources.events(spark, dir), "user_id")
      .head()
    val (exact, vZero, raw) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(exact > 0)
    // reader-side small-range correction (linear counting), as documented
    val m = 256.0
    val est = if (raw <= 2.5 * m && vZero > 0) m * math.log(m / vZero) else raw
    // sigma ~ 1.04/sqrt(256) = 6.5% for raw HLL; linear counting is tighter
    // still at this range — allow 4 sigma
    assert(math.abs(est - exact) / exact < 0.26,
      s"hll est $est (raw $raw, v_zero $vZero) too far from exact $exact")
  }

  test("hopping windows cover each event exactly twice") {
    val h = Relational.eventsHopping(spark, dir)
    val total = Sources.events(spark, dir).count()
    assert(h.agg(sum("n_events")).head.getLong(0) == 2 * total)
    // distinct strictly-increasing window keys (the fixture's event hours
    // are sparse, so gaps between windows are expected)
    val wins = h.select("win").collect().map(_.getLong(0))
    assert(wins.zip(wins.tail).forall { case (a, b) => b > a })
  }

  test("weighted sample keeps long docs surely and is length-monotone in rate") {
    val docs = Sources.documents(spark, dir)
    val kept = Curation.weightedSample(docs, denom = 200L).collect()
    assert(kept.nonEmpty)
    val keptIds = kept.map(_.getLong(0)).toSet
    // every doc at/above the denominator weight is kept with probability 1
    val sure = docs.filter(col("n_chars") >= 200).select("doc_id")
      .collect().map(_.getLong(0))
    sure.foreach(id => assert(keptIds.contains(id),
      s"doc $id with n_chars >= denom must always be kept"))
    // determinism: identical output on re-evaluation
    val again = Curation.weightedSample(docs, denom = 200L).collect()
    assert(kept.toSeq == again.toSeq)
  }

  test("mixture sampling flattens the language skew (head rate < tail rate)") {
    val docs = Sources.documents(spark, dir)
    val out = Curation.mixtureSample(docs)
    val rates = out.select("lang", "p_keep").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // p ∝ 1/sqrt(n): the more frequent language always gets the lower rate
    for (a <- rates.keys; b <- rates.keys if counts(a) > counts(b))
      assert(rates(a) < rates(b),
        s"lang $a (n=${counts(a)}) must be thinned below $b (n=${counts(b)})")
    // every kept row satisfies its language's rate by construction; spot the
    // expected-size shape: total kept within 40% of the target
    val n = out.count()
    assert(n > 300 * 0.6 && n < 300 * 1.4, s"kept $n vs target 300")
  }

  test("triangle counts match the canonical a<b<c triple join") {
    val docs = Sources.documents(spark, dir)
    val e = operators.Dedup.simhashPairs(docs).select("a", "b")
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .join(e.as("e3"), col("e3.a") === col("e1.b") && col("e3.b") === col("e2.b"))
      .select(explode(array(col("e1.a"), col("e1.b"), col("e2.b"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = operators.Dedup.triangleCounts(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == tri, s"degree-ordered count diverged: got $got want $tri")
  }

  test("chunking covers every token and overlaps by width-stride") {
    val docs = Sources.documents(spark, dir)
    val ch = TextAnalysis.chunkIndex(docs, width = 40, stride = 30).collect()
    val nToks = docs.select(size(split(col("text"), " ")).cast("long"))
      .collect().map(_.getLong(0))
    // every document chunks; token coverage: sum of chunk sizes equals
    // n + overlap*(chunks-1) per doc (each non-first chunk re-reads 10)
    val byDoc = ch.groupBy(_.getLong(0))
    assert(byDoc.size == nToks.length)
    byDoc.foreach { case (_, rows) =>
      val sizes = rows.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(sizes.init.forall(_ == 40L), "only the last chunk may be short")
      assert(sizes.last >= 1L && sizes.last <= 40L)
      // chunk text joins back to the right token count
      rows.foreach(r => assert(
        r.getString(3).split(" ").length == r.getLong(2)))
    }
  }

  test("deterministic mode picks the max count with the lexicographic tie-break") {
    val m = Relational.eventTypeMode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val g = Sources.events(spark, dir)
      .groupBy("user_id", "event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    assert(m.length == g.size, "one mode row per user")
    m.foreach { case (u, t, c) =>
      val best = g(u).map(x => (x._3, x._2)).max(
        Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
      assert((c, t) == (best._1, best._2),
        s"user $u: got ($t,$c) want ${best.swap}")
    }
  }

  test("bigram counts sum to the number of adjacent pairs above threshold") {
    val docs = Sources.documents(spark, dir)
    val all = TextAnalysis.bigramCounts(docs, minCount = 1L)
    val totalPairs = docs
      .select((size(split(col("text"), " ")) - 1).cast("long").as("n"))
      .filter(col("n") > 0).agg(sum("n")).head.getLong(0)
    assert(all.agg(sum("cnt")).head.getLong(0) == totalPairs,
      "every adjacent pair must be counted exactly once")
    val pruned = TextAnalysis.bigramCounts(docs, minCount = 2L)
    assert(pruned.filter(col("cnt") < 2).count() == 0)
  }

  test("top-similar is symmetric-consistent and rank-ordered per doc") {
    val docs = Sources.documents(spark, dir)
    val ts = operators.Dedup.topSimilar(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(ts.nonEmpty, "fixture has verified near-dup pairs")
    ts.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq)
      // jaccard non-increasing with rank
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      })
    }
    // every listed neighbor is a verified pair in both directions' view
    val pairs = operators.Dedup.minhashLshPairs(docs).collect()
      .map(r => Set(r.getLong(0), r.getLong(1))).toSet
    ts.foreach { case (d, n, _, _) => assert(pairs.contains(Set(d, n))) }
  }

  test("pagerank conserves fixed-point mass up to floor loss and ranks hubs") {
    val docs = Sources.documents(spark, dir)
    val pr = operators.Dedup.pageRank(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.nonEmpty)
    assert(pr.values.forall(_ > 0))
    // every round floors |V| contributions + the damping division: total
    // mass can only leak downward, never grow
    val mass = pr.values.sum
    assert(mass <= (1L << 40), s"mass $mass exceeds the 2^40 budget")
    assert(mass > (1L << 40) / 2, s"mass $mass lost more than half to floors")
    // non-degenerate centrality: ranks must differentiate nodes
    assert(pr.values.max > pr.values.min,
      "centrality must differentiate nodes on this fixture")
    // determinism to the bit
    val again = operators.Dedup.pageRank(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr == again)
  }

  test("json, orc and csv round trips are lossless") {
    val src = Sources.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    for (rt <- Seq(Sources.jsonRoundTrip(spark, dir),
                   Sources.orcRoundTrip(spark, dir),
                   Sources.csvRoundTrip(spark, dir))) {
      assert(rt.exceptAll(src).isEmpty && src.exceptAll(rt).isEmpty)
    }
  }

  test("emb LSH pairs are a subset of the exact all-pairs answer") {
    val emb = Sources.embeddings(spark, dir)
    val exact = operators.Similarity.neardupCosine(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = operators.Similarity.embLshPairs(emb).collect()
    assert(lsh.map(r => (r.getLong(0), r.getLong(1))).toSet.subsetOf(exact),
      "LSH blocking may lose pairs but must never invent them")
    lsh.foreach(r => assert(r.getDouble(2) >= 0.45))
    // codes: deterministic, and near-identical vectors share codes — every
    // exact cos>=0.45 pair agrees on SOME 4-bit band with high probability;
    // assert the sketch is non-degenerate instead (many distinct codes)
    val codes = operators.Similarity.embLshCodes(emb)
    assert(codes.select("code").distinct().count() > codes.count() / 4)
    assert(codes.collect().toSeq ==
      operators.Similarity.embLshCodes(emb).collect().toSeq)
  }

  test("grouping sets margins are consistent with the detail rows") {
    val gs = Relational.docsGroupingSets(spark, dir).collect()
    val total = Sources.documents(spark, dir).count()
    val grand = gs.filter(r => r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(grand.length == 1 && grand.head.getLong(4) == total)
    val detailSum = gs.filter(r => r.getLong(2) == 0 && r.getLong(3) == 0)
      .map(_.getLong(4)).sum
    val langSum = gs.filter(r => r.getLong(2) == 0 && r.getLong(3) == 1)
      .map(_.getLong(4)).sum
    assert(detailSum == total && langSum == total)
  }

  test("partitioned sink round trip is lossless and layout-partitioned") {
    val rt = Sources.parquetRoundTrip(spark, dir)
    val src = Sources.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(rt.exceptAll(src).isEmpty && src.exceptAll(rt).isEmpty)
    // the reader must prune the lang partition down to one directory
    // must match Sources.parquetRoundTrip's sink naming (the r8 md5 pathKey
    // fix — the old hashCode name only passed against a stale tmp dir)
    val out = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_sink_${graft.sources.Sources.pathKey(dir)}")
    assert(out.listFiles().exists(f => f.getName.startsWith("lang=")))
    val pruned = spark.read.parquet(out.getAbsolutePath)
      .filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter must prune partitions:\n$scan")
  }
}
