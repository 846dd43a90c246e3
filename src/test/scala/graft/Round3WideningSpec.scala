package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Relational, Similarity, TextAnalysis}
import graft.sources.Sources

/** Round-3 widening operators: repetition metrics, exact centroids,
  * near-dup survivors, cube/lag/percentile/range-window relational surface.
  * Hand-computable fixtures; the sf0.01 DuckDB gate covers the full tables. */
class Round3WideningSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("repetition: hand-checked ratios on a tiny corpus") {
    val docs = Seq(
      (1L, "a b a b a"),      // bigrams: ab,ba,ab,ba -> top 2/4; distinct 2/5
      (2L, "x y z"),          // bigrams: xy,yz -> top 1/2; distinct 3/3
      (3L, "solo")            // 1 token -> dropped
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs)
      .as[(Long, Long, Double, Double)].collect().toList
    assert(r == List((1L, 5L, 2.0 / 5.0, 2.0 / 4.0), (2L, 3L, 1.0, 1.0 / 2.0)))
  }

  test("labelCentroids: exact mean of power-of-two floats, order-independent") {
    // 0.5 and 0.25 are exact in float AND in the 2^30 quantization, so the
    // centroid must be the exact arithmetic mean regardless of partitioning
    val emb = Seq(
      (1L, Seq(0.5, 1.0), 7),
      (2L, Seq(0.25, -1.0), 7)
    ).toDF("vec_id", "emb", "label").repartition(5)
    val r = Similarity.labelCentroids(emb)
      .as[(Long, Long, Long, Double)].collect().toList
    assert(r == List((7L, 0L, 2L, 0.375), (7L, 1L, 2L, 0.0)))
  }

  test("nearDupSurvivors drops exactly the non-representative cluster members") {
    val docs = Sources.documents(spark, dir)
    val clusters = Dedup.nearDupClusters(docs)
      .as[(Long, Long)].collect().toMap
    val dropped = clusters.filter { case (d, c) => d != c }.keySet
    val survivors = Dedup.nearDupSurvivors(docs).as[Long].collect().toSet
    val all = docs.select(col("doc_id")).as[Long].collect().toSet
    assert(survivors == all.diff(dropped))
    assert(dropped.forall(d => !survivors.contains(d)))
  }

  test("cube emits the rollup sets plus the per-linestatus marginal") {
    val cube = Relational.pricingCube(spark, dir)
      .select("g_rf", "g_ls").distinct()
      .as[(Long, Long)].collect().toSet
    assert(cube == Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
  }

  test("lag deltas are non-negative and reference an earlier event of the same user") {
    val r = Relational.eventLagDeltas(spark, dir)
    assert(r.filter(col("gap_us") < 0).count() == 0)
    assert(r.filter(col("prev_event_id") === col("event_id")).count() == 0)
  }

  test("percentile_disc picks actual data values with cume_dist >= p") {
    val r = Relational.valuePercentiles(spark, dir)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    val values = Sources.events(spark, dir)
      .select(col("event_type"), col("value")).as[(String, Double)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    r.foreach { case (et, n, p50, p90, vmin, vmax) =>
      val vs = values(et)
      assert(n == vs.length && vmin == vs.head && vmax == vs.last)
      // smallest value whose cumulative distribution reaches p
      assert(p50 == vs(math.ceil(0.5 * n).toInt - 1))
      assert(p90 == vs(math.ceil(0.9 * n).toInt - 1))
    }
  }

  test("range window includes all timestamp peers (frame >= row frame count)") {
    val r = Relational.eventsRangeWindow(spark, dir)
    assert(r.filter(col("hr_n") < 1).count() == 0)
    // every row's frame contains at least itself and sums stay consistent
    val bad = r.filter(col("hr_n") === 1 && col("hr_sum").isNull)
    assert(bad.count() == 0)
  }
}
