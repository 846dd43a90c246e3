package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, ExactOutliers, GridOutliers}
import graft.streaming.ReservoirBuf

/** Property-based checks (SURVEY.md §5.2.3). Pure-Scala properties run at
  * full ScalaCheck volume via Prop.forAll; the Spark-facing containment
  * property samples a bounded number of generated point sets through the real
  * pipeline. */
class PropertySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def check(p: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  test("floor-cell property: cellOf(-x) == -cellOf(x) - 1 off grid lines") {
    // guards the floor-vs-truncate trap (SURVEY.md §7.3.1)
    val lam = GridOutliers.lambda(1.0)
    check(Prop.forAll(Gen.choose(0.001, 500.0)) { x =>
      (x / lam == math.floor(x / lam)) ||
        math.floor(-x / lam).toLong == -math.floor(x / lam).toLong - 1
    }, "floor-cell")
  }

  test("reservoir buffer: bottom-m invariant under arbitrary insert orders") {
    val gen = Gen.zip(Gen.listOf(Gen.zip(Gen.long, Gen.long)), Gen.chooseNum(1, 16))
    check(Prop.forAll(gen) { case (entries, m) =>
      val distinctKeys = entries.distinctBy(_._1)
      val buf = distinctKeys.foldLeft(ReservoirBuf(Array.empty, Array.empty)) {
        case (b, (k, v)) => b.insert(k, v, m)
      }
      val expect = distinctKeys.sortBy(_._1).take(m)
      buf.keys.toList == expect.map(_._1) && buf.items.toList == expect.map(_._2)
    }, "reservoir-bottom-m")
  }

  test("prefix join equals the quadratic definition on random corpora (sampled)") {
    // random corpora from a tiny vocabulary (heavy overlap forces pairs) at
    // random rational thresholds; reference is a plain-Scala quadratic pass
    // over STRING shingle sets — independent of the engine's hashed kernel,
    // its window prefix order, and all three candidate filters
    val rng = new scala.util.Random(20260813L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsln", "zetaa")
    for (trial <- 1 to 6) {
      val (tn, td) = Seq((1, 2), (2, 3), (4, 5), (9, 10))(rng.nextInt(4))
      val docs = (0 until (10 + rng.nextInt(12))).map { i =>
        val text = Seq.fill(2 + rng.nextInt(10))(
          vocab(rng.nextInt(vocab.size))).mkString(" ")
        (i.toLong, text, "en", "src", text.length.toLong)
      }
      val df = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      val got = Dedup.prefixJaccardPairs(df, tn, td).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val sets = docs.map { case (id, text, _, _, _) =>
        id -> text.sliding(9).toSet.filter(_.length == 9)
      }.filter(_._2.nonEmpty)
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = (sa & sb).size
        uni = sa.size + sb.size - inter
        if inter.toLong * td >= uni.toLong * tn
      } yield (a, b, inter.toDouble / uni.toDouble)).toSet
      assert(got == want,
        s"trial $trial (t=$tn/$td, ${docs.size} docs): " +
          s"missing=${want -- got}, extra=${got -- want}")
    }
  }

  test("capped ball counts keep the outlier report exact (early-exit cap)") {
    // the r14 kernel early-exit: capAbove=Some(m) may stop a point's
    // per-cell scan once its partial reaches m+1 — the ≤ m filter and the
    // surviving ball_size values must be bit-identical to the uncapped run
    val rng = new scala.util.Random(1414)
    for (d <- List(1.0, 2.0, 3.5)) {
      val m = 3
      val n = 60 + rng.nextInt(120)
      val pts = List.fill(n)((rng.nextDouble() * 30 - 15, rng.nextDouble() * 30 - 15))
      val df = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("id", "x", "y")
      val full = ExactOutliers.ballCounts(df, d)
        .filter(col("ball_size") <= m)
        .select("id", "ball_size").as[(Long, Long)].collect().toMap
      val capped = ExactOutliers.ballCounts(df, d, capAbove = Some(m))
        .filter(col("ball_size") <= m)
        .select("id", "ball_size").as[(Long, Long)].collect().toMap
      assert(capped === full,
        s"capped outlier report diverged at d=$d: " +
          s"missing=${full.keySet -- capped.keySet}, " +
          s"extra=${capped.keySet -- full.keySet}")
    }
  }

  test("grid containment holds on random point sets (sure ⊆ exact ⊆ sure ∪ uncertain)") {
    val rng = new scala.util.Random(4242)
    for (d <- List(1.0, 2.0, 3.0, 1.5, 2.5)) {
      val m = 3
      val n = 30 + rng.nextInt(90)
      val pts = List.fill(n)((rng.nextDouble() * 40 - 20, rng.nextDouble() * 40 - 20))
      val df = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }.toDF("id", "x", "y")
      val exact = ExactOutliers.ballCounts(df, d)
        .filter(col("ball_size") <= m).select("id").as[Long].collect().toSet
      val cellOf = GridOutliers.cellify(df, d).select("id", "i", "j")
        .as[(Long, Long, Long)].collect().map { case (id, i, j) => id -> (i, j) }.toMap
      val cls = GridOutliers.classifiedCells(df, d, m)
      val sure = cls.filter(col("sure_outlier")).select("i", "j").as[(Long, Long)].collect().toSet
      val unc = cls.filter(col("uncertain")).select("i", "j").as[(Long, Long)].collect().toSet
      cellOf.foreach { case (id, c) =>
        if (sure(c)) assert(exact.contains(id), s"sure-cell point $id must be a true outlier (d=$d)")
      }
      exact.foreach { id =>
        assert(sure(cellOf(id)) || unc(cellOf(id)), s"true outlier $id must be sure or uncertain (d=$d)")
      }
    }
  }
}
