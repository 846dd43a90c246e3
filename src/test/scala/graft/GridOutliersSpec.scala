package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ExactOutliers, GridOutliers}

class GridOutliersSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private val pts: Seq[(Long, Double, Double)] =
    (1L to 300L).map(i => (i, rng.nextDouble() * 20 - 10, rng.nextDouble() * 20 - 10)) ++
      Seq((901L, 55.0, 55.0), (902L, -55.0, -55.0), (903L, 55.1, 55.1)) // isolated
  private def df = pts.toDF("id", "x", "y")

  test("cellify floors toward -inf for negative coordinates") {
    val d = 1.0
    val lam = GridOutliers.lambda(d)
    val rows = GridOutliers.cellify(Seq((1L, -0.1, -0.1), (2L, 0.1, 0.1)).toDF("id", "x", "y"), d)
      .select("id", "i", "j").collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L) == (-1L, -1L))
    assert(rows(2L) == (0L, 0L))
    assert(math.floor(-0.1 / lam) == -1.0)
  }

  test("grid approximation brackets the exact outliers (sure ⊆ exact ⊆ sure ∪ uncertain)") {
    val d = 2.0; val m = 3
    val exact = ExactOutliers.ballCounts(df, d)
      .filter(col("ball_size") <= m).select("id").as[Long].collect().toSet
    val cells = GridOutliers.classifiedCells(df, d, m)
    val byCell = GridOutliers.cellify(df, d).select("id", "i", "j")
      .as[(Long, Long, Long)].collect().map { case (id, i, j) => id -> (i, j) }.toMap
    val sureCells = cells.filter(col("sure_outlier")).select("i", "j").as[(Long, Long)].collect().toSet
    val uncCells = cells.filter(col("uncertain")).select("i", "j").as[(Long, Long)].collect().toSet
    val inSure = byCell.collect { case (id, c) if sureCells(c) => id }.toSet
    val inSureOrUnc = byCell.collect { case (id, c) if sureCells(c) || uncCells(c) => id }.toSet
    assert(inSure.subsetOf(exact), "every point in a sure cell must be a true (D,M)-outlier")
    assert(exact.subsetOf(inSureOrUnc), "every true outlier must lie in a sure or uncertain cell")
    assert(exact.nonEmpty, "fixture should actually contain outliers")
  }

  test("summary counts match classified cell sums and total") {
    val row = GridOutliers.summary(df, 2.0, 3).head()
    assert(row.getLong(0) == pts.length)
    assert(row.getLong(1) >= 2) // the isolated points are sure outliers
    assert(row.getLong(1) + row.getLong(2) <= pts.length)
  }

  test("topKCells is ascending by (size, i, j) and bounded by K") {
    val rows = GridOutliers.topKCells(df, 2.0, 5)
      .select("size", "i", "j").as[(Long, Long, Long)].collect()
    assert(rows.length == 5)
    assert(rows.sameElements(rows.sortBy(identity)))
  }

  test("exact ball counts are self-inclusive and match a brute-force check") {
    val d = 2.0
    val brute = pts.map { case (id, x, y) =>
      id -> pts.count { case (_, x2, y2) =>
        (x - x2) * (x - x2) + (y - y2) * (y - y2) <= d * d
      }.toLong
    }.toMap
    val got = ExactOutliers.ballCounts(df, d)
      .as[(Long, Long)].collect().toMap
    assert(got == brute)
    assert(got.values.forall(_ >= 1), "ball includes the point itself")
  }
}
