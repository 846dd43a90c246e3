package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MRApproxOutliers, Spark-native (SURVEY.md §2.9 C2).
  *
  * Reference: `big_data_computing_1.py:78-114` (HW1 variant with random-key
  * 2-round aggregation) and `big_data_computing_2.py:84-113` (HW2 variant with
  * a hand-rolled mapPartitions combiner). Both collapse here into declarative
  * DataFrame aggregations: Catalyst's HashAggregateExec already performs
  * partial (map-side) + final aggregation, so the reference's manual
  * MapReduce-round discipline is deleted rather than ported (SURVEY.md §4).
  *
  * The driver-side `collectAsMap` + closure-captured dict used for the 3x3/7x7
  * neighborhood sums (`big_data_computing_1.py:87,91-96`) is replaced by an
  * explode-neighbors + join-aggregate (SURVEY.md §2.3 J2 option a): fully
  * distributed, no point-scale data ever crosses to the driver, and the plan
  * survives a 100x scale-up where the collected map would OOM the driver.
  */
object GridOutliers {

  /** Grid side Λ = D / (2·√2) (`big_data_computing_1.py:62`). Must be written
    * identically in the DuckDB oracle (`D / (2 * SQRT(2))`) for bit equality. */
  def lambda(d: Double): Double = d / (2.0 * math.sqrt(2.0))

  /** Cell assignment (`big_data_computing_1.py:54-65`): i = ⌊x/Λ⌋, j = ⌊y/Λ⌋.
    * `floor`, never an integer cast: Python `//` floors toward −∞, Scala
    * `.toLong` truncates toward 0 and would mis-bucket negative coordinates
    * (SURVEY.md §7.3.1). */
  def cellify(points: DataFrame, d: Double): DataFrame = {
    val lam = lambda(d)
    points
      .withColumn("i", floor(col("x") / lit(lam)).cast("long"))
      .withColumn("j", floor(col("y") / lit(lam)).cast("long"))
  }

  /** Per-cell counts (`big_data_computing_1.py:80-83` A1/A2): one built-in
    * partial+final hash aggregation replaces the reference's 2-round dance. */
  def cellCounts(points: DataFrame, d: Double): DataFrame =
    cellify(points, d).groupBy("i", "j").agg(count(lit(1)).as("size"))

  private val offsets7x7: Seq[(Int, Int)] =
    for { di <- -3 to 3; dj <- -3 to 3 } yield (di, dj)

  /** N3/N7 neighborhood sums (`big_data_computing_1.py:91-98` A3/J2).
    *
    * Each non-empty cell scatters its count to the ≤49 cells whose 7x7 window
    * contains it (tagging the 3x3 subset), then a group-sum per target cell and
    * an inner join back onto the non-empty cells. The scatter fan-out is a
    * constant 49x on the *cell* table (already aggregated, ≪ points), so this
    * stays cheap at any scale; the join keys are the cell coords, so Catalyst
    * plans an equi-join (broadcast when the cell table is small). */
  def neighborStats(cells: DataFrame, m: Int): DataFrame = {
    val contrib = cells
      .select(col("i"), col("j"), col("size"), explode(typedlit(offsets7x7)).as("o"))
      .select(
        (col("i") + col("o._1")).as("ci"),
        (col("j") + col("o._2")).as("cj"),
        col("size"),
        (abs(col("o._1")) <= 1 && abs(col("o._2")) <= 1).as("in3"))
      .groupBy("ci", "cj")
      .agg(
        sum(when(col("in3"), col("size"))).as("n3"),
        sum(col("size")).as("n7"))
    cells
      .join(contrib, cells("i") === contrib("ci") && cells("j") === contrib("cj"))
      .select(col("i"), col("j"), col("size"),
        // the cell itself is always inside its own 3x3, so n3 is never null
        col("n3").cast("long").as("n3"), col("n7").cast("long").as("n7"))
  }

  /** Cell stats + sure/uncertain classification (P5/P6,
    * `big_data_computing_1.py:101-103`). */
  def classifiedCells(points: DataFrame, d: Double, m: Int): DataFrame =
    neighborStats(cellCounts(points, d), m)
      .withColumn("sure_outlier", col("n3") <= m && col("n7") <= m)
      .withColumn("uncertain", col("n3") <= m && col("n7") > m)

  /** Single-row summary (`big_data_computing_1.py:109-111` A4): total points,
    * points in sure-outlier cells, points in uncertain cells. One distributed
    * pass, vs the reference's two collect()s + driver sums. */
  def summary(points: DataFrame, d: Double, m: Int): DataFrame = {
    val stats = classifiedCells(points, d, m).agg(
      coalesce(sum(when(col("sure_outlier"), col("size"))), lit(0L)).as("sure_outliers"),
      coalesce(sum(when(col("uncertain"), col("size"))), lit(0L)).as("uncertain_points"))
    points.agg(count(lit(1)).as("n_points")).crossJoin(stats)
  }

  /** K smallest non-empty cells (`big_data_computing_1.py:112-114` T2), with
    * the (size, i, j) tie-break made explicit and deterministic — the
    * reference's chained RDD sorts have no stability contract (SURVEY.md §2.6). */
  def topKCells(points: DataFrame, d: Double, k: Int): DataFrame =
    cellCounts(points, d)
      .orderBy(col("size").asc, col("i").asc, col("j").asc)
      .limit(k)
}
