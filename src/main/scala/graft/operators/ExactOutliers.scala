package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact (D,M)-outlier detection (SURVEY.md §2.9 C1, §2.3 J1).
  *
  * Reference: `ExactOutliers` at `big_data_computing_1.py:30-53` — a
  * driver-side O(n²) nested loop, gated to n ≤ 200,000 (`:178`). Rebuilt as a
  * distributed grid-bucketed distance self-join: points are bucketed into
  * cells of side D, each point probes its 3x3 cell neighborhood (any point
  * within distance D lies in an adjacent cell), and the join is a plain
  * equi-join on cell keys that Catalyst executes as a shuffled hash / sort-merge
  * join — never a cartesian. Pair count is n · E[ball size], not n², so the
  * plan survives 100x scale-up; skewed cells are handled by AQE skew-join.
  *
  * Semantics preserved exactly:
  *  - ball counts are self-inclusive (counts start at 1,
  *    `big_data_computing_1.py:33`): the self-pair (dist 0 ≤ D) stays in.
  *  - distance predicate is inclusive `dist ≤ D` (`:37`), compared in squared
  *    form with the same expression shape as the oracle for bit equality.
  */
object ExactOutliers {

  private val offsets3x3: Seq[(Int, Int)] =
    for { di <- -1 to 1; dj <- -1 to 1 } yield (di, dj)

  /** |B(p,D)| per point: (id, ball_size), self-inclusive
    * (`big_data_computing_1.py:33`).
    *
    * Note on a rejected optimization (measured, not assumed): materializing
    * each unordered pair once — half-space cell offsets + lexicographic
    * same-cell dedup over multiplicity-grouped rows, crediting both
    * endpoints — halves the distance evaluations, but benched 2-4x SLOWER
    * than this directional form at sf0.1/local[32]: the credit fan-out
    * (a Generate of two structs per surviving pair) doubles the aggregation
    * input back to the directional volume, and the disjunctive same-cell
    * predicate rides the join's hot loop. (A naive `id <` pair dedup is also
    * semantically wrong here: fixture ids are not unique.) */
  def ballCounts(points: DataFrame, d: Double,
                 pruneProbes: Boolean = true): DataFrame = {
    val bucketed = points.select(
      col("id"), col("x"), col("y"),
      floor(col("x") / lit(d)).cast("long").as("bi"),
      floor(col("y") / lit(d)).cast("long").as("bj"))
    val allProbes = bucketed
      .select(col("id"), col("x"), col("y"), col("bi"), col("bj"),
        explode(typedlit(offsets3x3)).as("o"))
      .select(col("id"), col("x"), col("y"),
        (col("bi") + col("o._1")).as("pi"),
        (col("bj") + col("o._2")).as("pj"))
    // Occupied-cell probe pruning (measured ~10-30% at sf0.1): a probe into
    // an empty neighbor cell can never match, so a broadcast semi-join
    // against the occupied-cell directory drops it BEFORE the shuffle (2/3
    // of probe rows on this fixture's integer-x grid). The directory is
    // |occupied cells| ≈ covered-area/D² — bounded by data geometry, not by
    // row count, so it stays broadcastable for any clustered dataset; set
    // pruneProbes=false for pathological near-uniform sparsity where
    // |cells| → |points|.
    val probes =
      if (!pruneProbes) allProbes
      else allProbes.join(
        broadcast(bucketed.select(col("bi").as("ci"), col("bj").as("cj")).distinct()),
        col("pi") === col("ci") && col("pj") === col("cj"), "left_semi")
    val other = bucketed.select(
      col("id").as("oid"), col("x").as("ox"), col("y").as("oy"),
      col("bi"), col("bj"))
    // shuffle-hash, not broadcast: at scale neither side fits an executor, and
    // even at sf0.1 broadcasting the 600k-row point table thrashes memory;
    // partitioning both sides by cell key is the plan that survives 100x.
    probes
      .join(other.hint("shuffle_hash"),
        probes("pi") === other("bi") && probes("pj") === other("bj"))
      .filter(
        (col("x") - col("ox")) * (col("x") - col("ox")) +
        (col("y") - col("oy")) * (col("y") - col("oy")) <= lit(d) * lit(d))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("ball_size"))
  }

  /** Outliers: |B(p,D)| ≤ M (`big_data_computing_1.py:42-44`), first K in
    * ascending (ball_size, id) order (`:48-53`, tie-break made deterministic). */
  def outliers(points: DataFrame, d: Double, m: Int, k: Int): DataFrame =
    ballCounts(points, d)
      .filter(col("ball_size") <= m)
      .orderBy(col("ball_size").asc, col("id").asc)
      .limit(k)

  /** Total outlier count (`big_data_computing_1.py:46-47`). */
  def outlierCount(points: DataFrame, d: Double, m: Int): DataFrame =
    ballCounts(points, d)
      .filter(col("ball_size") <= m)
      .agg(count(lit(1)).as("n_outliers"))
}
