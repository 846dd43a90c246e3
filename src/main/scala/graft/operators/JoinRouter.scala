package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Metadata-routed join strategy: broadcast when the build side is PROVABLY
  * small, shuffle when it is not — decided from parquet footers /
  * optimizer statistics ([[PlanStats.exactRowCount]]), never from a
  * driver-side probe job and never from a CBO cardinality guess.
  *
  * Spark's own `autoBroadcastJoinThreshold` routes on estimated BYTES of
  * the plan, which goes wrong in both directions at corpus scale: a
  * post-filter dimension whose estimate stayed at file size misses a cheap
  * broadcast, and a string-heavy "small" table with an optimistic estimate
  * OOMs every executor at once (the worst failure mode a 1000-executor job
  * has). Routing on exact row counts with an explicit hint makes the
  * decision deterministic, auditable (the route is IN the plan), and
  * independent of session conf drift. The unknown case deliberately falls
  * to shuffle: a wrong shuffle is slow, a wrong broadcast is an outage.
  *
  * The ANSWER is route-independent — both plans compute the same join —
  * so the oracle gate needs no knowledge of the routing; JoinRouterSpec
  * asserts the physical operator each route actually produces.
  */
object JoinRouter {

  /** Rows above which a dimension is not broadcast. 5M rows × ~100 B/row ≈
    * 500 MB hash relation per executor — past that, shipping beats holding. */
  val DefaultBroadcastRows: Long = 5000000L

  /** `fact ⋈ dim` with the build strategy chosen from metadata. */
  def joinRouted(fact: DataFrame, dim: DataFrame, joinKeys: Column,
                 broadcastRows: Long = DefaultBroadcastRows): DataFrame = {
    val small = PlanStats.exactRowCount(dim).exists(_ <= broadcastRows)
    val side = if (small) broadcast(dim) else dim.hint("shuffle_hash")
    fact.join(side, joinKeys)
  }

  /** Supplier-side revenue per nation through the routed join: lineitem
    * (fact, always shuffled on its key) ⋈ supplier ⋈ nation — both
    * dimensions resolve as provably-small from their parquet footers and
    * take the broadcast route, so the fact table is never exchanged at all:
    * one narrow scan into two BroadcastHashJoins into the final partial+
    * final aggregation over |nations| cells. */
  def supplierRevenue(spark: org.apache.spark.sql.SparkSession,
                      sfDir: String): DataFrame = {
    val li = Sources.table(spark, sfDir, "lineitem")
      .select("l_suppkey", "l_extendedprice", "l_discount")
    val supp = Sources.table(spark, sfDir, "supplier")
      .select("s_suppkey", "s_nationkey")
    val nation = Sources.table(spark, sfDir, "nation")
      .select("n_nationkey", "n_name")
    val dec = (c: Column) => c.cast("decimal(18,2)")
    val one = lit(1).cast("decimal(18,2)")
    joinRouted(
      joinRouted(li, supp, col("l_suppkey") === col("s_suppkey")),
      nation, col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }
}
