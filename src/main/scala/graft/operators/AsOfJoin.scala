package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** As-of (point-in-time) join — the temporal lookup Spark lacks as a native
  * operator (SURVEY.md §2.11 negative inventory; a standard extension in
  * time-series engines and validated here against DuckDB's native ASOF JOIN).
  *
  * Implementation is the scale-first union-merge formulation rather than an
  * inequality theta-join: tag both sides, sort each key's timeline once, and
  * carry the latest right-side row forward with a running `last(ignoreNulls)`
  * window. One shuffle on the join key, O(n log n) per key, no pair
  * explosion — the plan that survives 100 TB, where a `t_left >= t_right`
  * range join would degenerate to a per-key cartesian.
  *
  * Determinism: right-side rows are pre-aggregated to one row per
  * (key, time) — max payload id — so ties cannot make the pick ambiguous
  * (DuckDB's ASOF JOIN is equally underdetermined on exact-tie timestamps).
  * At equal timestamps the right row sorts before the left probe, making the
  * match inclusive (t_right <= t_left), matching ASOF JOIN's `>=`.
  */
object AsOfJoin {

  /** Generic as-of: for each left row (key, t, leftId), the right row
    * (key, t_r <= t, rightId) with the greatest (t_r, rightId).
    * Output: (leftId, key, t, rightId, t_r) — inner semantics (left rows
    * with no prior right row are dropped). */
  def asOf(left: DataFrame, right: DataFrame): DataFrame = {
    val r1 = right.groupBy("key", "t").agg(max(col("rightId")).as("rightId"))
      .select(col("key"), col("t"), lit(null).cast("long").as("leftId"),
        col("rightId"), lit(1).as("is_right"))
    val l1 = left.select(col("key"), col("t"), col("leftId"),
      lit(null).cast("long").as("rightId"), lit(0).as("is_right"))
    // right rows first at equal t (inclusive match), then by rightId so the
    // carried value at a tied timestamp is the max payload id
    val timeline = Window.partitionBy("key")
      .orderBy(col("t"), col("is_right").desc, col("rightId").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r1.unionByName(l1)
      .withColumn("m_rightId", last(col("rightId"), ignoreNulls = true).over(timeline))
      .withColumn("m_t", last(when(col("is_right") === 1, col("t")), ignoreNulls = true).over(timeline))
      .filter(col("is_right") === 0 && col("m_rightId").isNotNull)
      .select(col("leftId"), col("key"), col("t"),
        col("m_rightId").as("rightId"), col("m_t").as("t_r"))
  }

  /** Driver-contract instance: each event looks up the customer's most recent
    * order at-or-before the event time (micros on both sides). */
  def eventsAsOfOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Sources.events(spark, sfDir)
      .select(col("user_id").as("key"), expr("ts div 1000").as("t"),
        col("event_id").as("leftId"))
    val od = Sources.table(spark, sfDir, "orders")
      // orderdate is TIMESTAMP_NTZ; session TZ is pinned UTC so the cast is
      // the identity epoch mapping, matching DuckDB's epoch_us
      .select(col("o_custkey").as("key"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
        col("o_orderkey").as("rightId"))
    asOf(ev, od)
      .select(col("leftId").as("event_id"), col("key").as("user_id"),
        col("t").as("ev_us"), col("rightId").as("o_orderkey"), col("t_r").as("ord_us"))
      .orderBy("event_id")
  }
}
