package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** General relational queries over the TPC-H-ish testdata: the declarative
  * Catalyst surface (scan pruning, predicate pushdown, broadcast joins,
  * whole-stage codegen, window functions, JSON extraction) that the
  * reference's RDD pipelines bypass entirely (SURVEY.md §4). These document
  * the engine's general query capability beyond the reference's algorithms.
  *
  * Float-sum discipline: the source money columns carry ≤ 2 decimal digits,
  * so each is cast to DECIMAL(18,2) BEFORE any arithmetic (unambiguous — the
  * stored double sits ~1e-10 from the decimal value, nowhere near a rounding
  * boundary); products and sums then run in exact decimal on both engines —
  * independent of partitioning/order — with one final cast to double.
  * (Rounding a high-precision double PRODUCT to decimal is NOT portable:
  * Spark rounds the shortest decimal representation, DuckDB the exact binary
  * expansion, and they disagree on ~1% of rows.)
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
  private val one = lit(1).cast("decimal(18,2)")
  private def dsum(c: org.apache.spark.sql.Column) = sum(c).cast("double")

  /** TPC-H Q1-shaped pricing summary. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Sources.table(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(dec(col("l_quantity"))).as("sum_qty"),
        dsum(dec(col("l_extendedprice"))).as("sum_base_price"),
        dsum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))).as("sum_disc_price"),
        dsum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) * (one + dec(col("l_tax")))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Revenue per nation: 3-way join with an explicitly broadcast dimension. */
  def revenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Sources.table(spark, sfDir, "customer")
    val o = Sources.table(spark, sfDir, "orders")
    val l = Sources.table(spark, sfDir, "lineitem")
    val n = Sources.table(spark, sfDir, "nation")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        dsum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("n_name")
  }

  /** Top-3 orders per customer by total price — window function surface. */
  def topOrdersPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Sources.table(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Daily event rollup. `ts` arrives as long nanoseconds (nanosAsLong read);
    * the day key is exact integer division — no double rounding at 1e18. */
  def eventsDaily(spark: SparkSession, sfDir: String): DataFrame =
    Sources.table(spark, sfDir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        col("value"), col("user_id"))
      .groupBy("event_type", "day")
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value").cast("decimal(18,6)")).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type", "day")

  /** Gap-based sessionization: a user's events split into sessions wherever
    * the gap to the previous event exceeds `gapMicros` (30 min default). The
    * classic two-window formulation — lag to mark session starts, running sum
    * to number them — shuffles once on user_id and is fully ANSI-portable.
    * Times are in MICROseconds: the source carries nanos, but DuckDB's
    * TIMESTAMP truncates to micros at read, so both engines work on
    * `ts div 1000` for identical session boundaries and outputs. */
  def sessionize(spark: SparkSession, sfDir: String,
                 gapMicros: Long = 30L * 60 * 1000000L): DataFrame = {
    // event_id tie-break: equal timestamps would make lag order unstable
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Sources.table(spark, sfDir, "events")
      .select(col("user_id"), expr("ts div 1000").as("ts"), col("event_id"))
      .withColumn("new_session",
        when(col("ts") - lag(col("ts"), 1).over(byUser) > gapMicros ||
          lag(col("ts"), 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_no")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        (max(col("ts")) - min(col("ts"))).as("duration_us"))
      .orderBy("user_id", "session_no")
  }

  /** JSON property extraction + integer aggregation (exact long sums). */
  def eventsJsonStats(spark: SparkSession, sfDir: String): DataFrame =
    Sources.table(spark, sfDir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")
}
