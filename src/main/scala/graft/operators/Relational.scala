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

  /** Equi-width histogram over the event values (width 25): the standard
    * distribution-profiling primitive. One partial+final hash aggregation over
    * |bins| cells; the per-bin mass is an int64 sum of floor(value·100) (the
    * source carries 2 decimals), so the result is order-independent and
    * hash-gateable. Scale posture: map-side combine reduces each partition to
    * |bins| rows before the single tiny exchange. */
  def valueHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Sources.events(spark, sfDir)
      .groupBy(floor(col("value") / 25.0).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100.0).cast("long")).as("qsum"))
      .orderBy("bin")

  /** Daily event rollup. `ts` arrives as long nanoseconds (normalized at the
    * source boundary by [[graft.sources.Sources.events]] regardless of the
    * parquet physical type); the day key is exact integer division — no
    * double rounding at 1e18. */
  def eventsDaily(spark: SparkSession, sfDir: String): DataFrame =
    Sources.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        col("value"), col("user_id"))
      .groupBy("event_type", "day")
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value").cast("decimal(18,6)")).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type", "day")

  /** Hopping (sliding) window aggregation: 2-hour windows advancing every
    * hour, so each event lands in exactly two windows — the batch twin of
    * Structured Streaming's `window(ts, "2 hours", "1 hour")`. Window
    * replication is an explode over the two covering hour offsets (exact
    * integer arithmetic on the nanosecond timestamps — no double rounding),
    * then one partial+final hash aggregation over |windows| cells. */
  def eventsHopping(spark: SparkSession, sfDir: String): DataFrame =
    Sources.events(spark, sfDir)
      .select(expr("ts div 3600000000000").as("h"), col("value"))
      .select(explode(array(col("h") - 1, col("h"))).as("win"), col("value"))
      .groupBy("win")
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value").cast("decimal(18,6)")).as("total_value"))
      .orderBy("win")

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
    Sources.events(spark, sfDir)
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

  /** Session-shape rollup — the product-analytics view OVER [[sessionize]]
    * (same derivation, so this gate and q_sessions can never describe
    * different sessionizations): sessions binned by log2(event count),
    * with per-band session totals, the longest duration, and the exact
    * median duration (`percentile_disc` over int64 — an order statistic,
    * no interpolation). The |sessions| table collapses to ≤ ~40 band rows
    * map-side; medians run per band, not globally. Output
    * (band, n_sessions, n_events, max_dur_us, med_dur_us). */
  def sessionStats(spark: SparkSession, sfDir: String): DataFrame =
    sessionize(spark, sfDir)
      .select((length(bin(col("n_events"))) - 1).cast("long").as("band"),
        col("n_events"), col("duration_us"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("duration_us")).as("max_dur_us"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY duration_us)")
          .cast("long").as("med_dur_us"))
      .orderBy("band")

  /** The Q1 pricing summary through the string-SQL surface (temp view +
    * spark.sql): a user can run ANSI SQL against the engine and get the
    * same Catalyst plan — and the same bytes — as the DataFrame API. */
  def pricingSummarySql(spark: SparkSession, sfDir: String): DataFrame = {
    Sources.table(spark, sfDir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |       COUNT(*) AS count_order
        |  FROM lineitem
        | WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        | GROUP BY l_returnflag, l_linestatus
        | ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** TPC-H Q5-shaped 6-way join: revenue per region where the supplier and
    * the customer share a nation — lineitem drives, orders/customer/supplier
    * carry keys, nation/region are broadcast dims. Catalyst orders the joins;
    * the two tiny dims auto-broadcast, the key-carrying joins shuffle on
    * their keys. */
  def revenueByRegion(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Sources.table(spark, sfDir, "lineitem")
    val o = Sources.table(spark, sfDir, "orders")
    val c = Sources.table(spark, sfDir, "customer")
    val s = Sources.table(spark, sfDir, "supplier")
    val n = Sources.table(spark, sfDir, "nation")
    val r = Sources.table(spark, sfDir, "region")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        dsum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("r_name")
  }

  /** ROLLUP over (returnflag, linestatus) with explicit grouping flags —
    * grouping-sets surface. The flags disambiguate subtotal rows from data
    * NULLs and give every row a deterministic sort position. */
  def pricingRollup(spark: SparkSession, sfDir: String): DataFrame =
    Sources.table(spark, sfDir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"),
        count(lit(1)).as("n_rows"),
        dsum(dec(col("l_quantity"))).as("sum_qty"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))

  /** CUBE over (returnflag, linestatus) with explicit grouping flags — the
    * full grouping-sets lattice (rollup's sibling; adds the per-linestatus
    * marginals rollup omits). */
  def pricingCube(spark: SparkSession, sfDir: String): DataFrame =
    Sources.table(spark, sfDir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"),
        count(lit(1)).as("n_rows"),
        dsum(dec(col("l_quantity"))).as("sum_qty"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))

  /** Exact cumulative distinct users by day — the growth-curve query
    * (`COUNT(DISTINCT ...) OVER (ORDER BY day)` is unsupported as a
    * running window in both engines, and approximate HLL unions change
    * the answer): a user contributes to the curve exactly once, at their
    * FIRST event's day, so the cumulative distinct count is the running
    * sum of first-appearance counts. Two hash aggregations (per-user min,
    * per-day count) + one tiny running-sum window over |days| rows — the
    * shape that scales to any user cardinality because the window input
    * is days, not users. */
  def cumulativeUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    Sources.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .groupBy("user_id").agg(min(col("day")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .select("day", "new_users", "cum_users")
      .orderBy("day")
  }

  /** Deterministic per-group mode: each user's most frequent event type,
    * ties broken by type ascending — `mode()` itself keeps an arbitrary
    * tied value, which would not be oracle-checkable (same reasoning as
    * the dedup keeper). One aggregation + one WindowGroupLimit-planned
    * rank; the heavy (user, type) cardinality partial-aggregates map-side. */
  def eventTypeMode(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("cnt").desc, col("event_type").asc)
    Sources.events(spark, sfDir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("user_id", "event_type", "cnt")
      .orderBy("user_id")
  }

  /** Arbitrary GROUPING SETS (the general form of [[pricingRollup]]'s
    * ROLLUP and [[pricingCube]]'s CUBE): per-(lang, source) detail, the
    * per-lang margin, and the grand total in ONE aggregation pass — Spark
    * plans an Expand over the requested sets, so the corpus is read once
    * however many margins are asked for. Grouping flags disambiguate a
    * grouped NULL from a margin row, as in the rollup/cube twins. */
  def docsGroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    Sources.documents(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("lang"), col("source")), Seq(col("lang")), Seq()),
        col("lang"), col("source"))
      .agg(
        grouping(col("lang")).cast("long").as("g_lang"),
        grouping(col("source")).cast("long").as("g_src"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("g_lang"), col("g_src"), col("lang"), col("source"))

  /** lead/lag surface: per-user gap to the previous event in microseconds
    * plus the previous event id ((ts, event_id) order; first events are
    * dropped so every emitted row's lag is defined — no nullable columns for
    * the gate to disagree on). */
  def eventLagDeltas(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Sources.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts"))
      .withColumn("prev_event_id", lag(col("event_id"), 1).over(byUser))
      .withColumn("gap_us", col("ts") - lag(col("ts"), 1).over(byUser))
      .filter(col("prev_event_id").isNotNull)
      .select("event_id", "user_id", "prev_event_id", "gap_us")
      .orderBy("event_id")
  }

  /** Inverse-distribution surface: exact discrete percentiles per event
    * type. `percentile_disc` picks the smallest actual value whose
    * cumulative distribution reaches p — a data value, not an interpolation,
    * so there is no midpoint arithmetic for engines to disagree on. */
  def valuePercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Sources.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").as("p90"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"))
      .orderBy("event_type")

  /** Exact join-cardinality estimation — the planner statistic computed
    * from per-key count histograms, with its own correctness identity
    * riding in the gate: for an inner equi-join, |A ⨝ B| = Σ_k c_A(k)·c_B(k)
    * EXACTLY, so the "estimate" (two cheap per-key aggregations + one
    * |keys|-row join — what a CBO would precompute as column statistics)
    * must equal the actual join's row count to the row. At 100 TB this is
    * the pass that prices a join BEFORE shuffling it: the histogram join
    * moves |keys| short rows where the real join would move every payload
    * byte. `consistent` is the identity check — a hash-gated false here
    * would mean the engine's aggregation and join semantics disagree.
    * Output one row (est_rows, actual_rows, consistent). */
  def joinCardCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Sources.table(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"))
    val l = Sources.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("k"))
    val est = o.groupBy("k").agg(count(lit(1)).as("ca"))
      .join(l.groupBy("k").agg(count(lit(1)).as("cb")), "k")
      .agg(sum(col("ca") * col("cb")).as("est_rows"))
    val act = o.join(l, "k").agg(count(lit(1)).as("actual_rows"))
    est.crossJoin(broadcast(act))
      .select(col("est_rows"), col("actual_rows"),
        (col("est_rows") === col("actual_rows")).as("consistent"))
  }

  /** Event-rate anomaly screen — the pipeline-health monitor an ingestion
    * run consults before trusting a fresh partition: hourly event counts
    * flagged by the robust median/MAD rule (|n − median| > 3·MAD), the
    * outlier test that a burst can't poison the way it poisons a
    * mean/stddev z-score. Everything stays in exact integers: hourly
    * counts are int64, the medians are `percentile_disc` over int64 (an
    * order statistic — picks an actual value, no interpolation), and the
    * flag is an integer comparison, so the gate hashes with no IEEE
    * anywhere. Scale shape: the corpus collapses map-side to |hours|
    * rows; both medians and the flagging pass run on that bounded table
    * (two tiny single-group aggs broadcast back). Output
    * (hour, n_events, med, mad, is_anomaly). */
  /** A/B experiment assignment + sample-ratio-mismatch check — the
    * experimentation primitive: users are bucketed into arms by a salted
    * md5 hash (deterministic, so assignment is stable across runs, days
    * and engines — the property ad-hoc RNG assignment lacks and SRM
    * postmortems start from), then the one-row health summary computes
    * per-arm user/event counts and the chi-square SRM statistic against
    * the 50/50 design. chi2's operands are exact (integer counts, n/2.0
    * exact halves), its FP ops few and order-fixed, so the gate hashes the
    * statistic itself; `srm` flags chi2 > 3.841 (α=0.05, df=1) — the
    * "randomization is broken, stop reading metrics" tripwire. Scale
    * shape: one per-user aggregation (map-side combined), then a single
    * all-arms row. */
  def abSrm(spark: SparkSession, sfDir: String): DataFrame = {
    val perUser = Sources.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n_ev"))
      .withColumn("arm", graft.functions.Hashes.h60(
        concat(col("user_id").cast("string"), lit(":exp1"))) % 2)
    perUser.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("users_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("users_b"),
        sum(when(col("arm") === 0, col("n_ev")).otherwise(0L)).as("events_a"),
        sum(when(col("arm") === 1, col("n_ev")).otherwise(0L)).as("events_b"))
      .withColumn("expected",
        (col("users_a") + col("users_b")).cast("double") / lit(2.0))
      .withColumn("chi2",
        ((col("users_a").cast("double") - col("expected")) *
          (col("users_a").cast("double") - col("expected")) +
          (col("users_b").cast("double") - col("expected")) *
            (col("users_b").cast("double") - col("expected"))) / col("expected"))
      .select(col("users_a"), col("users_b"), col("events_a"),
        col("events_b"), col("chi2"), (col("chi2") > 3.841).as("srm"))
  }

  def rateAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val hours = Sources.events(spark, sfDir)
      .groupBy(expr("ts div 3600000000000").as("hour"))
      .agg(count(lit(1)).as("n_events"))
    // percentile_disc picks an ACTUAL int64 count but returns double;
    // the cast back to long is exact (order statistic, no interpolation)
    val med = hours.agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_events)")
        .cast("long").as("med"))
    val withMed = hours.crossJoin(broadcast(med))
    val mad = withMed
      .select(abs(col("n_events") - col("med")).as("dev"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)")
        .cast("long").as("mad"))
    withMed.crossJoin(broadcast(mad))
      .select(col("hour"), col("n_events"), col("med"), col("mad"),
        (abs(col("n_events") - col("med")) > col("mad") * 3L).as("is_anomaly"))
      .orderBy("hour")
  }

  /** Date-arithmetic surface: ISO-week (Monday-truncated) order rollup.
    * Week keys leave the engine as epoch microseconds — engine-neutral,
    * no timestamp rendering to disagree on; session TZ is pinned UTC so the
    * NTZ source column truncates identically on both engines. */
  def ordersWeekly(spark: SparkSession, sfDir: String): DataFrame =
    Sources.table(spark, sfDir, "orders")
      .select(
        unix_micros(date_trunc("week", col("o_orderdate").cast("timestamp"))).as("week_us"),
        col("o_totalprice"), col("o_custkey"))
      .groupBy("week_us")
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(dec(col("o_totalprice"))).as("revenue"),
        countDistinct(col("o_custkey")).as("n_custs"))
      .orderBy("week_us")

  /** Ordered string aggregation: per language, the sorted distinct source
    * list as one CSV string. array_sort ∘ collect_set is deterministic under
    * any partitioning — the portable form of ORDER BY inside an aggregate
    * (bare collect_list order is partition-dependent). */
  def langSources(spark: SparkSession, sfDir: String): DataFrame =
    Sources.table(spark, sfDir, "documents")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(array_sort(collect_set(col("source"))), ",").as("sources"))
      .orderBy("lang")

  /** RANGE-frame window: per user, the trailing-1-hour sum/count of the
    * integer JSON property k over event time (microseconds). A range frame
    * includes ALL peers of the current timestamp, so ties need no tiebreak
    * column to stay deterministic — the row-frame/rolling sibling can't say
    * that. Exact long sums. */
  def eventsRangeWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"))
      .rangeBetween(-3600000000L, Window.currentRow)
    Sources.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .withColumn("hr_sum", sum(col("k")).over(w))
      .withColumn("hr_n", count(lit(1)).over(w))
      .select("event_id", "user_id", "hr_sum", "hr_n")
      .orderBy("event_id")
  }

  /** SCD-1 upsert (MERGE INTO semantics) on a per-user profile: the base
    * snapshot is each user's latest event before the split instant, the
    * update batch each user's latest event at-or-after it; the merge keeps
    * untouched profiles (`keep`), overwrites matched ones with the batch row
    * (`update`), and inserts first-seen users (`insert`). This is the
    * lakehouse maintenance primitive every incrementally-refreshed serving
    * table runs on — expressed as latest-per-key windows on both sides plus
    * ONE full-outer equi-join on the key. At scale the base side is the
    * stored, bucketed-by-key table, so the merge shuffles only the batch to
    * the base's layout; output width is the profile row, never event
    * history. `value` passes through unmodified (no arithmetic — exact
    * cross-engine). Output (user_id, last_event_id, last_type, last_value,
    * action), user-ordered. */
  def userProfileUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    // 2024-01-21T00:00Z as epoch nanos (ts arrives as long nanos)
    val splitNs = java.time.LocalDate.of(2024, 1, 21).toEpochDay *
      86400L * 1000000000L
    val ev = Sources.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts"))
    def latest(df: DataFrame, p: String): DataFrame = {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as(s"${p}_event_id"),
          col("event_type").as(s"${p}_type"), col("value").as(s"${p}_value"))
    }
    val base = latest(ev.filter(col("ts") < splitNs), "b")
    val batch = latest(ev.filter(col("ts") >= splitNs), "u")
    base.join(batch, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("u_event_id"), col("b_event_id")).as("last_event_id"),
        coalesce(col("u_type"), col("b_type")).as("last_type"),
        coalesce(col("u_value"), col("b_value")).as("last_value"),
        when(col("u_event_id").isNotNull && col("b_event_id").isNotNull,
          lit("update"))
          .when(col("u_event_id").isNotNull, lit("insert"))
          .otherwise(lit("keep")).as("action"))
      .orderBy("user_id")
  }

  /** Semi/anti join surface: customers with at least one order vs none,
    * as one summary row (left_semi + left_anti counts). */
  def customersSemiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Sources.table(spark, sfDir, "customer")
    val o = Sources.table(spark, sfDir, "orders")
    val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_with"))
    val without = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_without"))
    withOrders.crossJoin(without)
  }

  /** Pivot surface: documents per (source, lang) with lang pivoted to
    * columns. Explicit value list — at scale an unbounded pivot would force
    * a discovery pass; a declared vocabulary keeps it one aggregation. */
  def docsPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    val p = Sources.table(spark, sfDir, "documents")
      .groupBy("source").pivot("lang", langs).agg(count(lit(1)))
    p.select(col("source") +: langs.map(l =>
      coalesce(col(l), lit(0L)).cast("long").as(l)): _*)
      .orderBy("source")
  }

  /** Rolling window frame: per-user 3-event moving sum of `value`
    * (2 preceding + current, (ts, event_id) order), summed in exact decimal
    * then cast to double so the frame fold is order-independent. */
  def eventsRolling(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    Sources.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("roll_sum",
        sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
      .withColumn("roll_n", count(lit(1)).over(w))
      .select("event_id", "user_id", "roll_sum", "roll_n")
      .orderBy("event_id")
  }

  /** Set-operation surface (UNION / INTERSECT / EXCEPT, all distinct
    * semantics): English or src1 docs, that are longer than 100 chars,
    * excluding src0. */
  def docsSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Sources.table(spark, sfDir, "documents")
    val en = d.filter(col("lang") === "en").select("doc_id")
    val s1 = d.filter(col("source") === "src1").select("doc_id")
    val long_ = d.filter(col("n_chars") > 100).select("doc_id")
    val s0 = d.filter(col("source") === "src0").select("doc_id")
    en.union(s1).distinct().intersect(long_).except(s0).orderBy("doc_id")
  }

  /** Sketch surface (rows-only; approximate by design, no exact oracle):
    * HyperLogLog++ distinct counts and quantile sketches over lineitem,
    * with the exact count alongside for scale reference. */
  def sketchStats(spark: SparkSession, sfDir: String): DataFrame =
    Sources.table(spark, sfDir, "lineitem")
      .agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct(col("l_extendedprice")).as("approx_prices"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("median_qty_approx"))

  /** JSON property extraction + integer aggregation (exact long sums). */
  def eventsJsonStats(spark: SparkSession, sfDir: String): DataFrame =
    Sources.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Ordered conversion funnel view → click → purchase: per user, the
    * earliest view, the earliest click STRICTLY AFTER that view, and the
    * earliest purchase strictly after that click — the sequential
    * constraint that distinguishes a funnel from three independent mins.
    * Formulated as three conditional min-aggregations chained by equi-joins,
    * ALL keyed on user_id: the per-stage tables shrink monotonically
    * (stage k+1 ⊆ stage k's users), so at cluster scale the chain is one
    * user_id exchange reused across stages plus joins against
    * ever-smaller (eventually broadcast-able) stage tables. Times are µs
    * (DuckDB's TIMESTAMP resolution); missing stages surface as the -1
    * sentinel rather than nulls so the gate has no null-ordering to
    * disagree on. */
  def funnel(spark: SparkSession, sfDir: String): DataFrame =
    funnelOf(Sources.events(spark, sfDir))

  /** [[funnel]] over an explicit events frame (ScaleProof replication
    * surface — per-user timelines replicate under disjoint user ids, so the
    * depth histogram has a closed form at any replication factor). */
  def funnelOf(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ts"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"),
        (lit(1L) + when(col("t_click").isNotNull, 1L).otherwise(0L)
          + when(col("t_purchase").isNotNull, 1L).otherwise(0L)).as("depth"),
        coalesce(col("t_click"), lit(-1L)).as("t_click"),
        coalesce(col("t_purchase"), lit(-1L)).as("t_purchase"))
      .orderBy("user_id")
  }

  /** Event-type transition matrix (the first-order Markov view of user
    * behavior): for every consecutive (ts, event_id)-ordered pair within a
    * user, count src→dst transitions and total the µs gaps. One user_id
    * shuffle for the lead window, then a partial+final hash aggregation over
    * |types|² cells — the window is per-user (bounded partitions, no global
    * order), so the shape survives any user cardinality. */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame =
    eventTransitionsOf(Sources.events(spark, sfDir))

  def eventTransitionsOf(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts"), col("event_id"))
      .withColumn("dst", lead(col("event_type"), 1).over(byUser))
      .withColumn("gap_us", lead(col("ts"), 1).over(byUser) - col("ts"))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"), sum(col("gap_us")).as("sum_gap_us"))
      .orderBy("src", "dst")
  }

  /** Weekly cohort-retention matrix: users are cohorted by the ISO-epoch
    * week of their FIRST event; each (cohort, weeks-since-cohort) cell
    * counts the distinct cohort members active that week. Two hash
    * aggregations and one join, all keyed on user_id, then a distinct-count
    * over |weeks|² cells. Week keys are exact integer division on the
    * nanosecond timestamps (no date rendering for engines to disagree on). */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame =
    cohortRetentionOf(Sources.events(spark, sfDir))

  def cohortRetentionOf(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), expr("ts div 604800000000000").as("week"))
    val cohort = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    ev.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** SCD-2 history build: each user's event stream becomes slowly-changing-
    * dimension rows with validity intervals — the batch twin of
    * [[graft.streaming.EventTime.profileUpsertStream]]'s SCD-1 "latest
    * wins" (type 2 keeps every state with [valid_from, valid_to] instead of
    * overwriting). The tracked state is the event type; consecutive repeats
    * collapse (SCD-2 records CHANGES), `valid_to` is the µs before the next
    * change (-1 = still current), `version` numbers a user's states in
    * order. Two per-user windows on one user_id shuffle — the second runs on
    * the change rows only, already co-partitioned by the first. */
  def scd2History(spark: SparkSession, sfDir: String): DataFrame =
    scd2HistoryOf(Sources.events(spark, sfDir))

  def scd2HistoryOf(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val changes = events
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changes
      .withColumn("valid_to",
        coalesce(lead(col("ts"), 1).over(byUser) - 1, lit(-1L)))
      .withColumn("version", row_number().over(byUser).cast("long"))
      .select(col("user_id"), col("version"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"))
      .orderBy("user_id", "version")
  }

  /** Schema-drift canary for the events time column (round-7 hard lesson:
    * a testdata regeneration flipped `ts` from TIMESTAMP(NANOS) to
    * timestamp[us] and silently broke nine event-time queries at analysis
    * time). This query hash-gates the NORMALIZED nanos — count, endpoints,
    * and a order-independent checksum over every value (sum of µs-resolution
    * offsets from a fixed epoch day, exact in int64) — against DuckDB's
    * native `epoch_ns` read. If the generator drifts to a physical type
    * [[graft.sources.Sources.events]] mishandles, this fails as ONE named
    * diff pointing at the source boundary, not nine downstream failures. */
  def eventsTsCanary(spark: SparkSession, sfDir: String): DataFrame =
    Sources.events(spark, sfDir)
      .agg(
        count(lit(1)).as("n"),
        min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"),
        // ts div 1000: µs resolution; minus a 2024-01-01 base so the int64
        // sum of ~60k sf0.1 values stays far from overflow at any sf
        sum(expr("ts div 1000") - lit(1704067200000000L)).as("us_checksum"))

  /** DAU/WAU stickiness — the product-analytics engagement ratio: per day,
    * distinct active users (DAU), distinct users active in the trailing
    * 7-day window (WAU, via each active (user, day) pair COVERING days
    * d..d+6 — a 7-way explode on the deduplicated user-day table, never
    * on raw events), and DAU/WAU as one exact division. The explode-then-
    * distinct shape is the scale-safe sliding-distinct: state is
    * |users·days|·7 short rows, not a per-day rescan of the event log,
    * and both aggregations are map-side combined. Output
    * (day, dau, wau, stickiness) ordered by day. */
  def stickiness(spark: SparkSession, sfDir: String): DataFrame =
    stickinessOf(Sources.events(spark, sfDir))

  def stickinessOf(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct()
    val dau = ud.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("day"))
      .groupBy("day").agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau").cast("double"))
          .as("stickiness"))
      .orderBy("day")
  }

  /** Second-order event-sequence transitions — the Markov-2 upgrade of
    * [[eventTransitions]]: per user timeline (total order: ts, then
    * event_id), every consecutive event-type TRIGRAM with its count and
    * the conditional probability p(t3 | t1,t2) as count-over-context —
    * both exact integers, ONE division. The sequence windows are
    * per-user (the partitioning key the event log is already bucketed by
    * at scale), so no global sort exists; min-support keeps the output
    * at the head where a sequence model actually reads it. Output
    * (t1, t2, t3, n, ctx, p) ordered by (t1, t2, t3). */
  def eventTrigrams(spark: SparkSession, sfDir: String,
                    minCount: Long = 5L): DataFrame =
    eventTrigramsOf(Sources.events(spark, sfDir), minCount)

  def eventTrigramsOf(events: DataFrame, minCount: Long = 5L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tri = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t1"))
      .withColumn("t2", lead(col("t1"), 1).over(w))
      .withColumn("t3", lead(col("t1"), 2).over(w))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .select("t1", "t2", "t3")
    val ctx = tri.groupBy("t1", "t2").agg(count(lit(1)).as("ctx"))
    tri.groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .join(ctx, Seq("t1", "t2"))
      .select(col("t1"), col("t2"), col("t3"), col("n"), col("ctx"),
        (col("n").cast("double") / col("ctx").cast("double")).as("p"))
      .orderBy("t1", "t2", "t3")
  }

  /** Longest active-day streaks per user — the canonical gaps-and-islands
    * pattern: on the deduplicated (user, day) table, `day − row_number()`
    * is constant exactly within a run of consecutive days, so islands
    * fall out of one per-user window plus one aggregation — no self-join,
    * no recursion. Per-user windows partition on the key the log is
    * bucketed by at scale. Output (user_id, n_days, n_streaks,
    * max_streak) ordered by user_id. */
  def activeStreaks(spark: SparkSession, sfDir: String): DataFrame =
    activeStreaksOf(Sources.events(spark, sfDir))

  def activeStreaksOf(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    ud.withColumn("island", col("day") - row_number().over(w))
      .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(sum(col("len")).as("n_days"), count(lit(1)).as("n_streaks"),
        max(col("len")).as("max_streak"))
      .orderBy("user_id")
  }

  /** Peak concurrency per day — the sweep-line pattern: each event opens a
    * 30-minute presence interval; intervals become ±1 endpoint deltas,
    * NETTED per (day, instant) so the running sum is order-independent at
    * equal timestamps, and the peak is the max prefix sum. Midnight-
    * crossing intervals are clamped into each day they touch (the +1 at
    * day start carries the overhang in, the −1 at the true end closes it)
    * — which is what makes the sweep DAY-PARTITIONED: no global sort of
    * the log exists at any scale, each day's window sorts only its own
    * |2·events-of-day| netted instants. Output (day, n_intervals, peak)
    * ordered by day. */
  def peakConcurrency(spark: SparkSession, sfDir: String): DataFrame =
    peakConcurrencyOf(Sources.events(spark, sfDir))

  def peakConcurrencyOf(events: DataFrame): DataFrame = {
    val dayNs = 86400000000000L
    val iv = events
      .select(col("ts").as("s"), (col("ts") + 1800000000000L).as("e"))
    // explode into per-day clamped segments (an interval spans at most 2
    // days at these lengths; sequence() handles the general case)
    val seg = iv
      .select(col("s"), col("e"),
        explode(sequence(expr(s"s div $dayNs"), expr(s"(e - 1) div $dayNs")))
          .as("day"))
      .select(col("day"),
        greatest(col("s"), col("day") * dayNs).as("cs"),
        least(col("e"), (col("day") + 1) * dayNs).as("ce"))
    val deltas = seg.select(col("day"), col("cs").as("t"), lit(1L).as("d"))
      .unionAll(seg.select(col("day"), col("ce").as("t"), lit(-1L).as("d")))
      .groupBy("day", "t").agg(sum(col("d")).as("nd"))
    val w = Window.partitionBy("day").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peaks = deltas.withColumn("run", sum(col("nd")).over(w))
      .groupBy("day").agg(max(col("run")).as("peak"))
    // interval count comes from the segments directly — netting at equal
    // instants can cancel a start against an end and must not undercount
    seg.groupBy("day").agg(count(lit(1)).as("n_intervals"))
      .join(peaks, "day")
      .select("day", "n_intervals", "peak")
      .orderBy("day")
  }

  /** Lorenz/Pareto activity concentration — "what share of users produce
    * what share of events": users ranked by activity (total order:
    * count desc, user_id), cut into deciles, cumulative event share per
    * decile as one exact integer division per row. The rank is over
    * |users| rows (≪ |events|, the analytics premise); the curve itself
    * is 10 rows. Output (decile, n_users, n_events, cum_events,
    * cum_share) ordered by decile. */
  def paretoDeciles(spark: SparkSession, sfDir: String): DataFrame =
    paretoDecilesOf(Sources.events(spark, sfDir))

  def paretoDecilesOf(events: DataFrame): DataFrame = {
    val ue = events
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val ranked = ue.withColumn("decile",
      ntile(10).over(Window.orderBy(col("n").desc, col("user_id")))
        .cast("long"))
    val byDec = ranked.groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDec.withColumn("cum_events", sum(col("n_events")).over(w))
      .crossJoin(broadcast(ue.agg(sum(col("n")).as("total"))))
      .select(col("decile"), col("n_users"), col("n_events"),
        col("cum_events"),
        (col("cum_events").cast("double") / col("total").cast("double"))
          .as("cum_share"))
      .orderBy("decile")
  }

  /** Incremental view maintenance — the materialized-aggregate identity a
    * lakehouse refresh relies on: for a distributive view V (per-lang doc
    * and token counts), V(base ∪ batch) must equal V(base) ⊕ V(batch)
    * merged by key. Both sides are computed here — the MERGE path (two
    * partial views full-outer-joined on the key, coalesced sums: work
    * proportional to the BATCH plus |keys|, the entire point at 100 TB
    * where base is a stored table and only the delta is scanned) and the
    * gold recompute over the union — and the `consistent` flag rides in
    * the hash gate, so an engine where merge and recompute disagree
    * (non-distributive agg, key leak, null mishandling) fails loudly.
    * The batch stand-in is `doc_id % 10 == 0`. Output
    * (lang, n_docs, n_tokens, consistent) ordered by lang. */
  def incrementalView(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Sources.documents(spark, sfDir)
    def view(d: DataFrame): DataFrame =
      d.select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val merged = view(docs.filter(col("doc_id") % 10 =!= 0)).alias("b")
      .join(view(docs.filter(col("doc_id") % 10 === 0)).alias("d"),
        Seq("lang"), "full_outer")
      .select(col("lang"),
        (coalesce(col("b.n_docs"), lit(0L)) +
          coalesce(col("d.n_docs"), lit(0L))).as("n_docs"),
        (coalesce(col("b.n_tokens"), lit(0L)) +
          coalesce(col("d.n_tokens"), lit(0L))).as("n_tokens"))
    merged.join(view(docs)
        .withColumnRenamed("n_docs", "g_docs")
        .withColumnRenamed("n_tokens", "g_tokens"),
      Seq("lang"), "full_outer")
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        (col("n_docs") === col("g_docs") &&
          col("n_tokens") === col("g_tokens")).as("consistent"))
      .orderBy("lang")
  }
}
