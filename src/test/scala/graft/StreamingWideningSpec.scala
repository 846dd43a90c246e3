package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventTime

class StreamingWideningSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(3600000L * 24 * 19723 + minute * 60000L)

  test("session_window groups events by gap and closes sessions past the watermark") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val df = ms.toDF().select(col("_1").as("ts"), col("_2").as("user_id"))
    val q = EventTime.sessionCounts(df, gap = "10 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("t_sessions")
      .outputMode(OutputMode.Append()).start()

    // user 1: events at 0,5 (one session); at 30 (new session, gap > 10)
    ms.addData((ts(0), 1L), (ts(5), 1L), (ts(30), 1L))
    q.processAllAvailable()
    // advance watermark far enough to finalize both sessions
    ms.addData((ts(120), 2L))
    q.processAllAvailable()
    ms.addData((ts(240), 2L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("t_sessions")
      .select(col("user_id"), col("n_events"))
      .as[(Long, Long)].collect().toList.sorted
    assert(rows.contains((1L, 2L)), s"first session of user 1 must hold 2 events, got $rows")
    assert(rows.contains((1L, 1L)), s"second session of user 1 must hold 1 event, got $rows")
  }

  test("stream-stream interval join pairs conversions within the delay bound") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val convs = MemoryStream[(Timestamp, Long)]
    val cdf = clicks.toDF().select(col("_1").as("ts"), col("_2").as("user_id"))
    val vdf = convs.toDF().select(col("_1").as("ts"), col("_2").as("user_id"))
    val q = EventTime.intervalJoin(cdf, vdf, maxDelay = "30 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("t_ssjoin")
      .outputMode(OutputMode.Append()).start()

    // user 1 clicks at 0; converts at 10 (in bound) and 50 (out of bound).
    // user 2 converts at 5 with no click -> never emitted.
    clicks.addData((ts(0), 1L))
    convs.addData((ts(10), 1L), (ts(50), 1L), (ts(5), 2L))
    q.processAllAvailable()
    // advance both watermarks so in-bound results finalize
    clicks.addData((ts(200), 9L))
    convs.addData((ts(200), 9L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("t_ssjoin")
      .select(col("user_id"), col("click_ts"), col("conv_ts"))
      .as[(Long, Timestamp, Timestamp)].collect().toList
    assert(rows.map(r => (r._1, r._2, r._3)).contains((1L, ts(0), ts(10))),
      s"in-bound conversion must pair, got $rows")
    assert(!rows.exists(r => r._3 == ts(50)),
      s"out-of-bound conversion must not pair, got $rows")
    assert(!rows.exists(_._1 == 2L), s"conversion without click must not pair, got $rows")
  }

  test("left-outer interval join emits unmatched clicks as nulls after the watermark") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val convs = MemoryStream[(Timestamp, Long)]
    val cdf = clicks.toDF().select(col("_1").as("ts"), col("_2").as("user_id"))
    val vdf = convs.toDF().select(col("_1").as("ts"), col("_2").as("user_id"))
    val q = EventTime.intervalJoinLeftOuter(cdf, vdf,
        maxDelay = "30 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("t_ssjoin_outer")
      .outputMode(OutputMode.Append()).start()

    // user 1 clicks and converts in bound; user 3 clicks and never converts
    clicks.addData((ts(0), 1L), (ts(0), 3L))
    convs.addData((ts(10), 1L))
    q.processAllAvailable()
    // advance both watermarks far past click+maxDelay+lateness so the
    // unmatched click's state entry closes and the null row emits
    clicks.addData((ts(300), 9L))
    convs.addData((ts(300), 9L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("t_ssjoin_outer")
      .select(col("user_id"), col("click_ts"), col("conv_ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)))).toList
    assert(rows.contains((1L, ts(0), Some(ts(10)))),
      s"matched click must pair normally, got $rows")
    assert(rows.contains((3L, ts(0), None)),
      s"unmatched click must emit null-padded after watermark, got $rows")
    // the null row appears exactly once — outer emission is not retried
    assert(rows.count(r => r._1 == 3L) == 1, s"outer row must be unique, got $rows")
  }

  test("streaming DAU counts each user once per day and matches the batch distinct") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val df = ms.toDF().select(col("_1").as("ts"), col("_2").as("user_id"))
    val q = EventTime.dauStream(df, lateness = "1 hour")
      .writeStream.format("memory").queryName("t_dau")
      .outputMode(OutputMode.Append()).start()

    // ts() is MINUTES from the day-19723 boundary. Day 0: user 1 three
    // times, user 2 once; day 1: user 1 once — the dedup stage must
    // collapse user 1's day-0 repeats to one row
    val dayMin = 1440
    ms.addData((ts(10), 1L), (ts(20), 1L), (ts(500), 1L), (ts(40), 2L))
    ms.addData((ts(dayMin + 10), 1L))
    q.processAllAvailable()
    // advance the watermark far past day 1 so both windows finalize
    ms.addData((ts(3 * dayMin), 9L))
    q.processAllAvailable()
    q.stop()

    val day0 = 19723L * 86400L // epoch seconds of the fixture's day boundary
    val rows = spark.table("t_dau")
      .select(col("day").cast("long"), col("dau"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.get(day0) === Some(2L),
      s"day 0 must count users {1,2} once each, got $rows")
    assert(rows.get(day0 + 86400L) === Some(1L),
      s"day 1 must count user 1, got $rows")
  }

  test("stream-static broadcast enrichment joins reference data per batch") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val events = ms.toDF().select(col("_1").as("ts"), col("_2").as("user_id"))
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = EventTime.enrich(events, dim, "user_id")
      .writeStream.format("memory").queryName("t_enrich")
      .outputMode(OutputMode.Append()).start()
    ms.addData((ts(0), 1L), (ts(1), 2L), (ts(2), 7L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_enrich")
      .select(col("user_id"), col("tier"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toSet
    assert(rows == Set(1L -> Some("gold"), 2L -> Some("silver"), 7L -> None),
      s"enrichment must match dim rows and pass unknown keys through: $rows")
  }

  test("dropDuplicatesWithinWatermark drops in-horizon duplicate event ids") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val df = ms.toDF().select(col("_1").as("ts"), col("_2").as("event_id"))
    val q = EventTime.dedupWithinWatermark(df, lateness = "10 minutes")
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode(OutputMode.Append()).start()

    ms.addData((ts(0), 100L), (ts(1), 100L), (ts(2), 101L))
    q.processAllAvailable()
    // same id again within the watermark horizon -> dropped
    ms.addData((ts(3), 100L))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("t_dedup").select("event_id").as[Long].collect().toList
    assert(ids.sorted == List(100L, 101L), s"duplicates must collapse, got $ids")
  }
}
