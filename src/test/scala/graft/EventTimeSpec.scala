package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventTime
import graft.streaming.EventTime.{ItemEvent, ItemRunning}

class EventTimeSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(3600000L * 24 * 19723 + minute * 60000L)

  test("watermarked tumbling window drops late rows and finalizes windows") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val df = ms.toDF().select(col("_1").as("ts"), col("_2").as("event_type"))
    val q = EventTime.windowedCounts(df, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("t_windows")
      .outputMode(OutputMode.Append()).start()

    ms.addData((ts(1), "click"), (ts(2), "click"), (ts(11), "view"))
    q.processAllAvailable()
    // advance event time far past window 0 + lateness -> finalize it
    ms.addData((ts(40), "click"))
    q.processAllAvailable()
    // this row is 39 min late, beyond the 5-min watermark: must be dropped
    ms.addData((ts(1), "click"))
    q.processAllAvailable()
    ms.addData((ts(55), "click"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("t_windows")
      .select(col("w_start").cast("long"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    val base = ts(0).getTime / 1000
    assert(rows.contains((base, "click", 2L)), s"window 0 must finalize with 2 clicks, got $rows")
    assert(rows.contains((base + 600, "view", 1L)))
    assert(!rows.exists { case (w, t, n) => w == base && t == "click" && n == 3L },
      "late row must not reopen the finalized window")
  }

  test("hopping windows: streaming result equals the batch window() aggregation") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val df = ms.toDF().select(col("_1").as("ts"), col("_2").as("event_type"))
    val q = EventTime.hoppingCounts(df)
      .writeStream.format("memory").queryName("t_hopping")
      .outputMode(OutputMode.Complete()).start()

    val data = Seq((ts(1), "a"), (ts(7), "b"), (ts(12), "a"),
      (ts(25), "c"), (ts(31), "a"))
    ms.addData(data: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("t_hopping")
      .select(col("w_start").cast("long"), col("n"))
      .as[(Long, Long)].collect().toSet
    val batch = data.toDF("ts", "event_type")
      .groupBy(window(col("ts"), "20 minutes", "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long"), col("n"))
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch,
      s"streaming hopping windows must equal the batch twin: $streamed vs $batch")
    // each event lands in exactly width/slide = 2 windows
    assert(streamed.toSeq.map(_._2).sum == 2L * data.size)
  }

  test("flatMapGroupsWithState keeps running per-item totals across batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[ItemEvent]
    val q = EventTime.runningCounts(ms.toDS())
      .writeStream.format("memory").queryName("t_running")
      .outputMode(OutputMode.Update()).start()

    ms.addData(ItemEvent(1L, ts(0)), ItemEvent(1L, ts(1)), ItemEvent(2L, ts(2)))
    q.processAllAvailable()
    ms.addData(ItemEvent(1L, ts(3)))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("t_running").as[ItemRunning].collect()
      .groupBy(_.item).view.mapValues(_.maxBy(_.batches)).toMap
    assert(last(1L).total == 3L && last(1L).batches == 2L)
    assert(last(2L).total == 1L && last(2L).batches == 1L)
  }
}
