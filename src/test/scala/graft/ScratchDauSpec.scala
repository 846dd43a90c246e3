package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventTime

class ScratchDauSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def ts(min: Long): Timestamp =
    new Timestamp((19723L * 86400L + min * 60L) * 1000L)

  test("scratch: same user-day across batches beyond the watermark") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long)]
    val df = ms.toDF().select(col("_1").as("ts"), col("_2").as("user_id"))
    val q = EventTime.dauStream(df, lateness = "1 hour")
      .writeStream.format("memory").queryName("t_dau_scratch")
      .outputMode(OutputMode.Append()).start()

    // batch 1: user 1 at minute 10 of day 0
    ms.addData((ts(10), 1L))
    q.processAllAvailable()
    // batch 2: advance watermark past 10+60 via another user, day 0 evening
    ms.addData((ts(600), 2L))
    q.processAllAvailable()
    // batch 3: user 1 AGAIN on day 0, evening (state for (1, day0) evicted?)
    ms.addData((ts(610), 1L))
    q.processAllAvailable()
    // close the day-0 window
    ms.addData((ts(5000), 9L))
    q.processAllAvailable()
    q.stop()

    val day0 = 19723L * 86400L
    val rows = spark.table("t_dau_scratch")
      .select(col("day").cast("long"), col("dau"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // EXACT DAU for day 0 is 2 (users 1 and 2); print what we actually get
    info(s"day0 dau = ${rows.get(day0)}")
    assert(rows.get(day0) === Some(2L), s"got $rows")
  }
}
