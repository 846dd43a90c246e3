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

  test("profileUpsertStream converges to the batch upsert's merged profile") {
    implicit val ctx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Sources.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts"))
      .as[EventTime.UserEvent].collect()
    // adversarial replay: round-robin split so each user's events interleave
    // across batches, each batch internally ts-REVERSED — arrival order must
    // not matter
    val batches = ev.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .map(_._2.map(_._1).sortBy(e => (-e.ts, e.event_id)).toSeq)
    val ms = MemoryStream[EventTime.UserEvent]
    val q = EventTime.profileUpsertStream(ms.toDS())
      .writeStream.format("memory").queryName("t_upsert")
      .outputMode(OutputMode.Update()).start()
    batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    val fin = spark.table("t_upsert").as[EventTime.UserProfile].collect()
      .groupBy(_.user_id).view.mapValues(_.maxBy(_.n_merges)).toMap
    val expect = ev.groupBy(_.user_id).view
      .mapValues(_.maxBy(e => (e.ts, e.event_id))).toMap
    assert(fin.keySet == expect.keySet.toSet)
    fin.foreach { case (u, p) =>
      val e = expect(u)
      assert(p.last_event_id == e.event_id && p.last_type == e.event_type &&
        p.last_value == e.value && p.ts == e.ts, s"user $u")
    }
    // and the batch MERGE (q_upsert) agrees on every profile column
    val merged = graft.operators.Relational.userProfileUpsert(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getDouble(3)))
      .toMap
    assert(merged.keySet == fin.keySet)
    merged.foreach { case (u, (eid, tpe, v)) =>
      assert(fin(u).last_event_id == eid && fin(u).last_type == tpe &&
        fin(u).last_value == v, s"user $u vs batch merge")
    }
  }

  test("funnelStream converges to the batch funnel under any batch carving") {
    implicit val ctx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Sources.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts"))
      .as[EventTime.UserEvent].collect()
    // the funnel's ordering contract: event-time order ACROSS batches;
    // WITHIN each batch the events are deliberately ts-REVERSED so the
    // fold's internal sort is what restores order, not the carving
    val ordered = ev.sortBy(e => (e.ts, e.event_id))
    for (nBatches <- Seq(1, 3, 7)) {
      val size = math.max(1, (ordered.length + nBatches - 1) / nBatches)
      val batches = ordered.grouped(size)
        .map(_.sortBy(e => (-e.ts, -e.event_id)).toSeq).toSeq
      val ms = MemoryStream[EventTime.UserEvent]
      val name = s"t_funnel_$nBatches"
      val q = EventTime.funnelStream(ms.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      val fin = spark.table(name).as[EventTime.FunnelProgress].collect()
        .groupBy(_.user_id).view.mapValues(_.maxBy(_.n_updates)).toMap
      val batchFunnel = graft.operators.Relational
        .funnelOf(graft.sources.Sources.events(spark, dir)).collect()
        .map(r => r.getLong(0) ->
          (r.getAs[Long]("t_view"), r.getAs[Long]("t_click"),
            r.getAs[Long]("t_purchase"), r.getAs[Long]("depth"))).toMap
      assert(fin.keySet == batchFunnel.keySet.toSet, s"carving $nBatches")
      fin.foreach { case (u, p) =>
        val (tv, tc, tp, d) = batchFunnel(u)
        assert(p.t_view == tv && p.t_click == tc && p.t_purchase == tp &&
          p.depth == d, s"user $u under carving $nBatches")
      }
    }
  }
}
