package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventTime

/** STATEFUL checkpoint recovery for [[EventTime.windowedCounts]]: a
  * watermarked windowed aggregation is stopped (AvailableNow drain) while
  * open windows are still held in state, then a fresh query resumes from the
  * same checkpoint with later data. The resumed run must (a) not re-emit
  * windows already finalized before the stop and (b) finalize the held
  * windows with counts that include pre-stop rows it never re-read — i.e.
  * the window state and watermark themselves survived the restart, which is
  * the contract [[FileSinkSpec]] (stateless projection) cannot witness. */
class StateRecoverySpec extends AnyFunSuite with SharedSpark {

  private def eventsDf(rows: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("raw_ts", "event_type")
      .select(to_timestamp(col("raw_ts")).as("ts"), col("event_type"))
  }

  private def recoveryRoundTrip(provider: Option[String]): Unit = {
    val base = java.nio.file.Files.createTempDirectory("graft_state").toString
    val (srcDir, outDir, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")

    // hour-window, 30 min lateness. Batch 1 ends with an 02:10 row, so after
    // the first drain the watermark is 01:40: window [00,01) is finalized and
    // emitted; [01,02) and [02,03) are OPEN STATE at the stop.
    val batch1 = eventsDf(Seq(
      ("2024-01-01 00:05:00", "view"), ("2024-01-01 00:15:00", "view"),
      ("2024-01-01 00:25:00", "click"),
      ("2024-01-01 01:10:00", "view"), ("2024-01-01 01:50:00", "view"),
      ("2024-01-01 02:10:00", "click")))
    // Batch 2's 04:00 row pushes the watermark to 03:30, flushing the held
    // windows; its own [04,05) window stays open and unemitted.
    val batch2 = eventsDf(Seq(("2024-01-01 04:00:00", "view")))

    def runOnce(): Unit = {
      provider.foreach(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
      val stream = spark.readStream
        .schema("ts TIMESTAMP, event_type STRING")
        .parquet(srcDir)
      val q = EventTime.windowedCounts(stream)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        q.awaitTermination(120000)
        assert(!q.isActive, "AvailableNow query must drain and stop")
      } finally
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }

    batch1.coalesce(1).write.mode("overwrite").parquet(srcDir)
    runOnce()
    val afterFirst = spark.read.parquet(outDir).collect()
    assert(afterFirst.map(_.getAs[java.sql.Timestamp]("w_start").toString).toSet ==
      Set("2024-01-01 00:00:00.0"),
      s"only the watermark-passed window may emit before the stop: ${afterFirst.toSeq}")

    batch2.coalesce(1).write.mode("append").parquet(srcDir)
    runOnce() // fresh query object, same checkpoint: state must be restored

    val out = spark.read.parquet(outDir)
      .groupBy("w_start", "event_type").agg(sum("n").as("n"), count(lit(1)).as("emits"))
      .collect()
    // no dupes: every (window, type) emitted exactly once across both runs
    assert(out.forall(_.getAs[Long]("emits") == 1L),
      s"a window re-emitted after restart: ${out.toSeq}")
    // no loss: the held windows flushed with their full pre-stop counts
    val byKey = out.map(r =>
      (r.getAs[java.sql.Timestamp]("w_start").toString, r.getAs[String]("event_type")) ->
        r.getAs[Long]("n")).toMap
    assert(byKey == Map(
      ("2024-01-01 00:00:00.0", "view") -> 2L,
      ("2024-01-01 00:00:00.0", "click") -> 1L,
      ("2024-01-01 01:00:00.0", "view") -> 2L,
      ("2024-01-01 02:00:00.0", "click") -> 1L),
      s"restored state must finalize with pre-stop rows included: $byKey")
  }

  test("windowedCounts survives a checkpointed restart without dupes or loss") {
    recoveryRoundTrip(provider = None) // default HDFS-backed memory store
  }

  // r7 verdict #8: at 100 TB of keys the default in-memory store IS the
  // bottleneck (every key lives on-heap per executor); RocksDB is the
  // production provider — state spills to local disk, memory stays bounded.
  // Same contract, same checkpoint round-trip, RocksDB-backed.
  test("windowedCounts recovery holds on the RocksDB state store") {
    recoveryRoundTrip(provider = Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
  }
}
