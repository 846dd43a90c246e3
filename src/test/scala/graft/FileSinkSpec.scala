package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming file sink: readStream → transform → writeStream(parquet) with a
  * checkpoint, then a RESTART over the same checkpoint — the exactly-once
  * file-sink contract (processed offsets are not re-emitted, late files are).
  * This is the durable half of §2.10 the memory-sink specs don't cover. */
class FileSinkSpec extends AnyFunSuite with SharedSpark {

  test("parquet writeStream is exactly-once across a checkpointed restart") {
    val base = java.nio.file.Files.createTempDirectory("graft_fsink").toString
    val (srcDir, outDir, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")

    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val Array(first, second) = src.randomSplit(Array(0.5, 0.5), seed = 1L)
    first.coalesce(1).write.mode("overwrite").parquet(srcDir)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("event_id BIGINT, user_id BIGINT, event_type STRING")
        .parquet(srcDir)
        .withColumn("bucket", pmod(col("user_id"), lit(10)))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive, "AvailableNow query must drain and stop")
    }

    runOnce()
    val n1 = spark.read.parquet(outDir).count()
    assert(n1 == first.count(), "first drain must emit exactly the first half")

    // drop more files, restart from the SAME checkpoint: only the new
    // files may be emitted — no reprocessing of committed offsets
    second.coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    val out = spark.read.parquet(outDir)
    assert(out.count() == src.count(), "restart must add only the new files")
    assert(out.select(sum("event_id")).head().getLong(0) ==
      src.select(sum("event_id")).head().getLong(0),
      "emitted rows must be exactly the source rows, once each")
  }
}
