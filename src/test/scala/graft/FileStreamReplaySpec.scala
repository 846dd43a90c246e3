package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.StreamParams
import graft.streaming.FrequentItemsStream

/** Offline replay of the events table as a file-source stream (FIXTURES.md
  * S4 mapping): the production pipeline's socket feed swaps for a parquet
  * directory with maxFilesPerTrigger, exercising the same foreachBatch fold. */
class FileStreamReplaySpec extends AnyFunSuite with SharedSpark {

  test("file-source replay of events drives the frequent-items fold") {
    val p = StreamParams(1000L, 0.025, 0.01, 0.1)
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_replay").toString
    // split into several files so multiple micro-batches fire
    src.select(col("event_id").as("seq"), (col("user_id") % 50).as("item"))
      .repartition(5).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("seq BIGINT, item BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val (state, query) = FrequentItemsStream.run(stream, p, seed = 7L,
      queryName = "t_replay")
    query.awaitTermination(60000)
    if (query.isActive) query.stop()

    assert(state.processed >= p.n)
    assert(state.reservoir.length == p.reservoirSize)
    assert(state.trueFrequent.nonEmpty)
    assert(state.exact.values.sum == state.processed)
  }

  test("stop fires even when the FIRST micro-batch already reaches n (stop-signal race)") {
    // regression for the ref.set-after-start race: one file, no
    // maxFilesPerTrigger -> the whole replay lands in micro-batch 0, whose
    // foreachBatch may run before run() publishes the query handle
    val p = StreamParams(200L, 0.025, 0.01, 0.1)
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_replay1").toString
    src.select(col("event_id").as("seq"), (col("user_id") % 50).as("item"))
      .coalesce(1).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("seq BIGINT, item BIGINT")
      .parquet(dir)
    val (state, query) = FrequentItemsStream.run(stream, p, seed = 3L,
      queryName = "t_replay_one_batch")
    val stopped = query.awaitTermination(60000)
    assert(stopped, "query must stop itself after the single covering batch")
    assert(state.processed >= p.n)
  }
}
