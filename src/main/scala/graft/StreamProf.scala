package graft

/** Per-micro-batch duration profiler for the streaming drains (guide §1,
  * optimization r15): registers a StreamingQueryListener and, after
  * running each named gate once, prints every micro-batch's
  * `durationMs` breakdown (addBatch / getBatch / walCommit / planning /
  * trigger) plus the state-operator commit times — the decomposition
  * JobProf cannot see because a whole micro-batch is one job. Local
  * diagnosis only — the bench artifact of record stays `graft.Bench`. */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkLocal.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      extraConf = sys.env.get("SPARK_GRAFT_SHUFFLE").toSeq
        .map(("spark.sql.shuffle.partitions", _)))
    val progress =
      new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.streaming.StreamingQueryProgress]
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit = progress.add(e.progress): Unit
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit = ()
      })
    for (n <- args.toSeq; fn <- SparkEntry.queries.get(n)) {
      progress.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1000000L
      Thread.sleep(500) // listener events ride an async bus
      val snap = progress.toArray(
        Array.empty[org.apache.spark.sql.streaming.StreamingQueryProgress])
      println(s"\n===== $n wall=${wall}ms batches=${snap.length} =====")
      snap.foreach { p =>
        val d = p.durationMs
        def ms(k: String) = Option(d.get(k)).map(_.toString).getOrElse("-")
        val state = p.stateOperators.map(s =>
          s"upd=${s.allUpdatesTimeMs} rm=${s.allRemovalsTimeMs} " +
            s"commit=${s.commitTimeMs} rows=${s.numRowsTotal} " +
            s"parts=${s.numShufflePartitions}").mkString(" | ")
        println(s"  ${p.name} b${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${ms("triggerExecution")} addBatch=${ms("addBatch")} " +
          s"getBatch=${ms("getBatch")} latestOffset=${ms("latestOffset")} " +
          s"plan=${ms("queryPlanning")} wal=${ms("walCommit")} " +
          s"commitOff=${ms("commitOffsets")}  [$state]")
      }
    }
    spark.stop()
  }
}
