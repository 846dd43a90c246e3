package graft

/** Per-job wall-time profiler for the optimization loop (guide §1):
  * runs each named query twice (cold then warm — codegen amortized) and
  * prints every Spark job the WARM run launched, with wall millis and
  * the head of its first stage's name/callsite. Local diagnosis only —
  * the bench artifact of record stays `graft.Bench`. */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkLocal.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // listener events arrive on the async bus thread (r14 ADVICE):
    // concurrent collections + a volatile flag, and the main thread
    // drains the bus before flipping/reading (GraftSparkHooks)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    @volatile var collecting = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (collecting) {
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
          starts.put(j.jobId, (System.nanoTime(), site)): Unit
        }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (collecting) Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
          jobs.add((j.jobId, (System.nanoTime() - t0) / 1000000L, site)): Unit
        }
    })
    for (n <- args.toSeq; fn <- SparkEntry.queries.get(n)) {
      fn(spark, sfDir).count() // cold: codegen + JIT
      spark.catalog.clearCache()
      org.apache.spark.GraftSparkHooks.drainListenerBus(spark.sparkContext)
      jobs.clear(); starts.clear()
      collecting = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1000000L
      // job-end events may still be in flight on the async bus — drain
      // before flipping the flag and reading the buffer (r14 ADVICE)
      org.apache.spark.GraftSparkHooks.drainListenerBus(spark.sparkContext)
      collecting = false
      spark.catalog.clearCache()
      val snap = jobs.toArray(Array.empty[(Int, Long, String)])
      println(s"\n===== $n warm=${wall}ms jobs=${snap.length} " +
        s"jobs_ms=${snap.map(_._2).sum} =====")
      snap.sortBy(_._1).foreach { case (id, ms, site) =>
        println(f"  job $id%4d $ms%6d ms  $site")
      }
    }
    spark.stop()
  }
}
