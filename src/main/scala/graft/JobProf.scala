package graft

import scala.collection.mutable

/** Per-job wall-time profiler for the optimization loop (guide §1):
  * runs each named query twice (cold then warm — codegen amortized) and
  * prints every Spark job the WARM run launched, with wall millis and
  * the head of its first stage's name/callsite. Local diagnosis only —
  * the bench artifact of record stays `graft.Bench`. */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkLocal.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, String)] // id, ms, site
    val starts = mutable.Map.empty[Int, (Long, String)]
    var collecting = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (collecting) {
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
          starts(j.jobId) = (System.nanoTime(), site)
        }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (collecting) starts.remove(j.jobId).foreach { case (t0, site) =>
          jobs += ((j.jobId, (System.nanoTime() - t0) / 1000000L, site))
        }
    })
    for (n <- args.toSeq; fn <- SparkEntry.queries.get(n)) {
      fn(spark, sfDir).count() // cold: codegen + JIT
      spark.catalog.clearCache()
      jobs.clear(); starts.clear()
      collecting = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1000000L
      collecting = false
      spark.catalog.clearCache()
      println(s"\n===== $n warm=${wall}ms jobs=${jobs.size} " +
        s"jobs_ms=${jobs.map(_._2).sum} =====")
      jobs.sortBy(_._1).foreach { case (id, ms, site) =>
        println(f"  job $id%4d $ms%6d ms  $site")
      }
    }
    spark.stop()
  }
}
