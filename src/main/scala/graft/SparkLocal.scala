package graft

/** Shared local-mode session tuning.
  *
  * The container's /tmp sits on a virtual disk whose burst throughput
  * collapses intermittently (observed 2–10x whole-stage stalls on
  * shuffle-write-heavy stages, in both driver-side and local runs). Shuffle
  * and spill files need no durability, so the harness points
  * `spark.local.dir` at tmpfs when available.
  */
object SparkLocal {
  def localDir: String = {
    val shm = new java.io.File("/dev/shm/graft-spark")
    if ((shm.isDirectory || shm.mkdirs()) && shm.canWrite) {
      sweepStale(shm, maxAgeMs = 2L * 3600 * 1000)
      shm.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
  }

  /** tmpfs is RAM: blockmgr/spark temp dirs leaked by killed JVMs must not
    * accumulate across runs. Spark removes its own dirs on clean stop; this
    * sweeps anything older than `maxAgeMs` (never the live run's dirs). */
  private def sweepStale(root: java.io.File, maxAgeMs: Long): Unit = {
    val cutoff = System.currentTimeMillis() - maxAgeMs
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.lastModified() < cutoff)
      .foreach(deleteRec)
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }
}
