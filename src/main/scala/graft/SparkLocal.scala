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
    if ((shm.isDirectory || shm.mkdirs()) && shm.canWrite) shm.getAbsolutePath
    else System.getProperty("java.io.tmpdir")
  }
}
