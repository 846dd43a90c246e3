package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import graft.sources.Sources

/** Z-order layout: the point of a Morton-key sort is that a 2-d box scan
  * prunes most parquet row groups on min/max stats — measure exactly that
  * by comparing bytes read for the same box over a z-sorted vs an
  * id-sorted layout of the same table. */
class LayoutSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.01"

  private def tmp(name: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_layout_$name").getAbsolutePath

  /** Bytes read by `body`'s scan tasks (listener-accumulated). */
  private def bytesRead(body: => Long): (Long, Long) = {
    val in = new java.util.concurrent.atomic.AtomicLong
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          in.addAndGet(t.taskMetrics.inputMetrics.bytesRead): Unit
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val rows = body
      // listener events drain asynchronously; under host contention a fixed
      // settle can undercount, so poll until the total is stable across two
      // consecutive checks (bounded at 10 s)
      var prev = -1L
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 10000) {
        Thread.sleep(200)
        waited += 200
        val cur = in.get
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      (rows, in.get)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def boxCount(df: DataFrame): Long =
    df.filter(col("x").between(10.0, 14.0) && col("y").between(20.0, 24.0))
      .count()

  test("zvalue interleaves bits (known vectors) and stays within 2*bits bits") {
    val rows = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (2L, 0L, 4L), (0L, 2L, 8L), (3L, 5L, 39L), (65535L, 65535L, 4294967295L))
    import spark.implicits._
    val got = rows.toDF("i", "j", "want")
      .select(col("want"), Layout.zvalue(col("i"), col("j")).as("got"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(0),
      s"zvalue mismatch: got ${r.getLong(1)} want ${r.getLong(0)}"))
  }

  test("z-sorted layout reads fewer bytes than id-sorted for the same box") {
    val pts = Layout.zorderPoints(Sources.points2d(spark, dir))
    // small row groups so the 60k-row fixture spans many groups
    Layout.writeOrdered(pts, col("zval"), tmp("zsort"), rowGroupBytes = 64 << 10)
    Layout.writeOrdered(pts, col("id"), tmp("idsort"), rowGroupBytes = 64 << 10)
    val (nZ, bZ) = bytesRead(boxCount(spark.read.parquet(tmp("zsort"))))
    val (nI, bI) = bytesRead(boxCount(spark.read.parquet(tmp("idsort"))))
    assert(nZ == nI, "layout must not change the answer")
    assert(nZ > 0, "box must select rows on this fixture")
    assert(bZ * 2 < bI,
      s"z-order should at least halve bytes read: z=$bZ vs id=$bI")
  }
}
