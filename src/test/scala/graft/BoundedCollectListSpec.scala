package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BoundedCollectList.boundedCollectList

/** Contract of the size-bounded collect aggregate
  * ([[graft.functions.BoundedCollectList]]): under-cap groups yield the
  * complete sorted list regardless of partitioning (partial-buffer merges
  * must not truncate below the bound), over-cap groups saturate at exactly
  * `maxLen` elements. */
class BoundedCollectListSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("under-cap groups: complete sorted list, partition-invariant") {
    val rows = for { g <- 0 until 7; i <- 0 until (g + 1) } yield (g.toLong, (100 - i).toLong)
    for (nPart <- Seq(1, 5)) {
      val got = rows.toDF("g", "v").repartition(nPart)
        .groupBy("g").agg(boundedCollectList(col("v"), 10).as("vs"))
        .orderBy("g")
        .as[(Long, Seq[Long])].collect()
      assert(got.length == 7)
      got.foreach { case (g, vs) =>
        val want = (0 until (g.toInt + 1)).map(i => (100 - i).toLong).sorted
        assert(vs == want, s"group $g at $nPart partitions")
      }
    }
  }

  test("over-cap groups saturate at exactly maxLen under any partitioning") {
    val rows = (0 until 1000).map(i => (i % 3L, i.toLong))
    for (nPart <- Seq(1, 13)) {
      val got = rows.toDF("g", "v").repartition(nPart)
        .groupBy("g").agg(size(boundedCollectList(col("v"), 21)).as("n"))
        .as[(Long, Int)].collect()
      assert(got.length == 3)
      got.foreach { case (g, n) => assert(n == 21, s"group $g at $nPart partitions") }
    }
  }

  test("matches sort_array(collect_list) exactly when nothing saturates") {
    val rows = (0 until 500).map(i => ((i * 7 % 40).toLong, (i * 31 % 1000).toLong))
    val a = rows.toDF("g", "v").repartition(7)
      .groupBy("g").agg(boundedCollectList(col("v"), 500).as("vs")).orderBy("g")
      .as[(Long, Seq[Long])].collect()
    val b = rows.toDF("g", "v")
      .groupBy("g").agg(sort_array(collect_list(col("v"))).as("vs")).orderBy("g")
      .as[(Long, Seq[Long])].collect()
    assert(a.toSeq == b.toSeq)
  }
}
