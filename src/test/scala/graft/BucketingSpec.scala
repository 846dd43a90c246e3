package graft



import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the persisted form of co-located joins (the 100 TB posture for
  * repeated fact-fact joins): both tables pre-hashed into the same bucket
  * count on the join key means the join plans with NO Exchange on either
  * side. This spec proves the plan shape, not just the result. */
class BucketingSpec extends AnyFunSuite with SharedSpark {

  private def rmWarehouse(): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val wh = new java.io.File("spark-warehouse")
    if (wh.exists()) rm(wh)
  }

  test("bucketed fact-fact join plans without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS li_b"); spark.sql("DROP TABLE IF EXISTS o_b")
    rmWarehouse()
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").format("parquet").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").format("parquet").saveAsTable("o_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: broadcast would mask the co-location win
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b").join(spark.table("o_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      val expect = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    spark.sql("DROP TABLE li_b"); spark.sql("DROP TABLE o_b")
    // saveAsTable writes under ./spark-warehouse in the shared test session
    // (warehouse.dir is a static conf); clean it out of the worktree
    rmWarehouse()
  }
}
