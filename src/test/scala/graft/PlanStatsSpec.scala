package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PlanStats

/** [[PlanStats.exactRowCount]] picks size-gate routes without running a job,
  * so a wrong answer silently changes RESULTS (the large routes trade recall
  * for scale). Contract: exact on row-preserving plans over parquet, None —
  * never a guess — anywhere row count could differ from the footers. */
class PlanStatsSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  test("parquet footer count is exact for bare and projected scans") {
    val docs = graft.sources.Sources.documents(spark, dir)
    val expected = docs.count()
    assert(PlanStats.exactRowCount(docs).contains(expected))
    assert(PlanStats.exactRowCount(
      docs.select(col("doc_id").cast("long"), col("text"))).contains(expected))
    // the contract query's exact shape: projected + cast embeddings
    val emb = graft.sources.Sources.embeddings(spark, dir)
      .select(col("vec_id").cast("long"), col("emb").cast("array<double>"))
    assert(PlanStats.exactRowCount(emb).contains(
      graft.sources.Sources.embeddings(spark, dir).count()))
  }

  test("non-row-preserving plans answer None, never an estimate") {
    val docs = graft.sources.Sources.documents(spark, dir)
    assert(PlanStats.exactRowCount(docs.filter(col("doc_id") > 100)).isEmpty)
    assert(PlanStats.exactRowCount(docs.limit(3)).isEmpty)
    assert(PlanStats.exactRowCount(
      docs.groupBy("lang").agg(count(lit(1)).as("n"))).isEmpty)
    assert(PlanStats.exactRowCount(docs.join(docs.select("doc_id"), "doc_id")).isEmpty)
  }

  test("local relations report their exact size when stats carry rowCount") {
    import spark.implicits._
    val local = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    // rowCount may legitimately be absent without CBO — the contract is only
    // "exact or None", so accept either, but reject any wrong Some
    PlanStats.exactRowCount(local).foreach(n => assert(n == 3L))
  }
}
