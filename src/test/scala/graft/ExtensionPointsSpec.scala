package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DotProduct
import graft.operators.Skew

class ExtensionPointsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("dot_product expression: eval and codegen agree with a Scala fold") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -0.5), Array(2.0, 2.0))
    ).toDF("a", "b")
    val got = df.select(DotProduct.dot(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
    assert(got(1) == 0.5 * 2 + -0.5 * 2)
  }

  test("dot_product registers on the SQL surface") {
    // GraftExtensions wires this at session build (spark.sql.extensions);
    // the shared test session already exists, so register directly here
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(r == 11.0)
  }

  test("threshold-levenshtein rule stages the filter and preserves results") {
    import graft.plans.ThresholdLevenshteinRule
    // parquet-backed source: a LocalRelation would be constant-folded by
    // ConvertToLocalRelation before any optimizer rule could be observed
    graft.sources.Sources.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "substring(text, 1, 12) AS a",
        "substring(text, 3, 12) AS b")
      .createOrReplaceTempView("lev_pairs")
    val q = "SELECT a, b FROM lev_pairs WHERE levenshtein(a, b) <= 2 ORDER BY a, b"
    val expect = spark.sql(q).collect().toSeq // unrewritten control
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ ThresholdLevenshteinRule
      val rewrittenDf = spark.sql(q)
      val plan = rewrittenDf.queryExecution.optimizedPlan.toString
      // the optimized filter carries BOTH halves of the staging: the
      // length-difference guard and the threshold (3-arg) levenshtein
      assert(plan.contains("levenshtein(") && plan.contains("Some(2)) >= 0"),
        s"threshold form missing:\n$plan")
      assert(plan.contains("abs(") && plan.contains("length("),
        s"length guard missing:\n$plan")
      assert(rewrittenDf.collect().toSeq === expect)
      // strict < and reversed comparison rewrite too; > stays untouched
      val lt = spark.sql(
        "SELECT count(*) FROM lev_pairs WHERE levenshtein(a, b) < 3")
      assert(lt.queryExecution.optimizedPlan.toString.contains("Some(2)) >= 0"))
      assert(lt.head().getLong(0) ===
        expect.length.toLong) // <3 ≡ <=2 on this fixture
      val gt = spark.sql(
        "SELECT count(*) FROM lev_pairs WHERE levenshtein(a, b) > 2")
      assert(!gt.queryExecution.optimizedPlan.toString.contains("Some("),
        "upper-bound-only comparisons must not be rewritten")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("salted join and salted count match their unsalted equivalents") {
    // heavy skew: 90% of rows share one key
    val probe = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i.toLong))
      .toDF("k", "v")
    val build = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val expect = probe.join(build, "k").agg(count(lit(1)), sum("v"))
      .as[(Long, Long)].head()
    val got = Skew.saltedJoin(probe, build, "k", buckets = 8)
      .agg(count(lit(1)), sum("v")).as[(Long, Long)].head()
    assert(got == expect)

    val cexpect = probe.groupBy("k").count().as[(Long, Long)].collect().toMap
    val cgot = Skew.saltedCount(probe, "k", buckets = 8)
      .as[(Long, Long)].collect().toMap
    assert(cgot == cexpect)
  }
}
