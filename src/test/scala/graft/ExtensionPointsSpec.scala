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
