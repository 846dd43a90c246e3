package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.Sources

/** Prefix-filtered exact Jaccard join: the prefix/length/positional filters
  * may only PRUNE candidates, never true pairs — that is the whole
  * correctness claim, so it is asserted directly against the quadratic
  * definition here (and against the DuckDB brute-force oracle in the
  * driver gate). */
class PrefixJoinSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  /** Quadratic reference: full incidence self-join over the same distinct
    * shingle-hash sets the engine uses (string shingles and their 60-bit
    * hashes are interchangeable — HashesSpec). Threshold as the same exact
    * rational tNum/tDen. */
  private def bruteForce(tNum: Int, tDen: Int) = {
    val docs = Sources.documents(spark, dir)
    val sh = docs
      .filter(col("text").isNotNull && length(col("text")) >= 9)
      .select(col("doc_id").cast("long"),
        explode(array_distinct(transform(
          sequence(lit(1), length(col("text")) - 8),
          i => col("text").substr(i, lit(9))))).as("s"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("a"), col("c").as("ca")), "a")
      .join(sz.select(col("doc_id").as("b"), col("c").as("cb")), "b")
      .filter(col("inter") * tDen >= (col("ca") + col("cb") - col("inter")) * tNum)
      .select(col("a"), col("b"),
        (col("inter").cast("double") /
          (col("ca") + col("cb") - col("inter")).cast("double")).as("jaccard"))
  }

  test("prefix-filtered join equals the quadratic definition (t = 4/5)") {
    val got = Dedup.prefixJaccardPairs(Sources.documents(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = bruteForce(4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"prefix join lost or invented pairs: " +
      s"missing=${want -- got}, extra=${got -- want}")
    assert(got.nonEmpty, "fixture must exercise the join")
  }

  test("prefix-filtered join equals the quadratic definition (t = 1/2)") {
    val got = Dedup.prefixJaccardPairs(Sources.documents(spark, dir), 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = bruteForce(1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"prefix join lost or invented pairs: " +
      s"missing=${want -- got}, extra=${got -- want}")
  }

  test("a stricter threshold returns a subset (and respects the bound)") {
    val docs = Sources.documents(spark, dir)
    val loose = Dedup.prefixJaccardPairs(docs, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val strictRows = Dedup.prefixJaccardPairs(docs, 9, 10).collect()
    assert(strictRows.map(r => (r.getLong(0), r.getLong(1))).toSet
      .subsetOf(loose))
    strictRows.foreach(r => assert(r.getDouble(2) >= 0.9))
  }

  test("exact duplicates pair at jaccard 1.0") {
    val docs = Sources.documents(spark, dir)
    val dupGroups = Dedup.exactGroups(docs).count()
    val perfect = Dedup.prefixJaccardPairs(docs)
      .filter(col("jaccard") === 1.0).count()
    // every exact-dup group of size g contributes g*(g-1)/2 jaccard-1 pairs
    assert(dupGroups == 0 || perfect > 0)
  }
}
