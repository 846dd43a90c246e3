package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.sources.Sources

/** Round-7 widening: BPE tokenizer-training pair statistics and the
  * token-length fertility audit, checked against first-principles driver
  * recounts on sf0.001. */
class TokenizerStatsSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def driverPairCounts(): Map[String, Long] = {
    val texts = Sources.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for (t <- texts; tok <- t.split(" ", -1) if tok.length >= 2;
         i <- 0 until tok.length - 1) {
      val p = tok.substring(i, i + 2)
      counts(p) = counts.getOrElse(p, 0L) + 1L
    }
    counts.toMap
  }

  test("bpe pair counts match a first-principles recount; top-k is the true top-k") {
    val truth = driverPairCounts()
    val total = truth.values.sum
    val got = TextAnalysis.bpePairs(Sources.documents(spark, dir), k = 20)
      .collect()
    assert(got.length === 20)
    // every reported pair: 2 chars, exact count, exact one-division frac
    got.foreach { r =>
      val (p, c, f) = (r.getString(0), r.getLong(1), r.getDouble(2))
      assert(p.length === 2)
      assert(truth(p) === c, s"count mismatch for '$p'")
      assert(f === c.toDouble / total.toDouble)
    }
    // the reported top-k IS the global top-k under (count desc, pair asc)
    val expectTop = truth.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq === expectTop)
    // and it is ordered that way
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) > b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) && a.getString(0) < b.getString(0)))
    }
  }

  test("token-length histogram partitions the token stream exactly") {
    val rows = TextAnalysis.tokenLengths(Sources.documents(spark, dir))
      .collect()
    val totalTokens = TextAnalysis.tokens(Sources.documents(spark, dir)).count()
    assert(rows.map(_.getLong(1)).sum === totalTokens)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // types never exceed occurrences
      assert(r.getLong(2) > 0L)
    }
    // recount one bucket from first principles
    val texts = Sources.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    val toks = texts.flatMap(_.split(" ", -1))
    val len = rows.head.getLong(0)
    assert(rows.head.getLong(1) === toks.count(_.length == len))
    assert(rows.head.getLong(2) ===
      toks.filter(_.length == len).distinct.length)
  }
}
