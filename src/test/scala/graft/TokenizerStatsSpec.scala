package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, TextAnalysis}
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

  /** Canonical greedy BPE on symbol lists — the independent reference the
    * flat-string replace encoding must reproduce exactly. */
  private def driverBpe(nMerges: Int): Seq[(Long, String, String, Long)] = {
    val texts = Sources.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    var vocab: Map[Vector[String], Long] = texts.iterator
      .flatMap(_.split(" ", -1)).filter(_.nonEmpty).toSeq
      .groupBy(identity).map { case (t, g) =>
        (t.map(_.toString).toVector, g.size.toLong)
      }
    val out = Seq.newBuilder[(Long, String, String, Long)]
    for (it <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- vocab; w <- syms.sliding(2) if w.length == 2)
        counts((w(0), w(1))) = counts.getOrElse((w(0), w(1)), 0L) + cnt
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq
          .sortBy { case ((x, y), n) => (-n, x + " " + y) }.head
        out += ((it.toLong, s"$a $b", a + b, c))
        // greedy left-to-right, non-overlapping merge application
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.result()
        }(_._2)(_ + _)
      }
    }
    out.result()
  }

  test("bpe merge table equals canonical greedy BPE on symbol lists") {
    val got = Bpe.bpeMerges(Sources.documents(spark, dir), nMerges = 8)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got === driverBpe(8))
    // merged symbols grow monotonically richer: each merge's parts are
    // either single chars or earlier merge outputs
    val known = scala.collection.mutable.Set.empty[String]
    got.foreach { case (_, pair, merged, _) =>
      val Array(a, b) = pair.split(" ")
      assert(a.length == 1 || known.contains(a), s"unknown left '$a'")
      assert(b.length == 1 || known.contains(b), s"unknown right '$b'")
      known += merged
    }
  }

  test("bpe corpus encoding matches a canonical greedy re-encode per doc") {
    val merges = driverBpe(8).map { case (_, pair, merged, _) =>
      val Array(a, b) = pair.split(" "); (a, b, merged)
    }
    def encodeLen(tok: String): Long = {
      var syms = tok.map(_.toString).toVector
      for ((a, b, m) <- merges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += m; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length.toLong
    }
    val docs = Sources.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).filter(_.nonEmpty)))
      .filter(_._2.nonEmpty)
    val expect = docs.map { case (id, ts) =>
      id -> ((ts.length.toLong, ts.map(_.length.toLong).sum,
        ts.map(encodeLen).sum))
    }.toMap
    val rows = Bpe.bpeEncode(Sources.documents(spark, dir), nMerges = 8)
      .collect()
    assert(rows.length === expect.size)
    rows.foreach { r =>
      val (id, w, c, t) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert((w, c, t) === expect(id), s"doc $id")
      // fertility brackets: never fewer tokens than words, never more than chars
      assert(t >= w && t <= c)
      assert(r.getDouble(4) === t.toDouble / w.toDouble)
    }
  }

  test("bigram LM score matches a first-principles recount") {
    val rows = TextAnalysis.lmScore(Sources.documents(spark, dir))
      .collect()
    // driver recount
    val docs = Sources.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= 2)
    val allBg = docs.flatMap { case (_, ts) => ts.sliding(2).map(w => (w(0), w(1))) }
    val cab = allBg.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val ca = cab.groupBy(_._1._1).map { case (w1, g) => w1 -> g.values.sum }
    def flog2(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val expect = docs.map { case (id, ts) =>
      val bgs = ts.sliding(2).map(w => (w(0), w(1))).toSeq
      val bits = bgs.map(b => (flog2(ca(b._1)) - flog2(cab(b))).toLong).sum
      id -> ((bgs.length.toLong, bits))
    }.toMap
    assert(rows.length === expect.size)
    rows.foreach { r =>
      val (id, n, bits, mean) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert((n, bits) === expect(id), s"doc $id")
      assert(bits >= 0L)
      assert(mean === bits.toDouble / n.toDouble)
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
