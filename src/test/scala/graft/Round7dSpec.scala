package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, DataQuality, Dedup, Sketches}
import graft.sources.Sources

/** Round-7 widening (session d): Misra–Gries verified heavy hitters, A-ES
  * priority sampling, SimHash-graph k-core, and the PR-curve evaluator —
  * each checked against a first-principles driver recount on sf0.001, plus
  * the guarantees the operators claim (partitioning-independence, peel
  * fixpoint, curve monotonicity).
  */
class Round7dSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  private def docTokens(): Seq[(Long, String, Array[String])] =
    Sources.documents(spark, dir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
      .toSeq

  test("heavy hitters equal the exact phi-frequent set, under any partitioning") {
    val toks = docTokens().flatMap(_._3)
    val n = toks.size.toLong
    val k = 200
    val expect = toks.groupBy(identity).view
      .mapValues(_.size.toLong).filter(_._2 * k > n).toMap
    assert(expect.nonEmpty, "fixture must make the test non-vacuous")
    val base = Sources.documents(spark, dir)
    for (docs <- Seq(base, base.repartition(1), base.repartition(7, col("lang")))) {
      val got = Sketches.heavyHitters(docs, k).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expect)
    }
  }

  test("priority sample matches a driver A-ES recount and is weight-plausible") {
    val docs = Sources.documents(spark, dir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keyed = docs.map { case (id, nc) =>
      val u = (h60(s"$id:prio1") + 1).toDouble / 1152921504606846976.0
      (id, nc, math.log(u) / nc.toDouble)
    }
    val expect = keyed.sortBy { case (id, _, key) => (-key, id) }
      .take(100).map(t => (t._1, t._2)).sortBy(_._1).toSeq
    val got = Curation.prioritySample(Sources.documents(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expect)
    // weight-proportional draw: the sampled mean length should exceed the
    // corpus mean (long docs are favored) — the reason A-ES exists
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    val sampleMean = got.map(_._2).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("kcore is the fixpoint: round 9 changes nothing, and a driver peel agrees") {
    val docs = Sources.documents(spark, dir)
    val r8 = Dedup.kcore(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r9 = Dedup.kcore(docs, rounds = 9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r8 === r9, "peel must have converged within the fixed 8 rounds")
    assert(r8.forall(_._2 >= 2), "every core member keeps degree >= k")
    // driver peel over the same simhash edge list
    var edges = Dedup.simhashPairs(docs).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    var stable = false
    while (!stable) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 2).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      stable = next == edges
      edges = next
    }
    val expect = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(r8 === expect.toSet.map((kv: (Long, Long)) => kv))
    assert(r8.nonEmpty, "fixture must have a non-empty 2-core")
  }

  test("pr curve matches a driver recount and is shape-sane") {
    val per = docTokens().map { case (id, lang, toks) =>
      val stop = toks.count(Set("the", "a", "of", "and"))
      val bin = (stop.toLong * 1000000L / toks.length) / 50000L
      (bin, if (lang == "en") 1L else 0L)
    }
    val allPos = per.map(_._2).sum
    val bins = per.groupBy(_._1).view.mapValues { g =>
      (g.size.toLong, g.map(_._2).sum)
    }.toSeq.sortBy(-_._1)
    var (tp, fp) = (0L, 0L)
    val expect = bins.map { case (bin, (n, nPos)) =>
      tp += nPos; fp += n - nPos
      (bin, n, tp, fp, tp.toDouble / (tp + fp), tp.toDouble / allPos)
    }
    val got = DataQuality.prCurve(Sources.documents(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === expect)
    // sweep semantics: recall is non-decreasing as the threshold loosens,
    // and the last row covers everything (recall 1.0)
    assert(got.map(_._6) === got.map(_._6).sorted)
    assert(got.last._6 === 1.0)
    assert(got.size >= 3, "curve must have enough operating points to matter")
  }
}
