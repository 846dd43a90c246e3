package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DataQuality, Layout, Sketches, TextAnalysis}
import graft.sources.Sources

/** Round-7 widening (session e): inverted-index posting fingerprints,
  * grouped top-k per source, and order-free source checksums — driver
  * recounts on sf0.001 plus the plan/partitioning properties each claims.
  */
class Round7eSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  test("inverted index matches a driver rebuild of banded sorted postings") {
    val docs = Sources.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val postings = docs
      .flatMap { case (id, t) => t.split(" ", -1).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // low minDf on the tiny fixture so the test is non-vacuous
    val expect = postings.filter { case (_, ids) =>
      ids.size >= 2 && ids.size <= 500
    }.map { case (tok, ids) =>
      tok -> ((ids.size.toLong, h60(ids.mkString(","))))
    }
    assert(expect.nonEmpty)
    val got = TextAnalysis.invertedIndex(Sources.documents(spark, dir),
        minDf = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expect)
  }

  test("top-per-source matches a driver rank and plans WindowGroupLimit") {
    val q = TextAnalysis.qualityScore(Sources.documents(spark, dir))
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bySource = Sources.documents(spark, dir)
      .select("doc_id", "source").collect()
      .map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expect = bySource.toSeq.sortBy(_._1).flatMap { case (src, ids) =>
      ids.sortBy(id => (-q(id), id)).take(3).zipWithIndex.map {
        case (id, i) => (src, id, q(id), (i + 1).toLong)
      }
    }
    val df = TextAnalysis.topPerSource(Sources.documents(spark, dir))
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(got === expect)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k must push a group-limit below the window exchange:\n$plan")
  }

  test("quantile accuracy gate: sketch error is in (0, width] for every group") {
    val rows = Sketches.quantileAccuracy(Sources.events(spark, dir)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exP50, estP50, errP50) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val (exP90, estP90, errP90) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(errP50 === estP50 - exP50)
      assert(errP90 === estP90 - exP90)
      assert(errP50 > 0.0 && errP50 <= 5.0, s"p50 bound violated: $r")
      assert(errP90 > 0.0 && errP90 <= 5.0, s"p90 bound violated: $r")
      assert(r.getBoolean(7), s"within_bound must be the theorem: $r")
    }
    // exact side really is percentile_disc: a driver order statistic agrees
    val vals = Sources.events(spark, dir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val vs = vals(r.getString(0))
      val p50 = vs(math.ceil(0.5 * vs.size).toInt - 1)
      assert(r.getDouble(1) === p50, s"exact p50 mismatch for ${r.getString(0)}")
    }
  }

  test("compaction plan matches exact ceil division and full-file utilization") {
    val rows = Layout.compactionPlan(Sources.documents(spark, dir)).collect()
    assert(rows.nonEmpty)
    val byLang = Sources.documents(spark, dir)
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    rows.foreach { r =>
      val (n, sum) = byLang(r.getString(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === sum)
      val files = (sum + 65535L) / 65536L
      assert(r.getLong(3) === files)
      assert(r.getDouble(4) === sum.toDouble / (files * 65536L).toDouble)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("source checksums match a driver xor and ignore partitioning") {
    val rows = Sources.documents(spark, dir)
      .select("source", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).view.mapValues { g =>
      (g.size.toLong, g.map(d => h60(d._2)).reduce(_ ^ _),
        g.map(_._3).sum)
    }.toMap
    val base = Sources.documents(spark, dir)
    for (docs <- Seq(base, base.repartition(1), base.repartition(5, col("lang")))) {
      val got = DataQuality.sourceChecksums(docs).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got === expect)
    }
  }
}
