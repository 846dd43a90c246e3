package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, DataQuality, Relational, Similarity,
  TextAnalysis}
import graft.sources.Sources

/** Round-7 widening (session f): snapshot diff (CDC), A/B assignment with
  * SRM check, and hashing-trick featurization — generic-operator unit
  * checks plus first-principles driver recounts on sf0.001.
  */
class Round7fSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  test("tableDiff classifies a constructed add/remove/change fixture exactly") {
    import spark.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "t")
    val neu = Seq((2L, "b"), (3L, "C!"), (4L, "d"), (9L, "z")).toDF("id", "t")
    val got = DataQuality.tableDiff(old, neu, "id",
        graft.functions.Hashes.h60(col("t"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 2L))
  }

  test("snapshot diff matches a driver rebuild of the derived v2, all classes live") {
    val docs = Sources.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val v1 = docs.toMap
    val v2 = scala.collection.mutable.Map.empty[Long, String]
    docs.foreach { case (id, t) =>
      if (h60(s"$id:v2del") % 20 != 0)
        v2(id) = if (h60(s"$id:v2chg") % 10 == 0)
          Option(t).getOrElse("") + " [rev2]" else t
    }
    docs.foreach { case (id, t) =>
      if (h60(s"$id:v2add") % 25 == 0) v2(id + 1000000000L) = t
    }
    def h(t: String): Long = if (t == null) -1L else h60(t)
    val keys = v1.keySet ++ v2.keySet
    val expect = keys.toSeq.map { k =>
      (v1.get(k), v2.get(k)) match {
        case (None, _) => "added"
        case (_, None) => "removed"
        case (Some(a), Some(b)) if h(a) == h(b) => "unchanged"
        case _ => "changed"
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = DataQuality.snapshotDiff(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)
    assert(Seq("added", "removed", "changed", "unchanged")
      .forall(c => got.getOrElse(c, 0L) > 0L), s"all classes live: $got")
  }

  test("ab srm matches a driver recount and assignment is stable") {
    val users = Sources.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byArm = users.groupBy { case (u, _) => h60(s"$u:exp1") % 2 }
    val (ua, ub) = (byArm.getOrElse(0L, Array.empty).length.toLong,
      byArm.getOrElse(1L, Array.empty).length.toLong)
    val (ea, eb) = (byArm.getOrElse(0L, Array.empty).map(_._2).sum,
      byArm.getOrElse(1L, Array.empty).map(_._2).sum)
    val expected = (ua + ub).toDouble / 2.0
    val chi2 = ((ua.toDouble - expected) * (ua.toDouble - expected) +
      (ub.toDouble - expected) * (ub.toDouble - expected)) / expected
    val r = Relational.abSrm(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((ua, ub, ea, eb)))
    assert(r.getDouble(4) === chi2)
    assert(r.getBoolean(5) === (chi2 > 3.841))
    // both arms populated: the salted hash really splits the population
    assert(ua > 0 && ub > 0)
  }

  test("split leakage keeps exactly the boundary-crossing LSH pairs, oriented") {
    val pairs = Similarity.embLshPairs(Sources.embeddings(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def split(id: Long): String =
      if (h60(s"$id:split1") % 10 < 8) "train" else "eval"
    val expect = pairs.filter { case (a, b, _) => split(a) != split(b) }
      .map { case (a, b, c) =>
        if (split(a) == "eval") (a, b, c) else (b, a, c)
      }.sortBy(t => (t._1, t._2)).toSeq
    val got = Similarity.splitLeakage(Sources.embeddings(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expect)
    got.foreach { case (e, t, _) =>
      assert(split(e) === "eval" && split(t) === "train")
    }
    assert(pairs.nonEmpty, "LSH chain must produce pairs at this scale")
  }

  test("emb clip thresholds are exact discrete percentiles with correct outlier mass") {
    val vecs = Sources.embeddings(spark, dir)
      .select("emb").collect().map(_.getSeq[Double](0))
    val dims = vecs.head.length
    val rows = Similarity.embClip(Sources.embeddings(spark, dir)).collect()
    assert(rows.length === dims)
    rows.foreach { r =>
      val d = r.getLong(0).toInt
      val vs = vecs.map(_(d)).sorted
      def disc(p: Double): Double = vs(math.ceil(p * vs.length).toInt - 1)
      assert(r.getDouble(1) === disc(0.01), s"lo dim $d")
      assert(r.getDouble(2) === disc(0.99), s"hi dim $d")
      assert(r.getLong(3) === vs.count(_ < disc(0.01)).toLong)
      assert(r.getLong(4) === vs.count(_ > disc(0.99)).toLong)
    }
    // non-vacuous: clipping would touch something, but never everything
    assert(rows.exists(r => r.getLong(3) + r.getLong(4) > 0))
    assert(rows.forall(r => r.getLong(3) + r.getLong(4) < vecs.length))
  }

  test("table stats match driver recounts for every profiled column") {
    val rows = Sources.documents(spark, dir)
      .select("doc_id", "lang", "source", "n_chars").collect()
    val got = DataQuality.docStats(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(got.keySet === Set("doc_id", "lang", "source", "n_chars"))
    def check[T](cn: String, vs: Seq[T], minS: String, maxS: String)
                (implicit ord: Ordering[T]): Unit = {
      val (n, nn, ndv) = (rows.length.toLong,
        vs.count(_ == null).toLong, vs.filter(_ != null).distinct.size.toLong)
      assert(got(cn) === ((n, nn, ndv, minS, maxS)), s"column $cn")
    }
    val ids = rows.map(_.getLong(0)).toSeq
    check("doc_id", ids, ids.min.toString, ids.max.toString)
    val langs = rows.map(_.getString(1)).toSeq
    check("lang", langs, langs.min, langs.max)
    val srcs = rows.map(_.getString(2)).toSeq
    check("source", srcs, srcs.min, srcs.max)
    val ncs = rows.map(_.getLong(3)).toSeq
    check("n_chars", ncs, ncs.min.toString, ncs.max.toString)
  }

  test("corpus build funnel is monotone, stage-consistent, and nowhere vacuous") {
    // sf0.01: the mixture stage needs more survivors than its target to be
    // non-vacuous (sf0.001 has too few decontamination survivors)
    val d01 = "/root/testdata/sf0.01"
    val stages = Curation.corpusBuild(spark, d01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stages.map(_._1).toSeq ===
      Seq("1_raw", "2_cleaned", "3_decontaminated", "4_mixed"))
    // funnel: every stage strictly drops something (non-vacuous) and
    // masses stay positive
    stages.sliding(2).foreach { case Array((sa, na, ca), (sb, nb, cb)) =>
      assert(nb < na, s"$sb must drop documents vs $sa")
      assert(cb < ca, s"$sb must drop char mass vs $sa")
    }
    assert(stages.last._2 > 0)
    // stage 2 equals the public cleanCorpus operator's survivor count —
    // the composition reuses the gated operators, not a reimplementation
    val docs = Sources.documents(spark, d01)
    assert(stages(1)._2 === TextAnalysis.cleanCorpus(docs).count())
    // stage 3 equals cleaned minus (bench docs + contaminated)
    val cleaned = docs.join(
      TextAnalysis.cleanCorpus(docs).select("doc_id"), "doc_id")
    assert(stages(2)._2 ===
      Curation.decontaminate(cleaned).filter(!col("contaminated")).count())
  }

  test("feature hash matches a driver fold and rows sum to token counts") {
    val docs = Sources.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.map { case (id, t) =>
      val v = new Array[Long](8)
      t.split(" ", -1).foreach(tok => v((h60(tok) % 8).toInt) += 1)
      id -> v.toSeq
    }.toMap
    val rows = TextAnalysis.featureHash(Sources.documents(spark, dir)).collect()
    assert(rows.length === expect.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      val v = (1 to 8).map(r.getLong(_))
      assert(v === expect(id), s"doc $id")
      assert(v.sum === docs.find(_._1 == id).get._2.split(" ", -1).length.toLong)
    }
    // collisions exist (8 buckets over a real vocab) — the trick's trade
    assert(expect.values.exists(_.max > 1))
  }
}
