package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Round-2 widening operators: as-of join vs a brute-force oracle, plus
  * shape/invariant checks for rollup, pivot, set-ops and tf-idf. The value
  * gate is the driver's DuckDB hash compare; these specs guard semantics on
  * adversarial local fixtures (ties, empty matches, duplicates). */
class RelationalWideningSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("asOf picks the latest right row at-or-before each left row, inclusive, max-id on ties") {
    val left = Seq( // (key, t, leftId)
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L),
      (2L, 10L, 200L), // key with right rows only later -> dropped
      (3L, 10L, 300L)  // key with no right rows -> dropped
    ).toDF("key", "t", "leftId")
    val right = Seq( // (key, t, rightId) — includes an exact tie at t=10
      (1L, 10L, 11L), (1L, 10L, 12L), (1L, 7L, 13L), (1L, 15L, 14L),
      (2L, 50L, 21L)
    ).toDF("key", "t", "rightId")
    val got = AsOfJoin.asOf(left, right)
      .select("leftId", "rightId")
      .as[(Long, Long)].collect().toMap
    // leftId 100 (t=10): right rows at t<=10 are {11,12,13}; latest t=10, max id 12
    assert(got(100L) == 12L)
    // leftId 101 (t=20): latest right is t=15 id 14
    assert(got(101L) == 14L)
    // leftId 102 (t=5): only t<=5 rows: none -> dropped
    assert(!got.contains(102L))
    assert(!got.contains(200L) && !got.contains(300L))
  }

  test("asOf matches a brute-force theta-join argmax on random data") {
    val rng = new scala.util.Random(7)
    val left = (1L to 200L).map(i => (rng.nextInt(5).toLong, rng.nextInt(100).toLong, i))
      .toDF("key", "t", "leftId")
    val right = (1L to 80L).map(i => (rng.nextInt(5).toLong, rng.nextInt(100).toLong, i))
      .toDF("key", "t", "rightId")
    val got = AsOfJoin.asOf(left, right)
      .select("leftId", "rightId").as[(Long, Long)].collect().toMap
    val l = left.as[(Long, Long, Long)].collect()
    val r = right.as[(Long, Long, Long)].collect()
    val want = l.flatMap { case (k, t, lid) =>
      val cands = r.filter(x => x._1 == k && x._2 <= t)
      if (cands.isEmpty) None
      else Some(lid -> cands.maxBy(x => (x._2, x._3))._3)
    }.toMap
    assert(got == want)
  }

  test("rollup emits detail, per-flag subtotal and grand-total layers that sum consistently") {
    val df = Relational_rollupFixture()
    val rows = df.collect()
    val grand = rows.filter(r => r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(grand.length == 1)
    val detail = rows.filter(r => r.getLong(2) == 0 && r.getLong(3) == 0)
    assert(detail.map(_.getLong(4)).sum == grand.head.getLong(4))
  }

  private def Relational_rollupFixture() =
    graft.operators.Relational.pricingRollup(spark, "/root/testdata/sf0.001")

  test("tfidf ranks at most k terms per doc, descending weight, tok tie-break") {
    val docs = Seq(
      (1L, "a a a b c", "en", "src0", 9L),
      (2L, "b b c c d", "en", "src0", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.operators.TextAnalysis.tfidfTopTerms(docs, k = 2)
      .select("doc_id", "tok", "rank").as[(Long, String, Long)].collect()
    assert(out.count(_._1 == 1L) == 2)
    // doc 1: tf(a)=3 df(a)=1 w=3; tf(b)=1 df(b)=2 w=0.5; tf(c)=1 df(c)=2 w=0.5 -> b beats c on tok
    assert(out.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq == Seq("a", "b"))
  }

  test("interval join matches a brute-force band theta-join, each pair once") {
    val rng = new scala.util.Random(11)
    val rows = (1L to 300L).map(i => (rng.nextInt(4).toLong, rng.nextInt(1000).toLong, i))
      .toDF("key", "t", "rowId")
    val got = graft.operators.IntervalJoin.within(rows, delta = 37L)
      .select("a", "b").as[(Long, Long)].collect().sorted.toSeq
    val data = (rows.as[(Long, Long, Long)].collect()): Array[(Long, Long, Long)]
    val want = (for {
      (ka, ta, ia) <- data; (kb, tb, ib) <- data
      if ka == kb && ia < ib && math.abs(tb - ta) <= 37L
    } yield (ia, ib)).sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("connectedComponents matches union-find on random pair graphs") {
    val rng = new scala.util.Random(13)
    // a chain + random edges: exercises multi-hop label propagation
    val pairs = ((1L to 8L).map(i => (i, i + 1)) ++
      (1 to 20).map(_ => (rng.nextInt(100).toLong + 100L, rng.nextInt(100).toLong + 100L)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val got = graft.operators.Dedup.connectedComponents(pairs.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    // distributed min-label propagation must reach the same fixpoint as the
    // driver-side union-find the size gate normally picks here
    val gotDistributed = graft.operators.Dedup
      .connectedComponents(pairs.toDF("a", "b"), driverThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(gotDistributed == got)
    // brute-force union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(v => v -> find(v)).toMap
    assert(got == want)
    assert(got.values.toSet.size > 1, "fixture should have several components")
  }

  test("set-ops query equals the set-algebra on collected sets") {
    val dir = "/root/testdata/sf0.001"
    val d = graft.sources.Sources.documents(spark, dir)
    def ids(c: org.apache.spark.sql.Column) =
      d.filter(c).select("doc_id").as[Long].collect().toSet
    val want = ((ids($"lang" === "en") ++ ids($"source" === "src1"))
      .intersect(ids($"n_chars" > 100))) -- ids($"source" === "src0")
    val got = graft.operators.Relational.docsSetOps(spark, dir)
      .as[Long].collect().toSet
    assert(got == want)
  }
}
