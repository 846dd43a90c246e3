package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DataQuality, TextAnalysis}
import graft.sources.Sources

/** Round-7 widening: PII scan/scrub, char-entropy quality signal, and the
  * documents/embeddings schema-drift canaries. */
class QualitySignalsSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  test("pii scan counts poisoned docs and the scrub changes only them") {
    import spark.implicits._
    val poisoned = Seq(
      (1L, "contact me at alice@example.com or bob.smith@corp.co.uk thanks"),
      (2L, "server 10.0.0.1 and 192.168.254.254 responded"),
      (3L, "card 1234567890123456 and id 999999 overlap run 123456"),
      (4L, "clean text with no pii at all"),
      (5L, "mixed: eve@x.io from 8.8.8.8 ordered 1000000 units"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiScan(poisoned).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === ((2L, 0L, 0L)))
    assert(got(2L) === ((0L, 2L, 0L)))
    assert(got(3L) === ((0L, 0L, 3L)))
    assert(got(4L) === ((0L, 0L, 0L)))
    assert(got(5L) === ((1L, 1L, 1L)))
    // scrub fingerprint: clean doc keeps the identity fingerprint,
    // poisoned docs do not
    val fps = TextAnalysis.piiScan(poisoned).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val idFps = poisoned
      .select(col("doc_id"), graft.functions.Hashes.h60(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(4L) === idFps(4L))
    Seq(1L, 2L, 3L, 5L).foreach(id => assert(fps(id) !== idFps(id), s"doc $id"))
    // the real corpus is clean: all counts zero, all fingerprints identity
    val corpus = TextAnalysis.piiScan(Sources.documents(spark, dir))
    assert(corpus.filter(col("n_emails") + col("n_ips") + col("n_digit_runs") > 0)
      .count() === 0)
  }

  test("char entropy: constant text scores 0 bits, distinct-char text scores max") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaaaaaaa"),          // 1 symbol: 0 bits each
      (2L, "abcdefgh"),          // 8 distinct: flog2(8)-flog2(1)=3 bits each
      (3L, "aabb"))              // flog2(4)-flog2(2)=1 bit each
      .toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((8L, 0L)))
    assert(got(2L) === ((8L, 24L)))
    assert(got(3L) === ((4L, 4L)))
    // corpus-level sanity: every doc scores within [0, n·flog2(n)]
    val bad = TextAnalysis.charEntropy(Sources.documents(spark, dir))
      .filter(col("entropy_bits") < 0 ||
        col("entropy_bits") > col("n_chars") * 63L)
    assert(bad.count() === 0)
  }

  test("doc-meta canary recounts and flags an injected n_chars drift") {
    val clean = DataQuality.docMeta(Sources.documents(spark, dir)).collect()(0)
    val nDocs = Sources.documents(spark, dir).count()
    assert(clean.getAs[Long]("n_docs") === nDocs)
    assert(clean.getAs[Long]("n_ids") === nDocs)
    assert(clean.getAs[Long]("n_bad_nchars") === 0L)
    // drift the metadata out of sync with the text: the canary must trip
    val drifted = Sources.documents(spark, dir)
      .withColumn("n_chars",
        when(col("doc_id") % 7 === 0, col("n_chars") + 1)
          .otherwise(col("n_chars")))
    val bad = DataQuality.docMeta(drifted).collect()(0)
    assert(bad.getAs[Long]("n_bad_nchars") > 0L)
  }

  test("embeddings canary pins count, dimension envelope and value probe") {
    val r = DataQuality.embDims(Sources.embeddings(spark, dir)).collect()(0)
    val n = Sources.embeddings(spark, dir).count()
    assert(r.getAs[Long]("n_vecs") === n)
    assert(r.getAs[Long]("n_ids") === n)
    assert(r.getAs[Long]("min_dim") === r.getAs[Long]("max_dim"),
      "fixture embeddings are fixed-dimension")
    assert(r.getAs[Long]("min_dim") > 0L)
    // probe is scale-sensitive: scaling every vector changes the sum
    val scaled = Sources.embeddings(spark, dir)
      .withColumn("emb", transform(col("emb"), x => x * 2.0))
    val r2 = DataQuality.embDims(scaled).collect()(0)
    assert(r.getAs[Long]("probe_sum") !== r2.getAs[Long]("probe_sum"))
  }
}
