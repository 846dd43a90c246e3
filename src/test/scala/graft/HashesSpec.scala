package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashes
import graft.operators.Dedup

/** Bit-equality of the JVM kernel hashes with their Column twins — the
  * invariant that lets the per-document kernels ([[Dedup.docSignatures]],
  * [[Dedup.simhash]]) keep the unchanged DuckDB oracles. */
class HashesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val samples = Seq(
    "", "a", "spark 4.1", "the quick", "ü-umlauts", "9charlong",
    "exactly fifteen hex digits ought to round-trip", "éèê",
    "0", "-1", "42") ++ (0 until 64).map(i => s"shingle-$i")

  test("h60Jvm / h32Jvm match the h60 / h32 Columns on ASCII and non-ASCII") {
    val df = samples.toDF("s")
      .select(col("s"), Hashes.h60(col("s")).as("h60"), Hashes.h32(col("s")).as("h32"))
      .collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    df.foreach { r =>
      val s = r.getString(0)
      assert(Hashes.h60Jvm(md, s) == r.getLong(1), s"h60 mismatch for '$s'")
      assert(Hashes.h32Jvm(md, s) == r.getLong(2), s"h32 mismatch for '$s'")
    }
  }

  test("mix60Jvm matches the mix60 Column for every variant k") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bases = samples.map(Hashes.h60Jvm(md, _))
    val df = bases.toDF("b")
      .select(col("b") +: (0 until 16).map(k => Hashes.mix60(col("b"), k).as(s"m$k")): _*)
      .collect()
    df.foreach { r =>
      val b = r.getLong(0)
      (0 until 16).foreach { k =>
        val expect = Hashes.mix60Jvm(b, (k * 7 + 3) % 60, Hashes.mixConst60(k))
        assert(expect == r.getLong(k + 1), s"mix60 mismatch base=$b k=$k")
      }
    }
  }

  test("docSignatures kernel equals the declarative explode+aggregate form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val kernel = Dedup.minhashSignatures(docs)
      .as[(Long, Int, Long)].collect().toSet
    // the pre-kernel formulation: explode shingles, h60 each, 16 parallel mins
    val sh = graft.operators.TextAnalysis.charShingles(docs)
      .select(col("doc_id"), Hashes.h60(col("s")).as("b"))
    val declarative = sh.groupBy("doc_id")
      .agg(array((0 until 16).map(k => min(Hashes.mix60(col("b"), k))): _*).as("sig"))
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("k", "mh")))
      .as[(Long, Int, Long)].collect().toSet
    assert(kernel == declarative)
  }

  test("docSignatures hs column matches distinct shingle hash sets and c") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val kernel = Dedup.docSignatures(docs)
      .select(col("doc_id"), col("hs"), col("c")).collect()
      .map(r => (r.getLong(0), (r.getSeq[Long](1).toSet, r.getLong(2)))).toMap
    val expect = graft.operators.TextAnalysis.charShingles(docs)
      .select(col("doc_id"), Hashes.h60(col("s")).as("b"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (id, rows) => (id, (rows.map(_._2).toSet, rows.length.toLong)) }
    assert(kernel == expect)
  }
}
