package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, DataQuality, Dedup, Similarity,
  TextAnalysis}
import graft.sources.Sources

/** Null/degenerate-input robustness sweep — at 100 TB, null text, empty
  * text, and single-char rows are a certainty, and an operator that
  * throws at ROW level takes the whole stage with it. Every DataFrame-
  * parameterized document operator must either process or cleanly drop a
  * poisoned row, never crash. (The contract queries read parquet via
  * sfDir, so this sweep drives the operator layer directly — the layer a
  * library user actually calls with their own, dirtier, tables.)
  */
class NullRobustnessSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  /** Base docs plus: a null-text row, an empty-text row, a one-char row,
    * and a whitespace-only row — each with fresh ids in every lang/source
    * position that exercises the group-by paths. */
  private lazy val poisoned: DataFrame = {
    val docs = Sources.documents(spark, dir)
    val spk = spark
    import spk.implicits._
    val bad = Seq(
      (900001L, null.asInstanceOf[String], "xx", "srcX", 0L),
      (900002L, "", "xx", "srcX", 0L),
      (900003L, "a", "en", "src0", 1L),
      (900004L, "   ", "en", "src0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.unionByName(bad)
  }

  private def runs(name: String)(body: => DataFrame): Unit = {
    val n = body.count()
    assert(n >= 0L, s"$name returned a negative count")
  }

  test("text-analysis operators survive null/empty/whitespace text") {
    runs("tokenCounts")(TextAnalysis.tokenCounts(poisoned))
    runs("qualityScore")(TextAnalysis.qualityScore(poisoned))
    runs("langId")(TextAnalysis.langId(poisoned))
    runs("fingerprint")(TextAnalysis.fingerprint(poisoned))
    runs("charEntropy")(TextAnalysis.charEntropy(poisoned))
    runs("lmScore")(TextAnalysis.lmScore(poisoned))
    runs("piiScan")(TextAnalysis.piiScan(poisoned))
    runs("cleanCorpus")(TextAnalysis.cleanCorpus(poisoned))
    runs("burstiness")(TextAnalysis.burstiness(poisoned))
    runs("tokenLengths")(TextAnalysis.tokenLengths(poisoned))
  }

  test("dedup kernels survive sub-shingle-width and null documents") {
    // shingle kernels must DROP rows shorter than k (incl. null), and the
    // signature kernel documents exactly that contract
    runs("docSignatures")(Dedup.docSignatures(poisoned, h = 4))
    runs("exactDupGroups")(Dedup.exactGroups(poisoned))
    runs("minhashLshPairs")(Dedup.minhashLshPairs(poisoned))
    runs("simhash")(Dedup.simhash(poisoned))
  }

  test("curation operators survive poisoned rows end to end") {
    runs("decontaminate")(Curation.decontaminate(poisoned))
    runs("mixtureSample")(Curation.mixtureSample(poisoned, target = 10L))
    runs("neymanAllocation")(Curation.neymanAllocation(poisoned))
    runs("ccnetBuckets")(Curation.ccnetBuckets(poisoned))
  }

  test("quality/audit operators survive poisoned rows") {
    runs("kAnonymity")(DataQuality.kAnonymity(poisoned))
    runs("diversity")(DataQuality.diversity(poisoned))
    runs("forgetAudit")(DataQuality.forgetAudit(poisoned))
    runs("robustStats")(DataQuality.robustStats(poisoned))
    runs("docMeta")(DataQuality.docMeta(poisoned))
  }

  test("poisoned rows are handled, not silently corrupting clean rows") {
    // the operator output on the CLEAN subset is unchanged by poison rows
    // riding along — per-doc operators must not leak state across rows
    val clean = Sources.documents(spark, dir)
    val fpClean = TextAnalysis.fingerprint(clean)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fpPoisoned = TextAnalysis.fingerprint(poisoned)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fpClean.foreach { case (id, fp) =>
      assert(fpPoisoned(id) === fp, s"poison row changed doc $id's fingerprint")
    }
  }
}
