package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, DataQuality, Dedup, Similarity,
  TextAnalysis}
import graft.sources.Sources

/** Zero-row robustness sweep — the other degenerate input a 100 TB
  * pipeline hits routinely (an empty partition filter, a source that
  * landed nothing today): every DataFrame-parameterized operator must
  * return an EMPTY (or summary-shaped) result on an empty input of the
  * correct schema, never throw on reduce-of-nothing or min-of-empty.
  */
class EmptyInputSpec extends AnyFunSuite with SharedSpark {

  private lazy val emptyDocs: DataFrame =
    Sources.documents(spark, "/root/testdata/sf0.001").filter(lit(false))
  private lazy val emptyEmb: DataFrame =
    Sources.embeddings(spark, "/root/testdata/sf0.001").filter(lit(false))

  private def runs(name: String)(body: => DataFrame): Unit =
    assert(body.count() >= 0L, s"$name threw or miscounted on empty input")

  test("text-analysis operators accept a zero-row corpus") {
    runs("tokenCounts")(TextAnalysis.tokenCounts(emptyDocs))
    runs("qualityScore")(TextAnalysis.qualityScore(emptyDocs))
    runs("langId")(TextAnalysis.langId(emptyDocs))
    runs("fingerprint")(TextAnalysis.fingerprint(emptyDocs))
    runs("lmScore")(TextAnalysis.lmScore(emptyDocs))
    runs("holdoutLmScore")(TextAnalysis.holdoutLmScore(emptyDocs))
    runs("burstiness")(TextAnalysis.burstiness(emptyDocs))
    runs("signalCorrelation")(TextAnalysis.signalCorrelation(emptyDocs))
    runs("cleanCorpus")(TextAnalysis.cleanCorpus(emptyDocs))
  }

  test("dedup and curation operators accept a zero-row corpus") {
    runs("docSignatures")(Dedup.docSignatures(emptyDocs, h = 4))
    runs("exactGroups")(Dedup.exactGroups(emptyDocs))
    runs("minhashLshPairs")(Dedup.minhashLshPairs(emptyDocs))
    runs("simhash")(Dedup.simhash(emptyDocs))
    runs("decontaminate")(Curation.decontaminate(emptyDocs))
    runs("neymanAllocation")(Curation.neymanAllocation(emptyDocs))
    runs("ccnetBuckets")(Curation.ccnetBuckets(emptyDocs))
    runs("contamAttribution")(Curation.contamAttribution(emptyDocs))
  }

  test("audit and similarity operators accept zero-row inputs") {
    runs("kAnonymity")(DataQuality.kAnonymity(emptyDocs))
    runs("diversity")(DataQuality.diversity(emptyDocs))
    runs("forgetAudit")(DataQuality.forgetAudit(emptyDocs))
    runs("robustStats")(DataQuality.robustStats(emptyDocs))
    runs("mrr")(Similarity.mrr(emptyEmb))
    runs("matryoshkaRecall")(Similarity.matryoshkaRecall(emptyEmb))
    runs("annBruteForce")(Similarity.annBruteForce(emptyEmb))
    runs("annImi")(graft.operators.Imi.annImi(emptyEmb))
    runs("imiRecall")(graft.operators.Imi.imiRecall(emptyEmb))
    runs("annImiPq")(graft.operators.Imi.annImiPq(emptyEmb))
    runs("substringDedup")(TextAnalysis.substringDedup(emptyDocs))
    runs("annImiServed") {
      val idx = java.nio.file.Files
        .createTempDirectory("graft_empty_imi_idx").toString
      graft.operators.Imi.persistIndex(emptyEmb, idx)
      graft.operators.Imi.annImiServed(emptyEmb, idx)
    }
    runs("compactExecute") {
      val out = java.nio.file.Files
        .createTempDirectory("graft_empty_compact").toString
      graft.operators.Layout.compactExecute(emptyDocs, out)
    }
  }

  test("round-11 index lifecycle operators accept zero-row inputs") {
    runs("indexDrift")(graft.operators.Imi.indexDrift(emptyEmb))
    runs("embStreamRecall")(Similarity.embStreamRecall(emptyEmb))
    val idx = java.nio.file.Files
      .createTempDirectory("graft_empty_imi_life").toString
    graft.operators.Imi.persistIndex(emptyEmb, idx)
    runs("indexDriftServed")(
      graft.operators.Imi.indexDriftServed(emptyEmb, idx))
    runs("annImiServed after deleteFromIndex") {
      graft.operators.Imi.deleteFromIndex(emptyEmb, idx)
      graft.operators.Imi.annImiServed(emptyEmb, idx)
    }
    runs("annImiServed after compactIndex") {
      graft.operators.Imi.compactIndex(spark, idx)
      graft.operators.Imi.annImiServed(emptyEmb, idx)
    }
    // upsert into an EMPTY bootstrap must fail LOUDLY, not silently
    // assign against zero-center books (covered semantically in
    // Round11Spec; asserted here as part of the empty-input sweep)
    intercept[IllegalArgumentException] {
      graft.operators.Imi.upsertIndex(emptyEmb, idx)
    }
  }

  test("round-12 lifecycle composition and manifest accept zero-row inputs") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft_empty_imi_r12").toString
    runs("indexLifecycle") {
      graft.operators.IndexLifecycle.run(emptyEmb, idx)
    }
    runs("indexManifest") {
      graft.operators.Imi.persistIndex(emptyEmb, idx)
      graft.operators.Imi.indexManifest(spark, idx)
    }
  }
}
