package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Clustering, Dedup, Similarity}
import graft.sources.Sources

/** Library-usage cache hygiene: an operator call must not leave entries in
  * the session's CacheManager after its result is consumed. Bench/Verify
  * clear caches globally between queries, so a leak there is invisible — but
  * a library caller composing these operators would accumulate stale cached
  * plans (and executor memory) with no way to know. Operators that need
  * multi-scan materialization inside a *returned lazy plan* use eager
  * localCheckpoint instead of cache(): no CacheManager entry, lineage
  * truncated, blocks freed by the ContextCleaner when the plan is GC'd. */
class CacheHygieneSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def leavesNoCache(name: String)(df: => DataFrame): Unit =
    test(s"$name leaves the CacheManager empty after consumption") {
      spark.catalog.clearCache() // isolate from sibling suites
      df.count()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left cached plans behind")
    }

  private def docs = Sources.documents(spark, dir)

  leavesNoCache("hw2Pipeline") {
    Clustering.hw2Pipeline(Sources.points2d(spark, dir), k = 3, l = 4, m = 10)
  }
  leavesNoCache("minhashLshPairs") { Dedup.minhashLshPairs(docs) }
  leavesNoCache("nearDupClusters") { Dedup.nearDupClusters(docs) }
  leavesNoCache("nearDupSurvivors") { Dedup.nearDupSurvivors(docs) }
  leavesNoCache("ngramJaccardPairs") { Dedup.ngramJaccardPairs(docs) }
  leavesNoCache("simhashPairs") { Dedup.simhashPairs(docs) }
  leavesNoCache("neardupCosine") {
    Similarity.neardupCosine(Sources.embeddings(spark, dir))
  }
}
