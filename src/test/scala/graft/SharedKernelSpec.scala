package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.Sources

/** Verify-side kernel sharing (`graft.sharedKernels`): the dedup query
  * family reuses ONE checkpointed docSignatures pass per document table.
  * Guards both directions — the memo must actually dedupe (reference
  * identity across semantically-equal doc plans and across h variants),
  * and sharing must not change any result (the memoized checkpoint is the
  * same table lshPairs builds itself when the flag is off). */
class SharedKernelSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  test("sharedSignatures is off by default and memoizes one checkpoint when on") {
    val docs = Sources.documents(spark, dir)
    assert(Dedup.sharedSignatures(docs, 16).isEmpty)
    val plain = Dedup.minhashLshPairs(docs).collect().toSet
    sys.props("graft.sharedKernels") = "true"
    try {
      val a = Dedup.sharedSignatures(docs, 16).get
      // a semantically-equal but separately-constructed plan hits the memo
      val b = Dedup.sharedSignatures(Sources.documents(spark, dir), 16).get
      assert(a eq b, "memo missed a semantically-equal doc plan")
      // hs is h-independent, so h=0 (the n-gram path) reuses the 16-superset
      val c = Dedup.sharedSignatures(docs, 0).get
      assert(c eq a, "h<=16 request did not reuse the h=16 superset")
      val shared = Dedup.minhashLshPairs(docs).collect().toSet
      assert(shared == plain, "sharing changed the LSH pair results")
    } finally { sys.props.remove("graft.sharedKernels"): Unit }
  }
}
