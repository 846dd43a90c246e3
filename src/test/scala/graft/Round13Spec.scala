package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupStream

/** Round-13 closures of the r12 verdict/ADVICE items. First family: the
  * state-audit drain cache. The r12 bench regression (q_state_audit
  * 0.17 → 3.5 s PER REP) was the derived cache key silently never
  * resolving — Spark 4 leaves `readStream.parquet(path)` as an
  * `UnresolvedDataSource` node at construction time, so the
  * `StreamingRelation` pattern match returned None and every call
  * re-drained. These specs pin the key contract OBSERVABLY (via the
  * drain counter), so a plan-shape change can never again degrade to
  * "correct but re-drains every rep" without a red test. */
class Round13Spec extends AnyFunSuite with SharedSpark {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeReplay(dir: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.map(i => (i, s"text_${i % 4}")).toDF("doc_id", "text")
      .coalesce(2).write.mode("overwrite").parquet(dir)
  }

  private def audit(dir: String): Long = {
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(dir)
    DedupStream.stateAudit(stream).count()
  }

  test("state-audit drains ONCE per replay content: second call is a cache hit") {
    val dir = tmp("graft_r13_audit")
    writeReplay(dir, 0L until 40L)
    val before = DedupStream.auditDrains.get()
    val n1 = audit(dir)
    assert(DedupStream.auditDrains.get() === before + 1,
      "first audit of a replay must drain (the key must RESOLVE — an " +
        "unresolved source path would also re-drain here, but the next " +
        "assertion distinguishes the two)")
    val n2 = audit(dir)
    assert(DedupStream.auditDrains.get() === before + 1,
      "second audit of the SAME replay content must reuse the drained " +
        "checkpoint — this is the r12 per-rep 3.5 s regression pinned")
    assert(n1 === n2)
    assert(n1 === 4, "4 distinct texts → 4 state rows")
  }

  test("a rewritten replay at the same path re-drains (content half of the key)") {
    val dir = tmp("graft_r13_audit_rw")
    writeReplay(dir, 0L until 40L)
    audit(dir): Unit
    val before = DedupStream.auditDrains.get()
    // rewrite with DIFFERENT content at the same path — same row count and
    // parquet layout shape, so only the content hash half of the
    // fingerprint is guaranteed to move if sizes/mtimes happen to collide
    import spark.implicits._
    (0L until 40L).map(i => (i, s"other_${i % 5}")).toDF("doc_id", "text")
      .coalesce(2).write.mode("overwrite").parquet(dir)
    val n = audit(dir)
    assert(DedupStream.auditDrains.get() === before + 1,
      "a rewrite at the same path must MISS the cache and re-drain — " +
        "serving the stale checkpoint would report the old corpus state")
    assert(n === 5, "rewritten corpus has 5 distinct texts")
  }
}
