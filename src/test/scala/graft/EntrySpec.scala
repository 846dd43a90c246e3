package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the driver's smoke check: the flagship entry query must return
  * rows on sf0.001, and every declared query must have matching oracle
  * wiring (column-name parity is enforced by Verify + the DuckDB compare;
  * here we check the static contract shape). */
class EntrySpec extends AnyFunSuite with SharedSpark {

  test("entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() >= 1)
  }

  test("every oracle key has a query; rows-only queries are the known set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without queries: ${o.diff(q)}")
    val rowsOnly = q.diff(o)
    // seeded-randomized (reservoir — golden-trace-pinned in Round8Spec) and
    // approximate-by-design (sketches) — everything else, including the
    // deterministic MRFFT radii, the full hw2 pipeline (pinned-center
    // oracles) and the merged bottom-m reservoir (byteswap64 replayed in
    // SQL, r8), must hash-match
    assert(rowsOnly == Set("q_reservoir", "q_sketch_stats"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("oracle SQL references only driver-provided tables via <sfDir>") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.contains("<sfDir>"), s"$name must read the testdata parquet")
    }
  }
}
