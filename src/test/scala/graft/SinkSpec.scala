package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sink surface: partitioned columnar writes and partition-pruned reads —
  * the layout decisions that matter at 100 TB (a scan that reads every
  * partition for a single-lang query is wrong regardless of operator
  * quality). The reference writes only to stdout (SURVEY.md §2.1 S5); this
  * is the beyond-ref storage surface. */
class SinkSpec extends AnyFunSuite with SharedSpark {

  test("partitionBy write + partition-pruned read (PartitionFilters in the scan)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)

    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())

    val en = back.filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter must prune partitions, not scan+filter:\n$plan")
    assert(en.count() == docs.filter(col("lang") === "en").count())
  }

  test("orc round-trip preserves rows and pushes filters to the scan") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    src.write.mode("overwrite").orc(dir)

    val back = spark.read.orc(dir)
    assert(back.count() == src.count())
    assert(back.agg(sum("n_chars")).head().getLong(0) ==
      src.agg(sum("n_chars")).head().getLong(0))
    val filtered = back.filter(col("doc_id") > 100L)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id"),
      s"doc_id predicate must reach the ORC scan:\n$plan")
    assert(filtered.count() == src.filter(col("doc_id") > 100L).count())
  }

  test("permissive json ingest quarantines corrupt rows instead of failing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badjson").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.json"),
      Seq("""{"doc_id": 1, "lang": "en"}""",
          """{"doc_id": 2, "lang": "fr"}""",
          """{"doc_id": "NOT_A_NUMBER", "lang": "de"}""",
          """{broken json""").map(_ + "\n").mkString.getBytes("UTF-8"))

    val read = spark.read
      .schema("doc_id BIGINT, lang STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    try {
      assert(read.count() == 4, "permissive mode must keep every input line")
      assert(read.filter(col("_corrupt_record").isNotNull).count() == 2,
        "both malformed lines must be quarantined, not dropped")
      assert(read.filter(col("_corrupt_record").isNull).agg(sum("doc_id"))
        .head().getLong(0) == 3L)
    } finally { read.unpersist(): Unit }
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dynpart")
      .resolve("t").toString
    import spark.implicits._
    val day1 = Seq((1L, "2024-01-01"), (2L, "2024-01-01"),
                   (3L, "2024-01-02")).toDF("id", "day")
    day1.write.partitionBy("day").parquet(dir)
    // rewrite ONLY day 2 with corrected rows; day 1 must survive untouched
    val fix = Seq((30L, "2024-01-02"), (31L, "2024-01-02")).toDF("id", "day")
    fix.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(dir)
    val got = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "2024-01-01"), (2L, "2024-01-01"),
      (30L, "2024-01-02"), (31L, "2024-01-02")),
      s"dynamic overwrite must keep day-1 rows and replace day-2: $got")
  }

  test("permissive csv ingest quarantines malformed rows instead of failing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.csv"),
      Seq("1,en", "2,fr", "NOT_A_NUMBER,de").map(_ + "\n").mkString.getBytes("UTF-8"))
    val read = spark.read
      .schema("doc_id BIGINT, lang STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    try {
      assert(read.count() == 3, "permissive mode must keep every input line")
      assert(read.filter(col("_corrupt_record").isNotNull).count() == 1,
        "the unparseable line must be quarantined, not dropped")
      assert(read.filter(col("_corrupt_record").isNull).agg(sum("doc_id"))
        .head().getLong(0) == 3L)
    } finally { read.unpersist(): Unit }
  }

  test("csv and json round-trips preserve rows and schema-on-read works") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_sink2").toString
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    src.write.mode("overwrite").json(s"$dir/json")

    val csv = spark.read.option("header", "true")
      .schema("doc_id BIGINT, lang STRING, n_chars BIGINT").csv(s"$dir/csv")
    val json = spark.read.schema("doc_id BIGINT, lang STRING, n_chars BIGINT")
      .json(s"$dir/json")
    assert(csv.count() == src.count() && json.count() == src.count())
    assert(csv.agg(sum("n_chars")).head().getLong(0) ==
      src.agg(sum("n_chars")).head().getLong(0))
    assert(json.agg(sum("n_chars")).head().getLong(0) ==
      src.agg(sum("n_chars")).head().getLong(0))
  }
}
