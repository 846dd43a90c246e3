package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout tools for multi-dimensional locality (north-star scale
  * technique): Z-order (Morton) keys interleave the bits of two quantized
  * coordinates so that sorting by the key clusters spatially-near rows into
  * the same parquet row groups — a `WHERE x BETWEEN … AND y BETWEEN …` box
  * scan then prunes most row groups on their column min/max stats alone.
  * This is the standard lakehouse layout trick (Delta/Iceberg `ZORDER BY`),
  * expressed here as a plain codegen'd column expression + `sortWithinPartitions`
  * write, because at 100 TB the difference between "scan the table" and
  * "scan the 1% of row groups whose stats overlap the box" IS the query
  * budget. LayoutSpec measures the effect: the z-sorted layout reads a
  * fraction of the bytes the id-sorted layout reads for the same box.
  */
object Layout {

  /** Morton key: interleave the low `bits` bits of i (even positions) and
    * j (odd positions) — a pure 64-bit integer expression, deterministic in
    * any engine, codegen'd end to end. Callers quantize/clamp coordinates
    * first ([[zorderPoints]]). */
  def zvalue(i: Column, j: Column, bits: Int = 16): Column =
    (0 until bits).map { b =>
      (shiftleft(shiftright(i, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(j, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_.bitwiseOR(_))

  /** SQL-string twin of [[zvalue]] for oracle authoring (`i`/`j` are SQL
    * expressions producing BIGINT). */
  def zvalueSql(i: String, j: String, bits: Int = 16): String =
    (0 until bits).map { b =>
      s"(((($i) >> $b) & 1) << ${2 * b}) | (((($j) >> $b) & 1) << ${2 * b + 1})"
    }.mkString("(", ") | (", ")")

  /** Z-order keys for the 2-d point table: coordinates are quantized to the
    * unit grid and clamped to the `bits`-bit range (floor semantics match
    * the grid operators; clamping keeps the interleave total — out-of-range
    * points share the boundary cell rather than wrapping). Output
    * (id, x, y, zval), the sort-key view a layout writer consumes. */
  def zorderPoints(points: DataFrame, bits: Int = 16): DataFrame = {
    val lim = (1L << bits) - 1
    def q(c: Column): Column =
      least(greatest(floor(c), lit(0L)), lit(lim))
    points.select(col("id"), col("x"), col("y"),
        zvalue(q(col("x")), q(col("y")), bits).as("zval"))
      .orderBy("id")
  }

  /** Write `df` as parquet physically ordered by `key` WITHIN each output
    * file (range-partitioned across files by the same key), so row-group
    * min/max stats become selective for any column correlated with the
    * key. `rowGroupBytes` is exposed for tests that need several row
    * groups out of a small fixture. */
  def writeOrdered(df: DataFrame, key: Column, path: String,
                   rowGroupBytes: Long = 128L << 20): Unit =
    df.repartitionByRange(key)
      .sortWithinPartitions(key)
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)

  /** Compaction planner — the small-files pass a lakehouse runs before a
    * partition's file count eats the driver: per lang partition, the
    * content volume (chars as the byte proxy the testdata affords) and the
    * target file count at `targetChars` per file, computed as exact
    * integer ceil division so any engine plans the identical layout. The
    * mean-fill column is the utilization number the plan is judged by
    * (one division per output row). At 100 TB this rollup is what decides
    * `repartitionByRange(n_files)` per partition BEFORE the rewrite —
    * |partitions| rows of statistics instead of a trial write. */
  def compactionPlan(docs: DataFrame, targetChars: Long = 65536L): DataFrame =
    docs.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"))
      .select(col("lang"), col("n_docs"), col("chars_sum"),
        expr(s"(chars_sum + ${targetChars - 1L}) div $targetChars")
          .as("n_files"))
      .withColumn("mean_fill",
        col("chars_sum").cast("double") /
          (col("n_files") * targetChars).cast("double"))
      .orderBy("lang")

  /** EXECUTE the compaction (r7 verdict #9 — closing the plan→write loop
    * the way q_zorder measured its pruning payoff): each document is
    * assigned to the file where its first character lands under a
    * deterministic within-lang (doc_id-ordered) running character sum —
    * file_idx = (cum − n_chars) div targetChars — and the writer
    * guarantees EXACTLY one physical parquet file per (lang, file_idx)
    * group: rows are placed with a custom exact partitioner (one group =
    * one task; hash `repartition` would collide groups into shared tasks
    * and merge their files), then written `partitionBy(lang)`.
    *
    * The returned report joins three independent sources per lang — the
    * ceil-division PLAN, the assignment's distinct file count, and the
    * FILESYSTEM's `input_file_name()` count from reading the written
    * layout back — plus the read-back doc/char totals, so the gate
    * verifies the physical writer achieved the mathematical layout and
    * lost nothing. (n_files_written ≤ n_files planned: a doc longer than
    * targetChars overfills its file rather than splitting, so consecutive
    * file indices can skip; the plan is the upper bound, the assignment
    * is the realized layout — both are pure functions the DuckDB oracle
    * replays.) At 100 TB this whole report is |langs| rows; the write is
    * one shuffle sized by the plan. Output (lang, n_docs, chars_sum,
    * n_files, n_files_assigned, n_files_written, docs_written,
    * chars_written). */
  def compactExecute(docs: DataFrame, path: String,
                     targetChars: Long = 65536L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
    val assigned = docs
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars").cast("long").as("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(w))
      .withColumn("file_idx", expr(s"(cum - n_chars) div $targetChars"))
      .drop("cum")
      .localCheckpoint() // assignment reused by the writer AND the report
    // plan-sized driver state: one dense id per (lang, file_idx) group
    val groups = assigned.select("lang", "file_idx").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.zipWithIndex.toMap
    val nGroups = math.max(1, groups.size)
    val bcGroups = spark.sparkContext.broadcast(groups)
    val placed = assigned
      .as[(Long, String, String, String, Long, Long)]
      .rdd.keyBy { case (_, _, lang, _, _, fi) => bcGroups.value((lang, fi)) }
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = nGroups
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .values
    spark.createDataset(placed)
      .toDF("doc_id", "text", "lang", "source", "n_chars", "file_idx")
      .drop("file_idx")
      .write.mode("overwrite").partitionBy("lang").parquet(path)
    // read back under the KNOWN written schema (data cols + the lang
    // partition col): inference has nothing to read on an empty corpus
    val back = spark.read
      .schema("doc_id LONG, text STRING, source STRING, n_chars LONG, lang STRING")
      .parquet(path)
      // input_file_name is non-deterministic: project it before aggregating
      .select(col("lang"), col("n_chars"), input_file_name().as("f"))
      .groupBy("lang").agg(
        count(lit(1)).as("docs_written"),
        sum(col("n_chars")).as("chars_written"),
        countDistinct(col("f")).as("n_files_written"))
    val assignedFiles = assigned.groupBy("lang")
      .agg(countDistinct(col("file_idx")).as("n_files_assigned"))
    compactionPlan(docs, targetChars).drop("mean_fill")
      .join(assignedFiles, Seq("lang"))
      .join(back, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("chars_sum"), col("n_files"),
        col("n_files_assigned"), col("n_files_written"),
        col("docs_written"), col("chars_written"))
      .orderBy("lang")
  }
}
