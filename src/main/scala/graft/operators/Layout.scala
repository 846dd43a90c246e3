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
}
