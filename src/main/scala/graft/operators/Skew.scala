package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §M6 / the 100 TB posture).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; explicit
  * salting is still the tool of choice when a SHUFFLED HASH join or an
  * aggregation keys on a power-law column (hot shingles, hot users): the hot
  * key's rows land on one reducer regardless of partition count. Salting
  * splits each key into `buckets` sub-keys deterministically, joins against a
  * `buckets`-times replicated build side, and never changes the result set.
  */
object Skew {

  /** Inner equi-join of a skewed probe side against a small build side with
    * deterministic salting: probe rows scatter across `buckets` sub-keys via
    * a hash of their whole row (`xxhash64` over all probe columns), the build
    * side replicates `buckets` times, and the join key becomes
    * (key, salt) — splitting every hot key across `buckets` reducers. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(probe.columns.map(col).toSeq: _*), lit(buckets.toLong)))
    val replicated = build.withColumn("_salt",
      explode(typedlit((0L until buckets.toLong).toList)))
    salted
      .join(replicated.hint("shuffle_hash"), Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Key-skew profile — the DIAGNOSTIC that decides whether [[saltedJoin]]/
    * [[saltedCount]] (or AQE skew handling) is needed at all: the key
    * frequency distribution collapsed into log2 bands (band =
    * floor_log2(count), via exact integer bit lengths — the same whole-bit
    * discipline as the surprisal operators). A heavy tail (rows
    * concentrating in high bands) is the shape that melts a shuffle; a
    * profile read BEFORE the join costs two map-side-combining
    * aggregations (|keys| then |bands| ≤ 64 rows) and no judgment calls.
    * max_cnt per band rides along so the single hottest key is visible
    * even inside its band. Output (band, n_keys, n_rows, max_cnt). */
  def keySkewProfile(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .select((length(bin(col("cnt"))) - 1).cast("long").as("band"),
        col("cnt"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_cnt"))
      .orderBy("band")

  /** Two-phase aggregation for skewed count-style rollups: partial counts per
    * (key, salt) — spreading a hot key over `buckets` reducers — then the
    * final sum per key. Equivalent to groupBy(key).count(). */
  def saltedCount(df: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    df.withColumn("_salt",
        pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(buckets.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("count"))
  }
}
