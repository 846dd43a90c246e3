package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hashes.
  *
  * Spark's `hash()`/`xxhash64()` and DuckDB's `hash()` are different functions,
  * so oracle-checkable operators derive integer hashes from `md5` (identical
  * in every engine) instead: a 60-bit value from the first 15 hex digits
  * (fits a signed 64-bit int with headroom) and a 32-bit value from the first
  * 8. DuckDB twins: `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)` /
  * `...substr(md5(x),1,8)...`. All expressions are built-in and codegen'd —
  * no UDFs (SURVEY.md §7.2).
  */
object Hashes {

  /** 60-bit md5-derived hash, uniform on [0, 2^60). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 32-bit md5-derived hash, uniform on [0, 2^32). */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** SQL-string twins for oracle authoring. */
  def h60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"
  def h32Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 8)) AS BIGINT)"
}
