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

  /** k-th 60-bit variant of a base [[h60]] hash: rotate right by
    * r = (7k+3) mod 60, then XOR a k-derived md5 constant. One md5 per input
    * row buys h variants in pure codegen'd integer ops — the MinHash trick
    * that keeps signature cost O(rows), not O(rows * h) md5 calls. The left
    * shift masks low bits first so engines that ERROR on BIGINT overflow
    * (DuckDB) and engines that wrap (Spark) compute identical values. */
  def mix60(base: Column, k: Int): Column = {
    val r = (k * 7 + 3) % 60
    val rot = shiftright(base, r).bitwiseOR(
      shiftleft(base.bitwiseAND(lit((1L << r) - 1)), 60 - r))
    rot.bitwiseXOR(lit(mixConst60(k)))
  }

  /** 60-bit XOR constant for variant k — first 15 hex chars of md5(k),
    * numerically identical to the SQL twin's md5(CAST(k AS VARCHAR)). */
  def mixConst60(k: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(k.toString.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** SQL twin of [[mix60]] with k as a column: base/k/r/c are SQL expressions
    * (r = (k*7+3)%60, c = the md5-of-k constant). */
  def mix60Sql(b: String, r: String, c: String): String =
    s"xor((($b) >> ($r)) | ((($b) & ((CAST(1 AS BIGINT) << ($r)) - 1)) << (60 - ($r))), $c)"

  // -------------------------------------------------------------------------
  // JVM twins of the Column hashes, for per-partition kernels that fold a
  // whole document's shingles/tokens in one narrow pass (see
  // operators.Dedup.docSignatures). Bit-equality with the Column forms is
  // asserted by HashesSpec; both reduce to "md5 hex prefix parsed base-16".
  // -------------------------------------------------------------------------

  /** JVM twin of [[h60]]: first 15 hex chars of md5 = the big-endian value of
    * the first 8 digest bytes with the low nibble dropped. The caller passes
    * (and reuses) one MessageDigest per partition; `digest()` resets it. */
  def h60Jvm(md: java.security.MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** JVM twin of [[h32]]: first 8 hex chars of md5 = the big-endian value of
    * the first 4 digest bytes, zero-extended to a long. */
  def h32Jvm(md: java.security.MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** JVM twin of [[mix60]] (base < 2^60, so >>> and >> agree). */
  def mix60Jvm(base: Long, r: Int, c: Long): Long =
    ((base >>> r) | ((base & ((1L << r) - 1)) << (60 - r))) ^ c
}
