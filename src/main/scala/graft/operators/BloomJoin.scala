package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashes
import graft.sources.Sources

/** Bloom-pre-filtered semi-join — the join-reduction pattern for the case a
  * broadcast hash join can't reach: the build side's KEY SET is too large to
  * ship as a hash relation (100M+ keys at corpus scale), but a fixed-size
  * Bloom bitset (default 2²⁰ bits = 128 KB, independent of key count) still
  * broadcasts everywhere. The probe side drops non-members in a narrow
  * zero-shuffle pass, so only candidate rows (true matches + the bitset's
  * false positives) reach the exchange of the EXACT semi-join that finishes
  * the query — the answer is identical to the plain semi-join, the shuffle
  * is proportional to the match set, not the probe table.
  *
  * Same deterministic bitset discipline as
  * [[Curation.decontaminateBloom]]: 4 bit positions per key are fixed 20-bit
  * windows of the md5-derived h60 ([[Hashes.h60]]), so the structure is
  * reproducible cross-engine; the DuckDB oracle needs none of it (it runs
  * the plain semi-join — result equality IS the false-positive-removal
  * proof). The bitset is built distributed: keys fold to their distinct bit
  * positions before the driver ever sees them, so the collect is bounded by
  * min(4·|keys|, 2²⁰) ints regardless of key-set size.
  *
  * Reference scope: the reference has no join reduction (its joins are the
  * outlier grid joins, SURVEY §2.3); this is pipeline-extension surface,
  * sized for the selective-dimension shape a 100 TB fact scan hits.
  */
object BloomJoin {

  private val Shifts = Array(0, 13, 26, 39)

  /** Selective build side: high-value orders (top ~10% by price). */
  def selectiveOrderKeys(spark: SparkSession, sfDir: String,
                         minPrice: Double): DataFrame =
    Sources.table(spark, sfDir, "orders")
      .filter(col("o_totalprice") > minPrice)
      .select(col("o_orderkey").as("key"))

  /** The distinct Bloom bit positions of a key column — computed on the
    * cluster so the driver materializes positions (≤ 2²⁰), never keys. */
  private def bitPositions(keys: DataFrame, mBits: Int): Array[Int] = {
    import keys.sparkSession.implicits._
    val mask = (mBits - 1).toLong
    val pos = Shifts.map(sh =>
      shiftright(Hashes.h60(col("key").cast("string")), sh)
        .bitwiseAND(lit(mask)))
    keys.select(explode(array(pos.toIndexedSeq: _*)).as("p"))
      .distinct().as[Long].map(_.toInt).collect()
  }

  /** Probe rows surviving the broadcast-bitset membership test: true
    * matches plus false positives, produced in one narrow typed pass —
    * no exchange, one md5 per probe row. */
  private def bloomPrefilter(probe: DataFrame, positions: Array[Int],
                             mBits: Int): DataFrame = {
    val spark = probe.sparkSession
    import spark.implicits._
    val bits = new java.util.BitSet(mBits)
    positions.foreach(bits.set)
    val bc = spark.sparkContext.broadcast(bits)
    val mask = (mBits - 1).toLong
    probe.as[(Long, String, Double)]
      .mapPartitions { it =>
        val b = bc.value
        val md = java.security.MessageDigest.getInstance("MD5")
        it.filter { case (key, _, _) =>
          val h = Hashes.h60Jvm(md, key.toString)
          var k = 0
          var all = true
          while (all && k < Shifts.length) {
            if (!b.get(((h >>> Shifts(k)) & mask).toInt)) all = false
            k += 1
          }
          all
        }
      }
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice")
  }

  /** Revenue of lineitems belonging to high-value orders, computed through
    * the Bloom-prefilter → exact-semi-join pipeline. Hash-gated equal to the
    * plain semi-join (the oracle); BloomJoinSpec additionally asserts the
    * prefilter's candidate count sits in [matches, probe rows). */
  def bloomSemiJoinRevenue(spark: SparkSession, sfDir: String,
                           minPrice: Double = 450000.0,
                           mBits: Int = 1 << 20): DataFrame = {
    val keys = selectiveOrderKeys(spark, sfDir, minPrice)
    val probe = Sources.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_extendedprice")
    bloomSemiJoinRevenueOf(keys, probe, mBits)
  }

  /** [[bloomSemiJoinRevenue]] over explicit key/probe frames (ScaleProof
    * surface: at 10× keys the bitset saturates toward its false-positive
    * ceiling and the answer must STAY exact — FP removal is the final
    * join's job, not the filter's). */
  def bloomSemiJoinRevenueOf(keys: DataFrame, probe: DataFrame,
                             mBits: Int = 1 << 20): DataFrame = {
    val candidates = bloomPrefilter(probe, bitPositions(keys, mBits), mBits)
    candidates
      .join(keys, candidates("l_orderkey") === keys("key"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("revenue"))
      .orderBy("l_returnflag")
  }

  /** The prefiltered candidate set alone (spec surface: candidate counting
    * and false-positive accounting). */
  def bloomCandidates(spark: SparkSession, sfDir: String,
                      minPrice: Double = 450000.0,
                      mBits: Int = 1 << 20): DataFrame = {
    val keys = selectiveOrderKeys(spark, sfDir, minPrice)
    val probe = Sources.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_extendedprice")
    bloomPrefilter(probe, bitPositions(keys, mBits), mBits)
  }
}
