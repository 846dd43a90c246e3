package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashes

/** Deterministic sketches with EXACT cross-engine gates.
  *
  * The usual objection to hash-gating a sketch is that its hash functions
  * are engine-private ([[Relational.sketchStats]]'s HLL++/quantile rows stay
  * rows-only for exactly that reason). Built over the md5-derived
  * [[Hashes]] family instead, the sketch itself becomes a deterministic
  * relational value — every counter, and every estimate read off it, is
  * bit-identical across engines and partitionings, so DuckDB can replay the
  * whole structure and the driver hash-compares it like any exact query.
  * The approximation error is still real (collisions overcount); it is the
  * SAME error in both engines.
  */
object Sketches {

  /** Count-Min sketch over the corpus token stream, plus the estimates read
    * back for the frequent vocabulary. `depth` hash rows (the [[Hashes.mix60]]
    * variants of one md5 per token) by `width` buckets; a token's estimate is
    * the min over rows of its bucket counters, so est ≥ exact always (the
    * CMS soundness bound — asserted in spec and visible in the output).
    *
    * Scale shape: one narrow tokenize+count aggregation (the vocabulary),
    * then depth tiny projections into a depth·width-cell aggregate — the
    * sketch is 4·1024 longs here, broadcastable at ANY corpus size, which is
    * the point of a CMS: the frequency table a 100 TB stream can afford to
    * keep. Output (tok, exact, est) for tokens with exact ≥ minCount. */
  def cmsTokenEstimates(docs: DataFrame, depth: Int = 4, width: Int = 1024,
                        minCount: Long = 50): DataFrame = {
    val mask = (width - 1).toLong
    // vocabulary with exact counts + base hash; feeds both the sketch build
    // and the estimate read-back (localCheckpoint: |vocab| rows, two readers)
    val vocab = TextAnalysis.tokens(docs)
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .withColumn("h", Hashes.h60(col("tok")))
      .localCheckpoint()
    // (tok, cnt, j, b): each token's bucket in every hash row
    val buckets = (0 until depth).map { j =>
      vocab.select(col("tok"), col("cnt"), lit(j).as("j"),
        Hashes.mix60(col("h"), j).bitwiseAND(lit(mask)).as("b"))
    }.reduce(_ unionAll _)
    val cms = buckets.groupBy("j", "b").agg(sum(col("cnt")).as("m"))
    buckets.filter(col("cnt") >= minCount)
      .join(cms, Seq("j", "b"))
      .groupBy("tok", "cnt")
      .agg(min(col("m")).as("est"))
      .select(col("tok"), col("cnt").as("exact"), col("est"))
      .orderBy("tok")
  }

  /** HyperLogLog distinct-count with deterministic md5-derived registers,
    * next to the exact answer. Bucket = top 8 of the 60 hash bits; rho =
    * 1-based position of the first set bit in the low 52 (computed with the
    * binary-string ops both engines share, so registers are bit-identical);
    * the harmonic sum runs over exact int64 terms `1 << (53 − reg)` (every
    * 2^−reg scaled by 2⁵³ is an integer), making it order-independent — the
    * one place a float Σ would break cross-engine equality. The raw-HLL
    * estimate then comes out of two IEEE ops both engines execute
    * identically, so even the approximate column is hash-gated.
    *
    * Scale shape: one narrow hash projection + a 256-cell max aggregation —
    * the mergeable fixed-size state that makes HLL THE distributed
    * distinct-count structure. Output one row (n_exact, v_zero, raw_est):
    * the small-range linear-counting correction `m·ln(m/V)` is left to the
    * reader (asserted in spec) because `ln` is the one op libms disagree on
    * in the last ulp — everything the gate hashes is IEEE-exact. */
  def hllDistinct(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val m = 256
    val keys = df.select(col(keyCol).cast("string").as("k"))
    val hashed = keys.select(Hashes.h60(col("k")).as("h"))
      .select(shiftright(col("h"), 52).bitwiseAND(lit((m - 1).toLong)).as("bucket"),
        col("h").bitwiseAND(lit((1L << 52) - 1)).as("low"))
      .select(col("bucket"),
        when(col("low") === 0, lit(53))
          .otherwise(instr(lpad(bin(col("low")), 52, "0"), "1")).as("rho"))
    val regs = hashed.groupBy("bucket").agg(max(col("rho")).as("reg"))
    val spine = spark.range(m).select(col("id").as("bucket"))
    val summed = spine.join(regs, Seq("bucket"), "left")
      .select(coalesce(col("reg"), lit(0)).cast("int").as("reg"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - reg)")).as("s"),
        sum(when(col("reg") === 0, 1L).otherwise(0L)).as("v_zero"))
    val exact = df.agg(countDistinct(col(keyCol)).as("n_exact"))
    exact.crossJoin(summed)
      .select(col("n_exact"), col("v_zero"),
        ((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))) * lit(65536.0) *
          lit(9007199254740992.0) / col("s").cast("double")).as("raw_est"))
  }

  /** Daily cumulative distinct-key curve from MERGED HLL registers — the
    * property that makes HLL worth shipping at all: the day-d state is the
    * elementwise MAX of days ≤ d's registers, so a year of daily sketches
    * unions into any range's estimate without touching the raw keys again
    * (the mergeable twin of [[Relational.cumulativeUsers]]'s exact curve,
    * which needs the full key set per day).
    *
    * Same determinism discipline as [[hllDistinct]]: md5-derived registers,
    * exact int64 harmonic terms, two IEEE float ops at the end. The running
    * register merge is a window max over the dense (day × 256) grid — |days|
    * · 256 rows however large the corpus, so the merge stage costs nothing
    * at any scale. Output (day, n_exact_cum, v_zero, raw_est): the exact
    * cumulative count rides along so the estimate's error is visible in the
    * gated artifact itself. */
  def hllCumulative(df: DataFrame, keyCol: String,
                    dayExpr: String = "ts div 86400000000000"): DataFrame = {
    val spark = df.sparkSession
    val m = 256
    val hashed = df.select(expr(dayExpr).as("day"),
        Hashes.h60(col(keyCol).cast("string")).as("h"))
      .select(col("day"),
        shiftright(col("h"), 52).bitwiseAND(lit((m - 1).toLong)).as("bucket"),
        col("h").bitwiseAND(lit((1L << 52) - 1)).as("low"))
      .select(col("day"), col("bucket"),
        when(col("low") === 0, lit(53))
          .otherwise(instr(lpad(bin(col("low")), 52, "0"), "1")).as("rho"))
    val daily = hashed.groupBy("day", "bucket").agg(max(col("rho")).as("rho"))
    val days = df.select(expr(dayExpr).as("day")).distinct()
    val spine = spark.range(m).select(col("id").as("bucket"))
    val byBucket = Window.partitionBy("bucket").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perDay = days.crossJoin(spine)
      .join(daily, Seq("day", "bucket"), "left")
      .withColumn("reg",
        max(coalesce(col("rho"), lit(0))).over(byBucket).cast("int"))
      .groupBy("day")
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - reg)")).as("s"),
        sum(when(col("reg") === 0, 1L).otherwise(0L)).as("v_zero"))
    // exact cumulative distinct: first-appearance counts + running sum over
    // |days| rows (the cumulativeUsers shape)
    val wDays = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val firsts = df.select(col(keyCol).as("k"), expr(dayExpr).as("day"))
      .groupBy("k").agg(min(col("day")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("nu"))
    val exactCum = days.join(firsts, Seq("day"), "left")
      .withColumn("n_exact_cum", sum(coalesce(col("nu"), lit(0L))).over(wDays))
    perDay.join(exactCum.select("day", "n_exact_cum"), "day")
      .select(col("day"), col("n_exact_cum"), col("v_zero"),
        ((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))) * lit(65536.0) *
          lit(9007199254740992.0) / col("s").cast("double")).as("raw_est"))
      .orderBy("day")
  }

  /** Mergeable equi-width histogram quantile sketch — the deterministic
    * member of the percentile family ([[Relational.sketchStats]]'s
    * `percentile_approx` stays rows-only because GK/KLL state is
    * merge-order-dependent; a bucket-count vector is not). The sketch
    * STATE is (group, bucket, cnt): associative, commutative, fixed error
    * (one bucket width), so partitions combine by plain summation — which
    * is exactly what Spark's partial aggregation does here, and what makes
    * this the quantile structure a 1000-executor scan can afford. Estimate
    * read-off is CDF inversion at integer-exact thresholds (`cum·den ≥
    * q_num·n` — no float boundary for engines to disagree on), reporting
    * each quantile as its bucket's upper edge.
    *
    * [[histogramSketch]] exposes the state so callers can persist shards
    * and merge later (re-aggregate by group+bucket); [[quantileSketch]] is
    * the one-shot build+read. Read-off cost is |groups|·|buckets| rows —
    * sketch-sized, corpus-independent. */
  def histogramSketch(df: DataFrame, groupCol: String, valueCol: String,
                      width: Double): DataFrame =
    df.groupBy(col(groupCol),
        floor(col(valueCol) / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Quantile estimates from a (possibly re-merged) [[histogramSketch]]
    * state. `qs` are (name, num, den) rationals, e.g. ("p90", 9, 10). */
  def quantilesFromSketch(sketch: DataFrame, groupCol: String, width: Double,
                          qs: Seq[(String, Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = sketch
      .withColumn("cum", sum(col("cnt"))
        .over(Window.partitionBy(groupCol).orderBy("bucket")))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(groupCol)))
    val qCols = qs.map { case (name, num, den) =>
      min(when(col("cum") * den >= col("n") * num,
        (col("bucket") + 1).cast("double") * width)).as(name)
    }
    cum.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), qCols: _*)
      .orderBy(groupCol)
  }

  /** One-shot contract instance: per-group quantile estimates of `valueCol`
    * via the mergeable histogram sketch. */
  def quantileSketch(df: DataFrame, groupCol: String, valueCol: String,
                     width: Double = 5.0): DataFrame =
    quantilesFromSketch(histogramSketch(df, groupCol, valueCol, width),
      groupCol, width,
      Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))

  /** Exact-vs-sketch quantile accuracy gate: per group, the exact discrete
    * percentile (`percentile_disc` — an actual data value, no midpoint
    * arithmetic) next to the mergeable histogram sketch's estimate, with
    * the error and the PROVABLE bound riding in the output. The sketch
    * reports its crossing bucket's upper edge, and the crossing bucket is
    * exactly the exact value's bucket (cum at bucket granularity crosses
    * where the value-level cum crosses), so err ∈ (0, width] for EVERY
    * group, always — `within_bound` is a theorem, and the gate hash-checks
    * the theorem holds in both engines. This closes the loop the CMS gate
    * (est ≥ exact) opened: every approximate structure ships with its
    * error contract as a verified column, not a code comment.
    *
    * Scale: the exact side sorts per group (the expensive path you run at
    * AUDIT time on a sample or slice); the sketch side is the
    * corpus-independent |groups|·|buckets| state you actually deploy. */
  def quantileAccuracy(df: DataFrame, groupCol: String = "event_type",
                       valueCol: String = "value",
                       width: Double = 5.0): DataFrame = {
    val est = quantileSketch(df, groupCol, valueCol, width)
      .select(col(groupCol), col("p50").as("est_p50"), col("p90").as("est_p90"))
    val exact = df.groupBy(groupCol).agg(
      expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY $valueCol)").as("ex_p50"),
      expr(s"percentile_disc(0.9) WITHIN GROUP (ORDER BY $valueCol)").as("ex_p90"))
    exact.join(est, groupCol)
      .select(col(groupCol),
        col("ex_p50"), col("est_p50"),
        (col("est_p50") - col("ex_p50")).as("err_p50"),
        col("ex_p90"), col("est_p90"),
        (col("est_p90") - col("ex_p90")).as("err_p90"),
        (col("est_p50") > col("ex_p50") &&
          col("est_p50") - col("ex_p50") <= width &&
          col("est_p90") > col("ex_p90") &&
          col("est_p90") - col("ex_p90") <= width).as("within_bound"))
      .orderBy(groupCol)
  }

  /** EXACT token heavy hitters (count·k > n) via a Misra–Gries candidate
    * screen + one candidate-restricted verify pass — the distributed-batch
    * form of the reference's φ-frequent-items contract
    * (`big_data_computing_3.py:69-92`, C7/P10 in SURVEY §2) for domains too
    * large to aggregate exactly.
    *
    * Why not a plain `groupBy(tok).count()`: its aggregation state is
    * O(|vocab|) — at 100 TB a token/shingle/url domain can be billions of
    * keys, most of them singletons that exist only to be discarded by the
    * threshold. The MG screen bounds state instead:
    *
    *  1. Per-partition Misra–Gries summary with k counters (mapPartitions
    *     kernel, ≤ k survivor rows per partition). The classic guarantee
    *     transfers through the union by pigeonhole: a token with GLOBAL
    *     count > n/k has count > n_p/k in at least one partition p
    *     (n = Σ n_p), and per-partition MG never evicts such a token — so
    *     the union of survivor SETS is a superset of the true heavy
    *     hitters, whatever the partitioning.
    *  2. Verify pass: semi-join the token stream against the broadcast
    *     candidate set (≤ k · partitions rows) BEFORE aggregating, so the
    *     exact count's hash state is bounded by the candidates, not the
    *     vocabulary; then keep cnt·k > n. False candidates die here, so
    *     the OUTPUT is the exact φ=1/k heavy-hitter set — deterministic
    *     and partitioning-independent even though the intermediate
    *     candidate set is not (spec replays adversarial partitionings).
    *
    * The kernel is the same narrow mapPartitions shape as the MinHash
    * signature kernel (SURVEY §7.2 exception list): a summary fold whose
    * state (k strings) no Column expression can express. Everything else is
    * codegen'd. Two scans of the token stream — the price of exactness; a
    * single-scan variant would return MG's overestimates, not counts. */
  def heavyHitters(docs: DataFrame, k: Int = 200): DataFrame = {
    val toks = TextAnalysis.tokens(docs).select("tok")
    val candidates = toks
      .as(org.apache.spark.sql.Encoders.STRING)
      .mapPartitions { it =>
        val counts = new java.util.HashMap[String, Long]()
        it.foreach { t =>
          val c = counts.getOrDefault(t, 0L)
          if (c != 0L) counts.put(t, c + 1)
          else if (counts.size < k) counts.put(t, 1L)
          else {
            // decrement-all step: amortized O(1) per arrival — each stored
            // unit is removed at most once, and arrivals add one unit each
            val e = counts.entrySet().iterator()
            while (e.hasNext) {
              val kv = e.next()
              if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1)
            }
          }
        }
        import scala.jdk.CollectionConverters._
        counts.keySet().iterator().asScala
      }(org.apache.spark.sql.Encoders.STRING)
      .toDF("tok").distinct()
    val total = toks.agg(count(lit(1)).as("n"))
    toks.join(broadcast(candidates), "tok")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .crossJoin(total) // 1-row build side: broadcast nested loop, no shuffle
      .filter(col("cnt") * k > col("n"))
      .select(col("tok"), col("cnt"))
      .orderBy("tok")
  }
}
