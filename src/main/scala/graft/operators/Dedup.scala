package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashes

/** Deduplication operators for a training-data pipeline (north-star
  * extension, SURVEY.md §7.1 M7): exact hash dedup, MinHash+LSH, SimHash and
  * DF-capped n-gram Jaccard near-dup detection.
  *
  * Scale design: nothing here ever materializes the n² pair space.
  *  - exact dedup is one hash aggregation;
  *  - MinHash/LSH generates candidates only where a band signature collides
  *    (equi-join on the band key → shuffled hash join);
  *  - n-gram Jaccard prunes the inverted index by document frequency before
  *    pairing, bounding each posting list (the classic stop-shingle cap);
  *  - SimHash pairs join on a coarse prefix bucket before the Hamming check.
  * All hashes are md5-derived ([[Hashes]]) so every operator has an exact
  * DuckDB oracle twin.
  */
object Dedup {

  /** Exact duplicate groups (`dropDuplicates` inverted): content hash,
    * surviving doc (min id), multiplicity — only groups with >1 member. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)
      .orderBy("h")

  /** Deduplicated corpus: the `dropDuplicates`-style survivor set with a
    * DETERMINISTIC keeper (min doc_id per distinct text — `dropDuplicates`
    * itself keeps an arbitrary row, which would not be oracle-checkable). */
  def dedupedDocIds(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
      .orderBy("doc_id")

  /** Corpus-level dedup summary: total docs, distinct texts, redundant docs. */
  def dedupSummary(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("text")).as("n_distinct"),
      (count(lit(1)) - countDistinct(col("text"))).as("n_dup_docs"))

  /** MinHash signatures: for each of `h` hash variants k, the min 60-bit
    * mixed hash over the doc's distinct 9-gram shingles.
    * Output: (doc_id, k, mh). */
  def minhashSignatures(docs: DataFrame, h: Int = 16): DataFrame =
    minhashSignaturesFrom(TextAnalysis.charShingles(docs), h)

  private def minhashSignaturesFrom(sh: DataFrame, h: Int): DataFrame = {
    // ONE md5 per shingle row (the expensive part), then h cheap bit-mixed
    // variants (rotate+xor, [[Hashes.mix60]], pure codegen'd integer ops)
    // taken as h parallel min-aggregates in a single partial+final hash
    // aggregation. No distinct-vocabulary join: at 100 TB there is no
    // bounded build side to broadcast, and map-side partial aggregation
    // keeps the shuffle at |docs|·1 rows regardless of corpus size. The
    // tiny (doc, h-array) result unfolds to the (doc_id, k, mh) contract.
    val based = sh.select(col("doc_id"), Hashes.h60(col("s")).as("b"))
    based.groupBy("doc_id")
      .agg(array((0 until h).map(k => min(Hashes.mix60(col("b"), k))): _*).as("sig"))
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("k", "mh")))
  }

  /** MinHash LSH near-dup pairs: band the signature (bands of `rows` hashes),
    * join docs whose band signature collides, then verify candidates with the
    * exact Jaccard over their distinct shingle sets. Output:
    * (a, b, jaccard) for verified pairs with jaccard ≥ threshold.
    *
    * ONE pass over the shingle incidence: a single doc_id aggregation folds
    * the h signature mins, the shingle set and its size together, so the
    * 2.8M-row (at sf0.1) incidence table is never cached or re-scanned —
    * only the tiny per-doc table (|docs| rows) persists. Bands derive from
    * the sig array; verification joins the candidate pairs back to the same
    * per-doc table (AQE broadcasts it) and intersects the two distinct sets
    * per row — integer counts, so the jaccard double divides identically to
    * the oracle's join-count formulation. */
  def minhashLshPairs(docs: DataFrame, h: Int = 16, rows: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val based = TextAnalysis.charShingles(docs)
      .select(col("doc_id"), col("s"), Hashes.h60(col("s")).as("b"))
    val docAgg = based.groupBy("doc_id")
      .agg(
        array((0 until h).map(k => min(Hashes.mix60(col("b"), k))): _*).as("sig"),
        collect_list(col("s")).as("ss"),
        count(lit(1)).as("c"))
      .cache()
    val bands = docAgg
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("k", "mh")))
      .withColumn("band", floor(col("k") / lit(rows.toDouble)).cast("int"))
      .groupBy("doc_id", "band")
      .agg(concat_ws("-",
        transform(array_sort(collect_list(struct(col("k"), col("mh")))),
          x => x.getField("mh").cast("string"))).as("sig"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    cand
      .join(docAgg.as("ca"), col("a") === col("ca.doc_id"))
      .join(docAgg.as("cb"), col("b") === col("cb.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("ca.ss"), col("cb.ss"))).cast("long"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") /
          (col("ca.c") + col("cb.c") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("a", "b")
  }

  /** DF-capped n-gram Jaccard near-dup pairs: inverted index over shingles
    * whose document frequency ≤ `dfCap` (stop-shingle pruning — bounds every
    * posting list, hence the pair fan-out, at any corpus size); Jaccard is
    * computed over the SAME capped shingle sets. Output (a, b, jaccard). */
  def ngramJaccardPairs(docs: DataFrame, dfCap: Int = 20,
                        threshold: Double = 0.3): DataFrame = {
    // One explicit hash-repartition on the shingle key, cached: the DF
    // aggregation, the df-cap semi-filter join and the inverted-index
    // self-join below are all keyed by `s`, so they reuse this partitioning
    // (InMemoryRelation preserves outputPartitioning) instead of three
    // separate exchanges of the full doc x shingle incidence.
    val sh = TextAnalysis.charShingles(docs).repartition(col("s")).cache()
    val rare = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select("s")
    val rsh = sh.join(rare, "s").cache()
    val sizes = rsh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val inter = rsh.as("x").join(rsh.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("ca"), col("a") === col("ca.doc_id"))
      .join(sizes.as("cb"), col("b") === col("cb.doc_id"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") /
          (col("ca.c") + col("cb.c") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("a", "b")
  }

  /** Connected components over an undirected pair list — the cluster-merge
    * step after near-dup pair generation (two docs 0.4-similar to a common
    * third belong to one dedup group even if not directly paired).
    *
    * Min-label propagation to fixpoint: every vertex repeatedly adopts the
    * smallest label among itself and its neighbors. Each round is one
    * shuffled join + aggregation over the EDGE list (never a transitive
    * closure materialization), and the round count is the component
    * diameter — near-dup clusters are short chains, so this converges in a
    * handful of rounds at any corpus size; the driver only ever sees the
    * single convergence counter. Output: (doc_id, cluster_id = min doc_id
    * in the component), for every doc incident to a pair. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 100,
                          driverThreshold: Long = 4_000_000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = pairs.select(col("a").cast("long"), col("b").cast("long")).cache()
    // Size-gated strategy (the same explicit switch the reference applies to
    // its exact-outlier path): a near-dup pair graph is a vanishing fraction
    // of the corpus — when it fits the driver comfortably, a local
    // union-find in one collect beats rounds of distributed joins whose
    // per-round job overhead dominates tiny data. Past the threshold, the
    // distributed min-label loop below takes over.
    if (p.count() <= driverThreshold) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val px = parent.getOrElseUpdate(x, x)
        if (px == x) x else { val r = find(px); parent(x) = r; r }
      }
      p.as[(Long, Long)].collect().foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      p.unpersist()
      parent.keys.toSeq.map(v => (v, find(v))).toDF("doc_id", "cluster_id")
        .orderBy("doc_id")
    } else {
      val edges = p.select(col("a").as("u"), col("b").as("v"))
        .unionByName(p.select(col("b").as("u"), col("a").as("v")))
        .cache()
      var labels = edges.select(col("u").as("id"))
        .distinct()
        .select(col("id"), col("id").as("lbl"))
        .localCheckpoint()
      var converged = false
      var round = 0
      while (!converged && round < maxRounds) {
        val neighborMin = edges
          .join(labels, edges("v") === labels("id"))
          .groupBy(col("u").as("id")).agg(min(col("lbl")).as("nlbl"))
        // localCheckpoint (eager) truncates the per-round lineage — without
        // it each iteration's plan nests the previous one and analysis time
        // grows quadratically with the round count
        val next = labels.join(neighborMin, "id")
          .select(col("id"), least(col("lbl"), col("nlbl")).as("lbl"))
          .localCheckpoint()
        converged = next.join(labels.withColumnRenamed("lbl", "old"), "id")
          .filter(col("lbl") =!= col("old")).isEmpty
        labels.unpersist()
        labels = next
        round += 1
      }
      labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
        .orderBy("doc_id")
    }
  }

  /** Driver-contract instance: clusters over the MinHash-LSH verified pairs. */
  def nearDupClusters(docs: DataFrame): DataFrame =
    connectedComponents(minhashLshPairs(docs))

  /** 32-bit SimHash over whitespace tokens (with multiplicity): per bit b,
    * sign-sum of token-hash bits; simhash bit b set iff the sum is positive. */
  def simhash(docs: DataFrame): DataFrame = {
    // 32 sign-sums as 32 parallel aggregates in one hash aggregation (no
    // 32-fold token-row explosion); the bit fold over the tiny per-doc array
    // happens after.
    TextAnalysis.tokens(docs)
      .select(col("doc_id"), Hashes.h32(col("tok")).as("th"))
      .groupBy("doc_id")
      .agg(array((0 until 32).map(b =>
        sum(expr(s"(shiftright(th, $b) & 1) * 2 - 1"))): _*).as("sgns"))
      .select(col("doc_id"), posexplode(col("sgns")).as(Seq("b", "sgn")))
      .groupBy("doc_id")
      .agg(sum(when(col("sgn") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L)).as("simhash"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs: Hamming distance ≤ maxHamming (< 8).
    *
    * Candidate generation is an EXACT band trick, not a heuristic: the 32-bit
    * simhash splits into 8 bands of 4 bits; ≤ 7 flipped bits can touch at most
    * 7 bands, so every qualifying pair agrees on at least one whole band and
    * is found by the (band_id, band_value) equi-join — a shuffled hash join,
    * never a cartesian. The oracle can therefore use the naive quadratic SQL:
    * both produce identical pair sets. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 2): DataFrame = {
    // maxHamming+1 bands: ≤ maxHamming flips touch at most maxHamming bands,
    // so one band is always intact. Fewer, wider bands = exponentially fewer
    // spurious bucket collisions (width 11 → 2048 buckets vs width 4 → 16).
    val nBands = maxHamming + 1
    val width = (32 + nBands - 1) / nBands
    val mask = (1 << width) - 1
    val sh = simhash(docs).cache()
    val bands = sh.select(col("doc_id"), col("simhash"),
        explode(typedlit((0 until nBands).toList)).as("bd"))
      .withColumn("bv", expr(s"shiftright(simhash, bd * $width) & $mask"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.bd") === col("y.bd") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    cand
      .join(sh.as("sa"), col("a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("b") === col("sb.doc_id"))
      .select(col("a"), col("b"),
        expr("bit_count(sa.simhash ^ sb.simhash)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }
}
