package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the document table — the BM25 ranking a
  * RAG/eval pipeline runs against the same corpus the dedup/curation
  * operators maintain (beyond the reference, which has no text-retrieval
  * surface; this is the retrieval-side counterpart of
  * [[TextAnalysis.tfidfCosinePairs]]'s similarity side).
  *
  * Determinism contract (the repo-wide whole-bit discipline — see
  * [[TextAnalysis.tfidfTopTerms]] for why ln-based scoring cannot hash
  * cross-engine): BM25's Robertson idf and length normalization are
  * re-expressed in EXACT integer arithmetic,
  *
  *   - idf_t       = floor(log2(N div df_t))  (binary-string length, no
  *                   libm — boilerplate terms with df > N/2 score 0 and
  *                   are dropped),
  *   - k1 = 6/5, b = 3/4 (the standard 1.2/0.75 as exact rationals),
  *   - contrib(q,d,t) scaled by 2^10 and floor-divided:
  *
  *       tfScale·idf·tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/S))
  *     = (idf·tf·44·S·1024) div (20·tf·S + 6·S + 18·dl·N)
  *
  *     with S = Σ dl (total corpus tokens). Every operand is int64; the
  *     floor division and the ORDER-FREE integer SUM over a query's
  *     terms make the final score an exact int64, bit-identical across
  *     engines and invariant to partitioning — the property a
  *     double-summed BM25 does not have. Int64 headroom: the numerator
  *     is ≤ idf·tf·44·1024 · S ≈ 2^21·tf·S; the loud `require` below
  *     guards the gate-scale bound, and the 100 TB deployment note is
  *     the same as [[TextAnalysis.tfidfCosinePairs]]: lift the two
  *     products into decimal(38,0) when S approaches 2^40.
  *
  * Query derivation is corpus-internal and SQL-replicable: the nq
  * lowest-doc_id documents are the query set; a query's terms are its
  * first `qTerms` distinct indexable tokens in token order (indexable =
  * df ≤ N/dfCapDen and idf ≥ 1). Candidates are every OTHER
  * document sharing ≥ 1 query term.
  *
  * Scale shape: the term table is |q|·qTerms rows — broadcast; the only
  * shuffle is the (qid, doc) score aggregation over the posting-list
  * join, whose size is Σ_t df_t ≤ (N/dfCapDen)·|terms| by the cap —
  * linear, never corpus². Top-k per query is a window over
  * ≤ (N/dfCapDen)·qTerms candidate rows per query. */
object Retrieval {

  /** The retrieval TERM UNIT: word bigrams. The synthetic corpus (and
    * many real ones after aggressive normalization) has a tiny unigram
    * vocabulary where almost every word is boilerplate-common — term
    * statistics are bimodal and single-word retrieval degenerates. Word
    * bigrams give a rich vocabulary with genuine document-frequency
    * spread (phrase-level retrieval — the standard n-gram lexical
    * fallback), and every downstream formula is term-unit-agnostic:
    * lengths, frequencies and idf all live in bigram space. (doc_id, tok)
    * with multiplicity; single-word documents carry no term and drop out
    * of the collection statistics on BOTH engines identically. */
  private[graft] def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(a) - 2), i -> concat(a[i], ' ', a[i + 1]))"))
        .as("tok"))

  /** BM25 top-k per derived query: (qid, doc_id, score, rank) with the
    * integer-scaled score above and the (score desc, doc_id asc)
    * tie-break. */
  def bm25TopK(docs: DataFrame, nq: Int = 5, qTerms: Int = 6, k: Int = 10,
               dfCapDen: Long = 10L): DataFrame = {
    // ONE bigram-explode pass: tf is materialized once (localCheckpoint)
    // and dl/df/corpus all derive from it (dl = Σ_tok tf by definition) —
    // without this every downstream branch re-runs the |corpus|·|doc|
    // explode (no cross-branch reuse in one Catalyst plan)
    val tf = bigrams(docs).groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf")).localCheckpoint()
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
    val dfTab = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    // indexable vocabulary: df ≤ N/dfCapDen (the cap is a FRACTION of the
    // corpus, so the indexable set is scale-invariant — a fixed absolute
    // cap empties the vocabulary as df grows linearly with N), whole-bit
    // idf ≥ 1; the comparison is exact integers (df·den ≤ N)
    val vocab = dfTab
      .crossJoin(broadcast(corpus))
      .filter(col("df") * lit(dfCapDen) <= col("n"))
      .withColumn("idf", (length(bin(expr("n div df"))) - 1).cast("long"))
      .filter(col("idf") >= 1L)
      .select("tok", "idf")
    // query terms: first qTerms indexable tokens of the nq lowest-id docs
    val qw = Window.partitionBy("qid").orderBy("tok")
    val terms = tf.filter(col("doc_id") < nq)
      .select(col("doc_id").as("qid"), col("tok"))
      .join(vocab, "tok")
      .withColumn("rn", row_number().over(qw))
      .filter(col("rn") <= qTerms)
      .select("qid", "tok", "idf")
    // posting join: candidates share ≥1 term; self excluded
    val scored = tf.join(broadcast(terms), "tok")
      .filter(col("doc_id") =!= col("qid"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      // loud int64-headroom guard IN the plan (candidate rows only — ≤
      // nq·qTerms·(N/dfCapDen) rows): Spark's non-ANSI int64 multiply wraps
      // silently, so the numerator is re-derived in decimal and compared
      // (DuckDB's own BIGINT overflow is already loud)
      .withColumn("_guard", assert_true(
        col("idf").cast("decimal(38,0)") * col("tf") * lit(44) * col("s") *
          lit(1024) < lit(Long.MaxValue).cast("decimal(38,0)"),
        lit("bm25 int64 headroom exceeded: lift the contribution products " +
          "into decimal(38,0) — see the Retrieval scaladoc")))
      .withColumn("contrib",
        expr("(idf * tf * 44 * s * 1024) div (20 * tf * s + 6 * s + 18 * dl * n)"))
      .filter(col("_guard").isNull) // assert_true returns null — keep all rows
      .groupBy("qid", "doc_id")
      .agg(sum(col("contrib")).as("score")) // exact int64 — order-free
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "doc_id", "score", "rank")
      .orderBy("qid", "rank")
  }

  /** The COMPOSED retrieval-side pipeline a RAG/eval run executes per
    * query: BM25 retrieve ([[bm25TopK]]) → collapse exact duplicates
    * among the retrieved set (identical retrieved texts waste context
    * budget; the best-ranked copy survives — the retrieval-side instance
    * of [[Dedup]]'s keeper rule) → greedily pack survivors in rank order
    * into a fixed token budget. Output one row per surviving retrieved
    * doc: (qid, doc_id, rank, n_tokens, cum_tokens, packed) — `packed`
    * marks the prefix that fits the budget, and the unpacked tail stays
    * in the report (an eval wants to see what the budget cut).
    *
    * Everything downstream of the BM25 scores is integer windows
    * (row_number for the dup collapse, a running int64 sum for the
    * budget), so the whole composition hash-gates. The per-query window
    * partitions are ≤ k rows — never a scale concern. */
  def ragPack(docs: DataFrame, nq: Int = 5, qTerms: Int = 6, k: Int = 10,
              budget: Long = 256L, dfCapDen: Long = 10L): DataFrame = {
    val hits = bm25TopK(docs, nq, qTerms, k, dfCapDen)
    val dl = TextAnalysis.tokens(docs)
      .groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val dupW = Window.partitionBy("qid", "text").orderBy("rank")
    val packW = Window.partitionBy("qid").orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hits
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .join(dl, "doc_id")
      .withColumn("copy_rn", row_number().over(dupW))
      .filter(col("copy_rn") === 1) // best-ranked copy of each text survives
      .withColumn("cum_tokens", sum(col("n_tokens")).over(packW))
      .select(col("qid"), col("doc_id"), col("rank"), col("n_tokens"),
        col("cum_tokens"), (col("cum_tokens") <= budget).as("packed"))
      .orderBy("qid", "rank")
  }

  // --------------------------------------------------------------------
  // The PERSISTED LEXICON — the retrieval family's stored artifact (the
  // [[Imi.persistIndex]] story applied to BM25): a deployment does not
  // re-tokenize 100 TB per query batch; it ships an inverted index and
  // serves from it. Layout at `path`:
  //
  //   path/_PUBLISHED       atomic publish marker (created LAST — the
  //                         crash-mid-write discipline of the ANN
  //                         artifact; a serve against an unpublished
  //                         lexicon fails loudly)
  //   path/stats            (n, s): corpus doc count + total tokens — 1 row
  //   path/dl               (doc_id, dl): per-doc lengths
  //   path/vocab            (tok, df, idf): the df-capped indexable
  //                         vocabulary with whole-bit idf
  //   path/postings         (tok, doc_id, tf) partitioned by
  //                         bucket = pmod(h60(tok), 64): a query's terms
  //                         resolve to ≤ |terms| buckets, so the serve
  //                         reads a DIRECTORY-PRUNED slice of the posting
  //                         table, never a scan — the partition-pruning
  //                         shape a 100 TB posting table needs.
  //
  // Every stored number is an exact integer (counts, whole-bit idf), so
  // serving from the artifact is bit-identical to the in-query chain —
  // `q_bm25_served` rides the `q_bm25` oracle verbatim, no pins.
  // --------------------------------------------------------------------

  private val Published = "_PUBLISHED"
  private val PostingBuckets = 64

  private def lexFs(df: DataFrame, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)

  /** Build and atomically publish the lexicon artifact. Single-version:
    * a rebuild deletes the root first (so no stale posting bucket can
    * survive a corpus that stopped touching it) and the marker lands
    * LAST — a crash mid-rebuild leaves an unpublished tree that the next
    * rebuild clears and [[bm25Served]] refuses to read. The multi-version
    * retained-snapshot pattern is [[Imi]]'s; the lexicon keeps the
    * single-publish shape a batch-rebuilt artifact needs. */
  def persistLexicon(docs: DataFrame, path: String,
                     dfCapDen: Long = 10L): Unit = {
    lexFs(docs, path).delete(new org.apache.hadoop.fs.Path(path), true): Unit
    // one explode pass feeds all four table writes (see bm25TopK)
    val tf = bigrams(docs).groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf")).localCheckpoint()
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val dfTab = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val corpus = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
    val vocab = dfTab
      .crossJoin(broadcast(corpus))
      .filter(col("df") * lit(dfCapDen) <= col("n"))
      .withColumn("idf", (length(bin(expr("n div df"))) - 1).cast("long"))
      .filter(col("idf") >= 1L)
      .select("tok", "df", "idf")
    corpus.coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    dl.write.mode("overwrite").parquet(s"$path/dl")
    vocab.write.mode("overwrite").parquet(s"$path/vocab")
    graft.sources.Sources.writePartitioned(
      tf.join(vocab.select("tok"), "tok") // only indexable terms stored
        .withColumn("bucket",
          pmod(graft.functions.Hashes.h60(col("tok")), lit(PostingBuckets.toLong)))
        .select("bucket", "tok", "doc_id", "tf"),
      s"$path/postings", Seq("bucket"))
    val out = lexFs(docs, path).create(
      new org.apache.hadoop.fs.Path(path, Published), false)
    out.close()
  }

  /** BM25 top-k served FROM the stored lexicon: query terms derive from
    * the caller's query documents exactly as [[bm25TopK]] does, resolve
    * against the STORED vocabulary, and score only the posting rows of
    * the terms' hash buckets (collected driver-side first — ≤ nq·qTerms
    * rows, the driver-bounded step that turns the bucket set into
    * partition-pruning literals). Output identical to [[bm25TopK]]. */
  def bm25Served(docs: DataFrame, path: String, nq: Int = 5, qTerms: Int = 6,
                 k: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    if (!lexFs(docs, path).exists(
        new org.apache.hadoop.fs.Path(path, Published)))
      throw new IllegalStateException(
        s"no published lexicon at $path — persistLexicon first")
    val stats = spark.read.schema("n BIGINT, s BIGINT").parquet(s"$path/stats")
    val dl = spark.read.schema("doc_id BIGINT, dl BIGINT").parquet(s"$path/dl")
    val vocab = spark.read.schema("tok STRING, df BIGINT, idf BIGINT")
      .parquet(s"$path/vocab")
    val qw = Window.partitionBy("qid").orderBy("tok")
    // driver-bounded: ≤ nq·qTerms term rows — the literal bucket list the
    // posting read prunes on
    val terms = bigrams(docs.filter(col("doc_id") < nq))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf_q"))
      .select(col("doc_id").as("qid"), col("tok"))
      .join(vocab.select("tok", "idf"), "tok")
      .withColumn("rn", row_number().over(qw))
      .filter(col("rn") <= qTerms)
      .select(col("qid"), col("tok"), col("idf"),
        pmod(graft.functions.Hashes.h60(col("tok")),
          lit(PostingBuckets.toLong)).as("bucket"))
      .localCheckpoint()
    val buckets = terms.select("bucket").distinct()
      .collect().map(_.getLong(0)).toSeq
    val postings = spark.read
      .schema("tok STRING, doc_id BIGINT, tf BIGINT, bucket BIGINT")
      .parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*)) // directory-level pruning
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id").asc)
    postings
      .join(broadcast(terms.select("qid", "tok", "idf")), "tok")
      .filter(col("doc_id") =!= col("qid"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        expr("(idf * tf * 44 * s * 1024) div (20 * tf * s + 6 * s + 18 * dl * n)"))
      .groupBy("qid", "doc_id")
      .agg(sum(col("contrib")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "doc_id", "score", "rank")
      .orderBy("qid", "rank")
  }

  /** Lexicon staleness — the O(1)-ish health signal the maintenance loop
    * reads (the [[Imi.maintainIndex]] trigger applied to retrieval): the
    * stored stats table says how many documents the collection statistics
    * were computed over; the lengths table says how many the lexicon
    * currently serves. Their gap is the mass scored under stale
    * (N, S, df, idf). One row: (n_stats, n_docs, n_stale) — the fraction
    * is left to the caller as two exact int64s (no ratio column, so the
    * row hash-gates without a division contract). Cost: one 1-row stats
    * read + one count over the slim lengths table. */
  def lexiconStaleness(spark: org.apache.spark.sql.SparkSession,
                       path: String): DataFrame = {
    val stats = spark.read.schema("n BIGINT, s BIGINT").parquet(s"$path/stats")
    val nDocs = spark.read.schema("doc_id BIGINT, dl BIGINT")
      .parquet(s"$path/dl").agg(count(lit(1)).as("n_docs"))
    stats.select(col("n").as("n_stats"))
      .crossJoin(nDocs)
      .select(col("n_stats"), col("n_docs"),
        (col("n_docs") - col("n_stats")).as("n_stale"))
  }

  /** The maintenance policy: rebuild when the stale mass exceeds
    * `maxStaleNum/maxStaleDen` of the statistics base (exact integer
    * comparison — no float boundary decides maintenance). Rebuilding
    * retrains the collection statistics over what the corpus has become
    * (`docs` — the caller's current corpus table), repaying the frozen-
    * stats staleness the upsert path accrues. Returns the action taken
    * ("rebuild" | "none"), loggable/spec-assertable like
    * [[Imi.maintainIndex]]. */
  def maintainLexicon(docs: DataFrame, path: String,
                      maxStaleNum: Long = 1L, maxStaleDen: Long = 5L): String = {
    val row = lexiconStaleness(docs.sparkSession, path).head()
    val (nStats, nStale) = (row.getLong(0), row.getLong(2))
    if (nStale * maxStaleDen > nStats * maxStaleNum) {
      persistLexicon(docs, path)
      "rebuild"
    } else "none"
  }

  /** Retrieval quality gauge — precision/recall@k of the BM25 ranking
    * against a DETERMINISTIC pseudo-relevance set (no human labels exist
    * for a synthetic corpus, and none are needed for a regression gauge):
    * a document is pseudo-relevant to a query iff it shares ≥ `minShared`
    * DISTINCT indexable query terms. That is the standard term-overlap
    * proxy, it is exactly SQL-expressible, and it is NOT what BM25
    * optimizes (BM25 weighs tf, idf and length), so the gauge genuinely
    * discriminates rankings rather than echoing the score. Output one row
    * per query: (qid, n_rel, hits, precision, recall) — integers plus two
    * single exact divisions. */
  def retrievalEval(docs: DataFrame, nq: Int = 5, qTerms: Int = 6,
                    k: Int = 10, dfCapDen: Long = 10L,
                    minShared: Long = 2L): DataFrame = {
    val tf = bigrams(docs).groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf")).localCheckpoint()
    val dfTab = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val corpus = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
    val vocab = dfTab
      .crossJoin(broadcast(corpus))
      .filter(col("df") * lit(dfCapDen) <= col("n"))
      .withColumn("idf", (length(bin(expr("n div df"))) - 1).cast("long"))
      .filter(col("idf") >= 1L)
      .select("tok", "idf")
    val qw = Window.partitionBy("qid").orderBy("tok")
    val terms = tf.filter(col("doc_id") < nq)
      .select(col("doc_id").as("qid"), col("tok"))
      .join(vocab, "tok")
      .withColumn("rn", row_number().over(qw))
      .filter(col("rn") <= qTerms)
      .select("qid", "tok")
    // pseudo-relevance: ≥ minShared distinct shared terms, self excluded
    val rel = tf.join(broadcast(terms), "tok")
      .filter(col("doc_id") =!= col("qid"))
      .groupBy("qid", "doc_id")
      .agg(countDistinct(col("tok")).as("shared"))
      .filter(col("shared") >= minShared)
      .select("qid", "doc_id")
    val hits = bm25TopK(docs, nq, qTerms, k, dfCapDen)
      .select("qid", "doc_id")
      .join(rel, Seq("qid", "doc_id"))
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    val nRel = rel.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    tf.filter(col("doc_id") < nq).select(col("doc_id").as("qid")).distinct()
      .join(nRel, Seq("qid"), "left")
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("precision"),
        when(coalesce(col("n_rel"), lit(0L)) === 0L, lit(0.0))
          .otherwise(coalesce(col("hits"), lit(0L)).cast("double") /
            coalesce(col("n_rel"), lit(1L)).cast("double")).as("recall"))
      .orderBy("qid")
  }

  /** Test seam: the posting buckets a serve for `docs`'s first `nq`
    * query documents would read — so the pruning spec can delete every
    * OTHER bucket and prove the serve never touches them. Driver-bounded
    * (≤ nq·qTerms rows). */
  private[graft] def queryBucketsForTest(docs: DataFrame, path: String,
                                         nq: Int = 5,
                                         qTerms: Int = 6): Set[Long] = {
    val spark = docs.sparkSession
    val vocab = spark.read.schema("tok STRING, df BIGINT, idf BIGINT")
      .parquet(s"$path/vocab")
    val qw = Window.partitionBy("qid").orderBy("tok")
    bigrams(docs.filter(col("doc_id") < nq))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf_q"))
      .select(col("doc_id").as("qid"), col("tok"))
      .join(vocab.select("tok"), "tok")
      .withColumn("rn", row_number().over(qw))
      .filter(col("rn") <= qTerms)
      .select(pmod(graft.functions.Hashes.h60(col("tok")),
        lit(PostingBuckets.toLong)).as("bucket"))
      .distinct().collect().map(_.getLong(0)).toSet
  }

  /** Incremental document delivery into the stored lexicon under FROZEN
    * statistics — the [[Imi.upsertIndex]] frozen-books discipline applied
    * to retrieval: new documents gain posting rows and length entries
    * (pure per-doc functions of the delivery), while (N, S, df, idf) stay
    * the bootstrap artifact. This is how production lexicons actually
    * serve between stat-refresh cycles: scores over the merged corpus are
    * computed under slightly-stale collection statistics, and the staleness
    * is repaid at the next [[persistLexicon]] rebuild (the compaction
    * analogy). Because every stored number is frozen or a pure function,
    * upsert-then-serve is bit-identical to one bulk build with base-split
    * statistics — which is what `q_bm25_upsert` hash-gates in plain SQL,
    * no pins. */
  def upsertLexicon(delta: DataFrame, path: String): Unit = {
    val spark = delta.sparkSession
    if (!lexFs(delta, path).exists(
        new org.apache.hadoop.fs.Path(path, Published)))
      throw new IllegalStateException(
        s"no published lexicon at $path — persistLexicon first")
    val vocab = spark.read.schema("tok STRING, df BIGINT, idf BIGINT")
      .parquet(s"$path/vocab")
    val tf = bigrams(delta).groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf")).localCheckpoint()
    tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      .write.mode("append").parquet(s"$path/dl")
    graft.sources.Sources.writePartitioned(
      tf.join(vocab.select("tok"), "tok")
        .withColumn("bucket",
          pmod(graft.functions.Hashes.h60(col("tok")), lit(PostingBuckets.toLong)))
        .select("bucket", "tok", "doc_id", "tf"),
      s"$path/postings", Seq("bucket"), mode = "append")
  }
}
