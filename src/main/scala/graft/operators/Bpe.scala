package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding training (Sennrich et al. 2016) — the merge loop
  * itself, not just one pair count: iteratively find the most frequent
  * adjacent symbol pair across the corpus and fuse it into a new symbol.
  * The result is the ordered merge table a subword tokenizer ships.
  *
  * Distribution shape, which is what matters at 100 TB: training runs on
  * the *word-frequency table* (|vocab| rows, built by one hash aggregation
  * over the token stream), never on the token stream itself — the classic
  * BPE factorization. Each iteration is (a) one narrow in-row pair
  * expansion + partial-aggregating groupBy on the pair key, (b) a 1-row
  * TakeOrdered argmax, (c) one codegen'd `replace` projection. The
  * per-iteration driver collect is a single (pair, count) row — BPE's
  * argmax loop is inherently sequential (merge i+1's counts depend on
  * merge i), so the driver holds only the loop control, never data.
  *
  * Merge application is exact under a flat string encoding chosen so one
  * literal `replace` IS the greedy left-to-right merge: symbols are
  * double-space separated with double-space padding at both ends, and the
  * search pattern keeps a single-space margin on each side
  * (`" a  b " -> " ab "`). The margin spaces prove the match starts and
  * ends at symbol boundaries (no cross-symbol substring match, e.g.
  * merging "a b" never fires inside "xa b"), while each replacement
  * consumes only the *inner* delimiter — the margin it rewrites is
  * re-usable by an immediately adjacent next match, so repeats merge
  * exactly like greedy BPE ("a b a b" -> "ab ab", left-to-right,
  * non-overlapping). Whitespace tokenization guarantees the delimiter
  * never collides with symbol characters.
  *
  * Counts are exact int64 (weighted by word frequency, one count per
  * adjacent position); ties broken (count desc, pair asc). Output
  * (iter, pair, merged, pair_count) — hash-gated against a DuckDB oracle
  * that unrolls the same loop as chained CTEs. */
object Bpe {

  /** The shared trainer: runs the merge loop and returns BOTH the ordered
    * merge rows and the final encoded word-frequency table (cnt, seq) —
    * `seq` is the double-space symbol encoding AFTER all merges, so
    * [[bpeEncode]] reads corpus tokenization straight off it without
    * re-deriving the loop. */
  private[graft] def train(docs: DataFrame, nMerges: Int)
      : (Seq[Row], DataFrame) = {
    // word-frequency table: the only pass over the full corpus
    var vocab = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) >= 1)
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"),
        concat(lit("  "), regexp_replace(col("tok"), "(.)", "$1  ")).as("seq"))
      .localCheckpoint() // truncate lineage across merge iterations
    val merges = Seq.newBuilder[Row]
    for (it <- 1 to nMerges) {
      val best = vocab
        .select(col("cnt"),
          filter(split(col("seq"), "  "), x => x =!= "").as("syms"))
        // guard: Spark's sequence(1, n) counts DOWN for n < 1, so a
        // single-symbol word would index past its array
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => concat(element_at(col("syms"), i), lit(" "),
            element_at(col("syms"), i + 1)))).as("pair"))
        .groupBy("pair").agg(sum(col("cnt")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("pair").asc)
        .limit(1).collect()
      if (best.nonEmpty) {
        val (pair, pc) = (best(0).getString(0), best(0).getLong(1))
        val merged = pair.replace(" ", "")
        merges += Row(it.toLong, pair, merged, pc)
        // NO per-iteration checkpoint (r15): each checkpoint was one
        // extra Spark job per merge, and the lineage it truncated is just
        // i literal `replace` projections over the ALREADY-checkpointed
        // v0 — re-evaluating them inside the next argmax job is a few
        // codegen'd string ops per vocab row, far cheaper than a
        // scheduled job (8 merges → 8 fewer jobs per trained gate)
        vocab = vocab
          .withColumn("seq", replace(col("seq"),
            lit(" " + pair.replace(" ", "  ") + " "),
            lit(" " + merged + " ")))
      }
    }
    (merges.result(), vocab)
  }

  def bpeMerges(docs: DataFrame, nMerges: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    val (merges, _) = train(docs, nMerges)
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges, 1),
      StructType(Seq(
        StructField("iter", LongType, nullable = false),
        StructField("pair", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
      .orderBy("iter")
  }

  /** Corpus encoding under the trained merge table — the APPLY side of the
    * tokenizer loop (train → encode → audit), i.e. what actually runs over
    * 100 TB once training finishes. The final word-frequency table from
    * [[train]] already carries each word TYPE's encoded symbol sequence,
    * so encoding the corpus is a join, never a re-tokenization: recover the
    * word key by stripping the delimiter spaces from `seq` (symbols
    * concatenate back to the word by construction), count its symbols, and
    * join each doc's token multiset against that |vocab|-row table — the
    * doc side shuffles on the token key once, the vocab side is tiny (at
    * worst |vocab| ≪ corpus; broadcast-able in practice).
    *
    * Output per doc: exact int64 word/char/BPE-token counts and the one
    * IEEE division `bpe_per_word` — the FERTILITY number (tokens-per-word)
    * tokenizer evaluations report, here from the real trained tokenizer
    * rather than the chars/4 rule-of-thumb of `q_token_counts`. */
  def bpeEncode(docs: DataFrame, nMerges: Int = 8): DataFrame = {
    val (_, vocab) = train(docs, nMerges)
    val wordSyms = vocab.select(
      replace(col("seq"), lit(" "), lit("")).as("tok"),
      size(filter(split(col("seq"), "  "), x => x =!= ""))
        .cast("long").as("n_sym"))
    val docToks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) >= 1)
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("m"))
    docToks.join(wordSyms, "tok")
      .groupBy("doc_id")
      .agg(sum(col("m")).as("n_words"),
        sum(col("m") * length(col("tok")).cast("long")).as("n_chars"),
        sum(col("m") * col("n_sym")).as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        col("n_bpe_tokens"),
        (col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
          .as("bpe_per_word"))
      .orderBy("doc_id")
  }

  /** The DuckDB twin: the same merge loop unrolled as chained CTEs (one
    * pair-count + argmax + replace block per iteration), so the oracle is
    * derived from the iteration count, not hand-kept in sync. Every chained
    * CTE is MATERIALIZED: v_i is referenced twice (s_{i+1} and v_{i+1}), so
    * default inlining would re-expand the chain 2^n times.
    *
    * [[chainSql]] is the shared WITH-body (v0 … v_n, b_1 … b_n) both the
    * merge-table oracle and the encode oracle read from — one derivation,
    * two gated consumers. */
  def chainSql(nMerges: Int = 8): String = {
    val blocks = (1 to nMerges).map { i =>
      val prev = s"v${i - 1}"
      s"""s$i AS MATERIALIZED (SELECT cnt, list_filter(string_split(seq, '  '), x -> x <> '') AS syms FROM $prev),
         |p$i AS (SELECT syms[CAST(u.i AS INTEGER)] || ' ' || syms[CAST(u.i AS INTEGER) + 1] AS pair, cnt
         |          FROM s$i, LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)),
         |pc$i AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count FROM p$i GROUP BY pair),
         |b$i AS MATERIALIZED (SELECT CAST($i AS BIGINT) AS iter, pair, replace(pair, ' ', '') AS merged, pair_count
         |          FROM pc$i ORDER BY pair_count DESC, pair LIMIT 1),
         |v$i AS MATERIALIZED (SELECT cnt,
         |               replace(seq, ' ' || replace((SELECT pair FROM b$i), ' ', '  ') || ' ',
         |                            ' ' || (SELECT merged FROM b$i) || ' ') AS seq
         |          FROM $prev)""".stripMargin
    }.mkString(",\n")
    s"""w AS (SELECT unnest(string_split(text, ' ')) AS tok
       |             FROM '<sfDir>/documents.parquet'),
       |v0 AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
       |              '  ' || regexp_replace(tok, '(.)', '\\1  ', 'g') AS seq
       |         FROM w WHERE length(tok) >= 1 GROUP BY tok),
       |$blocks""".stripMargin
  }

  def oracleSql(nMerges: Int = 8): String = {
    val union = (1 to nMerges).map(i => s"SELECT * FROM b$i").mkString(" UNION ALL ")
    s"""WITH ${chainSql(nMerges)}
       |SELECT iter, pair, merged, pair_count FROM ($union) ORDER BY iter""".stripMargin
  }

  /** Encode oracle: the final vocab CTE v_n maps back to (word, n_sym)
    * exactly as the Spark side does — strip delimiter spaces to recover the
    * word, count non-empty symbols — then joins the per-doc token multiset.
    * Same chain as [[oracleSql]], so the two gates share one derivation. */
  def encodeOracleSql(nMerges: Int = 8): String =
    s"""WITH ${chainSql(nMerges)},
       |enc AS (SELECT replace(seq, ' ', '') AS tok,
       |               CAST(len(list_filter(string_split(seq, '  '), x -> x <> '')) AS BIGINT) AS n_sym
       |          FROM v$nMerges),
       |dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |         FROM '<sfDir>/documents.parquet'),
       |dm AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS m
       |         FROM dt WHERE length(tok) >= 1 GROUP BY doc_id, tok)
       |SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_words,
       |       CAST(SUM(m * length(dm.tok)) AS BIGINT) AS n_chars,
       |       CAST(SUM(m * n_sym) AS BIGINT) AS n_bpe_tokens,
       |       CAST(SUM(m * n_sym) AS DOUBLE) / CAST(SUM(m) AS DOUBLE) AS bpe_per_word
       |  FROM dm JOIN enc ON dm.tok = enc.tok
       | GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
