package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Constraint-audit surface: the validation pass a pipeline runs BEFORE
  * training on a freshly-landed corpus (dbt-test / Deequ shape). Each check
  * reports (rows examined, violations) so a clean table is a positive
  * assertion, not an absence of output — and the all-zero case still hashes
  * meaningfully against the oracle because n_rows rides along.
  *
  * Every check is one narrow scan + count or one key anti-join:
  *  - referential integrity (orders→customer, lineitem→orders) as
  *    left_anti equi-joins — at cluster scale these share the join key
  *    shuffles the real queries need anyway, and a broadcast dimension
  *    makes the FK probe shuffle-free;
  *  - primary-key uniqueness as a groupBy-count (map-side partials
  *    collapse the key space before the exchange);
  *  - domain/nullness checks as pure filters (pushed to the scan).
  * The union of |checks| 1-row aggregates is driver-trivial at any scale.
  */
object DataQuality {

  /** Unfold a single-row per-table aggregate into (check_name, n_rows,
    * n_bad) rows — `specs` = (name, n_rows column, n_bad column). The
    * coalesce keeps the empty-table case a positive zero, matching the
    * count-of-empty-filter semantics the unfused form had. */
  private def checkRows(agg: DataFrame,
                        specs: (String, String, String)*): DataFrame =
    agg.select(explode(array(specs.map { case (nm, nc, bc) =>
      struct(lit(nm).as("check_name"),
        coalesce(col(nc), lit(0L)).as("n_rows"),
        coalesce(col(bc), lit(0L)).as("n_bad"))
    }: _*)).as("k")).select(col("k.*"))

  private def badWhen(cond: Column): Column =
    coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L))

  def audit(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Sources.table(spark, sfDir, "orders")
    val customer = Sources.table(spark, sfDir, "customer")
    val lineitem = Sources.table(spark, sfDir, "lineitem")
    val events = Sources.events(spark, sfDir)
    val docs = Sources.documents(spark, sfDir)

    // ONE pass per table (r9 verdict #6's fusion sweep: the unfused form
    // paid 30 stages — 9 checks x 2 single-row aggregates, lineitem
    // scanned four times — for a sub-second answer; at 100 TB those are
    // full-corpus scans). Each check keeps its exact unfused semantics:
    // FK violations count ROWS without a parent, PK violations count KEYS
    // with multiplicity > 1, domain checks count rows — so the oracle SQL
    // is untouched and the hash gate carries over.

    // customer: the key-multiplicity table serves BOTH the pk check and,
    // key-distinct by construction, the orders FK probe (a left join
    // against it cannot multiply orders rows even if customer keys dup)
    val custKeys = customer.groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // consumed by custAgg AND the orders FK probe
    val custAgg = custKeys.agg(
      coalesce(sum(col("c")), lit(0L)).as("n"),
      badWhen(col("c") > 1).as("dup"))

    // orders: broadcast FK probe + pk groupBy fused in one pass; the keyed
    // table is reused (key-distinct) as the lineitem FK probe's right side.
    // localCheckpoint so the reuse is REAL — ordAgg and liAgg both consume
    // it, and without the checkpoint each union branch would recompute the
    // orders scan + broadcast join (exchange reuse across branches is not
    // guaranteed once projections differ); |orders| keyed rows, eager,
    // freed by the ContextCleaner when the plan is GC'd
    val ordKeys = orders.join(broadcast(custKeys.select(col("c_custkey"))),
        orders("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("fkbad"))
      .localCheckpoint()
    val ordAgg = ordKeys.agg(
      coalesce(sum(col("c")), lit(0L)).as("n"),
      coalesce(sum(col("fkbad")), lit(0L)).as("fk_bad"),
      badWhen(col("c") > 1).as("dup"))

    // lineitem (the big table): FK probe and both domain checks in the
    // single scan the join needs anyway
    val liAgg = lineitem.join(ordKeys.select(col("o_orderkey").as("fk_ok")),
        lineitem("l_orderkey") === col("fk_ok"), "left")
      .agg(count(lit(1)).as("n"),
        badWhen(col("fk_ok").isNull).as("fk_bad"),
        badWhen(col("l_discount") < 0.0 || col("l_discount") > 1.0).as("disc_bad"),
        badWhen(col("l_quantity") <= 0.0).as("qty_bad"))

    val evAgg = events.agg(count(lit(1)).as("n"),
      badWhen(col("props").isNull || col("props") === "").as("props_bad"),
      // the generator's declared coverage window (TESTDATA.md): Jan 2024
      badWhen(col("ts") < 1704067200000000000L ||
        col("ts") >= 1706745600000000000L).as("ts_bad"))

    val docAgg = docs.agg(count(lit(1)).as("n"),
      badWhen(col("text").isNull || length(col("text")) === 0).as("text_bad"))

    Seq(
      checkRows(custAgg, ("customer_pk_unique", "n", "dup")),
      checkRows(ordAgg,
        ("orders_fk_customer", "n", "fk_bad"),
        ("orders_pk_unique", "n", "dup")),
      checkRows(liAgg,
        ("lineitem_fk_orders", "n", "fk_bad"),
        ("lineitem_discount_domain", "n", "disc_bad"),
        ("lineitem_qty_positive", "n", "qty_bad")),
      checkRows(evAgg,
        ("events_props_present", "n", "props_bad"),
        ("events_ts_in_window", "n", "ts_bad")),
      checkRows(docAgg, ("docs_text_nonempty", "n", "text_bad")))
      .reduce(_.unionAll(_)).orderBy("check_name")
  }

  /** Schema-drift canary for the documents table — the r6 lesson
    * (events.ts silently changed physical type and took out 9 queries)
    * applied to the second extension table: one aggregate that pins the
    * column surface AND the semantic invariant `n_chars == length(text)`
    * (n_bad_nchars rides along, so metadata drifting out of sync with the
    * text fails the hash, not just the row count). A type change in any
    * probed column breaks this one query loudly at the next verify. */
  def docMeta(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("doc_id")).as("n_ids"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      sum(col("n_chars")).as("total_chars"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
        .as("n_bad_nchars"))

  /** Schema-drift canary for the embeddings table: vector count, dimension
    * envelope, label domain, and a value probe (Σ floor(1024·first
    * element) — exact after the float→double promotion both engines share)
    * that trips on precision or layout drift, not just shape drift. */
  def embDims(emb: DataFrame): DataFrame =
    emb.agg(
      count(lit(1)).as("n_vecs"),
      countDistinct(col("vec_id")).as("n_ids"),
      min(size(col("emb"))).cast("long").as("min_dim"),
      max(size(col("emb"))).cast("long").as("max_dim"),
      countDistinct(col("label")).as("n_labels"),
      sum(floor(element_at(col("emb"), 1) * 1024.0)).cast("long")
        .as("probe_sum"))

  /** Exact two-sample Kolmogorov-Smirnov statistic between the train and
    * holdout splits' document-length distributions — the distribution-
    * drift gate: a hash split SHOULD make both sides identically
    * distributed, so a large KS here means the split key correlates with
    * content (or the corpus snapshot shifted between split assignments) and
    * eval numbers won't transfer. All in the engine's exact-integer
    * discipline: per distinct length, side counts are int64; the CDF gap
    * is compared via cross-multiplication (|cum_tr·n_ho − cum_ho·n_tr|,
    * products bounded by n_tr·n_ho — fine to ~3·10⁹ docs a side, and the
    * per-side counts would move to DECIMAL(38,0) beyond that), so the max
    * is over exact integers and only the final KS value divides.
    *
    * Scale shape: the corpus collapses map-side to one row per distinct
    * length before anything global happens; the running-sum window then
    * runs on that |distinct lengths| table — bounded by the length domain
    * (thousands), NOT by corpus rows, which is why a single-partition
    * window is the honest plan here and not a scale smell. Output: one row
    * (n_train, n_holdout, d_scaled, ks). */
  def splitDrift(docs: DataFrame): DataFrame = {
    val sided = docs.select(col("n_chars"),
      (graft.functions.Hashes.h60(col("doc_id").cast("string")) % 10 < 8)
        .as("is_tr"))
    val perLen = sided.groupBy("n_chars").agg(
      sum(when(col("is_tr"), 1L).otherwise(0L)).as("c_tr"),
      sum(when(!col("is_tr"), 1L).otherwise(0L)).as("c_ho"))
    val w = Window.orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perLen.select(
      sum(col("c_tr")).over(w).as("cum_tr"),
      sum(col("c_ho")).over(w).as("cum_ho"))
    val tot = perLen.agg(sum(col("c_tr")).as("n_train"),
      sum(col("c_ho")).as("n_holdout"))
    cum.crossJoin(broadcast(tot))
      .select(col("n_train"), col("n_holdout"),
        abs(col("cum_tr") * col("n_holdout") - col("cum_ho") * col("n_train"))
          .as("gap"))
      .groupBy("n_train", "n_holdout")
      .agg(max(col("gap")).as("d_scaled"))
      .select(col("n_train"), col("n_holdout"), col("d_scaled"),
        (col("d_scaled").cast("double") /
          (col("n_train") * col("n_holdout")).cast("double")).as("ks"))
  }

  /** Per-source token-distribution drift — the corpus-side twin of the
    * index family's [[Imi.indexDrift]] gauge: for each `source`, the
    * total-variation distance between that source's token distribution
    * and the whole corpus's. This is the monitor a training-data
    * pipeline runs per ingest feed — a source whose language/topic mix
    * shifts shows up here before any downstream metric moves.
    *
    * Determinism: the exact-integer TVD form (the `q_index_drift`
    * idiom) — numerator Σ_t |S_all·c_src(t) − S_src·c_all(t)| is an
    * order-free int64 sum over the corpus vocabulary (c_src = 0 for
    * tokens the source lacks, so the corpus vocab IS the union), and the
    * only double is the single final division by 2·S_all·S_src.
    *
    * Scale shape: two hash aggregations over the token stream (per-token
    * corpus counts, per-(source, token) counts) + one join on tok —
    * map-side partials carry the load; the join is |vocab|·|sources| at
    * worst. Output (source, n_tokens, tvd_num, tvd) ordered by source. */
  def tokenDriftBySource(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(docs.select(col("doc_id"), col("text")))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val cAll = toks.groupBy("tok").agg(count(lit(1)).as("c_all"))
    val cSrc = toks.groupBy("source", "tok").agg(count(lit(1)).as("c_src"))
    val sAll = cAll.agg(sum(col("c_all")).as("s_all"))
    val sSrc = cSrc.groupBy("source").agg(sum(col("c_src")).as("s_src"))
    // left join FROM the corpus vocab per source: missing (source, tok)
    // pairs contribute |0 - s_src*c_all| = s_src*c_all via coalesce
    cAll.crossJoin(broadcast(sSrc))
      .join(cSrc, Seq("source", "tok"), "left")
      .crossJoin(broadcast(sAll))
      .select(col("source"), col("s_src"), col("s_all"),
        abs(col("s_all") * coalesce(col("c_src"), lit(0L)) -
          col("s_src") * col("c_all")).as("gap"))
      .groupBy("source", "s_src", "s_all")
      .agg(sum(col("gap")).as("tvd_num"))
      .select(col("source"), col("s_src").as("n_tokens"), col("tvd_num"),
        (col("tvd_num").cast("double") /
          (lit(2.0) * col("s_all").cast("double") * col("s_src").cast("double")))
          .as("tvd"))
      .orderBy("source")
  }

  /** Embedding norm histogram — the normalization audit for a vector
    * corpus: cosine-based ANN assumes unit-ish norms, and a bimodal or
    * heavy-tailed norm histogram is the first sign of mixed encoders or
    * corrupted vectors. Squared norms avoid any sqrt: ‖v‖² is one
    * [[graft.functions.DotProduct]] codegen'd fold (self-dot — the same
    * left-to-right IEEE order every ANN oracle already pins), buckets are
    * floor(64·‖v‖²) exactly, counts exact int64, one narrow projection +
    * |buckets| hash aggregation. Output (bucket, n_vecs, min_sq, max_sq). */
  def embNorms(emb: DataFrame): DataFrame =
    emb.select(graft.functions.DotProduct.dot(col("emb"), col("emb")).as("sq"))
      .select(col("sq"), floor(col("sq") * 64.0).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"),
        min(col("sq")).as("min_sq"), max(col("sq")).as("max_sq"))
      .orderBy("bucket")

  /** Upper-triangle quantized covariance pass — the fit step of PCA /
    * whitening / decorrelation, i.e. what [[dimStats]] is to per-dim
    * standardization this is to cross-dim structure. The n·d²/2 product
    * incidence is the intrinsic cost of a covariance estimate; the shape
    * keeps it honest at 100 TB: products are built IN ROW (quantize once
    * per vector, explode (i, j≥i) pairs from the row's own array — rows
    * multiply only at the explode feeding a partial aggregate) and the
    * exchange carries exactly d(d+1)/2 cells of map-side-combined int64
    * partials. Products of floor(1024·v) quantizations bound at ~2²⁰ per
    * cell term, so 2⁴⁰ corpus terms stay inside int64. The d-row mean
    * table joins back twice (broadcast) for the centered covariance; the
    * subtraction `qq/n − (qi/n)(qj/n)` is the one FP expression, pinned
    * operand-for-operand in the oracle. Output
    * (dim_i, dim_j, n, qq_sum, cov_q) over j ≥ i. */
  def embCovariance(emb: DataFrame): DataFrame = {
    val q = emb.select(transform(col("emb"),
      v => floor(v * lit(1024.0)).cast("long")).as("qs"))
    val pairs = q
      .select(col("qs"), posexplode(col("qs")).as(Seq("i", "qi")))
      .select(col("i").cast("long").as("dim_i"), col("qi"),
        posexplode(slice(col("qs"), col("i") + 1, size(col("qs")) - col("i")))
          .as(Seq("j", "qj")))
      .select(col("dim_i"), (col("dim_i") + col("j").cast("long")).as("dim_j"),
        (col("qi") * col("qj")).as("p"))
    val cells = pairs.groupBy("dim_i", "dim_j")
      .agg(count(lit(1)).as("n"), sum(col("p")).as("qq_sum"))
    val means = q.select(posexplode(col("qs")).as(Seq("pos", "qv")))
      .groupBy(col("pos").cast("long").as("dim"))
      .agg(sum(col("qv")).as("q_sum"))
    cells
      .join(broadcast(means.select(col("dim").as("dim_i"),
        col("q_sum").as("si"))), "dim_i")
      .join(broadcast(means.select(col("dim").as("dim_j"),
        col("q_sum").as("sj"))), "dim_j")
      .select(col("dim_i"), col("dim_j"), col("n"), col("qq_sum"),
        (col("qq_sum").cast("double") / col("n").cast("double") -
          (col("si").cast("double") / col("n").cast("double")) *
            (col("sj").cast("double") / col("n").cast("double"))).as("cov_q"))
      .orderBy("dim_i", "dim_j")
  }

  /** Per-dimension embedding statistics — the fit pass of feature
    * normalization (standardization, whitening, per-dim clipping all
    * consume exactly this table). One in-row posexplode into a |dims|-key
    * hash aggregation: at 100 TB the incidence is n·d rows but every
    * partial aggregates map-side down to d rows before the (tiny, d-row)
    * exchange — the cheapest shape a full-corpus moment pass can have.
    *
    * Moment sums follow the engine's exact-integer discipline: values
    * quantize to q = floor(1024·v) (float→double promotion is exact, one
    * multiply + floor), and Σq / Σq² accumulate as order-free int64 —
    * |q| ≤ ~2¹⁰·|v|, so with unit-scale embeddings q² ≤ ~2²⁰ and even
    * 2⁴⁰ corpus cells stay 2²³ under the int64 edge. min/max are exact
    * over doubles (no accumulation). The one IEEE op per output row is the
    * mean division. Output (dim, n, q_sum, q2_sum, min_v, max_v, mean_q). */
  def dimStats(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("emb")).as(Seq("pos", "v")))
      .select(col("pos").cast("long").as("dim"), col("v"),
        floor(col("v") * 1024.0).cast("long").as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("q_sum"),
        sum(col("q") * col("q")).as("q2_sum"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .select(col("dim"), col("n"), col("q_sum"), col("q2_sum"),
        col("min_v"), col("max_v"),
        (col("q_sum").cast("double") / col("n").cast("double")).as("mean_q"))
      .orderBy("dim")

  /** Per-source corpus checksums — the content-integrity artifact a
    * replication/migration pass compares on both ends ("did the copy land
    * bit-identical"), and the per-slice provenance line a dataset release
    * publishes. Per source: doc count, an ORDER-FREE 60-bit content
    * fingerprint (bit_xor of per-doc md5-derived text hashes — XOR is
    * commutative/associative with no overflow, so the checksum is
    * invariant to partitioning, task retries and row order, exactly the
    * properties a distributed integrity check needs), and the exact char
    * volume. One map-side-combined hash aggregation over |sources| keys;
    * the hash projection is codegen'd. Null texts are skipped by both
    * engines' aggregate null semantics — identically. */
  def sourceChecksums(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        graft.functions.Hashes.h60(col("text")).as("h"), col("n_chars"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(h)").as("xor_fp"),
        sum(col("n_chars")).as("chars_sum"))
      .orderBy("source")

  /** ANALYZE-style column statistics — the table profile a cost-based
    * optimizer (and every human debugging a bad plan) reads: per column,
    * row count, null count, EXACT distinct count, and min/max rendered as
    * strings so one fixed schema covers every column type. Each column's
    * stats are one aggregation; the union of |columns| single-row frames
    * is driver-trivial. Exact ndv is the AUDIT-time choice here because
    * the gate needs determinism — the deployed CBO path would swap in the
    * [[graft.operators.Sketches]] HLL (same query shape, sketch-sized
    * state), which is exactly the swap the statistics consumer never
    * notices. At scale each stat pass is map-side combined; min/max/count
    * never shuffle more than partial aggregates. */
  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("ndv"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("ndv"), col("min_s"), col("max_s"))
    }.reduce(_ unionByName _).orderBy("column")

  /** Contract instance over the documents table's scalar columns. */
  def docStats(spark: SparkSession, sfDir: String): DataFrame =
    tableStats(Sources.documents(spark, sfDir),
      Seq("doc_id", "lang", "source", "n_chars"))

  /** Generic snapshot diff — the change-data-capture primitive ("what
    * changed between corpus v1 and v2") every incremental pipeline keys
    * retraining and cache invalidation off: full-outer join on the key,
    * classify each row by comparing 60-bit content fingerprints, roll up
    * to per-change-type counts. One key-partitioned shuffle each side; the
    * fingerprint projection is codegen'd, so the exchange carries
    * (key, 8 bytes) per row, never the payload — the property that makes
    * a 100 TB diff affordable. Null content hashes are sentinel-coalesced
    * by the CALLER (a null would masquerade as presence-absence here). */
  def tableDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
                content: Column): DataFrame = {
    val o = oldDf.select(col(key).as("k"), content.as("h_old"))
    val n = newDf.select(col(key).as("k"), content.as("h_new"))
    o.join(n, Seq("k"), "full_outer")
      .select(when(col("h_old").isNull, "added")
        .when(col("h_new").isNull, "removed")
        .when(col("h_old") === col("h_new"), "unchanged")
        .otherwise("changed").as("change_type"))
      .groupBy("change_type").agg(count(lit(1)).as("n"))
      .orderBy("change_type")
  }

  /** Contract instance of [[tableDiff]]: v2 of the documents corpus is
    * DERIVED deterministically (the same fixture discipline as points2d) —
    * 1-in-20 docs deleted, 1-in-10 survivors text-revised, 1-in-25 docs
    * re-added under offset ids — so all four change classes are non-vacuous
    * and the DuckDB twin rebuilds the identical v2. */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    def k(salt: String): Column = graft.functions.Hashes.h60(
      concat(col("doc_id").cast("string"), lit(":" + salt)))
    val docs = Sources.documents(spark, sfDir).select("doc_id", "text")
    val kept = docs.filter(k("v2del") % 20 =!= 0)
    val revised = kept.withColumn("text",
      when(k("v2chg") % 10 === 0,
        concat(coalesce(col("text"), lit("")), lit(" [rev2]")))
        .otherwise(col("text")))
    val added = docs.filter(k("v2add") % 25 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    tableDiff(docs, revised.unionByName(added), "doc_id",
      coalesce(graft.functions.Hashes.h60(col("text")), lit(-1L)))
  }

  /** Precision/recall curve of a cheap classifier against corpus labels —
    * the calibration artifact every filter threshold decision reads
    * (CCNet-style: pick the operating point, THEN filter 100 TB). The
    * instance evaluated here: the English detector score
    * `⌊10⁶ · n_stop / n_tokens⌋` (the stopword list is English, so its
    * rate IS an en-vs-rest signal) against the true `lang = 'en'` label.
    *
    * Shape: one token aggregation per doc (integer-scaled score — floor
    * division, no float ratio, so bucketing is exact in any engine), bucket
    * scores into `binWidth` bins, then one cumulative window over the
    * |bins| ≤ ~21-row bucket table sweeping thresholds from strictest down
    * — predicted-positive = "score bucket ≥ b". Per-row precision/recall
    * are each ONE integer division (IEEE-exact same value cross-engine).
    * The heavy work is the per-doc aggregation; the curve itself is
    * driver-trivial at any corpus size. Output (bin, n, tp, fp, precision,
    * recall) ordered by bin desc = threshold sweep order. */
  def prCurve(docs: DataFrame, binWidth: Long = 50000L): DataFrame = {
    val scored = TextAnalysis.tokens(docs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("tok").isin("the", "a", "of", "and"), 1L)
          .otherwise(0L)).as("n_stop"))
      .join(docs.select(col("doc_id"),
        (col("lang") === "en").cast("long").as("pos")), "doc_id")
      .select((col("n_stop") * 1000000L).divide(col("n_tokens"))
        .cast("long").divide(binWidth).cast("long").as("bin"), col("pos"))
    val bins = scored.groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins
      .withColumn("tp", sum(col("n_pos")).over(w))
      .withColumn("fp", sum(col("n") - col("n_pos")).over(w))
      .crossJoin(scored.agg(sum(col("pos")).as("all_pos")))
      .select(col("bin"), col("n"), col("tp"), col("fp"),
        (col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .as("precision"),
        (col("tp").cast("double") / col("all_pos").cast("double"))
          .as("recall"))
      .orderBy(col("bin").desc)
  }

  /** Coverage-gap grid — the completeness audit a multi-source multilingual
    * corpus runs before mixture design: the FULL lang × source grid
    * (cross join of the two distinct axes — tiny by construction), each
    * cell's document count, and `missing` flagged where a combination has
    * no documents at all. The absent cells are the report's point — a
    * plain groupBy can only show what exists, never what's missing. At
    * scale the axes are |langs| and |sources| rows (both ≪ corpus), so
    * the grid is driver-trivial and the single corpus aggregation is
    * map-side combined. Output (lang, source, n_docs, missing) ordered
    * by (lang, source). */
  def coverageGaps(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("lang", "source").agg(count(lit(1)).as("c"))
    docs.select("lang").distinct()
      .crossJoin(docs.select("source").distinct())
      .join(counts, Seq("lang", "source"), "left")
      .select(col("lang"), col("source"),
        coalesce(col("c"), lit(0L)).as("n_docs"),
        col("c").isNull.as("missing"))
      .orderBy("lang", "source")
  }

  /** Robust per-source statistics — the profile that survives a corrupted
    * length field where mean/max do not: exact DISCRETE p01/p50/p99 of
    * n_chars per source (`percentile_disc` picks real elements, the same
    * cross-engine-exact choice as q_percentiles) plus the winsorized mean
    * with values clipped to [p01, p99] — computed as an exact integer
    * clipped sum over a second pass with the |sources|-row threshold
    * table broadcast back onto the scan, then ONE division. Two narrow
    * aggregations; nothing wider than |sources| shuffles. The discrete
    * order statistics are exact-at-audit; the 100 TB swap is the
    * quantile-sketch threshold pass, same shape. Output
    * (source, n, p01, p50, p99, wins_sum, wins_mean). */
  def robustStats(docs: DataFrame): DataFrame = {
    val thr = docs.groupBy("source").agg(
      count(lit(1)).as("n"),
      // percentile_disc RETURNS double even over an integer column; the
      // picked value is an actual element, so the long cast is lossless
      expr("CAST(percentile_disc(0.01) WITHIN GROUP (ORDER BY n_chars) AS LONG)")
        .as("p01"),
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS LONG)")
        .as("p50"),
      expr("CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n_chars) AS LONG)")
        .as("p99"))
    docs.select(col("source"), col("n_chars"))
      .join(broadcast(thr), "source")
      .groupBy(col("source"), col("n"), col("p01"), col("p50"), col("p99"))
      .agg(sum(greatest(col("p01"), least(col("p99"), col("n_chars"))))
        .as("wins_sum"))
      .select(col("source"), col("n"), col("p01"), col("p50"), col("p99"),
        col("wins_sum"),
        (col("wins_sum").cast("double") / col("n").cast("double"))
          .as("wins_mean"))
      .orderBy("source")
  }

  /** Right-to-be-forgotten audit — the evidence a deletion request (DSAR /
    * GDPR art. 17) actually landed: per source, counts before/after
    * removing the deletion list (here the deterministic stand-in
    * `doc_id % 101 == 0`; in production the request table), plus an XOR
    * fingerprint over the SURVIVORS' (doc_id, text) hashes — the
    * fingerprint, not the count, is what proves the deleted rows are gone
    * rather than merely uncounted, because a residual row flips it. One
    * map-side-combined aggregation; in deployment the deletion list is a
    * broadcast anti-join feeding the same audit shape, and the audit runs
    * as the post-delete verification pass over the rewritten files.
    * Output (source, n_before, n_deleted, n_after, xor_after). */
  def forgetAudit(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        graft.functions.Hashes.h60(
          concat_ws(":", col("doc_id"), col("text"))).as("h"),
        (col("doc_id") % 101 === 0).as("del"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("del"), 1L).otherwise(0L)).as("n_deleted"),
        sum(when(!col("del"), 1L).otherwise(0L)).as("n_after"),
        expr("bit_xor(CASE WHEN NOT del THEN h ELSE CAST(0 AS BIGINT) END)")
          .as("xor_after"))
      .orderBy("source")

  /** k-anonymity audit over the release metadata — the privacy screen a
    * corpus runs before publishing per-document attributes: every
    * quasi-identifier class (lang, source, n_chars bucketed to 100) with
    * its population and an `at_risk` flag for classes smaller than k. A
    * released row in a sub-k class is re-identifiable by its metadata
    * alone, so the release either suppresses those rows or widens the
    * bucket; this query is the evidence either way. One hash aggregate
    * over |classes| ≪ |docs| groups (map-side partials collapse each
    * partition to its class counts before the exchange), integer-only —
    * the same shape at 100 TB. Output (lang, source, len_bucket, n_docs,
    * at_risk) ordered by class. */
  def kAnonymity(docs: DataFrame, k: Long = 5L): DataFrame =
    docs
      .groupBy(col("lang"), col("source"),
        floor(col("n_chars") / 100L).cast("long").as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("lang"), col("source"), col("len_bucket"), col("n_docs"),
        (col("n_docs") < k).as("at_risk"))
      .orderBy("lang", "source", "len_bucket")

  /** Corpus-balance report per composition axis (lang, source) — the
    * diversity numbers a mixture designer reads before weighting: class
    * count, population, largest/smallest class, the dominant class share,
    * and Shannon entropy in WHOLE BITS via the same exact floor_log2
    * integer form as [[TextAnalysis.charEntropy]]/q_unigram
    * (`Σ n_c · (⌊log2 N⌋ − ⌊log2 n_c⌋)`, an order-free int64 sum — no
    * transcendental log, so the DuckDB twin is bit-identical). The two
    * doubles are each ONE integer division. Per axis this is one hash
    * aggregate to |classes| rows plus a driver-trivial rollup; axes are
    * independent scans unioned — at 100 TB each axis is a map-side
    * partial collapse, nothing wider than |classes| ever shuffles.
    * Output (axis, n_classes, n_docs, max_class, min_class, top_share,
    * entropy_bits, bits_per_doc) ordered by axis. */
  def diversity(docs: DataFrame): DataFrame = {
    def axis(name: String): DataFrame = {
      val classes = docs.groupBy(col(name).as("cls"))
        .agg(count(lit(1)).as("n_c"))
      classes
        .crossJoin(broadcast(classes.agg(
          (length(bin(sum(col("n_c")))) - 1).cast("long").as("tbits"))))
        .agg(
          count(lit(1)).as("n_classes"),
          sum(col("n_c")).as("n_docs"),
          max(col("n_c")).as("max_class"),
          min(col("n_c")).as("min_class"),
          sum(col("n_c") *
            (col("tbits") -
              (length(bin(col("n_c"))) - 1).cast("long"))).as("x"))
        .select(lit(name).as("axis"), col("n_classes"), col("n_docs"),
          col("max_class"), col("min_class"),
          (col("max_class").cast("double") / col("n_docs").cast("double"))
            .as("top_share"),
          col("x").as("entropy_bits"),
          (col("x").cast("double") / col("n_docs").cast("double"))
            .as("bits_per_doc"))
    }
    axis("lang").unionAll(axis("source")).orderBy("axis")
  }
}
