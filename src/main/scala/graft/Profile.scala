package graft


/** Plan inspection + timing harness: for each query name (args, or the
  * built-in hot list), runs the query cold and warm and optionally prints the
  * formatted physical plan (`SPARK_GRAFT_EXPLAIN=1`). The warm/cold split
  * separates codegen-compile fixed cost from actual execution. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    val spark = SparkLocal.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_minhash_lsh", "q_exact_outlier_count", "q_hw2_pipeline",
        "q_ngram_jaccard", "q_ann_ivf", "q_simhash_pairs",
        "q_prefix_jaccard", "q_pagerank", "q_triangles", "q_emb_lsh_pairs",
        "q_semdedup", "q_neardup_blocked", "q_ngram_containment",
        // r7 additions (r6 lesson: q_editdist_pairs shipped unprofiled at
        // 102 s warm) — every new pair-generating query joins this list
        // BEFORE it is declared done
        "q_editdist_pairs", "q_sorted_neighbors", "q_tfidf_pairs",
        "q_pq_codes", "q_pq_adc", "q_pq_recall", "q_ivfpq", "q_ivfpq_recall",
        "q_bpe_encode", "q_ngram_novelty", "q_top_spans", "q_source_overlap",
        "q_kcore", "q_heavy_hitters", "q_split_leakage", "q_corpus_build",
        "q_contam_attr", "q_ccnet_buckets")
    for (n <- names; fn <- SparkEntry.queries.get(n)) {
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      // min-of-N warm reps (default 1): the container's disk/CPU contention
      // swings single readings 2-10x; the min is the steady-state estimate
      val reps = math.max(1, scala.util.Try(
        sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "1").toInt).getOrElse(1))
      val warm = (1 to reps).map(_ => once()).min
      println(f"PROF $n%-24s cold=$cold%7.2f warm=$warm%7.2f")
      if (explain) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
