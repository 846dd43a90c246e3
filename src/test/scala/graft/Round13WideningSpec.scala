package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DataQuality, Retrieval, Sq8}

/** Round-13 widening: BM25 retrieval + RAG packing, the SQ8 quantized
  * ANN tier, and the per-source token-drift monitor. The hash gates pin
  * the values on the real corpus; these specs pin the SEMANTICS on
  * constructed inputs where the expected behavior is derivable by hand. */
class Round13WideningSpec extends AnyFunSuite with SharedSpark {

  private def docsOf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  // ---- BM25 ----

  test("bm25: a matching doc outranks a non-matching one; ranks are contiguous") {
    // terms are word BIGRAMS: the query doc carries the phrase
    // "zebra stripes"; docs 10/11 contain that exact phrase, 12 does not
    // (it has both words but never adjacent — phrase retrieval semantics)
    val docs = docsOf(
      0L -> "zebra stripes query words",
      10L -> "the zebra stripes shine",
      11L -> "zebra stripes zebra stripes twice",
      12L -> "zebra likes bold stripes",
      13L -> "filler so idf stays sane", 14L -> "more filler text rows",
      15L -> "yet another filler doc", 16L -> "and one more filler entry",
      17L -> "extra rows for cap room", 18L -> "still more corpus mass",
      19L -> "tail filler to widen n")
    val out = Retrieval.bm25TopK(docs, nq = 1, qTerms = 6, k = 10,
      dfCapDen = 1L).collect() // tiny toy corpus: no fractional cap
    val byDoc = out.map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(byDoc.contains(10L) && byDoc.contains(11L),
      s"docs sharing the query term must be retrieved: ${out.toSeq}")
    assert(!byDoc.contains(12L),
      "a doc sharing no query term must not appear")
    val ranks = out.filter(_.getLong(0) == 0L).map(_.getLong(3)).sorted
    assert(ranks.toSeq === (1L to ranks.length).toSeq, "contiguous ranks")
  }

  test("bm25 length normalization: equal tf, shorter doc scores higher") {
    val filler = (20L to 40L).map(i => i -> s"pad_$i common filler words")
    // same bigram "needle probe" once in each; 11 is much longer
    val docs = docsOf((Seq(
      0L -> "needle probe query",
      10L -> "needle probe short",
      11L -> ("needle probe " + Seq.tabulate(30)(i => s"long_$i").mkString(" "))) ++
      filler): _*)
    val out = Retrieval.bm25TopK(docs, nq = 1, qTerms = 6, k = 10,
        dfCapDen = 1L).collect()
      .filter(_.getLong(0) == 0L).map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out(10L) > out(11L),
      s"same tf=1 for 'needle': the 2-token doc must outscore the 31-token doc ($out)")
  }

  test("ragPack: duplicate retrieved texts collapse to the best rank; budget cuts a prefix") {
    val docs = docsOf(
      0L -> "needle probe query",
      10L -> "needle probe text one", // dup pair: same text, ids 10 < 11
      11L -> "needle probe text one",
      12L -> ("needle probe " + Seq.tabulate(300)(i => s"w_$i").mkString(" ")),
      13L -> "needle probe beta words",
      14L -> "filler one", 15L -> "filler two", 16L -> "filler three",
      17L -> "filler four", 18L -> "filler five", 19L -> "filler six")
    val out = Retrieval.ragPack(docs, nq = 1, qTerms = 6, k = 10, budget = 20L,
      dfCapDen = 1L).collect()
    val ids = out.map(_.getLong(1)).toSet
    assert(!(ids.contains(10L) && ids.contains(11L)),
      "identical retrieved texts must collapse to one survivor")
    // packed flag: cumulative sums are monotone; every packed row fits,
    // and no packed row follows an unpacked one (prefix property)
    val rows = out.filter(_.getLong(0) == 0L).sortBy(_.getLong(2))
    val packedFlags = rows.map(_.getBoolean(5))
    assert(packedFlags.sliding(2).forall(p => p.length < 2 || p(0) || !p(1)),
      s"packed must be a rank prefix: ${rows.toSeq}")
    rows.filter(_.getBoolean(5)).foreach(r =>
      assert(r.getLong(4) <= 20L, s"packed row over budget: $r"))
  }

  // ---- SQ8 ----

  private def embOf(rows: (Long, Seq[Double])*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "emb")
  }

  test("sq8 codes: range [0,255], endpoints exact, constant dims encode 0") {
    val emb = embOf(
      0L -> Seq(0.0, -1.0, 7.0),
      1L -> Seq(51.0, 1.0, 7.0),
      2L -> Seq(102.0, 3.0, 7.0))
    val codes = Sq8.codes(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(codes.forall { case (_, _, c) => c >= 0L && c <= 255L })
    val byKey = codes.map { case (v, p, c) => (v, p) -> c }.toMap
    assert(byKey((0L, 0L)) === 0L && byKey((2L, 0L)) === 255L,
      "min and max of a dimension must encode 0 and 255")
    assert(byKey((1L, 0L)) === 128L, "midpoint encodes round(127.5) = 128")
    assert(Seq(0L, 1L, 2L).forall(v => byKey((v, 2L)) === 0L),
      "a constant dimension encodes 0")
  }

  test("sq8 topK reproduces exact L2 ranking on grid-aligned vectors") {
    // values sit exactly on the 255-step grid of [0, 255] per dim, so
    // quantization is LOSSLESS and code-L2 == true L2 exactly
    val emb = embOf(
      0L -> Seq(0.0, 0.0), 1L -> Seq(10.0, 0.0), 2L -> Seq(0.0, 20.0),
      3L -> Seq(100.0, 100.0), 4L -> Seq(255.0, 0.0), 5L -> Seq(0.0, 255.0),
      6L -> Seq(255.0, 255.0))
    val out = Sq8.topK(emb, nQueries = 1, k = 6).collect()
      .filter(_.getLong(0) == 0L).sortBy(_.getLong(3)).map(_.getLong(1))
    assert(out.toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L),
      "lossless quantization must rank exactly as L2")
    val recall = Sq8.recall(emb, nQueries = 1, k = 6).collect()
    assert(recall.head.getDouble(2) === 1.0, "lossless grid => recall 1.0")
  }

  // ---- the persisted lexicon ----

  test("lexicon: serve refuses an unpublished artifact; prunes to the query terms' buckets") {
    val docs = docsOf(
      0L -> "needle probe query",
      10L -> "needle probe alpha", 11L -> "needle probe beta gamma",
      12L -> "unrelated words entirely", 13L -> "more unrelated filler",
      14L -> "padding one", 15L -> "padding two")
    val lex = java.nio.file.Files.createTempDirectory("graft_r13_lex").toString
    val e = intercept[IllegalStateException](
      graft.operators.Retrieval.bm25Served(docs, lex))
    assert(e.getMessage.contains("no published lexicon"))
    graft.operators.Retrieval.persistLexicon(docs, lex, dfCapDen = 1L)
    val served = graft.operators.Retrieval.bm25Served(docs, lex, nq = 1)
    val expected = served.collect().toSeq
    assert(expected.map(_.getLong(1)).toSet === Set(10L, 11L),
      s"only needle-bearing docs retrieve: $expected")
    // partition-pruning semantics: delete every posting bucket the query
    // terms do NOT hash to — the serve must not notice (it never reads
    // them); pruning is what makes a 100 TB posting table affordable
    val needed = graft.operators.Retrieval
      .queryBucketsForTest(docs, lex, nq = 1)
    val postingsDir = graft.operators.Retrieval
      .lexTableDirForTest(spark, lex, "postings")
    val fs = new org.apache.hadoop.fs.Path(lex)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(postingsDir))
      .filter(_.isDirectory)
      .filterNot(st => needed.exists(b => st.getPath.getName == s"bucket=$b"))
      .foreach(st => assert(fs.delete(st.getPath, true)))
    assert(graft.operators.Retrieval.bm25Served(docs, lex, nq = 1)
      .collect().toSeq === expected,
      "serving must only touch the query terms' buckets")
  }

  test("lexicon upsert: new docs retrieve, collection statistics stay frozen") {
    val base = docsOf(
      0L -> "needle probe query",
      10L -> "needle probe alpha", 12L -> "unrelated words entirely",
      13L -> "more unrelated filler", 14L -> "padding one")
    val delta = docsOf(20L -> "needle probe fresh arrival")
    val lex = java.nio.file.Files.createTempDirectory("graft_r13_lexup").toString
    graft.operators.Retrieval.persistLexicon(base, lex, dfCapDen = 1L)
    def tableDir(t: String) =
      graft.operators.Retrieval.lexTableDirForTest(spark, lex, t)
    val statsBefore = spark.read.parquet(tableDir("stats")).collect().toSeq
    val vocabBefore = spark.read.parquet(tableDir("vocab")).collect().toSeq
    assert(graft.operators.Retrieval.upsertLexicon(delta, lex,
      deliveryId = "d1") === "append")
    assert(spark.read.parquet(tableDir("stats")).collect().toSeq === statsBefore,
      "upsert must not touch (N, S)")
    assert(spark.read.parquet(tableDir("vocab")).collect().toSeq === vocabBefore,
      "upsert must not touch (df, idf)")
    val all = base.union(delta)
    val ids = graft.operators.Retrieval.bm25Served(all, lex, nq = 1)
      .collect().map(_.getLong(1)).toSet
    assert(ids.contains(20L), "the upserted doc must be retrievable")
  }

  // ---- token drift ----

  test("token drift: a source distributed like the corpus reads ~0; a disjoint one reads its mass complement") {
    import spark.implicits._
    // source A: 30 tokens all 'x'; source B: 10 tokens all 'y'
    // corpus: {x: 30, y: 10} — TVD(A, corpus) = 10/40, TVD(B, corpus) = 30/40
    val docs = (Seq.tabulate(3)(i => (i.toLong, Seq.fill(10)("x").mkString(" "), "A")) ++
      Seq((3L, Seq.fill(10)("y").mkString(" "), "B")))
      .toDF("doc_id", "text", "source")
    val out = DataQuality.tokenDriftBySource(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (na, numA, tvdA) = out("A")
    val (nb, numB, tvdB) = out("B")
    assert(na === 30L && nb === 10L)
    // numerator = Σ_t |S_all·c_src − S_src·c_all|, S_all = 40
    // A: t=x |40·30 − 30·30| = 300; t=y |0 − 30·10| = 300 → 600
    //    tvd = 600 / (2·40·30) = 0.25
    assert(numA === 600L && tvdA === 0.25)
    // B: t=x |0 − 10·30| = 300; t=y |40·10 − 10·10| = 300 → 600
    //    tvd = 600 / (2·40·10) = 0.75
    assert(numB === 600L && tvdB === 0.75)
  }
}
