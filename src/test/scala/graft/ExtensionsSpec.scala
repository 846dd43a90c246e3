package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

class ExtensionsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val base =
    "the quick spark table scans a very large parquet file and the query joins rows of data"
  private val nearDup = base.replace("large", "big") // one-token edit
  private val docs = Seq(
    (1L, base, "en", "srcA", base.length.toLong),
    (2L, nearDup, "en", "srcA", nearDup.length.toLong),
    (3L, base, "en", "srcB", base.length.toLong), // exact dup of 1
    (4L, "le chat et la table et le vin et la nuit et le jour et la mer", "fr", "srcB", 62L),
    (5L, "der hund und die katze und der vogel und die maus und der baum", "de", "srcC", 62L),
    (6L, "completely different words about graph theory algorithms and topology proofs", "en", "srcC", 77L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup finds the duplicated text and summary is consistent") {
    val groups = Dedup.exactGroups(docs).collect()
    assert(groups.length == 1)
    assert(groups(0).getLong(1) == 1L && groups(0).getLong(2) == 2L) // keeper=1, n=2
    val s = Dedup.dedupSummary(docs).head()
    assert(s.getLong(0) == 6L && s.getLong(1) == 5L && s.getLong(2) == 1L)
  }

  test("minhash LSH surfaces exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)), "exact dup pair must collide in every band")
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)),
      "one-token near-dups share most shingles")
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L), "unrelated doc must not pair")
  }

  test("ngram jaccard and simhash agree that 1~2 are near and 6 is far") {
    val jac = Dedup.ngramJaccardPairs(docs, dfCap = 10, threshold = 0.3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(jac.contains((1L, 2L)))
    val sh = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sh(a) ^ sh(b))
    assert(ham(1L, 3L) == 0)
    assert(ham(1L, 2L) < ham(1L, 6L))
    val pairs = Dedup.simhashPairs(docs, maxHamming = ham(1L, 2L).max(1))
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)))
  }

  test("language id picks the marker-dominant language") {
    val langs = TextAnalysis.langId(docs)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(langs(1L) == "en" && langs(4L) == "fr" && langs(5L) == "de")
  }

  test("token counts and quality components match hand computation") {
    val tc = TextAnalysis.tokenCounts(docs)
      .filter($"doc_id" === 1L).head()
    val expectTokens = base.split(" ").length.toLong
    assert(tc.getLong(1) == expectTokens)
    assert(tc.getLong(3) == math.ceil(base.length / 4.0).toLong)
    val q = TextAnalysis.qualityScore(docs).filter($"doc_id" === 1L).head()
    assert(q.getLong(2) == expectTokens)
    val ttr = q.getDouble(5)
    assert(ttr > 0 && ttr <= 1.0)
  }

  test("ANN brute force: neighbors ranked by cosine, self excluded") {
    val rng = new scala.util.Random(5)
    def vec(shift: Double) = Array.fill(16)(rng.nextGaussian()).map(_ + shift)
    val emb = (0L until 50L).map(i => (i, vec(if (i % 2 == 0) 1.0 else -1.0).toSeq, (i % 2).toInt))
      .toDF("vec_id", "emb", "label")
    val res = Similarity.annBruteForce(emb, nQueries = 2, k = 5)
      .select("qid", "nid", "rank", "cos").collect()
    assert(res.length == 10)
    res.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val cosines = rows.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(cosines.sameElements(cosines.sortBy(-_)), "ranks must follow cosine desc")
      assert(!rows.exists(_.getLong(1) == qid), "self excluded")
    }
  }

  test("SQL surface resolves the registered custom functions") {
    // GraftExtensions registers dot_product (scalar) and bounded_collect_list
    // (aggregate) into the session's FunctionRegistry; SharedSpark boots with
    // the extension installed, so plain SQL strings plan the native forms
    docs.createOrReplaceTempView("ext_docs")
    val dp = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(dp == 32.0)
    val bcl = spark.sql(
      """SELECT source, bounded_collect_list(doc_id, 2) AS ids
        |  FROM ext_docs GROUP BY source ORDER BY source""".stripMargin)
      .as[(String, Seq[Long])].collect()
    assert(bcl.forall(_._2.length <= 2), "lists must saturate at maxLen")
    assert(bcl.find(_._1 == "srcA").get._2 == Seq(1L, 2L))
    // zorder_key: composed built-in tree registered under one SQL name;
    // must agree bit-for-bit with the Column form (Layout.zvalue)
    val zv = spark.sql("SELECT zorder_key(3L, 5L) AS z").head().getLong(0)
    assert(zv == 39L, s"zorder_key(3,5) must interleave to 39, got $zv")
    val both = spark.range(200).select(
        (col("id") * 7 % 65536).as("i"), (col("id") * 13 % 65536).as("j"))
      .selectExpr("zorder_key(i, j) AS sqlz", "i", "j")
      .withColumn("colz", graft.operators.Layout.zvalue(col("i"), col("j")))
      .filter(col("sqlz") =!= col("colz")).count()
    assert(both == 0, "SQL and Column z-keys must agree on every row")
  }

  test("multimodal: real header decode metadata and frame sampling shapes") {
    val media = Multimodal.fromDocuments(docs)
    val meta = Multimodal.decodeMeta(media).collect().map(m => m.media_id -> m).toMap
    // doc 1 is odd → JPEG container (15-byte header), doc 2 even → PNG (33)
    assert(meta(1L).kind == "jpeg" && meta(2L).kind == "png")
    assert(meta(1L).n_bytes == Multimodal.JpegHeaderBytes + base.length.toLong)
    assert(meta(2L).n_bytes == Multimodal.PngHeaderBytes + nearDup.length.toLong)
    // dimensions survive the write→parse round trip of the real header
    assert(meta(1L).width == 64L + base.length % 576)
    assert(meta(1L).height == 48L + (base.length * 7L) % 432)
    val frames = Multimodal.sampleFrames(media, stride = 20, frameBytes = 8).collect()
    val f1 = frames.filter(_.media_id == 1L)
    val m1len = Multimodal.JpegHeaderBytes + base.length
    assert(f1.length == (m1len + 19) / 20)
    assert(f1.forall(_.frame.length <= 8))
    // the first sampled window is the container header, not the payload
    assert((f1.head.frame(0) & 0xFF) == 0xFF && (f1.head.frame(1) & 0xFF) == 0xD8)
  }
}
