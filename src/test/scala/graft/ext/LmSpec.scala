package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** LM perplexity: closed-form values on tiny corpora, the
  * gibberish-detection property the surface heuristics lack, and the
  * word-order sensitivity only the bigram model has. */
class LmSpec extends SparkSuite {

  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("unigram perplexity matches the closed form on a tiny corpus") {
    // vocab: a→3, b→1; total 4, V 2; add-k 0.5 denominator 4+0.5*3 = 5.5
    val out = Lm.perplexity(docsOf("a a", "a b")).orderBy("doc_id").collect()
    val lpA = math.log(3.5 / 5.5)
    val lpB = math.log(1.5 / 5.5)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getAs[Long]("n_tokens") === 2L)
    assert(out(0).getAs[Double]("avg_nll_r") === r6(-lpA))
    assert(math.abs(out(1).getAs[Double]("avg_nll_r") - r6(-(lpA + lpB) / 2)) < 2e-6)
    assert(out(0).getAs[Double]("ppl_r") > 1.0)
  }

  test("gibberish salted with stopwords passes the heuristic gate but " +
      "spikes under the LM") {
    val normal = (0 until 20).map(i =>
      s"the quick brown fox jumps over the lazy dog and it is a fine day $i")
    // every heuristic signal looks healthy: sane length, high alpha
    // ratio, plenty of stopwords
    val gibberish =
      "the zxqv gqpxw of vvkjq and qzzpt is a wqxjvk in the pzzqv it"
    val docs = docsOf((normal :+ gibberish): _*)
    val gibId = normal.length.toLong

    val q = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val medianQ = q.values.toSeq.sorted.apply(q.size / 2)
    assert(q(gibId) >= medianQ * 0.9,
      s"heuristic gate must NOT flag the gibberish (q=${q(gibId)}, median=$medianQ)")

    val p = Lm.perplexity(docs)
      .select(col("doc_id"), col("ppl_r")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl_r")).toMap
    val maxNormal = (p - gibId).values.max
    assert(p(gibId) > 2 * maxNormal,
      s"LM must flag the gibberish (ppl=${p(gibId)}, max normal=$maxNormal)")
  }

  test("bigram LM is word-order sensitive where the unigram LM is blind") {
    val docs = docsOf("x y", "x y", "x y", "x y", "x y", "y x")
    val uni = Lm.perplexity(docs).select("doc_id", "ppl_r").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uni(5L) === uni(0L), "unigram: same bag of words, same ppl")
    val bi = Lm.perplexityBigram(docs).select("doc_id", "ppl_r").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bi(5L) > bi(0L), "bigram: the rare order costs more")
  }

  test("Kneser–Ney: order-sensitive like add-k bigram, and the " +
      "continuation distribution discounts high-frequency-one-context " +
      "tokens where raw counts overrate them") {
    // the classic KN motivation ("san francisco"): a token frequent in
    // ONE context only should carry a LOW continuation probability even
    // though its raw count is high. 'francisco' occurs 6 times but only
    // ever after 'san' (N1+(·francisco)=1); 'end' occurs 4 times after
    // 4 DIFFERENT contexts (N1+(·end)=4). The probe docs start with the
    // probe token (scored under pc) and share an otherwise-identical
    // rare bigram, so pc is the only discriminator.
    val docs = docsOf(
      "san francisco", "san francisco", "san francisco",
      "san francisco", "san francisco", "san francisco",
      "a end", "b end", "c end", "d end",
      "francisco only", "end only")
    val kn = Lm.perplexityKn(docs).select("doc_id", "ppl_r").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // docs 10 and 11 both start with a token seen 6+ raw times as a
    // continuation... francisco: n1b = 1 (only after 'san'); end:
    // n1b = 4 (after a,b,c,d). Both probe docs share the rare bigram
    // '<x> only' (nab=1). KN must score 'end only' (diverse contexts)
    // BETTER than 'francisco only' (one context), though raw counts
    // say francisco (6) >> end (4).
    assert(kn(11L) < kn(10L),
      "diverse-context first token must beat one-context frequent token")
    // and word order still matters end-to-end
    val docs2 = docsOf("x y", "x y", "x y", "x y", "x y", "y x")
    val kn2 = Lm.perplexityKn(docs2).select("doc_id", "ppl_r").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kn2(5L) > kn2(0L), "the rare order costs more under KN too")
  }

  test("trigram KN sees third-order structure the bigram level cannot: " +
      "a rare trigram over common bigrams costs more under kn3") {
    // corpus: 'x y z' x5, 'w y q' x5, probe 'x y q' x1. At the bigram
    // level the probe is unremarkable ((x,y) 6 occurrences, (y,q) 6);
    // at the trigram level (x,y,q) occurs once vs (x,y,z) five times.
    val docs = docsOf(
      "x y z", "x y z", "x y z", "x y z", "x y z",
      "w y q", "w y q", "w y q", "w y q", "w y q",
      "x y q")
    val kn3 = Lm.perplexityKn3(docs).select("doc_id", "ppl_r").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val kn2 = Lm.perplexityKn(docs).select("doc_id", "ppl_r").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kn3(10L) > kn3(0L), "rare trigram must cost more under kn3")
    // the discrimination ratio must be driven by the trigram order:
    // bigram KN sees near-identical statistics for the two docs
    val gap3 = kn3(10L) / kn3(0L)
    val gap2 = kn2(10L) / kn2(0L)
    assert(gap3 > gap2 * 1.1,
      s"third-order structure must add discrimination (kn3 $gap3 vs kn2 $gap2)")
  }

  test("perplexity-gated corpus cleaning drops the gibberish the " +
      "heuristic gate admits") {
    val normal = (0 until 20).map(i =>
      s"the quick brown fox jumps over the lazy dog and it is a fine day $i")
    val gibberish =
      "the zxqv gqpxw of vvkjq and qzzpt is a wqxjvk in the pzzqv it"
    val docs = texts2docs(normal :+ gibberish)
    val kept = graft.streaming.CorpusIngest.cleanBatchPerplexity(docs)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!kept.contains(normal.length.toLong), "gibberish dropped by NLL tail")
    assert(kept.size >= normal.length - 2, "normal docs overwhelmingly kept")
  }

  // corpus with the extra columns cleanBatchPerplexity's chain touches
  private def texts2docs(texts: Seq[String]) =
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "s1", t.length.toLong) }
      .toDF("doc_id", "text", "source", "n_chars")

  test("source LM divergence: an off-distribution source scores higher " +
      "KL than one matching the corpus") {
    val common = "the cat sat on the mat and the dog ran in the park"
    val docs = (
      (0 until 8).map(i => (i.toLong, common, "sA", common.length.toLong)) ++
      (8 until 16).map(i => (i.toLong, common, "sB", common.length.toLong)) :+
      (16L, "zq zq zq wv wv kx kx kx jj jj zq wv kx", "sC", 38L))
      .toDF("doc_id", "text", "source", "n_chars")
    val kl = Lm.sourceLmDivergence(docs).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("kl_r")).toMap
    assert(kl("sC") > kl("sA") * 5,
      s"off-distribution source must stand out: $kl")
    assert(math.abs(kl("sA") - kl("sB")) < 1e-6,
      "identical sources diverge identically")
  }

  test("scoreRow tokenizes exactly like the Spark twin on tab/newline " +
      "edges (space-only trim, trailing empties kept)") {
    val docs = Seq((0L, "\thello world\n"), (1L, "  plain text  "))
      .toDF("doc_id", "text")
    val (model, unk) = Lm.nanoModel(docs, topK = 16)
    val batch = Lm.nanoScores(docs, topK = 16).orderBy("doc_id").collect()
    val texts = Seq("\thello world\n", "  plain text  ")
    texts.zipWithIndex.foreach { case (t, i) =>
      val (s, n) = Lm.scoreRow(t, model, unk)
      assert(n.toLong === batch(i).getAs[Long]("n_tokens"),
        s"token count for ${t.replace("\n", "\\n")}")
      val nll = BigDecimal(-(s.toDouble / 1e9) / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(nll === batch(i).getAs[Double]("avg_nll_r"))
    }
  }

  test("every doc is scored; token counts line up with the tokenizer") {
    val docs = docsOf("one two three", "", "solo")
    val out = Lm.perplexity(docs).orderBy("doc_id").collect()
    assert(out.length === 3)
    // wsTokens of "" is [""] — one (rare) token, still scored
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq === Seq(3L, 1L, 1L))
  }
}
