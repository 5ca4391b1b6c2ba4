package graft.ext

import graft.SparkSuite

/** Near-dup operator properties on a corpus with planted duplicates. */
class DedupSpec extends SparkSuite {

  import spark.implicits._

  private val base =
    "spark window batch filter merge join scan table value part hash group sort order stream line column query key data"
  // doc 2 = doc 1 with one word changed (near-dup); doc 3 = unrelated;
  // doc 4 = exact dup of doc 1 modulo case/punctuation
  private lazy val docs = Seq(
    (1L, base, "en", "s1", base.length.toLong),
    (2L, base.replace("merge", "shuffle"), "en", "s1", base.length.toLong),
    (3L, "completely different words about cats dogs birds fish mice horses cows sheep goats llamas", "en", "s2", 90L),
    (4L, base.toUpperCase + "!!!", "en", "s3", base.length.toLong + 3))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup collapses case/punctuation variants") {
    val survivors = Dedup.exactSurvivors(docs).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(survivors === Set(1L, 2L, 3L)) // doc 4 normalizes to doc 1
  }

  test("MinHash LSH + Jaccard verify finds the planted near-dup pair only") {
    val pairs = Dedup.nearDupJaccard(docs, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)))   // the near-dup
    assert(pairs.contains((1L, 4L)))   // exact-dup modulo case also surfaces
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated never pairs
  }

  test("containmentPairs finds a doc quoted inside a larger one; Jaccard misses it") {
    val small = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lam mu nu xi omicron pi rho sigma tau upsilon"
    val filler = (1 to 60).map(i => s"filler$i").mkString(" ")
    val quote = Seq(
      (1L, small, "en", "s1", small.length.toLong),
      (2L, small + " " + filler, "en", "s1", 400L),
      (3L, "unrelated words entirely different from the others here now", "en", "s2", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val cont = Dedup.containmentPairs(quote, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(cont.contains((1L, 2L)), "doc 1's shingles are all inside doc 2")
    assert(!cont.contains((2L, 1L)), "containment is directed: big doc not inside small")
    assert(!cont.exists(p => p._1 == 3L || p._2 == 3L))
    // the same pair is invisible to symmetric Jaccard at the same threshold
    val jac = Dedup.nearDupJaccard(quote, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(!jac.contains((1L, 2L)))
  }

  test("tiny docs with empty shingle sets never pair and never crash") {
    // < 3 tokens ⇒ empty shingle set ⇒ identical (empty-set) MinHash
    // signatures; without the guard these collide in every band and hit
    // the Jaccard verify as 0/0
    val tiny = Seq(
      (1L, "one two", "en", "s1", 7L),
      (2L, "three four", "en", "s1", 10L),
      (3L, base, "en", "s2", base.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Dedup.nearDupJaccard(tiny, threshold = 0.1).count() === 0L)
  }

  test("components: transitive chains collapse, disjoint clusters stay apart") {
    // two components: a 4-node path 10-11-12-13 (tests transitivity AND
    // pointer jumping over a chain) and a 2-node pair 20-21
    val pairs = Seq((11L, 10L), (11L, 12L), (13L, 12L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.components(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("components: long path converges within the iteration cap") {
    val n = 40 // path 0-1-...-40: diameter >> log-rounds; jumping must kick in
    val pairs = (0 until n).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")
    val got = Dedup.components(pairs, maxIter = 10).collect()
      .map(r => r.getAs[Long]("cluster_id")).toSet
    assert(got === Set(0L))
  }

  test("components: checkpoint interpose fires on high-diameter paths " +
      "without changing the result") {
    // path 0-1-...-24 (diameter 24 > 20); checkpointEvery=2 forces the
    // localCheckpoint branch to fire on most rounds, proving the truncated
    // lineage carries the same labels forward (VERDICT r4 item 7)
    val n = 24
    val pairs = (0 until n).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")
    val got = Dedup.components(pairs, maxIter = 25, checkpointEvery = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    assert(got.length === n + 1)
    assert(got.forall(_._2 == 0L))
  }

  test("components: 400-node path converges under the default checkpoint " +
      "cadence with no lineage blowup") {
    // ~log2(400) ≈ 9-10 pointer-jump rounds, enough to cross the default
    // checkpoint boundary twice — the untested territory VERDICT r4
    // flagged (union-find property test caps at 30 nodes). Without the
    // interpose this test OOMs in plan stringification: the plan grows
    // 3^rounds (three references per round to the previous frame).
    val n = 400
    val pairs = (0 until n).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")
    val got = Dedup.components(pairs)
      .collect().map(r => r.getAs[Long]("cluster_id")).toSet
    assert(got === Set(0L))
  }

  test("components: empty pair set yields empty clustering") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.components(empty).count() === 0L)
  }

  test("nearDupSurvivors keeps one representative per transitive cluster") {
    // docs 1, 2, 4 form one cluster at threshold 0.5 (1~2 near, 1~4 exact
    // modulo case); doc 3 is unrelated → survivors are 1 (min id) and 3
    val kept = Dedup.nearDupSurvivors(docs, threshold = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept === Set(1L, 3L))
  }

  test("exactSubstrSpans flags a copied span at ARBITRARY alignment — " +
      "where block-segment dedup finds nothing — and merges overlapping " +
      "windows; self-repetition counts") {
    import org.apache.spark.sql.functions._
    val aToks = (0 until 30).map(i => s"a$i")
    // doc 2 copies doc 1's tokens 4..19 (a 16-token span) behind a
    // 7-token unique prefix — alignments 4 and 7 differ, so no 10-token
    // BLOCK of one equals a block of the other
    val bToks = (0 until 7).map(i => s"b$i") ++ aToks.slice(4, 20)
    // doc 4 repeats its own first 10 tokens — self-duplication
    val dToks = (0 until 10).map(i => s"x$i")
    val docs = Seq(
      (1L, aToks.mkString(" ")),
      (2L, bToks.mkString(" ")),
      (3L, "totally unrelated words only occurring here once each never repeated at all in corpus"),
      (4L, (dToks ++ dToks).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.exactSubstrSpans(docs, spanLen = 10).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("dup_tokens"), r.getAs[Double]("dup_frac_r"))))
      .toMap
    // shared span: windows at offsets 4..10 in doc 1 (7 windows), union
    // coverage = 6·1 + 10 = 16 tokens
    assert(got(1L) === ((30L, 7L, 16L, 0.533333)))
    assert(got(2L) === ((23L, 7L, 16L, 0.695652)))
    assert(got(3L) === ((14L, 0L, 0L, 0.0)))
    // offsets 0 and 10 hold the identical window: gap 10 telescopes to
    // full coverage
    assert(got(4L) === ((20L, 2L, 20L, 1.0)))
    // the contrast that motivates the operator: non-overlapping 10-token
    // segments see NO repetition in docs 1/2 (misaligned copy)
    val withToks = docs.where(col("doc_id") <= 2)
      .select(col("doc_id"),
        graft.ext.TextOps.wsTokens(lower(col("text"))).as("__toks"))
    val lines = Dedup.lineDedup(withToks,
      Dedup.tokenBlockLines(col("__toks")), minDocs = 2).collect()
    Dedup.releaseAll()
    lines.foreach { r =>
      assert(r.getAs[Long]("n_kept") === r.getAs[Long]("n_lines"),
        "segment dedup must miss the misaligned copy")
    }
  }

  test("softDedupWeights: cluster members weigh 1/|cluster|, singletons 1.0, " +
      "every doc appears exactly once") {
    val out = Dedup.softDedupWeights(docs, threshold = 0.5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Double]("weight_r"))))
      .toMap
    Dedup.releaseAll()
    // docs 1, 2, 4 form one cluster (1~2 near, 1~4 exact modulo case):
    // each weighs 1/3; unrelated doc 3 is a singleton at full weight
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    Seq(1L, 2L, 4L).foreach { id =>
      assert(out(id) === ((1L, 3L, 0.333333)))
    }
    assert(out(3L) === ((3L, 1L, 1.0)))
    // total training mass = one unit per CONTENT, not per copy
    assert(math.abs(out.values.map(_._3).sum - 2.0) < 1e-5)
  }

  test("SimHash: hamming orders near-dups below unrelated docs; exact dups collide") {
    import org.apache.spark.sql.functions._
    val fp = Dedup.simhashed(docs)
      .select(col("doc_id"), col("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
    def hamming(a: Long, b: Long): Int =
      java.lang.Long.bitCount(fp(a) ^ fp(b))
    // near-dup strictly closer than an unrelated doc
    assert(hamming(1L, 2L) < hamming(1L, 3L))
    assert(hamming(1L, 2L) < hamming(2L, 3L))
    // banded candidates: the one-word near-dup (hamming 8 — a clean
    // 16-bit band survives) and the token-identical doc 5 (hamming 0 —
    // caught by the pigeonhole guarantee) surface; the unrelated doc
    // (hamming ≈ 30) never pairs. (1,4) is hamming 13 on this basis —
    // outside the 4×16-band guarantee, correctly not asserted.
    val docs5 = docs.union(
      Seq((5L, base.toUpperCase, "en", "s4", base.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val pairs = Dedup.nearDupSimhash(docs5, maxHamming = 16)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 5L))) // exact dup modulo case: hamming 0
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("nearDupSurvivorsQuality keeps the highest-quality member, not the min id") {
    // docs 1 and 4 normalize to the same shingles (case + trailing "!!!"),
    // but doc 1 carries the punctuation garbage — lower alpha ratio, lower
    // quality — so the quality policy keeps doc 4 where the min-id policy
    // keeps doc 1
    val qdocs = Seq(
      (1L, base.toUpperCase + " !!! ??? ###", "en", "s1", base.length.toLong + 12),
      (4L, base, "en", "s3", base.length.toLong),
      (3L, "completely different words about cats dogs birds fish mice horses cows sheep goats llamas", "en", "s2", 90L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val minId = Dedup.nearDupSurvivors(qdocs, threshold = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(minId === Set(1L, 3L), "min-id policy keeps doc 1")
    val byQuality = Dedup.nearDupSurvivorsQuality(qdocs, threshold = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(byQuality === Set(4L, 3L), "quality policy keeps the clean doc 4")
  }

  test("lineDedup drops planted cross-doc boilerplate lines and " +
      "reassembles the rest in order") {
    val boiler = "subscribe to our newsletter today"
    val ldocs = Seq(
      (1L, s"unique first line\n$boiler\nunique closing thought", "en", "s1", 10L),
      (2L, s"$boiler\nanother original sentence here", "en", "s1", 10L),
      (3L, "entirely original document with no repeats", "en", "s2", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    import org.apache.spark.sql.functions.{col, split}
    val got = Dedup.lineDedup(ldocs, split(col("text"), "\n"), minDocs = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_md5"))))
      .toMap
    def md5Of(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(got(1L) === ((3L, 2L, md5Of("unique first line\nunique closing thought"))))
    assert(got(2L) === ((2L, 1L, md5Of("another original sentence here"))))
    assert(got(3L) === ((1L, 1L, md5Of("entirely original document with no repeats"))))
  }

  test("lineDedup: a doc whose every line is boilerplate reassembles to empty") {
    val boiler = "all rights reserved"
    val ldocs = Seq(
      (1L, boiler, "en", "s1", 19L),
      (2L, boiler, "en", "s1", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    import org.apache.spark.sql.functions.{col, split}
    val got = Dedup.lineDedup(ldocs, split(col("text"), "\n"), minDocs = 2)
      .collect().map(r => (r.getAs[Long]("n_kept"), r.getAs[String]("clean_md5")))
    assert(got.length === 2)
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e" // md5("")
    assert(got.forall(_ == ((0L, emptyMd5))))
  }

  test("semanticSurvivors drops a planted paraphrase that lexical dedup " +
      "provably misses") {
    // docs 0 and 1: ZERO shared tokens (no shingle overlap, disjoint token
    // hashes) but near-parallel embeddings — the SemDeDup case. doc 2 is
    // orthogonal. vec 0 is the only centroid (stride default 20), so all
    // three land in its cell and the intra-cell verify sees every pair.
    val pdocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank", "en", "s1", 63L),
      (1L, "a speedy russet canine leaps across an idle hound beside a stream shore", "en", "s1", 72L),
      (2L, "completely unrelated treatise on thermodynamics and entropy gradients", "en", "s2", 69L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dim = 8
    def vec(xs: Double*): Array[Float] = xs.toArray.map(_.toFloat)
    val embs = Seq(
      (0L, vec(1, 0.01, 0, 0, 0, 0, 0, 0)),
      (1L, vec(0.99, 0.02, 0.01, 0, 0, 0, 0, 0)), // cosine(v0,v1) ≈ 1
      (2L, vec(0, 0, 0, 1, 0, 0, 0, 0)))          // orthogonal
      .toDF("vec_id", "embedding")
    assert(embs.head().getAs[Seq[Float]]("embedding").length === dim)
    // lexical near-dup: nothing — the paraphrase shares no 3-gram shingle
    assert(Dedup.nearDupJaccard(pdocs, threshold = 0.1).count() === 0L)
    // semantic pairs: exactly the paraphrase pair
    val pairs = Dedup.semanticPairs(embs, threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs === Set((0L, 1L)))
    // survivors: representative 0 kept, paraphrase 1 dropped, 2 untouched
    val kept = Dedup.semanticSurvivors(pdocs, embs, threshold = 0.9)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept === Set(0L, 2L))
  }

  test("semanticSurvivorsQuality keeps the higher-quality paraphrase; " +
      "min-id policy keeps the other") {
    val pdocs = Seq(
      (0L, "a speedy russet canine leaps across an idle hound !!! ??? ###", "en", "s1", 61L),
      (1L, "the quick brown fox jumps over the lazy dog near the river", "en", "s1", 58L),
      (2L, "completely unrelated treatise on thermodynamics and entropy", "en", "s2", 59L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def vec(xs: Double*): Array[Float] = xs.toArray.map(_.toFloat)
    val embs = Seq(
      (0L, vec(1, 0.01, 0, 0)), (1L, vec(0.99, 0.02, 0.01, 0)),
      (2L, vec(0, 0, 0, 1)))
      .toDF("vec_id", "embedding")
    val minId = Dedup.semanticSurvivors(pdocs, embs, threshold = 0.9)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(minId === Set(0L, 2L))
    val byQuality = Dedup.semanticSurvivorsQuality(pdocs, embs, threshold = 0.9)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(byQuality === Set(1L, 2L),
      "quality policy keeps the clean doc 1 over the garbage-laden doc 0")
  }

  test("clusterSizeStats profiles a mixed pair graph") {
    // one 4-node path + one 2-node pair → sizes {4: 1, 2: 1}
    val pairs = Seq((11L, 10L), (11L, 12L), (13L, 12L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.clusterSizeStats(pairs).collect()
      .map(r => r.getAs[Long]("cluster_size") -> r.getAs[Long]("n_clusters"))
      .toMap
    assert(got === Map(2L -> 1L, 4L -> 1L))
  }

  test("containmentPairs: threshold-exact pair with shingle count divisible " +
      "by 5 survives the prefix floor guard") {
    // |sh(a)| = 10 distinct shingles, exactly 8 shared with b ⇒ containment
    // = 0.8 precisely at the default threshold; the unguarded float floor
    // would shorten the prefix and could drop it
    val a = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 x1 x2"   // 12 tokens → 10 shingles
    val b = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 y1 y2"   // shares the first 8 shingles
    val cdocs = Seq(
      (1L, a, "en", "s1", a.length.toLong),
      (2L, b, "en", "s1", b.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Dedup.containmentPairs(cdocs, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("containment"))).toSet
    assert(got === Set((1L, 2L, 0.8), (2L, 1L, 0.8)))
  }

  test("snapshotDiff: planted add/remove/change classified; unchanged " +
      "docs emit nothing") {
    val prev = Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
      .toDF("doc_id", "text")
    val curr = Seq(1L -> "alpha", 2L -> "beta REVISED", 9L -> "delta")
      .toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(prev, curr).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("change")).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 9L -> "added"))
  }

  test("approx distinct within 5% of exact on the fixture corpus") {
    val fx = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val exact = TextAnalysis.distinctExact(fx).collect().head.getAs[Long]("distinct_norm_texts")
    val approx = TextAnalysis.distinctApprox(fx).collect().head.getAs[Long]("approx_norm_texts")
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}
