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

  test("approx distinct within 5% of exact on the fixture corpus") {
    val fx = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val exact = TextAnalysis.distinctExact(fx).collect().head.getAs[Long]("distinct_norm_texts")
    val approx = TextAnalysis.distinctApprox(fx).collect().head.getAs[Long]("approx_norm_texts")
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}
