package graft.expr

import graft.SparkSuite
import graft.ext.{Similarity, TextOps}
import org.apache.spark.sql.functions._

/** The fused/precomputed fast paths must be value-identical to the
  * composed expression forms they replaced (which are themselves pinned by
  * the DuckDB oracle gate). */
class FusedExprsSpec extends SparkSuite {

  test("MinShingleMd5 equals composed MinMd5(shingles) on fixture docs") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val toks = TextOps.wsTokens(lower(col("text")))
    val both = docs.select(
      MinShingleMd5(toks, 3).as("fused"),
      MinMd5(TextOps.shingles(toks, 3)).as("composed"))
    assert(both.where(not(col("fused") <=> col("composed"))).count() === 0L)
  }

  test("SortedIntersectCount equals size(array_intersect) on fixture " +
      "shingle sets, plus hand edge cases") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val sh = graft.ext.Dedup.shingled(docs).where(size(col("sh")) > 0)
    val pairs = sh.select(col("doc_id").as("a"), col("sh").as("sh_a"))
      .crossJoin(sh.select(col("doc_id").as("b"), col("sh").as("sh_b")))
      .where(col("a") < col("b")).limit(5000)
    val both = pairs.select(
      SortedIntersectCount(col("sh_a"), col("sh_b")).as("fused"),
      size(array_intersect(col("sh_a"), col("sh_b"))).as("composed"))
    assert(both.where(not(col("fused") <=> col("composed"))).count() === 0L)
    import spark.implicits._
    val edge = Seq(
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L), 3),   // identical
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L), 0),   // disjoint
      (Array.empty[Long], Array(1L, 2L), 0),       // empty side
      (Array(Long.MinValue, 0L, Long.MaxValue),
        Array(Long.MinValue, Long.MaxValue), 2))   // extremes
      .toDF("x", "y", "want")
    assert(edge.where(
      SortedIntersectCount(col("x"), col("y")) =!= col("want")).count() === 0L)
  }

  test("MinShingleMd5 is null for docs shorter than the shingle size") {
    import spark.implicits._
    val tiny = Seq("one two", "a", "").toDF("text")
    val got = tiny
      .select(MinShingleMd5(TextOps.wsTokens(lower(col("text"))), 3).as("m"))
      .collect().map(_.isNullAt(0))
    assert(got.forall(identity))
  }

  test("HyperplaneBuckets is fail-closed on dimension-mismatched vectors") {
    import spark.implicits._
    val ragged = Seq(
      Array.fill(32)(0.5),  // wrong dim → bucket 0 everywhere
      Array.fill(64)(0.5))  // right dim → data-dependent buckets
      .toDF("v")
    val got = ragged
      .select(Similarity.allBuckets(col("v"), 64).as("b"))
      .collect().map(_.getSeq[Int](0))
    assert(got(0).forall(_ === 0), "ragged vector must land in bucket 0")
    assert(got(1).exists(_ !== 0), "well-formed vector gets real buckets")
  }

  test("HyperplaneBuckets matches the per-row xxhash64 plane formulation") {
    val dim = 64
    // the pre-fusion formulation: plane re-derived per row from string hashes
    def plane(j: Int) =
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(concat(lit(s"p$j:"), i.cast("string"))), lit(1000000L))
          .cast("double") / 1000000.0) - 0.5)
    def oldSketch(t: Int) =
      (0 until Similarity.bitsPerTable).map { jj =>
        val j = t * Similarity.bitsPerTable + jj
        when(VectorExprs.dot(col("v"), plane(j)) > 0, lit(1 << jj)).otherwise(lit(0))
      }.reduce[org.apache.spark.sql.Column](_ + _)

    val base = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val checked = base.select(
      Similarity.allBuckets(col("v"), dim).as("fused"),
      array((0 until Similarity.numTables).map(oldSketch): _*).as("composed"))
    assert(checked.where(not(col("fused") <=> col("composed"))).count() === 0L)
  }
}
