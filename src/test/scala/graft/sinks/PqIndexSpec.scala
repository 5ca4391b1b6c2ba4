package graft.sinks

import graft.SparkSuite
import graft.ext.Pq
import org.apache.spark.sql.functions._

/** Persisted PQ index lifecycle: fresh-build probe ≡ in-plan ADC,
  * appends encode against the frozen codebook, compaction preserves
  * results. */
class PqIndexSpec extends SparkSuite {

  private lazy val fx =
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("probe over a fresh build is bit-identical to Pq.adcTopK") {
    val path = tmpDir("pqidx")
    PqIndex.build(fx, path)
    val inPlan = Pq.adcTopK(fx, numQueries = 10, k = 10).collect().map(_.toString)
    val probed = PqIndex.probe(fx, path, numQueries = 10, k = 10)
      .collect().map(_.toString)
    assert(probed.sameElements(inPlan))
  }

  test("append encodes with the frozen codebook and probes see new rows") {
    import spark.implicits._
    val path = tmpDir("pqidx_app")
    val half = fx.where(col("vec_id") < 250)
    PqIndex.build(half, path)
    // frozen-codebook contract: codebook rows must not change on append
    val cbBefore = spark.read.parquet(s"$path/codebook").collect().map(_.toString).sorted
    PqIndex.append(fx.where(col("vec_id") >= 250), path)
    val cbAfter = spark.read.parquet(s"$path/codebook").collect().map(_.toString).sorted
    assert(cbAfter.sameElements(cbBefore))
    // every corpus vector is now probeable
    val n = spark.read.parquet(s"$path/codes")
      .select("vec_id").distinct().count()
    assert(n === fx.count())
    // an appended vector surfaces as its own nearest neighbor via a
    // near-identical external query
    val v250 = fx.where(col("vec_id") === 250)
      .select("embedding").collect().head.getSeq[Float](0).toArray
    val q = Seq((9000L, v250)).toDF("q_id", "embedding")
    val top = PqIndex.probeWith(spark, path, q, k = 3).collect()
    assert(top.head.getAs[Long]("neighbor_id") === 250L,
      "appended vector must be its own query's top hit")
  }

  test("compaction preserves probe results") {
    val path = tmpDir("pqidx_cmp")
    PqIndex.build(fx.where(col("vec_id") < 300), path)
    PqIndex.append(fx.where(col("vec_id") >= 300), path)
    val before = PqIndex.probe(fx, path, numQueries = 5, k = 10)
      .collect().map(_.toString)
    PqIndex.compact(spark, path)
    val after = PqIndex.probe(fx, path, numQueries = 5, k = 10)
      .collect().map(_.toString)
    assert(after.sameElements(before))
    // compaction leaves one file per bucket directory
    val root = new java.io.File(s"$path/codes")
    root.listFiles().filter(_.getName.startsWith("vec_bucket=")).foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) === 1,
        s"bucket ${d.getName} not compacted to one file")
    }
  }
}
