package graft.sinks

import graft.SparkSuite
import graft.ext.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted ANN index lifecycle (VERDICT r7 item 1): build ≡ the
  * in-plan operator, probe-after-append sees appended vectors with NO
  * rebuild, compaction preserves results, appends saturate against the
  * frozen build-time scale. */
class AnnIndexSpec extends SparkSuite {

  import spark.implicits._

  private def embs: DataFrame =
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")

  private def rows(df: DataFrame): Seq[(Long, Int, Long, Double)] =
    df.select(col("q_id"), col("rank").cast("int"), col("neighbor_id"),
      col("sim_r"))
      .as[(Long, Int, Long, Double)].collect().toSeq

  // array<tinyint> columns come back as Seq[Byte] rows, not BINARY
  private def centMap(path: String): Map[Long, Array[Byte]] =
    spark.read.parquet(s"$path/centroids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1).toArray).toMap

  test("probe over a fresh build is bit-identical to quantizedIvfTopK") {
    val path = tmpDir("annidx_full")
    AnnIndex.build(embs, path)
    val indexed = rows(AnnIndex.probe(spark, path, numQueries = 10, k = 10))
    val inPlan = rows(
      Similarity.quantizedIvfTopK(embs, numQueries = 10, k = 10))
    assert(indexed === inPlan)
  }

  test("probe-after-append sees appended vectors; centroids and meta " +
      "untouched (assignment-only append, no rebuild)") {
    val path = tmpDir("annidx_append")
    // build on the even half only: centroids sample every 20th vec_id of
    // the build set, so the centroid set is a pure function of the evens
    AnnIndex.build(embs.where(col("vec_id") % 2 === 0), path)
    val centsBefore = centMap(path)
    val before = rows(AnnIndex.probe(spark, path, numQueries = 10, k = 10))
    assert(before.forall(_._3 % 2 == 0)) // only evens exist yet
    AnnIndex.append(embs.where(col("vec_id") % 2 === 1), path)
    val after = rows(AnnIndex.probe(spark, path, numQueries = 10, k = 10))
    // appended (odd) vectors are now probe candidates…
    assert(after.exists(_._3 % 2 == 1),
      "no appended vector surfaced in any probe's top-k")
    // …and the codebook is frozen: identical centroid codes
    val centsAfter = centMap(path)
    assert(centsAfter.keySet === centsBefore.keySet)
    assert(centsAfter.forall { case (id, cv) =>
      java.util.Arrays.equals(cv, centsBefore(id)) })
    // an even-only query set over the union index: every pre-existing
    // neighbor either survives or was outranked by an appended one
    assert(after.map(r => (r._1, r._3)).toSet
      .intersect(before.map(r => (r._1, r._3)).toSet).nonEmpty)
  }

  test("compaction after appends preserves probe results exactly") {
    val path = tmpDir("annidx_compact")
    AnnIndex.build(embs.where(col("vec_id") % 2 === 0), path)
    AnnIndex.append(embs.where(col("vec_id") % 2 === 1), path)
    val before = rows(AnnIndex.probe(spark, path, numQueries = 10, k = 10))
    AnnIndex.compact(spark, path)
    val after = rows(AnnIndex.probe(spark, path, numQueries = 10, k = 10))
    assert(after === before)
    // compaction collapsed the per-append files: at most one parquet
    // file per bucket directory remains
    val vecRoot = new java.io.File(s"$path/vectors")
    val perBucket = vecRoot.listFiles().filter(_.getName.startsWith("cell_bucket="))
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(perBucket.nonEmpty && perBucket.forall(_ <= 1))
  }

  test("streaming ingestion (runToIndex): micro-batches land as " +
      "assignment-only appends, a restart never duplicates, probes see " +
      "everything ingested so far") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmpDir("annidx_stream")
    val all = embs.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (buildHalf, streamHalf) = all.partition(_._1 % 2 == 0)
    AnnIndex.build(
      spark.createDataFrame(buildHalf.toSeq).toDF("vec_id", "embedding"), path)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val ckpt = tmpDir("annidx_stream_ckpt")
    def run(): Unit = {
      val q = AnnIndex.runToIndex(
        mem.toDF().toDF("vec_id", "embedding"), path, ckpt)
      q.awaitTermination()
    }
    val (s1, s2) = streamHalf.splitAt(streamHalf.length / 2)
    mem.addData(s1.toSeq: _*)
    run()
    val mid = spark.read.parquet(s"$path/vectors").count()
    assert(mid === buildHalf.length + s1.length)
    // restart with the second slice: the checkpoint fences batch 0
    mem.addData(s2.toSeq: _*)
    run()
    assert(spark.read.parquet(s"$path/vectors").count() === all.length)
    // and another restart with nothing new appends nothing
    run()
    assert(spark.read.parquet(s"$path/vectors").count() === all.length)
    // the fully-ingested index probes like a fresh full build MINUS the
    // frozen-codebook difference: codes quantized under the build-half
    // scale. With the fixture's scale determined by a build-half vector
    // the two probes coincide exactly.
    val streamed = rows(AnnIndex.probe(spark, path, numQueries = 10, k = 10))
    assert(streamed.nonEmpty &&
      streamed.exists(_._3 % 2 == 1) && streamed.exists(_._3 % 2 == 0))
  }

  test("probeWith: an external query id colliding with a corpus vec_id " +
      "keeps that vector as a candidate (self-exclusion is opt-in, " +
      "fixture-parity probe only)") {
    val path = tmpDir("annidx_ext")
    AnnIndex.build(embs, path)
    // an external request whose id happens to equal corpus vec_id 3,
    // carrying vector 3's own codes: its true nearest neighbor IS
    // vector 3 (sim 1.0) and must not be silently dropped
    val q = spark.read.parquet(s"$path/vectors")
      .where(col("vec_id") === 3)
      .select(col("vec_id").as("q_id"),
        transform(col("qv"), x => x.cast("double")).as("q"))
    val kept = rows(AnnIndex.probeWith(spark, path, q, k = 3))
    assert(kept.head === ((3L, 1, 3L, 1.0)),
      "external probe must keep the colliding corpus vector")
    val excluded = rows(
      AnnIndex.probeWith(spark, path, q, k = 3, excludeSelf = true))
    assert(!excluded.exists(_._3 == 3L),
      "fixture-parity mode must still exclude self")
  }

  test("appends quantize with the FROZEN build-time scale, saturating " +
      "at ±127 for out-of-range components") {
    val path = tmpDir("annidx_sat")
    // build-time corpus has max |x| = 1.0 → s = 1.0
    val base = Seq((0L, Array.fill(64)(1.0f)), (20L, Array.fill(64)(-1.0f)))
      .toDF("vec_id", "embedding")
    AnnIndex.build(base, path)
    // appended vector has |x| = 3.0 > s: codes must clamp to ±127, not wrap
    val big = Seq((101L, Array.fill(64)(3.0f)), (102L, Array.fill(64)(-3.0f)))
      .toDF("vec_id", "embedding")
    AnnIndex.append(big, path)
    val codes = spark.read.parquet(s"$path/vectors")
      .where(col("vec_id") >= 101L)
      .select(col("vec_id"), col("qv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1).toArray).toMap
    assert(codes(101L).forall(_ == 127.toByte))
    assert(codes(102L).forall(_ == -127.toByte))
  }

  test("streaming probes (runProbes): each query micro-batch lands the " +
      "batch probeWith's exact rows; a restart never re-lands a batch") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmpDir("annidx_qstream")
    AnnIndex.build(embs, path)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Double])]
    val outPath = tmpDir("annidx_qstream_out")
    val ckpt = tmpDir("annidx_qstream_ckpt")
    def run(): Unit = {
      val q = AnnIndex.runProbes(
        mem.toDF().toDF("q_id", "q"), path, outPath, ckpt, k = 5)
      q.awaitTermination()
    }
    val queryVecs = embs.where(col("vec_id") < 6).collect()
      .map(r => (1000L + r.getLong(0),
        r.getSeq[Float](1).toArray.map(_.toDouble)))
    val (b1, b2) = queryVecs.splitAt(3)
    mem.addData(b1.toSeq: _*)
    run()
    assert(spark.read.parquet(s"$outPath/results").count() === 3 * 5)
    mem.addData(b2.toSeq: _*)
    run()
    run() // restart with nothing new: the marker fence holds
    val streamed = rows(spark.read.parquet(s"$outPath/results")
      .orderBy("q_id", "rank")).toSet
    val direct = rows(AnnIndex.probeWith(spark, path,
      spark.createDataFrame(queryVecs.toSeq).toDF("q_id", "q"), k = 5)).toSet
    assert(streamed === direct,
      "streamed results must equal the one-shot batch probe")
  }

  test("filtered probe: stored label payload gates candidates, appended " +
      "labels included, labelless sources store null") {
    val path = tmpDir("annidx_filt")
    AnnIndex.build(embs, path) // fixture embeddings carry label
    val labels = embs.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qs = spark.read.parquet(s"$path/vectors")
      .where(col("vec_id") < 10)
      .select(col("vec_id"), col("qv"), col("label"))
      .dropDuplicates("vec_id")
      .select(col("vec_id").as("q_id"),
        Similarity.asDouble(col("qv")).as("q"), col("label").as("qlabel"))
    val out = AnnIndex.probeWithFiltered(spark, path, qs, k = 10,
      excludeSelf = true).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(labels(r.getAs[Long]("neighbor_id")) ===
        labels(r.getAs[Long]("q_id")), "neighbor outside the predicate")
    }
    // appended vectors carry their label and become filter-visible
    val extra = Seq((9001L, Array.fill(64)(0.5f), labels(0L)))
      .toDF("vec_id", "embedding", "label")
    AnnIndex.append(extra, path)
    val stored = spark.read.parquet(s"$path/vectors")
      .where(col("vec_id") === 9001L).select("label").head().getInt(0)
    assert(stored === labels(0L))
    // a labelless source stores null and never matches a filtered probe
    val nolabel = Seq((9002L, Array.fill(64)(0.25f)))
      .toDF("vec_id", "embedding")
    AnnIndex.append(nolabel, path)
    val nullStored = spark.read.parquet(s"$path/vectors")
      .where(col("vec_id") === 9002L).select("label").head()
    assert(nullStored.isNullAt(0))
    val after = AnnIndex.probeWithFiltered(spark, path, qs, k = 1000,
      excludeSelf = true).collect()
    assert(!after.exists(_.getAs[Long]("neighbor_id") == 9002L),
      "null-label rows must not match any label predicate")
  }

  test("filtered probes against STREAMING marker-fenced appends (VERDICT " +
      "r10 stretch): a committed labeled append is filter-visible, a " +
      "wrong-label append never surfaces, and a restart replay changes " +
      "nothing") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmpDir("annidx_filt_stream")
    AnnIndex.build(embs, path)
    val qs = spark.read.parquet(s"$path/vectors")
      .where(col("vec_id") < 10)
      .dropDuplicates("vec_id")
      .select(col("vec_id").as("q_id"),
        Similarity.asDouble(col("qv")).as("q"), col("label").as("qlabel"))
    def probeSet(): Set[(Long, Long)] =
      AnnIndex.probeWithFiltered(spark, path, qs, k = 1000,
        excludeSelf = true).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val before = probeSet()
    // stream two copies of query 0's raw vector: one wearing its label
    // (must become a filtered neighbor of q 0 once the batch commits and
    // its marker lands), one wearing a label no fixture row has (must
    // never surface for any query)
    val q0 = embs.where(col("vec_id") === 0L)
      .select(col("embedding"), col("label")).head()
    val v0 = q0.getSeq[Float](0).toArray
    val label0 = q0.getInt(1)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float], Int)]
    val ckpt = tmpDir("annidx_filt_stream_ckpt")
    def run(): Unit = {
      val sq = AnnIndex.runToIndex(
        mem.toDF().toDF("vec_id", "embedding", "label"), path, ckpt)
      sq.awaitTermination()
    }
    mem.addData((9101L, v0, label0), (9102L, v0, label0 + 1000))
    run()
    val after = probeSet()
    assert(after.contains((0L, 9101L)),
      "a committed same-label streamed append must be filter-visible")
    assert(!after.exists(_._2 == 9102L),
      "a label no query carries must never pass the filter")
    assert(before.subsetOf(after), "appends only add candidates")
    // restart with nothing new: the checkpoint + batch marker fence the
    // replay, so the filtered view is unchanged — no duplicate rows either
    run()
    assert(probeSet() === after, "a fenced replay must change nothing")
    val n9101 = spark.read.parquet(s"$path/vectors")
      .where(col("vec_id") === 9101L).count()
    assert(n9101 === 1L, "replay must not duplicate the append")
  }
}
