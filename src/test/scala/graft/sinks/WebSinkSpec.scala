package graft.sinks

import graft.SparkSuite
import graft.ext.WebCodec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming web-corpus ingest: the streamed cleaned-text table must
  * equal the batch pipeline operator row-for-row (same parse gate, same
  * extraction, same gates), drop unparseable archives at the gate
  * without dying, fence replayed batches, and compact back to one file
  * per bucket without changing contents. */
class WebSinkSpec extends SparkSuite {
  import spark.implicits._

  // keyed by (media_id, http_status, target_uri): a doc's WARC carries
  // several fetch rows beside its 200 capture (3xx aliases since r17;
  // r18 chain/loop hops share one status, so the URI completes the key)
  private def rowMap(df: org.apache.spark.sql.DataFrame)
  : Map[(Long, Int, String), (String, String, Long, Long, Boolean)] =
    df.select("media_id", "host", "http_status", "target_uri", "body",
      "n_words", "alpha_milli", "kept").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getString(3)) ->
        ((r.getString(1),
        r.getString(4), r.getLong(5), r.getLong(6), r.getBoolean(7))))
      .toMap

  test("streamed ingest equals the batch pipeline; gate drops garbage; " +
      "replays fence; compact folds files, contents unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.sources
      .Tables(spark, "/root/testdata/sf0.001", "documents").limit(40)
    val media = WebCodec.webWarc(docs)
    val rows = media.select("media_id", "payload")
      .as[(Long, Array[Byte])].collect()
    val expected = rowMap(WebCodec.pipeline(media))
    assert(expected.nonEmpty)

    val mem = MemoryStream[(Long, Array[Byte])]
    val dir = tmpDir("web_sink")
    val ckpt = tmpDir("web_sink_ckpt")
    def run(): Unit = WebSink.runToWebTable(
      mem.toDF().toDF("media_id", "payload"), dir, ckpt).awaitTermination()

    // batch 1: even ids; batch 2: odd ids PLUS payloads the WARC walk
    // rejects (must drop at the gate, not kill the stream or land)
    mem.addData(rows.filter(_._1 % 2 == 0).toSeq: _*)
    run()
    mem.addData(rows.filter(_._1 % 2 == 1).toSeq ++ Seq(
      (900000001L, "definitely not a warc".getBytes("UTF-8")),
      (900000002L, WebCodec.gzipStored("WARC/9.9 nope".getBytes)),
      (900000003L, null.asInstanceOf[Array[Byte]])): _*)
    run()

    assert(rowMap(WebSink.read(spark, dir)) === expected,
      "streamed table must equal the batch operator exactly")

    // an uncommitted-marker retry re-appends files; read-side dedup on
    // the deterministic key keeps the serving view exactly-once
    WebSink.appendBatch(
      rows.filter(_._1 % 2 == 1).toSeq.toDF("media_id", "payload"), dir)
    assert(rowMap(WebSink.read(spark, dir)) === expected)

    // compaction folds the duplicates physically; a PLAIN read agrees
    WebSink.compact(spark, dir)
    assert(rowMap(spark.read.parquet(dir)) === expected,
      "post-compact the physical duplicate is gone, not just masked")
    val filesPerBucket = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("web_bucket="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(filesPerBucket.nonEmpty && filesPerBucket.forall(_ === 1),
      s"expected one file per bucket, got ${filesPerBucket.mkString(",")}")

    // a keyed lookup prunes to ONE bucket directory (the 100 TB shape)
    val one = expected.keys.head
    val pruned = spark.read.parquet(dir)
      .where(col("web_bucket") ===
        pmod(hash(lit(one._1)), lit(WebSink.defaultBuckets)))
      .where(col("media_id") === one._1 && col("http_status") === one._2
        && col("target_uri") === one._3)
    assert(pruned.count() === 1L)
  }

  test("streamed MAIN-CONTENT ingest equals the batch pipelineMain " +
      "operator row-for-row (r16), gate included") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.sources
      .Tables(spark, "/root/testdata/sf0.001", "documents").limit(30)
    val media = WebCodec.webWarc(docs)
    val rows = media.select("media_id", "payload")
      .as[(Long, Array[Byte])].collect()
    def mainMap(df: org.apache.spark.sql.DataFrame) =
      df.select("media_id", "http_status", "target_uri", "body", "n_kept",
        "boiler_chars", "kept")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)) ->
          ((r.getString(3), r.getLong(4), r.getLong(5),
            r.getBoolean(6)))).toMap
    val expected = mainMap(WebCodec.pipelineMain(media))
    assert(expected.nonEmpty)
    val mem = MemoryStream[(Long, Array[Byte])]
    val dir = tmpDir("web_sink_main")
    val ckpt = tmpDir("web_sink_main_ckpt")
    mem.addData(rows.toSeq ++ Seq(
      (900000001L, "not a warc either".getBytes("UTF-8"))): _*)
    WebSink.runToMainTable(mem.toDF().toDF("media_id", "payload"),
      dir, ckpt).awaitTermination()
    assert(mainMap(WebSink.read(spark, dir)) === expected,
      "streamed main-content table must equal the batch operator")
  }

  test("streamed FETCH LOG equals the batch fetchLog projection " +
      "row-for-row (r18), gate included, replays fenced") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.sources
      .Tables(spark, "/root/testdata/sf0.001", "documents").limit(30)
    val media = WebCodec.webWarc(docs)
    val rows = media.select("media_id", "payload")
      .as[(Long, Array[Byte])].collect()
    def logMap(df: org.apache.spark.sql.DataFrame) =
      df.select("media_id", "rec_index", "warc_type", "target_uri",
        "http_status", "location", "retry_after", "warc_date")
        .collect().map(r => (r.getLong(0), r.getInt(1)) ->
          ((r.getString(2), r.getString(3), r.getInt(4), r.getString(5),
            r.getLong(6), r.getString(7)))).toMap
    val expected = logMap(WebCodec.fetchLog(media))
    assert(expected.nonEmpty)
    val mem = MemoryStream[(Long, Array[Byte])]
    val dir = tmpDir("web_sink_fetch")
    val ckpt = tmpDir("web_sink_fetch_ckpt")
    mem.addData(rows.toSeq ++ Seq(
      (900000001L, "not a warc".getBytes("UTF-8"))): _*)
    WebSink.runToFetchTable(mem.toDF().toDF("media_id", "payload"),
      dir, ckpt).awaitTermination()
    assert(logMap(WebSink.readFetch(spark, dir)) === expected,
      "streamed fetch log must equal the batch projection")
    // a replayed append dedups read-side on (media_id, rec_index)
    WebSink.appendBatchFetch(
      rows.take(5).toSeq.toDF("media_id", "payload"), dir)
    assert(logMap(WebSink.readFetch(spark, dir)) === expected)
  }

  test("null-payload handling in the gate: a batch of ONLY rejects " +
      "appends nothing and the table stays readable") {
    val dir = tmpDir("web_sink_rej")
    WebSink.appendBatch(Seq(
      (1L, "junk".getBytes("UTF-8")),
      (2L, Array.emptyByteArray)).toDF("media_id", "payload"), dir)
    // an all-reject append writes an empty (possibly schema-only) table;
    // the exactly-once view over it must be empty, not an error
    val files = Option(new java.io.File(dir).listFiles()).map(_.length)
    assert(files.isDefined)
    val n = try WebSink.read(spark, dir).count()
    catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    assert(n === 0L)
  }
}
