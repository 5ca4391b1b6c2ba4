package graft.sinks

import graft.SparkSuite
import graft.ext.Multimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming multimodal ingest: the streamed media-embedding table must
  * equal the batch embedding operator row-for-row (same decode gate,
  * same pixels), drop undecodable payloads at the gate without dying,
  * fence replayed batches, and compact back to one file per bucket
  * without changing contents. */
class MediaSinkSpec extends SparkSuite {
  import spark.implicits._

  private def embMap(df: org.apache.spark.sql.DataFrame)
  : Map[Long, (String, Seq[Float])] =
    df.select("media_id", "fmt", "embedding").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getSeq[Float](2).toList: Seq[Float])).toMap

  test("streamed ingest equals the batch embedding operator; gate drops " +
      "garbage; replays fence; compact folds files, contents unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .limit(40)
    val media = Multimodal.mediaAllFormats(docs)
    val rows = media.select("media_id", "payload")
      .as[(Long, Array[Byte])].collect()
    val expected = embMap(Multimodal.mediaEmbedding(media))
    assert(expected.nonEmpty)

    val mem = MemoryStream[(Long, Array[Byte])]
    val dir = tmpDir("media_sink")
    val ckpt = tmpDir("media_sink_ckpt")
    def run(): Unit = MediaSink.runToMediaTable(
      mem.toDF().toDF("media_id", "payload"), dir, ckpt).awaitTermination()

    // batch 1: even ids; batch 2: odd ids PLUS payloads no codec claims
    // (must drop at the gate, not kill the stream or land as rows)
    mem.addData(rows.filter(_._1 % 2 == 0).toSeq: _*)
    run()
    mem.addData(rows.filter(_._1 % 2 == 1).toSeq ++ Seq(
      (900000001L, "definitely not an image".getBytes("UTF-8")),
      (900000002L, null.asInstanceOf[Array[Byte]])): _*)
    run()

    assert(embMap(MediaSink.read(spark, dir)) === expected,
      "streamed table must equal the batch operator exactly")

    // an uncommitted-marker retry re-appends files; read-side dedup on
    // the deterministic key keeps the serving view exactly-once
    MediaSink.appendBatch(
      rows.filter(_._1 % 2 == 1).toSeq.toDF("media_id", "payload"), dir)
    assert(embMap(MediaSink.read(spark, dir)) === expected)

    // compaction folds the duplicates physically and restores one file
    // per bucket; a PLAIN read (no dedup) now agrees too
    MediaSink.compact(spark, dir)
    assert(embMap(spark.read.parquet(dir)) === expected,
      "post-compact the physical duplicate is gone, not just masked")
    val filesPerBucket = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("media_bucket="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(filesPerBucket.nonEmpty && filesPerBucket.forall(_ === 1),
      s"expected one file per bucket, got ${filesPerBucket.mkString(",")}")

    // a keyed lookup prunes to ONE bucket directory (the 100 TB shape)
    val one = expected.keys.head
    val pruned = spark.read.parquet(dir)
      .where(col("media_bucket") ===
        pmod(hash(lit(one)), lit(MediaSink.defaultBuckets)))
      .where(col("media_id") === one)
    assert(pruned.count() === 1L)
  }
}
