package graft.sinks

import java.util.concurrent.ConcurrentHashMap

import graft.ext.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Streaming MULTIMODAL ingest — the media modality joins the streaming
  * corpus tier: a checkpointed stream of raw (media_id, payload) rows is
  * decode-GATED (every payload through [[Multimodal.decodeImage]]'s real
  * codecs; rows no codec claims drop at the gate, exactly the batch
  * [[Multimodal.mediaEmbedding]] contract), embedded from DECODED PIXELS,
  * and appended into a bucket-partitioned serving table in the house
  * [[BucketedSink]] posture: marker-fenced foreachBatch (at-least-once at
  * the file level), deterministic `media_id` keys restoring exactly-once
  * via read-side dedup, and [[compact]] folding small appended files back
  * to one per bucket between runs.
  *
  * The table serves (media_id, fmt, width, height, embedding) — the shape
  * the similarity tier consumes (`media_embedding_topk` and any ANN index
  * build slot in downstream), bucketed by `pmod(hash(media_id), N)` so a
  * keyed lookup prunes to one directory at any table size.
  */
object MediaSink {

  val defaultBuckets = 32

  private def clusteringSort = Seq(col("media_id"))

  private def write(rows: DataFrame, path: String, buckets: Int,
      mode: String): Unit =
    BucketedSink.write(rows, path, col("media_id"), "media_bucket",
      buckets, clusteringSort, mode)

  /** Decode-gate + embed one micro-batch of raw media and append it into
    * the bucketed layout. The gate is the batch embedding operator
    * itself — streamed bytes and batch bytes take the identical code
    * path, which is what lets the streamed table ride the SAME DuckDB
    * oracle as the batch query. */
  def appendBatch(media: DataFrame, path: String,
      buckets: Int = defaultBuckets, dim: Int = 16): Unit =
    write(Multimodal.mediaEmbedding(media, dim), path, buckets, "append")

  /** The streaming ingest: checkpointed foreachBatch of raw payload rows
    * through the decode gate into the serving table. Delivery semantics
    * per [[BucketedSink.runToTable]]; readers needing exactly-once apply
    * `dropDuplicates("media_id")` (the key is deterministic). */
  def runToMediaTable(media: DataFrame, path: String, checkpointPath: String,
      buckets: Int = defaultBuckets)
  : org.apache.spark.sql.streaming.StreamingQuery =
    BucketedSink.runToTable(media, path, checkpointPath,
      appendBatch(_, path, buckets))

  /** Fold accumulated appends back to one file per bucket; replayed
    * rows are deduplicated here so they stop paying read-side dedup.
    * Quiesced-writer contract per [[BucketedSink.compact]]. */
  def compact(spark: SparkSession, path: String,
      buckets: Int = defaultBuckets): Unit =
    BucketedSink.compact(spark, path, (df, tmp) =>
      write(df.drop("media_bucket").dropDuplicates("media_id"), tmp,
        buckets, "overwrite"))

  /** Exactly-once view over the at-least-once table. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).dropDuplicates("media_id")

  // one table per fixture dir per JVM (fixture-derived and immutable —
  // the ActivitySink.materialized pattern)
  private val cache = new ConcurrentHashMap[String, DataFrame]()
  private val annBuilt = new ConcurrentHashMap[String, String]()

  /** The "ANN index build slot" the header names, filled (r15): a
    * persisted [[AnnIndex]] over the served table's BMP-range
    * embeddings (the decode→embed→index→serve loop closed end-to-end:
    * streamed MediaSink table → frozen-codebook IVF index → pruned
    * probes). Build-once per fixture dir, overwrite semantics. */
  def annIndexed(spark: SparkSession, sfDir: String): String =
    annBuilt.computeIfAbsent(sfDir, { _ =>
      val path = graft.util.DirKeys.tmpPath("annmedia", sfDir)
      val embs = materialized(spark, sfDir)
        .where(col("media_id") < 100000000000L) // the BMP range
        .where(expr("aggregate(embedding, 0D, (a, x) -> a + x) > 0D"))
        .select(col("media_id").as("vec_id"), col("embedding"))
      AnnIndex.build(embs, path)
      path
    })

  /** The materialized media-embedding table for a fixture dir: the
    * five-format synth corpus through the SAME decode-gate + embed path
    * the streaming ingest runs, persisted for the serving queries. */
  def materialized(spark: SparkSession, sfDir: String): DataFrame =
    cache.computeIfAbsent(sfDir, { _ =>
      val path = graft.util.DirKeys.tmpPath("mediasink", sfDir)
      val docs = graft.sources.Tables(spark, sfDir, "documents")
      // OVERWRITE, not append (the ActivitySink pattern): the tmp dir
      // outlives the JVM, and an append here would stack a full
      // duplicate copy per run — and serve STALE-schema rows after any
      // embedding change, failing the oracle with no code bug present
      write(Multimodal.mediaEmbedding(Multimodal.mediaAllFormats(docs)),
        path, defaultBuckets, "overwrite")
      read(spark, path).persist(StorageLevel.MEMORY_AND_DISK)
    })
}
