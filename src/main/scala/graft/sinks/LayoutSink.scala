package graft.sinks

import graft.ext.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance for a z-clustered table ([[Layout]]): appended
  * micro-batches land in the SAME `zcell=` directory layout as the
  * initial build, keyed against the build's frozen normalization bounds
  * (drift past them clamps into the edge cells until a re-layout — see
  * [[Layout.scaleKey]]), so the partition-pruned read path keeps working
  * unchanged while the table grows. Delivery follows the house bucketed-
  * sink posture: marker-fenced foreachBatch (at-least-once at the file
  * level), deterministic keys restoring exactly-once via read-side dedup,
  * and [[compact]] folding the small appended files back into the
  * canonical one-file-per-cell clustering between runs.
  */
object LayoutSink {

  // the bounds are FROZEN by contract (that's the clamp story), so one
  // disk read per path per JVM — not one Spark job per micro-batch. The
  // cache is fingerprinted by `path/meta`'s modification time so a
  // re-layout (writeClustered rerun with drifted bounds or different
  // cellBits) in the same JVM invalidates it: one FS stat per call, no
  // Spark job, and appends never key against a stale grid.
  private val metaCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Layout.TableMeta)]()

  private def metaOf(spark: SparkSession, path: String): Layout.TableMeta = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp = fs.getFileStatus(metaPath).getModificationTime
    metaCache.compute(path, (p, cached) =>
      if (cached != null && cached._1 == stamp) cached
      else (stamp, Layout.readMeta(spark, p)))._2
  }

  /** Drop the cached meta for `path` (a re-layout also invalidates
    * automatically via the meta directory's modification stamp). */
  def invalidateMeta(path: String): Unit = { metaCache.remove(path); () }

  /** Append one batch into `path`'s `zcell=` directories using the
    * frozen meta bounds. */
  def appendBatch(batch: DataFrame, path: String): Unit =
    withCell(batch, metaOf(batch.sparkSession, path))
      .write.mode("append").partitionBy("zcell").parquet(s"$path/data")

  private def withCell(df: DataFrame, meta: Layout.TableMeta): DataFrame =
    df.where(col(meta.xName).isNotNull && col(meta.yName).isNotNull)
      .withColumn("zcell", shiftright(
        Layout.zValue(
          Layout.scaleKey(meta.xName, meta.xLo, meta.xHi),
          Layout.scaleKey(meta.yName, meta.yLo, meta.yHi)),
        32 - meta.cellBits))

  /** Checkpointed AvailableNow maintenance run: each micro-batch appends
    * into the clustered layout behind a per-batch marker (a replayed
    * batch that already committed is skipped). */
  def run(stream: DataFrame, path: String, checkpointPath: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    BucketedSink.runToTable(stream, s"$path/data", checkpointPath,
      batch => appendBatch(batch, path))

  /** Partition-pruned read over a maintained table: [[Layout.readPruned]]
    * plus the deterministic-key dedup that restores exactly-once over
    * at-least-once file appends (the [[AnnIndex]] reader contract). */
  def readPruned(spark: SparkSession, path: String, key: String,
    xRange: Option[(Long, Long)], yRange: Option[(Long, Long)]): DataFrame =
    Layout.readPruned(spark, path, xRange, yRange).dropDuplicates(key)

  /** Fold accumulated appends back to one clustered file per cell and GC
    * the batch markers; crash-safe swap per [[BucketedSink.compact]].
    * Run BETWEEN streaming runs. Rows are deduplicated on `key` here so
    * replayed appends stop paying their read-side dedup forever. */
  def compact(spark: SparkSession, path: String, key: String): Unit = {
    val meta = metaOf(spark, path)
    BucketedSink.compact(spark, s"$path/data", (df, tmp) =>
      withCell(df.drop("zcell").dropDuplicates(key), meta)
        .repartition(col("zcell"))
        .sortWithinPartitions(col(meta.xName), col(meta.yName))
        .write.mode("overwrite").partitionBy("zcell").parquet(tmp))
  }
}
