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

  /** Append one batch into `path`'s cell directories using the frozen
    * meta bounds — [[Layout.withFileCol]] is the SAME keying path the
    * initial build used, so appends bucket identically for either curve
    * (z or Hilbert) and any cellsPerFile. */
  def appendBatch(batch: DataFrame, path: String): Unit = {
    val meta = metaOf(batch.sparkSession, path)
    val keyed = Layout.withFileCol(batch, meta).persist()
    try {
      keyed.write.mode("append").partitionBy(meta.partitionCol)
        .parquet(s"$path/data")
      // the stats manifest grows one row per batch×file — sound for the
      // stats reader (a file is scanned iff ANY of its rows intersects);
      // compact() folds it back to one row per file
      Layout.writeStats(keyed, path, meta, mode = "append")
    } finally { keyed.unpersist(); () }
  }

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
      Layout.withFileCol(
        df.drop(meta.partitionCol).dropDuplicates(key), meta)
        .repartition(col(meta.partitionCol))
        .sortWithinPartitions(col(meta.xName), col(meta.yName))
        .write.mode("overwrite").partitionBy(meta.partitionCol).parquet(tmp))
    // fold the per-batch stats rows back to one row per file (reading
    // the freshly compacted data keeps manifest and bytes in lockstep)
    Layout.writeStats(
      Layout.withFileCol(
        spark.read.parquet(s"$path/data").drop(meta.partitionCol), meta),
      path, meta)
  }
}
