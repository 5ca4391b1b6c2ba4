package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming Misra–Gries: the batch sketch ([[graft.ext.HeavyHitters]])
  * maintained as keyed streaming state — the continuous frequent-keys
  * monitor (hot URLs, hot shards, trending tokens) a long-running ingest
  * runs beside the pipeline.
  *
  * Sharding: the key space hash-partitions into `buckets` groups and each
  * group's state is ITS OWN k-counter MG summary over every arrival of
  * its keys. Because a key's occurrences all land in one bucket, each
  * summary carries the full MG contract for its keys with the TIGHTER
  * per-bucket bound: true(x) − est(x) ≤ N_bucket/(k+1) ≤ N/(k+1). The
  * union of bucket summaries is therefore a valid (sharded) heavy-hitter
  * summary of the whole stream — the same mergeable-summaries fact the
  * batch operator's partition merge rests on, with hash sharding playing
  * the role partitioning plays there.
  *
  * State is bounded BY CONSTRUCTION at buckets × k counters — the sketch
  * is its own eviction policy, so no timeout bookkeeping is needed
  * (contrast [[StreamingIngest.userStats]], whose per-user counters need
  * event-time eviction to stay bounded). Each update emits the bucket's
  * refreshed summary stamped with a per-bucket version; the latest
  * version per bucket is the current snapshot (update-mode sinks retain
  * stale rows; StreamHeavyHittersSpec folds by max version).
  */
/** One summary row: hash bucket, its snapshot version, key, estimate. */
final case class HHRow(bucket: Int, version: Long, key: String, est: Long)

/** A bucket's MG state: snapshot version + the k-bounded counters.
  * Top-level (not nested/private) — the state encoder's generated code
  * needs a public constructor and accessors. */
final case class HHBucketState(version: Long, counters: Map[String, Long])

object StreamHeavyHitters {

  /** MG fold of one micro-batch's arrivals into a bucket's counters —
    * THE batch operator's update rule, shared (not copied) so the two
    * sketches cannot diverge. */
  private[streaming] def mgFold(
      counters: scala.collection.mutable.HashMap[String, Long],
      arrivals: Iterator[String],
      k: Int): Unit =
    graft.ext.HeavyHitters.mgFold(counters, arrivals, k)

  /** Continuous sharded-MG summary over a streaming frame whose first
    * column is the key. Update-mode output: every touched bucket emits
    * its full refreshed summary each micro-batch. */
  def streamSummary(keys: DataFrame, k: Int, buckets: Int = 16): Dataset[HHRow] = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys
      .select(col(keys.columns.head).cast("string").as("key"))
      .where(col("key").isNotNull)
      .select(pmod(xxhash64(col("key")), lit(buckets)).cast("int").as("bucket"),
        col("key"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HHBucketState, HHRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (bucket, rows, state) =>
          val prev = state.getOption.getOrElse(HHBucketState(0L, Map.empty))
          val counters = scala.collection.mutable.HashMap[String, Long](
            prev.counters.toSeq: _*)
          mgFold(counters, rows.map(_._2), k)
          val next = HHBucketState(prev.version + 1L, counters.toMap)
          state.update(next)
          counters.iterator.map { case (key, est) =>
            HHRow(bucket, next.version, key, est)
          }
      }
  }
}
