package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the batch follow-graph connected components
  * ([[graft.serve.GraphStats.followComponents]]) — VERDICT r11 item 6,
  * completing the pattern the sketch tier set (StreamHeavyHitters sharing
  * mgFold with the batch Misra–Gries): the graph tier's component labels
  * maintained incrementally over the CDC follow stream.
  *
  * Architecture is the [[graft.ingest.CurrentState]] fold: a checkpointed
  * foreachBatch merges each edge micro-batch into a persisted label table
  * via write-new + swap. The merge input is the persisted table's STAR
  * edges (member → component label) unioned with the batch's new edges —
  * the star form preserves the connectivity relation of every edge seen
  * so far in O(vertices) rows, so each fold runs the label-propagation
  * loop over O(V + |batch|) edges, never a rescan of the full edge
  * history (the DedupIndex discipline applied to graphs). Labels are min
  * vertex ids, and min(star ∪ batch) over a merged component equals the
  * min over its full member set, so the fold's labels are IDENTICAL to a
  * batch run over all edges (StreamComponentsSpec pins batch ≡ replayed
  * stream on the fixture graph, including a bridge edge arriving in a
  * later batch that merges two existing components).
  *
  * Scale posture: per batch, one distinct() on the batch edges, the
  * persisted-label scan (V rows, two longs each), and the components
  * loop's two long-only shuffles per round; the swap write is V rows.
  * Exactly-once: the fold is idempotent — re-merging an already-folded
  * batch adds edges the star set already spans, reproducing the same
  * labels — so a foreachBatch replay after a checkpoint failure is
  * harmless (same argument as CurrentState's latest-wins replay).
  */
object StreamComponents {

  /** CDC follower micro-batch → canonical undirected edge list
    * (doc_a/doc_b, the components loop's column contract). Kept
    * identical to followComponents' edge extraction so the twin's input
    * semantics are the batch operator's (creates only, no self-loops). */
  private def batchEdges(followers: DataFrame): DataFrame =
    followers.where(col("__op") === "c")
      .select(col("follower_id").cast("long").as("doc_a"),
        col("following_id").cast("long").as("doc_b"))
      .where(col("doc_a") =!= col("doc_b"))
      .distinct()

  /** One fold step, exposed for the spec: merge an edge micro-batch into
    * the label table at `path` (missing table = empty graph). */
  def foldBatch(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crash between the swap's two renames below leaves the table only
    // at __old; heal before deciding "missing table = empty graph"
    graft.util.SwapDirs.restoreFromOld(fs, hPath)
    val newEdges = batchEdges(batch)
    val merged =
      if (fs.exists(hPath)) {
        // star edges: every labeled vertex → its component's min id.
        // The min vertex's own star is a self-loop (label == id) and is
        // dropped — its membership survives via the other members'
        // stars, and components never tracks edgeless singletons.
        val stars = spark.read.parquet(path)
          .select(col("user_id").as("doc_a"),
            col("component_id").as("doc_b"))
          .where(col("doc_a") =!= col("doc_b"))
        graft.ext.Dedup.components(stars.unionByName(newEdges))
      } else graft.ext.Dedup.components(newEdges)
    val out = merged
      .select(col("doc_id").as("user_id"), col("cluster_id").as("component_id"))
    val tmp = new org.apache.hadoop.fs.Path(path + "__next")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    // writing the merge materializes the read of the old table before
    // the swap retires it
    out.write.mode("overwrite").parquet(tmp.toString)
    // BucketedSink.compact posture: a crash never LOSES the table. The
    // live path is briefly absent between the two renames — a crash
    // there leaves the data only at __old, which the restoreFromOld at
    // the top of the next fold renames back before anything could
    // rebuild from an empty graph. (A delete-then-rename swap had no
    // such recovery: prior labels silently lost.) Rename live -> __old,
    // __next -> live (require: Hadoop rename signals failure by
    // returning false), then drop __old.
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(hPath)) {
      require(fs.rename(hPath, old),
        s"foldBatch: rename $hPath -> $old failed; table unchanged, merge at $tmp")
    }
    require(fs.rename(tmp, hPath),
      s"foldBatch: rename $tmp -> $hPath failed; prior table preserved at $old")
    fs.delete(old, true)
    ()
  }

  /** Streaming maintenance of the component-label table over a CDC
    * follower stream. */
  def runComponentsTable(
      followers: DataFrame,
      path: String,
      checkpointPath: String): org.apache.spark.sql.streaming.StreamingQuery =
    followers.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => foldBatch(batch, path) }
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Read the maintained labels in the batch operator's output shape. */
  def readComponents(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).orderBy("user_id")
}
