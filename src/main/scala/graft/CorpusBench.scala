package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end throughput of the deployable streaming corpus pipeline
  * (VERDICT r9 item 8): file-source micro-batches over the fixture
  * documents → the FULL redacted gate chain (quality gate → watermarked
  * fingerprint dedup → decontamination anti-join → PII redaction) →
  * parquet training shards, with the per-stage `observe()` counters
  * summed across micro-batches — the one-place measurement of the
  * pipeline README narrates.
  *
  * Usage: runMain graft.CorpusBench [sfDir] [filesPerTrigger] — prints
  * one JSON line `{"metric":"corpus_stream_docs_per_sec", ...}` plus the
  * stage table. The corpus stages as 16 parquet files, so
  * filesPerTrigger=4 (default) measures the 4-micro-batch cadence and
  * 16 the single-batch steady state (per-batch scheduling overhead
  * dominates at fixture scale; the delta between the two isolates it).
  */
object CorpusBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val filesPerTrigger = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val nDocs = docs.count()
    val totalChars =
      docs.agg(sum(length(col("text")))).head().getLong(0)

    // stage the corpus as parquet chunk files so the stream runs the real
    // file source in bounded micro-batches (no driver-side feeding)
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val staging = tmp("graft_corpusbench_in")
    val outDir = tmp("graft_corpusbench_out")
    val ckpt = tmp("graft_corpusbench_ckpt")
    val feed = docs.select(
      col("doc_id"), col("text"), col("source"),
      timestamp_millis(lit(1700000000000L) + col("doc_id") * 1000)
        .as("event_ts"))
    feed.repartition(16).write.mode("overwrite").parquet(staging)

    // the same probe slice the corpus_clean batch twin decontaminates
    // against: every 50th document's fingerprint (static frame)
    val probeFps = docs.where(pmod(col("doc_id"), lit(50)) === 0)
      .select(graft.streaming.CorpusIngest.fingerprint.as("fp"))

    val streamIn = spark.readStream
      .schema(feed.schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(staging)

    val t0 = System.nanoTime()
    // watermark wider than the fixture's synthetic event_ts span so no
    // doc is late-dropped — the landed count is then identical at every
    // micro-batch cadence (4,892 at sf0.1), isolating THROUGHPUT as the
    // only variable under measurement
    val q = graft.streaming.CorpusIngest
      .cleanStreamRedacted(streamIn, probeFps, watermark = "30 days")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9

    // per-stage counters: sum each observe() metric across micro-batches
    val stages = scala.collection.mutable.LinkedHashMap[String, Long]()
    q.recentProgress.foreach { p =>
      p.observedMetrics.forEach { (name, row) =>
        (0 until row.length).foreach { i =>
          // a trailing empty micro-batch reports null observed values
          if (!row.isNullAt(i)) {
            val key = s"$name.${row.schema(i).name}"
            stages(key) = stages.getOrElse(key, 0L) + row.getLong(i)
          }
        }
      }
    }
    val landed = spark.read.parquet(outDir).count()
    stages.foreach { case (k, v) => System.err.println(f"STAGE $k%-40s $v") }
    val stageJson = stages.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(
      s"""{"metric":"corpus_stream_docs_per_sec","value":${nDocs / secs},""" +
        s""""unit":"docs/sec","sf_dir":"$sfDir","files_per_trigger":$filesPerTrigger,"docs":$nDocs,""" +
        s""""chars":$totalChars,"mb_per_sec":${totalChars / 1e6 / secs},""" +
        s""""landed":$landed,"secs":$secs,"stages":{$stageJson}}""")
    spark.stop()
  }
}
