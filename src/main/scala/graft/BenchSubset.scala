package graft
import org.apache.spark.sql.SparkSession

/** Local timing harness for individual registered queries — Bench's
  * timed region (noop write + releaseAll between queries) over an
  * explicit subset, with the same sf0.001 warm-up, so a single query's
  * plan change can be measured without a full 180-query run.
  * Usage: runMain graft.BenchSubset <sfDir> <queryName>...
  *
  * SPARK_GRAFT_MASTER overrides the master — notably
  * `local-cluster[4,8,4096]` (4 SEPARATE executor JVMs × 8 cores):
  * real RPC, serialized shuffle blocks over the network stack, and
  * closure/kryo costs that local[32]'s in-process block manager never
  * pays. That is the SCALE_PROBE multi-node-exchange evidence mode (no
  * cluster needed). The forked run JVM's full classpath is handed to
  * the executors (graft classes aren't in SPARK_HOME's jars), plus the
  * JDK-17 --add-opens set the driver itself needs. */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")
    val builder = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) {
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar")
        .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
      builder
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "3g"))
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // same one-time write-path warm-ups Bench performs outside the timed
    // region, so index-probing queries measure probing, not building
    def warmUp(body: => Any): Unit =
      try body catch { case e: Throwable => System.err.println(e.getMessage) }
    warmUp(graft.sinks.ActivitySink.materialized(spark, dir))
    warmUp(graft.sinks.AnnIndex.materialized(spark, dir))
    warmUp(graft.sinks.DedupIndex.materialized(spark, dir))
    warmUp(graft.sinks.TextIndex.materialized(spark, dir))
    warmUp(graft.sinks.PqIndex.materialized(spark, dir))
    warmUp(graft.sinks.MediaSink.materialized(spark, dir))
    warmUp(graft.sinks.MediaSink.annIndexed(spark, dir))
    warmUp(graft.sinks.WebSink.materialized(spark, dir))
    warmUp(graft.sinks.WebSink.materializedMain(spark, dir))
    warmUp(graft.sinks.WebSink.materializedFetch(spark, dir))
    warmUp(graft.sinks.WebSink.materializedRecrawl(spark, dir))
    // mirror Bench's shared-artifact memo warm-ups (ADVICE r10): without
    // these, the first timed memoized query pays the full build here but
    // not in Bench, making the two harnesses incomparable for exactly
    // the memo-served queries this harness exists to remeasure
    warmUp(graft.ext.Similarity.knnClustersAt(spark, dir).count())
    warmUp(graft.ext.Similarity.knnCellComponentPaths(spark, dir))
    warmUp(graft.sinks.TextIndex.standardLexRun(spark, dir).count())
    warmUp(graft.ext.Dedup.nearDupComponentsAt(spark, dir).count())
    warmUp(graft.ext.Dedup.semanticComponentsAt(spark, dir).count())
    warmUp(graft.ext.Bpe.learnAt(spark, dir))
    warmUp(graft.ext.Dsir.importanceWeightsAt(spark, dir).count())
    warmUp(graft.ext.Pca.componentsAt(spark, dir).count())
    warmUp(graft.ext.Layout.clusteredOrdersAt(spark, dir))
    warmUp(graft.ext.Layout.clusteredOrdersHilbertAt(spark, dir))
    warmUp(graft.sinks.LayoutSink.driftedOrdersLayoutAt(spark, dir))
    graft.ext.Dedup.releaseAll()
    for (n <- args.drop(1)) { // warm-up, untimed
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      graft.ext.Dedup.releaseAll()
    }
    for (n <- args.drop(1)) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      graft.ext.Dedup.releaseAll()
      println(f"TIMED $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
