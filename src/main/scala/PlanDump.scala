import org.apache.spark.sql.SparkSession

/** Scratch: dump `explain("formatted")` of named registered queries to
  * files — the plans/r19 before/after evidence the optimization round
  * commits. Usage: runMain PlanDump <outDir> <suffix> <query>... */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = args(0)
    val suffix = args(1)
    val sf = "/root/testdata/sf0.01"
    new java.io.File(outDir).mkdirs()
    for (q <- args.drop(2)) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"dumped $q")
      graft.ext.Dedup.releaseAll()
    }
    spark.stop()
  }
}
