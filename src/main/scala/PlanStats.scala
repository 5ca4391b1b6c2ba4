import org.apache.spark.sql.SparkSession

/** Scratch: per-query physical-plan shape stats over the whole registry —
  * the round-19 optimization target finder. Counts duplicated-subtree
  * signals (parquet scans, exchanges, codec seams) per optimized plan. */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    println("query,scans,exchanges,mapparts,sorts,joins,plan_chars")
    for (q <- names) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, sf)
        val p = df.queryExecution.executedPlan.toString
        def c(tok: String) = tok.r.findAllIn(p).length
        println(s"STAT,$q,${c("Scan parquet")},${c("Exchange")}," +
          s"${c("MapPartitions")},${c("(?m)^\\s*\\+?-?\\s*\\*?\\(?\\d*\\)?\\s*Sort ")}," +
          s"${c("Join")},${p.length}")
      } catch {
        case e: Throwable => println(s"STAT,$q,ERR,${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
