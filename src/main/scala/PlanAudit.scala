import org.apache.spark.sql.SparkSession

/** Scratch: dump formatted plans of headline queries for the scale audit. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"########## PLAN $q")
      graft.SparkEntry.queries(q)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
