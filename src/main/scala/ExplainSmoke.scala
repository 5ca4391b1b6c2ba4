import org.apache.spark.sql.SparkSession
object ExplainSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    println("=== PROFILE PLAN ===")
    graft.SparkEntry.queries("orders_profile")(spark, d).explain("formatted")
    println("=== TRIANGLES PLAN ===")
    graft.SparkEntry.queries("feed_triangles")(spark, d).explain("formatted")
    spark.stop()
  }
}
