package graft
import org.apache.spark.sql.SparkSession
object Calib {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 100000000L, 1, 32)
        .selectExpr("xxhash64(id) % 1000003 AS h", "id % 97 AS k")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("h"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate()
    println(f"CALIB ${Seq.fill(3)(calibrate()).sorted.apply(1)}%.3f")
    spark.stop()
  }
}
