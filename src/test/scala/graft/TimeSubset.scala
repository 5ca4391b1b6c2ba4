package graft

import org.apache.spark.sql.SparkSession

/** Local timing harness for a SUBSET of registered queries — Bench's
  * methodology (sf0.001 warm-up pass, then timed noop-sink writes at the
  * target SF) without the full-suite cost, for fast perf iteration.
  * Run: sbt "Test/runMain graft.TimeSubset <sfDir> <name> [name...]".
  * Not part of any gate; Bench remains the judged artifact.
  */
object TimeSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(n: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      finally graft.ext.Dedup.releaseAll()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(force(_, "/root/testdata/sf0.001")) // warm-up, untimed
    names.foreach(n => println(f"TIMED $n%-35s ${force(n, sfDir)}%.3f"))
    spark.stop()
  }
}
