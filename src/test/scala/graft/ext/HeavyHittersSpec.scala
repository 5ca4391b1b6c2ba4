package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters: the three sketch contracts (no overcount,
  * N/(k+1) undercount band, no false negatives above threshold) on a
  * planted skewed stream, under adversarial partitioning, plus the
  * summary-size bound the 100 TB posture rests on. */
class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  // planted stream: one heavy key (40%), one warm (20%), 60 cold keys
  // sharing the rest — interleaved so every partition sees the tail
  private def planted = {
    val rows = (0 until 5000).map { i =>
      if (i % 5 < 2) "heavy"
      else if (i % 5 == 2) "warm"
      else s"cold_${i % 60}"
    }
    rows.toDF("k").repartition(7) // round-robin: heavy spread everywhere
  }

  test("guaranteed survivors pass all three contracts") {
    val out = HeavyHitters.heavyHittersCheck(planted, k = 8).collect()
    // threshold N/(k+1) = 5000/9 ≈ 555: heavy (2000) and warm (1000) only
    assert(out.map(_.getString(0)).toSet === Set("heavy", "warm"))
    out.foreach { r =>
      assert(r.getBoolean(2), s"in_summary failed for ${r.getString(0)}")
      assert(r.getBoolean(3), s"no_overcount failed for ${r.getString(0)}")
      assert(r.getBoolean(4), s"within_band failed for ${r.getString(0)}")
    }
    assert(out.find(_.getString(0) == "heavy").get.getLong(1) === 2000L)
  }

  test("summary never overcounts ANY key and stays size-bounded") {
    val df = planted
    val parts = df.rdd.getNumPartitions
    val summary = HeavyHitters.mgSummary(df, k = 8).collect()
    assert(summary.length <= parts * 8,
      s"summary ${summary.length} rows > partitions($parts) × k(8)")
    val exact = df.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    summary.foreach { r =>
      assert(r.getLong(1) <= exact(r.getString(0)),
        s"overcount on ${r.getString(0)}")
    }
  }

  test("k larger than the key domain degrades to exact counting") {
    val df = Seq("a", "a", "b", "c", "a", "b").toDF("k").repartition(3)
    val got = HeavyHitters.mgSummary(df, k = 16).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("null keys are excluded from stream, summary, and survivor set") {
    val df = Seq(Some("x"), None, Some("x"), None, Some("y"))
      .toDF("k")
    val out = HeavyHitters.heavyHittersCheck(df, k = 2).collect()
    // N = 3 (nulls dropped), threshold 1: x (2) survives, y (1) does not
    assert(out.map(_.getString(0)).toSet === Set("x"))
    assert(out.head.getLong(1) === 2L)
    assert(out.head.getBoolean(2) && out.head.getBoolean(3) &&
      out.head.getBoolean(4))
  }

  test("adversarial single-partition order still respects the band") {
    // worst case for MG: the heavy key arrives FIRST, then a long uniform
    // tail keeps evicting it — est may drop well below exact but never
    // below exact − N/(k+1)
    val rows = Seq.fill(300)("heavy") ++
      (0 until 900).map(i => s"t_${i % 90}") // 90 tail keys × 10
    val df = rows.toDF("k").coalesce(1)
    val k = 4
    val n = rows.size
    val summary = HeavyHitters.mgSummary(df, k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = summary.getOrElse("heavy", 0L)
    assert(est <= 300L)
    assert(300L - est <= n / (k + 1),
      s"undercount ${300L - est} exceeds N/(k+1) = ${n / (k + 1)}")
    // 300 > 1200/5 = 240 → heavy is a guaranteed survivor
    assert(est > 0L)
  }
}
