package graft.ingest

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** SCD Type-2 interval semantics: interval cutting, delete gaps,
  * zero-width ties, replay idempotence, point-in-time consistency with
  * the current-state view, and the one-exchange plan shape. */
class Scd2Spec extends SparkSuite {

  import spark.implicits._

  // (pk, op, ts, id, payload)
  private def df(rows: (Long, String, Long, Long, String)*) =
    rows.toDF("pk", "__op", "__source_ts_ms", "id", "payload")

  private def hist(d: org.apache.spark.sql.DataFrame) =
    Scd2.history(d, Seq("pk"))

  test("c/u/d events cut half-open intervals; deletes close without reopening") {
    val cdc = df(
      (1L, "c", 100L, 1L, "v1"), (1L, "u", 200L, 2L, "v2"),
      (1L, "d", 300L, 3L, "v2"), (1L, "c", 400L, 4L, "v3"))
    val h = hist(cdc).orderBy("valid_from")
      .select("id", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3)))
    assert(h.toSeq === Seq(
      (1L, 100L, Some(200L), false),   // closed by the update
      (2L, 200L, Some(300L), false),   // closed by the DELETE — no v at 350
      (4L, 400L, None, true)))         // re-created, currently live
    // the delete gap: no row live at t=350
    assert(Scd2.stateAt(hist(cdc), lit(350L)).count() === 0)
    // but v2 is live at t=250 (point-in-time audit across the delete)
    val at250 = Scd2.stateAt(hist(cdc), lit(250L)).collect()
    assert(at250.length === 1 && at250.head.getAs[String]("payload") === "v2")
  }

  test("timestamp ties collapse to zero-width intervals; stateAt sees the tie winner") {
    val cdc = df((1L, "c", 100L, 1L, "lo"), (1L, "u", 100L, 2L, "hi"))
    val h = hist(cdc).orderBy("id").collect()
    // [100,100) for the loser, [100,null) for the winner
    assert(h.map(r => Option(r.get(r.fieldIndex("valid_to")))).toSeq ===
      Seq(Some(100L), None))
    val live = Scd2.stateAt(hist(cdc), lit(100L)).collect()
    assert(live.length === 1 && live.head.getAs[String]("payload") === "hi")
  }

  test("exact replays mint no duplicate versions (at-least-once delivery)") {
    val once = df(
      (1L, "c", 100L, 1L, "v1"), (1L, "u", 200L, 2L, "v2"),
      (2L, "c", 150L, 3L, "a"))
    val replayed = once.unionByName(once) // the whole batch delivered twice
    val a = hist(once).orderBy("pk", "valid_from").collect().toSeq
    val b = hist(replayed).orderBy("pk", "valid_from").collect().toSeq
    assert(a === b)
  }

  test("stateAt(max ts) equals the current-state view on the CDC fixture") {
    val d = "/root/testdata/sf0.001"
    val (l, c, sh, f) = graft.sources.CdcSource.all(spark, d)
    val u = Seq(l, c, sh, f)
      .map(_.select(col("__source_table").as("tbl"), col("id"),
        col("__op"), col("__source_ts_ms").as("ts_ms")))
      .reduce(_ unionByName _)
      .withColumn("pk", pmod(col("id"), lit(250)))
    val h = Scd2.history(u, Seq("tbl", "pk"), "ts_ms", "__op", Seq("id"))
    val tMax = u.agg(max("ts_ms")).head().getLong(0)
    val viaScd2 = Scd2.stateAt(h, lit(tMax))
      .select(col("tbl"), col("pk"), col("id"))
    val viaCurrent = CurrentState
      .currentState(u, Seq("tbl", "pk"), "ts_ms", tieBreak = Seq("id"))
      .select(col("tbl"), col("pk"), col("id"))
    assert(viaScd2.exceptAll(viaCurrent).count() === 0)
    assert(viaCurrent.exceptAll(viaScd2).count() === 0)
    assert(viaCurrent.count() > 0)
  }

  test("history plans ONE exchange: replay-dedup lag and interval lead share the sort") {
    val cdc = df((1L, "c", 100L, 1L, "v1"), (1L, "u", 200L, 2L, "v2"))
    val plan = hist(cdc).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(sorts === 1, s"expected 1 sort, plan:\n$plan")
  }
}
