package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** As-of join semantics on a hand-checkable timeline. */
class AsOfJoinSpec extends SparkSuite {

  import spark.implicits._

  test("latest right row at-or-before each left row, per key") {
    val quotes = Seq( // (sym, t, px)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0))
      .toDF("sym", "t", "px")
    val trades = Seq( // (sym, t, qty)
      ("A", 5L, 100L),  // before any quote → null
      ("A", 20L, 200L), // exactly at a quote → inclusive match (2.0)
      ("A", 25L, 300L), // between quotes → 2.0
      ("A", 99L, 400L), // after all → 3.0
      ("B", 16L, 500L), // → 9.0
      ("C", 50L, 600L)) // key with no right rows → null
      .toDF("sym", "t", "qty")

    val got = AsOfJoin
      .asof(trades, quotes, Seq("sym"), "t", "t", payload = Seq("t", "px"))
      .orderBy("sym", "t")
      .collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("t"),
        Option(r.get(r.fieldIndex("asof_px"))).map(_.asInstanceOf[Double])))

    assert(got.toSeq === Seq(
      ("A", 5L, None),
      ("A", 20L, Some(2.0)),
      ("A", 25L, Some(2.0)),
      ("A", 99L, Some(3.0)),
      ("B", 16L, Some(9.0)),
      ("C", 50L, None)))
  }

  test("null keys never match (SQL join semantics), left rows survive unenriched") {
    val right = Seq(
      (Option.empty[Long], 10L, "from-null-key"),
      (Option(1L), 10L, "from-key-1"))
      .toDF("k", "t", "v")
    val left = Seq(
      (Option.empty[Long], 20L, 100L), // null key → must stay unenriched
      (Option(1L), 20L, 200L))
      .toDF("k", "t", "lid")
    val got = AsOfJoin.asof(left, right, Seq("k"), "t", "t", Seq("v"))
      .collect()
      .map(r => r.getAs[Long]("lid") -> Option(r.getAs[String]("asof_v")))
      .toMap
    assert(got(100L) === None)
    assert(got(200L) === Some("from-key-1"))
  }

  test("left columns pass through untouched; payload is prefixed") {
    val right = Seq((1L, 10L, "x")).toDF("k", "t", "v")
    val left = Seq((1L, 11L, "keep")).toDF("k", "t", "note")
    val out = AsOfJoin.asof(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(out.columns.toSeq === Seq("k", "t", "note", "asof_v"))
    val row = out.collect().head
    assert(row.getAs[String]("note") === "keep")
    assert(row.getAs[String]("asof_v") === "x")
  }
}
