package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming corpus ingest: quality gate → online dedup → decontamination,
  * with at-least-once replay absorbed by the watermarked dedup state and
  * semantics pinned to the batch twin (`corpus_clean`, DuckDB-oracled). */
class CorpusIngestSpec extends SparkSuite {

  import spark.implicits._

  private val goodText =
    "the quick brown fox jumps over the lazy dog and it is a fine day in the sun"
  private val otherText =
    "a completely original essay about the nature of distributed systems and their failures"
  private val benchText =
    "benchmark question with the official answer key included in it for the eval"
  private val junkText = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"

  private case class Doc(doc_id: Long, text: String, source: String,
      event_ts: java.sql.Timestamp)
  private def doc(id: Long, text: String, tsSec: Long) =
    (id, text, "s1", new java.sql.Timestamp(tsSec * 1000))

  test("stream gate: junk filtered, duplicates collapsed, benchmark " +
      "fingerprints dropped; replay absorbed") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val probeFps = Seq(benchText).toDF("text")
      .select(CorpusIngest.fingerprint.as("fp"))
    val out = tmpDir("corpus_clean_out")
    val ckpt = tmpDir("corpus_clean_ckpt")
    def run(): Unit = {
      val q = CorpusIngest.cleanStream(
          mem.toDF().toDF("doc_id", "text", "source", "event_ts"),
          probeFps)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    mem.addData(
      doc(1, goodText, 1000),
      doc(2, goodText, 1010),   // exact dup of 1 (same fingerprint)
      doc(3, junkText, 1020),   // fails the quality gate
      doc(4, benchText, 1030),  // contaminated: fp in the probe set
      doc(5, otherText, 1040))
    run()
    // replay the same docs (at-least-once redelivery) + one new doc
    mem.addData(
      doc(1, goodText, 1000),
      doc(5, otherText, 1040),
      doc(6, otherText.toUpperCase, 1050), // dup of 5 modulo normalization
      doc(7, "yet another genuinely new and reasonably long clean document here", 1060))
    run()

    val kept = spark.read.parquet(out)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(kept === Seq(1L, 5L, 7L),
      "junk, duplicates, replays and benchmark docs must all be dropped")
  }

  test("batch twin applies the same gates (against the fixture corpus)") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val got = CorpusIngest.cleanBatch(docs).collect()
    assert(got.nonEmpty)
    val ids = got.map(_.getAs[Long]("doc_id")).toSet
    // no probe-slice doc survives (its own fp is in the probe set)
    assert(!ids.exists(_ % 50 == 0))
    // no duplicate fingerprints in the output
    val fps = got.map(_.getAs[String]("fp"))
    assert(fps.length === fps.distinct.length)
    // quality floor holds
    assert(got.forall(_.getAs[Double]("quality_r") >= 0.3))
  }
}
