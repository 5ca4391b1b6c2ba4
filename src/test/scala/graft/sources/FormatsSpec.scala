package graft.sources

import graft.SparkSuite
import graft.model.Schemas
import org.apache.spark.sql.functions._

/** Source-format coverage: the engine's tables round-trip through JSON
  * lines and CSV with explicit schemas (the reference's wire format is
  * schema-less JSON — debezium config.json:20-23 — so the JSON path is the
  * production-relevant one). */
class FormatsSpec extends SparkSuite {

  import spark.implicits._

  private lazy val likes = {
    val ev = CdcSource.events(spark, "/root/testdata/sf0.001")
    CdcSource.likes(ev)
  }

  test("JSON-lines round trip preserves rows and types (explicit schema)") {
    val dir = tmpDir("fmt_json")
    likes.write.mode("overwrite").json(dir)
    val back = spark.read.schema(Schemas.likesCdc).json(dir)
    assert(back.count() === likes.count())
    val a = likes.select("id", "shard_id", "liked_by", "__op").orderBy("id").collect().toSeq
    val b = back.select("id", "shard_id", "liked_by", "__op").orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("CSV round trip with header preserves values") {
    val dir = tmpDir("fmt_csv")
    likes.select("id", "shard_id", "liked_by", "__op")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .option("header", "true")
      .schema("id LONG, shard_id LONG, liked_by STRING, __op STRING")
      .csv(dir)
    assert(back.count() === likes.count())
    assert(back.agg(sum("id")).collect().head.getLong(0) ===
      likes.agg(sum("id")).collect().head.getLong(0))
  }

  test("ORC round trip preserves rows and types") {
    val dir = tmpDir("fmt_orc")
    likes.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === likes.count())
    val a = likes.select("id", "shard_id", "liked_by", "__op").orderBy("id").collect().toSeq
    val b = back.select("id", "shard_id", "liked_by", "__op").orderBy("id").collect().toSeq
    assert(a === b)
    // predicate pushdown reaches the ORC reader the same as parquet
    assert(back.where(col("__op") === "c").count() ===
      likes.where(col("__op") === "c").count())
  }

  test("kafka-frame shape: value-bytes -> envelope -> adapter round trip") {
    // the full wire path: struct -> JSON string (to_json) -> binary value
    // column -> from_json parse -> gates -> projection
    val frames = likes
      .select(to_json(struct(likes.columns.map(col): _*)).cast("binary").as("value"))
    val parsed = graft.ingest.CdcEnvelope.parseTable(frames, "likes")
    assert(parsed.count() === likes.count())
    val acts = graft.ingest.Adapters.likes(graft.ingest.CdcEnvelope.admitted(parsed))
    assert(acts.count() === likes.where(col("__op") === "c").count())
  }
}
