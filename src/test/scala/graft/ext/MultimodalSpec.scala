package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal plumbing: schema contract, deterministic stub decode, batch
  * shape. (The codec itself is a documented stub — these tests pin the
  * Spark-side contract a real codec would drop into.) */
class MultimodalSpec extends SparkSuite {

  private lazy val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
  private lazy val media = Multimodal.mediaFromDocuments(docs)

  test("media table schema: opaque binary payload + typed metadata") {
    val f = media.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(f("payload") === BinaryType)
    assert(f("kind") === StringType)
    assert(f("media_id") === LongType)
    assert(media.select("kind").distinct().count() === 3)
  }

  test("feature extraction is deterministic and fixed-shape") {
    val a = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val b = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(a.length === docs.count())
    def feats(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getSeq[Float](r.fieldIndex("feature")).toList)
    assert(feats(a).forall(_.length == 8))
    // deterministic: same payload → same features across runs
    assert(feats(a).zip(feats(b)).forall { case (x, y) => x == y })
    // dims in the stub's declared range
    assert(a.forall { r =>
      val w = r.getAs[Int]("width"); w >= 64 && w < 576 })
  }

  test("resize preserves aspect ratio, never upscales, passes audio through") {
    val resized = Multimodal.resize(media, maxDim = 128).collect()
    assert(resized.length === docs.count())
    resized.foreach { r =>
      val (ow, oh) = (r.getAs[Int]("orig_width"), r.getAs[Int]("orig_height"))
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val s = r.getAs[Double]("scale")
      if (r.getAs[String]("kind") == "audio") {
        assert(s === 1.0 && w === ow && h === oh)
      } else {
        assert(w <= 128 && h <= 128, s"$w x $h exceeds maxDim")
        assert(s <= 1.0, "never upscale")
        assert(w === math.max(1, math.round(ow * s).toInt))
        assert(h === math.max(1, math.round(oh * s).toInt))
        // aspect ratio preserved to rounding
        assert(math.abs(w.toDouble / h - ow.toDouble / oh) < 0.05 ||
          math.max(w, h) == 128)
      }
    }
  }

  test("frame sampling explodes only videos, every 4th frame") {
    val feats = Multimodal.extractFeatures(media)
    val frames = Multimodal.sampleFrames(feats, everyK = 4)
    val videoIds = feats.where(col("kind") === "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    val sampledIds = frames.select("media_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(sampledIds === videoIds)
    assert(frames.where(pmod(col("frame_idx"), lit(4)) =!= 0).count() === 0)
  }

  test("mediaNearDup: byte-identical payloads collide at hamming 0; " +
      "near-identical land close; unrelated never pair") {
    import spark.implicits._
    val body = ("spark window batch filter merge join scan table value " * 8).trim
    val m = Seq(
      (1L, "image", body.getBytes("UTF-8"), "s1", body.length.toLong),
      // same bytes re-"muxed" with a small metadata-style prefix tweak
      (2L, "image", ("XHDR" + body).getBytes("UTF-8"), "s1", body.length + 4L),
      (3L, "image", body.getBytes("UTF-8"), "s2", body.length.toLong),
      (4L, "audio", "totally different byte content with nothing shared at all here"
        .getBytes("UTF-8"), "s3", 63L),
      (5L, "image", "abc".getBytes("UTF-8"), "s4", 3L)) // < 4 bytes: no grams
      .toDF("media_id", "kind", "payload", "source", "declared_bytes")
    val pairs = Multimodal.mediaNearDup(m, maxHamming = 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Int]("hamming")).toMap
    assert(pairs((1L, 3L)) === 0, "byte-identical payloads: hamming 0")
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) <= 8,
      "prefix-tweaked copy lands within the hamming budget")
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated bytes never pair")
    assert(!pairs.keys.exists(p => p._1 == 5L || p._2 == 5L),
      "sub-4-byte payload has no grams and never pairs")
  }

  test("null payload (missing/undecodable media) flows through without crashing") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", null.asInstanceOf[Array[Byte]], "s1", 0L),
      (2L, "video", "real bytes".getBytes("UTF-8"), "s1", 10L))
      .toDF("media_id", "kind", "payload", "source", "declared_bytes")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 2, "no row dropped, no NPE")
    val resized = Multimodal.resize(media).collect()
    assert(resized.length === 2)
  }

  test("decodeImage dispatches every real decoder by magic bytes; video " +
      "containers contribute their first frame; unknowns stay None") {
    val few = docs.limit(3)
    def fmtOf(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().flatMap(r => Multimodal.decodeImage(
        r.getAs[Array[Byte]]("payload")).map(_._1)).toSet
    assert(fmtOf(Multimodal.mediaBmp(few)) === Set("bmp"))
    assert(fmtOf(Multimodal.mediaBmpRle(few)) === Set("bmp"))
    assert(fmtOf(Multimodal.mediaPgm(few)) === Set("pgm"))
    assert(fmtOf(Multimodal.mediaGif(few)) === Set("gif"))
    assert(fmtOf(Multimodal.mediaPng(few)) === Set("png"))
    assert(fmtOf(Multimodal.mediaJpeg(few)) === Set("jpeg"))
    assert(fmtOf(Multimodal.mediaWebpl(few)) === Set("webp"))
    assert(fmtOf(Multimodal.mediaAviDib(few)) === Set("avi"))
    assert(fmtOf(Multimodal.mediaAviMjpeg(few)) === Set("avi"))
    assert(Multimodal.decodeImage("not a picture".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    // AVI = FIRST frame: a one-pixel 2-frame DIB where the frames differ
    val avi = Multimodal.mediaAviDib(few.limit(1)).collect().head
    val (_, w, h, px) = Multimodal.decodeImage(
      avi.getAs[Array[Byte]]("payload")).get
    val frames = Multimodal.AviCodec.decodeFrames(
      avi.getAs[Array[Byte]]("payload")).get
    assert((w, h) === (frames._1, frames._2))
    assert(px.sameElements(frames._3(0)), "must be the FIRST frame")
  }

  test("pixelEmbeddingVec is the exact integer grid mean with 0 for " +
      "empty cells, and extractFeatures routes decoded payloads to it") {
    // 2×2 constant-gray 100: gx = x*4/2 ∈ {0, 2}, so exactly cells
    // 0, 2, 8, 10 hold pixels (mean milli-luma 100000), the rest 0
    val px = Array.fill(4)((100 << 16) | (100 << 8) | 100)
    val v = Multimodal.pixelEmbeddingVec(2, 2, px, 16)
    val expected = Array.tabulate(16)(i =>
      if (Set(0, 2, 8, 10)(i)) 100000f else 0f)
    assert(v.toSeq === expected.toSeq)
    // non-uniform: 1×2 column, lumas 1000·(10, 30) — cells (0,0) and
    // (2,0): y=0→gy0, y=1→gy2
    val v2 = Multimodal.pixelEmbeddingVec(1, 2, Array(
      (10 << 16) | (10 << 8) | 10, (30 << 16) | (30 << 8) | 30), 16)
    assert(v2(0) === 10000f && v2(8) === 30000f)
    assert(v2.count(_ != 0f) === 2)
    // non-square dim: a 3x3 grid serving dim=8 FOLDS cell 8 into entry
    // 7 — the bottom-right region must still contribute (it used to be
    // silently discarded). 3x3 image, only the bottom-right pixel lit:
    val br = Array.tabulate(9)(i =>
      if (i == 8) (90 << 16) | (90 << 8) | 90 else 0)
    val v3 = Multimodal.pixelEmbeddingVec(3, 3, br, 8)
    // entry 7 pools raw cells 7 and 8: pixels (1,2) dark and (2,2) at
    // 90 gray -> mean (0 + 90000) / 2
    assert(v3(7) === 45000f,
      "the folded last entry must carry the bottom-right region")
    assert(v3.sum !== 0f)
    // extractFeatures: a real BMP payload gets the PIXEL embedding, a
    // byte blob keeps the FakeCodec stub
    import spark.implicits._
    val bmpRow = Multimodal.mediaBmp(docs.limit(1)).collect().head
    val blob = "no codec claims this".getBytes("UTF-8")
    val media = Seq(
      (1L, "image", bmpRow.getAs[Array[Byte]]("payload"), "s", 0L),
      (2L, "image", blob, "s", 0L))
      .toDF("media_id", "kind", "payload", "source", "declared_bytes")
    val feats = Multimodal.extractFeatures(media, featureDim = 16)
      .orderBy("media_id").collect()
    val (_, bw, bh, bpx) = Multimodal.decodeImage(
      bmpRow.getAs[Array[Byte]]("payload")).get
    assert(feats(0).getSeq[Float](feats(0).fieldIndex("feature")).toSeq ===
      Multimodal.pixelEmbeddingVec(bw, bh, bpx, 16).toSeq)
    assert(feats(0).getAs[Int]("width") === bw)
    assert(feats(1).getSeq[Float](feats(1).fieldIndex("feature")).toSeq ===
      Multimodal.FakeCodec.features(blob, 16).toSeq)
  }
}
