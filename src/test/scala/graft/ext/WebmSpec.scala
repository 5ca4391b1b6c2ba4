package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** WebM tier: EBML walk round-trip over real arithmetic-coded VP8
  * keyframes, frame-order pinning, and the house strictness. */
class WebmSpec extends SparkSuite {

  private lazy val docs =
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")

  test("webm round-trips the DC-only VP8 family: dims, frame count, " +
      "and the closed-form per-frame reconstruction") {
    val feats = Multimodal.webmFeatures(Multimodal.mediaWebmVp8(docs))
      .orderBy("media_id").collect()
    assert(feats.length === docs.count())
    val dcQ = Vp8Tables.dcQLookup
    feats.take(25).foreach { r =>
      val id = r.getAs[Long]("media_id")
      val w = (id % 37 + 1).toInt; val h = ((3 * id) % 29 + 1).toInt
      val qi = (id % 128).toInt; val nf = (id % 4 + 1).toInt
      assert(r.getAs[Int]("width") === w && r.getAs[Int]("height") === h)
      assert(r.getAs[Long]("n_frames") === nf.toLong)
      val mbW = (w + 15) / 16; val mbH = (h + 15) / 16
      val n = mbW * mbH
      val q2dc = dcQ(qi) * 2; val uvdc = math.min(dcQ(qi), 132)
      def chain(add: Int => Int, tok: Int => Int): Array[Int] = {
        val m = new Array[Int](n)
        var k = 0
        while (k < n) {
          val mx = k % mbW; val my = k / mbW
          val pred =
            if (k == 0) 128
            else if (my == 0) m(k - 1)
            else if (mx == 0) m(k - mbW)
            else (m(k - 1) + m(k - mbW) + 1) >> 1
          m(k) = math.max(0, math.min(255, pred + add(tok(k))))
          k += 1
        }
        m
      }
      var sr = 0L; var ck = 0L
      for (f <- 0 until nf) {
        val ym = chain(t => (((t * q2dc + 3) >> 3) + 4) >> 3,
          k => ((id + 5 * k + 13 * f) % 23 - 11).toInt)
        val um = chain(t => (t * uvdc + 4) >> 3,
          k => ((3 * id + 7 * k + 11 * f) % 19 - 9).toInt)
        val vm = chain(t => (t * uvdc + 4) >> 3,
          k => ((7 * id + 11 * k + 17 * f) % 17 - 8).toInt)
        for (k <- 0 until n) {
          val npx = math.min(16, w - 16 * (k % mbW)) *
            math.min(16, h - 16 * (k / mbW))
          val yy = 298 * (ym(k) - 16)
          val dd = um(k) - 128; val ee = vm(k) - 128
          def c8(v: Int) = math.max(0, math.min(255, v >> 8))
          val rr = c8(yy + 409 * ee + 128)
          val gg = c8(yy - 100 * dd - 208 * ee + 128)
          val bb = c8(yy + 516 * dd + 128)
          sr += rr.toLong * npx
          ck += (f + 1).toLong * (rr + 2L * gg + 3L * bb) * npx
        }
      }
      assert(r.getAs[Long]("sum_r") === sr, s"sum_r for $id")
      assert(r.getAs[Long]("checksum") === ck, s"frame order for $id")
    }
  }

  test("strictness: wrong DocType, second track, non-VP8 codec, lacing, " +
      "undeclared track, non-keyframe flag, and fuzz never throw") {
    val one = Multimodal.mediaWebmVp8(docs.where(col("doc_id") === 3))
      .collect().head.getAs[Array[Byte]]("payload")
    assert(WebmCodec.decodeFrames(one).nonEmpty, "control")
    def findAscii(p: Array[Byte], s: String): Int = {
      val b = s.getBytes("US-ASCII")
      (0 to p.length - b.length).find(i =>
        b.indices.forall(j => p(i + j) == b(j))).get
    }
    val badDoc = one.clone()
    badDoc(findAscii(one, "webm")) = 'x'
    assert(WebmCodec.decodeFrames(badDoc).isEmpty)
    val badCodec = one.clone()
    badCodec(findAscii(one, "V_VP8") + 2) = 'P'.toByte
    assert(WebmCodec.decodeFrames(badCodec).isEmpty)
    // first SimpleBlock: id 0xA3, then size vint, then 0x81 track,
    // 2-byte timecode, flags 0x80
    val blockAt = (0 until one.length - 6).find(i =>
      (one(i) & 0xff) == 0xa3 && (one(i + 2) & 0xff) == 0x81 &&
        (one(i + 5) & 0xff) == 0x80).getOrElse(
      (0 until one.length - 7).find(i =>
        (one(i) & 0xff) == 0xa3 && (one(i + 3) & 0xff) == 0x81 &&
          (one(i + 6) & 0xff) == 0x80).get)
    val flagsAt = (blockAt until one.length).find(i =>
      (one(i) & 0xff) == 0x81).get + 3
    val laced = one.clone()
    laced(flagsAt) = (0x80 | 0x02).toByte
    assert(WebmCodec.decodeFrames(laced).isEmpty, "lacing must reject")
    val interFrame = one.clone()
    interFrame(flagsAt) = 0x00
    assert(WebmCodec.decodeFrames(interFrame).isEmpty,
      "a non-keyframe block must reject")
    val wrongTrack = one.clone()
    wrongTrack(flagsAt - 3) = 0x82.toByte // track 2, undeclared
    assert(WebmCodec.decodeFrames(wrongTrack).isEmpty)
    assert(WebmCodec.decodeFrames(one :+ 0x00.toByte).isEmpty,
      "trailing garbage must reject")
    (1 until one.length by 9).foreach { k =>
      WebmCodec.decodeFrames(java.util.Arrays.copyOf(one, k))
    }
    val rnd = new scala.util.Random(21)
    (0 until 300).foreach { _ =>
      val m = one.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      WebmCodec.decodeFrames(m)
    }
  }
}
