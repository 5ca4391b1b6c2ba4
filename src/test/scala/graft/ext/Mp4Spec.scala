package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** MP4/ISO-BMFF tier: the box walk's sample-table resolution against
  * the muxer, the pure-Column dims parse against the JVM walk, and the
  * AVI-grade strictness rejects. */
class Mp4Spec extends SparkSuite {

  private lazy val docs =
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")

  test("mp4 mjpeg round-trips the dcOnlyJpeg frames: dims, count, and " +
      "exact tile values survive mux -> box walk -> sample decode") {
    val feats = Multimodal.mp4Features(Multimodal.mediaMp4Mjpeg(docs))
      .orderBy("media_id").collect()
    assert(feats.length === docs.count())
    feats.take(20).foreach { r =>
      val id = r.getAs[Long]("media_id")
      val wb = (id % 3 + 1).toInt; val hb = (2 - id % 2).toInt
      val nf = (id % 5 + 2).toInt
      assert(r.getAs[Int]("width") === wb * 8)
      assert(r.getAs[Int]("height") === hb * 8)
      assert(r.getAs[Long]("n_frames") === nf.toLong)
      // each 8x8 tile reconstructs to 128 + cumulative DC sum; the
      // even-id midpoint inversion negates the whole cumsum
      var luma = 0L
      for (f <- 0 until nf) {
        val inv = id % 2 == 0 && f >= nf / 2
        var s = 0L
        for (j <- 0 until wb * hb) {
          val mag = (id * 7 + j * 3) % 8 + 8
          s += (if ((id + j) % 2 == 0) mag else -mag)
          luma += 64000L * (128 + (if (inv) -s else s))
        }
      }
      assert(r.getAs[Long]("luma_milli") === luma, s"luma for $id")
    }
  }

  test("pure-Column mp4Dims agrees with the JVM box walk on every file") {
    val media = Multimodal.mediaMp4Mjpeg(docs)
    val colSide = Multimodal.mp4Dims(media)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val spark2 = spark
    import spark2.implicits._
    val jvmSide = media.as[(Long, Array[Byte])].collect()
      .sortBy(_._1)
      .map { case (id, p) =>
        val (w, h, fs) = Mp4Codec.decodeFrames(p).get
        (id, w, h, fs.length.toLong)
      }
    assert(colSide.toSeq === jvmSide.toSeq)
  }

  test("strictness: second trak, non-jpeg codec, stts/stsz disagreement, " +
      "trailing garbage, and truncations all reject as None, never throw") {
    val one = Multimodal.mediaMp4Mjpeg(docs.where(col("doc_id") === 1))
      .collect().head.getAs[Array[Byte]]("payload")
    assert(Mp4Codec.decodeFrames(one).nonEmpty, "control must decode")
    def be32(p: Array[Byte], i: Int): Int =
      ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
        ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
    def tagAt(p: Array[Byte], i: Int) = new String(p, i + 4, 4, "US-ASCII")
    // locate moov (after ftyp + mdat)
    val mdatSz = be32(one, 24)
    val moovAt = 24 + mdatSz
    assert(tagAt(one, moovAt) == "moov")
    // duplicate the trak inside a grown moov: must reject (2 traks)
    val moovSz = be32(one, moovAt)
    val trakAt = moovAt + 8 + 108 // after moov hdr + mvhd
    assert(tagAt(one, trakAt) == "trak")
    val trakSz = be32(one, trakAt)
    val trak = java.util.Arrays.copyOfRange(one, trakAt, trakAt + trakSz)
    val two = new java.io.ByteArrayOutputStream()
    two.write(one, 0, moovAt)
    val newMoovSz = moovSz + trakSz
    two.write(newMoovSz >> 24); two.write((newMoovSz >> 16) & 0xff)
    two.write((newMoovSz >> 8) & 0xff); two.write(newMoovSz & 0xff)
    two.write(one, moovAt + 4, moovSz - 4)
    two.write(trak)
    assert(Mp4Codec.decodeFrames(two.toByteArray).isEmpty,
      "a second trak must reject, not silently drop a stream")
    // flip the sample-entry codec tag 'jpeg' -> 'xxxx'
    val codecIdx = (0 until one.length - 4).find(i =>
      one(i) == 'j' && one(i + 1) == 'p' && one(i + 2) == 'e' &&
        one(i + 3) == 'g').get
    val badCodec = one.clone()
    badCodec(codecIdx) = 'x'
    assert(Mp4Codec.decodeFrames(badCodec).isEmpty)
    // trailing garbage after moov
    assert(Mp4Codec.decodeFrames(one :+ 0x00.toByte).isEmpty)
    // truncation fuzz: every prefix must not throw
    (1 until one.length by 7).foreach { k =>
      Mp4Codec.decodeFrames(java.util.Arrays.copyOf(one, k))
    }
    // mutation fuzz
    val rnd = new scala.util.Random(3)
    (0 until 300).foreach { _ =>
      val m = one.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Mp4Codec.decodeFrames(m)
    }
  }
}
