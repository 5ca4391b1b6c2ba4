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

  test("decodeAv demuxes both traks from the interleaved mdat and the " +
      "cross-modal checksum follows the stsc/stco chunk association") {
    val feats = Multimodal.mp4AvFeatures(Multimodal.mediaMp4Av(docs))
      .orderBy("media_id").collect()
    assert(feats.length === docs.count())
    feats.take(20).foreach { r =>
      val id = r.getAs[Long]("media_id")
      val nf = (id % 5 + 2).toInt; val spf = (id % 7 + 3).toInt
      assert(r.getAs[Long]("n_frames") === nf.toLong)
      assert(r.getAs[Long]("n_samples") === (nf * spf).toLong)
      var sa = 0L; var avCk = 0L
      for (k <- 0 until nf * spf) {
        val s = (3 * id + 17 * k) % 65536 - 32768
        sa += math.abs(s)
        avCk += (k / spf + 1) * math.abs(s)
      }
      assert(r.getAs[Long]("sum_abs") === sa)
      assert(r.getAs[Long]("av_checksum") === avCk, s"chunk assoc for $id")
    }
    // swap two equal-size audio chunks' BYTES in mdat: stco still maps
    // chunk f to its (now swapped) location — the sample MULTISET is
    // unchanged, av_checksum must move (unless the two chunks happen
    // to carry equal |s| sums; pick an id where they differ)
    val one = Multimodal.mediaMp4Av(docs.where(col("doc_id") === 1))
      .collect().head.getAs[Array[Byte]]("payload")
    val base = Mp4Codec.decodeAv(one).get
    assert(base._4.length >= 2)
    val c0 = base._4(0); val c1 = base._4(1)
    assert(c0.map(math.abs(_)).sum != c1.map(math.abs(_)).sum)
    // locate the two chunks in mdat: audio chunk f follows video
    // frame f; find by byte pattern of chunk 0's samples
    def bytesOf(c: Array[Int]): Array[Byte] =
      c.flatMap(s => Array((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val b0 = bytesOf(c0); val b1 = bytesOf(c1)
    def find(hay: Array[Byte], needle: Array[Byte]): Int =
      (0 to hay.length - needle.length).find(i =>
        needle.indices.forall(j => hay(i + j) == needle(j))).get
    val i0 = find(one, b0); val i1 = find(one, b1)
    val swapped = one.clone()
    Array.copy(b1, 0, swapped, i0, b1.length)
    Array.copy(b0, 0, swapped, i1, b0.length)
    val sw = Mp4Codec.decodeAv(swapped).get
    assert(sw._4(0).toSeq === c1.toSeq && sw._4(1).toSeq === c0.toSeq,
      "chunk f must be whatever stco points at")
  }

  test("decodeAv strictness: a third trak, stereo audio, a non-sowt " +
      "entry, and video-only files all reject") {
    val av = Multimodal.mediaMp4Av(docs.where(col("doc_id") === 2))
      .collect().head.getAs[Array[Byte]]("payload")
    assert(Mp4Codec.decodeAv(av).nonEmpty, "control")
    // video-only file: decodeAv needs exactly two traks
    val vOnly = Multimodal.mediaMp4Mjpeg(docs.where(col("doc_id") === 2))
      .collect().head.getAs[Array[Byte]]("payload")
    assert(Mp4Codec.decodeAv(vOnly).isEmpty)
    // and the A/V file must reject through the video-only entry point
    assert(Mp4Codec.decodeFrames(av).isEmpty,
      "an audio trak the video walk would drop must reject")
    // stereo: channels field lives at entry+24 of the sowt box
    val sowtAt = (0 until av.length - 4).find(i =>
      av(i) == 's' && av(i + 1) == 'o' && av(i + 2) == 'w' &&
        av(i + 3) == 't').get - 4
    val stereo = av.clone()
    stereo(sowtAt + 25) = 2
    assert(Mp4Codec.decodeAv(stereo).isEmpty)
    val notSowt = av.clone()
    notSowt(sowtAt + 4) = 'x'
    assert(Mp4Codec.decodeAv(notSowt).isEmpty)
    // truncation + mutation fuzz through the A/V path
    (1 until av.length by 11).foreach { k =>
      Mp4Codec.decodeAv(java.util.Arrays.copyOf(av, k))
    }
    val rnd = new scala.util.Random(17)
    (0 until 300).foreach { _ =>
      val m = av.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Mp4Codec.decodeAv(m)
    }
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
