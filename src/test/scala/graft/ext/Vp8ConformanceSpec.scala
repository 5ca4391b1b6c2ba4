package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** VP8 conformance against libwebp's OWN decode: every fixture in
  * src/test/resources/vp8/fixtures.bin is a libwebp-ENCODED WebP
  * (tools/make_vp8_fixtures.py, 51 files across content kinds, sizes
  * 1×1..128×96 incl. odd dims, quality 0..99) paired with the Y/U/V
  * planes libwebp's `WebPDecodeYUV` produced for it. [[Vp8Codec]] must
  * reproduce every plane BIT-FOR-BIT — the end-to-end check that
  * validates the `.rodata` table recovery in [[Vp8Tables]] (a wrong
  * probability diverges the arithmetic decoder catastrophically, so
  * exactness across this corpus is a conformance proof, not a
  * similarity score). No Spark session: the codec is a pure byte seam.
  */
class Vp8ConformanceSpec extends AnyFunSuite {

  private case class Fix(name: String, webp: Array[Byte], w: Int, h: Int,
    y: Array[Byte], u: Array[Byte], v: Array[Byte])

  private def load(res: String): Seq[Fix] = {
    val in = getClass.getResourceAsStream(res)
    assert(in != null, s"$res missing from test resources")
    val all = in.readAllBytes(); in.close()
    val bb = java.nio.ByteBuffer.wrap(all)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](8); bb.get(magic)
    assert(new String(magic, "US-ASCII") == "VP8FIX01")
    val n = bb.getInt
    (0 until n).map { _ =>
      val name = { val b = new Array[Byte](bb.getInt); bb.get(b); new String(b, "UTF-8") }
      val webp = { val b = new Array[Byte](bb.getInt); bb.get(b); b }
      val w = bb.getInt; val h = bb.getInt
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      val y = new Array[Byte](w * h); bb.get(y)
      val u = new Array[Byte](cw * ch); bb.get(u)
      val v = new Array[Byte](cw * ch); bb.get(v)
      Fix(name, webp, w, h, y, u, v)
    }
  }

  /** 51 libwebp-ENCODED files (content×size×quality sweep) plus 34
    * hand-CRAFTED streams covering what libwebp's encoder never emits
    * (multi-partition, simple filter, LF deltas, explicit cat1..6
    * magnitudes, per-segment absolute/delta quantizers) — every one
    * decoded by libwebp itself for the ground truth (tools/
    * vp8_craft.py: libwebp ACCEPTING each crafted stream also pins the
    * header layout). */
  private lazy val fixtures: Seq[Fix] =
    load("/vp8/fixtures.bin") ++ load("/vp8/fixtures_crafted.bin")

  test("every libwebp-encoded fixture decodes to BIT-EXACT Y/U/V planes " +
      "vs libwebp's own WebPDecodeYUV") {
    assert(fixtures.size >= 85)
    val failures = fixtures.flatMap { f =>
      Vp8Codec.vp8ChunkOf(f.webp).flatMap(Vp8Codec.decodeYuv) match {
        case None => Some(s"${f.name}: decode returned None")
        case Some((w, h, y, u, v)) =>
          if (w != f.w || h != f.h) Some(s"${f.name}: dims ($w,$h) != (${f.w},${f.h})")
          else if (!java.util.Arrays.equals(y, f.y)) {
            val i = y.indices.find(i => y(i) != f.y(i)).get
            Some(s"${f.name}: Y differs first at px ${i % w},${i / w} " +
              s"(got ${y(i) & 0xff}, want ${f.y(i) & 0xff})")
          }
          else if (!java.util.Arrays.equals(u, f.u)) {
            val cw = (w + 1) / 2
            val i = u.indices.find(i => u(i) != f.u(i)).get
            Some(s"${f.name}: U differs first at ${i % cw},${i / cw} " +
              s"(got ${u(i) & 0xff}, want ${f.u(i) & 0xff})")
          }
          else if (!java.util.Arrays.equals(v, f.v)) {
            val cw = (w + 1) / 2
            val i = v.indices.find(i => v(i) != f.v(i)).get
            Some(s"${f.name}: V differs first at ${i % cw},${i / cw} " +
              s"(got ${v(i) & 0xff}, want ${f.v(i) & 0xff})")
          }
          else None
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size}/${fixtures.size} fixtures mismatch:\n" +
        failures.mkString("\n"))
  }

  test("encodeDcOnly round-trip: decode reproduces the closed-form " +
      "reconstruction (the media_features_vp8 oracle formula) across " +
      "dims, quantizers, and token signs") {
    val dcQ = Vp8Tables.dcQLookup
    val rnd = new scala.util.Random(7)
    (0 until 400).foreach { _ =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(33)
      val qi = rnd.nextInt(128)
      val mbW = (w + 15) / 16; val mbH = (h + 15) / 16
      val n = mbW * mbH
      val y2 = Array.fill(n)(rnd.nextInt(33) - 16)
      val u = Array.fill(n)(rnd.nextInt(33) - 16)
      val v = Array.fill(n)(rnd.nextInt(33) - 16)
      val webp = Vp8Codec.encodeDcOnly(w, h, qi, y2, u, v)
      val (w2, h2, yp, up, vp) =
        Vp8Codec.vp8ChunkOf(webp).flatMap(Vp8Codec.decodeYuv).get
      assert(w2 == w && h2 == h)
      // closed form: per-MB uniform values on the DC prediction chain
      def chain(tok: Array[Int], add: Int => Int): Array[Int] = {
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
      val q2dc = dcQ(qi) * 2
      val uvdc = math.min(dcQ(qi), 132)
      val ym = chain(y2, t => (((t * q2dc + 3) >> 3) + 4) >> 3)
      val um = chain(u, t => (t * uvdc + 4) >> 3)
      val vm = chain(v, t => (t * uvdc + 4) >> 3)
      var ok = true
      for (yy <- 0 until h; xx <- 0 until w)
        ok &= (yp(yy * w + xx) & 0xff) == ym((yy / 16) * mbW + xx / 16)
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      for (yy <- 0 until ch; xx <- 0 until cw) {
        ok &= (up(yy * cw + xx) & 0xff) == um((yy / 8) * mbW + xx / 8)
        ok &= (vp(yy * cw + xx) & 0xff) == vm((yy / 8) * mbW + xx / 8)
      }
      assert(ok, s"closed form mismatch at w=$w h=$h qi=$qi")
    }
  }

  test("mutation fuzz: single-byte corruptions of valid streams decode " +
      "to Some or None but never throw") {
    val f = fixtures.head
    val rnd = new scala.util.Random(11)
    (0 until 300).foreach { _ =>
      val m = f.webp.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Vp8Codec.decode(m) // must not throw
    }
    val synth = Vp8Codec.encodeDcOnly(33, 21, 60, // 3x2 macroblocks
      Array(-3, 5, 0, 2, 7, -6), Array(1, -1, 2, -2, 0, 3),
      Array(0, 4, -4, 1, -5, 2))
    (0 until 300).foreach { _ =>
      val m = synth.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Vp8Codec.decode(m)
    }
  }

  test("malformed input rejects as None, never throws: truncations, " +
      "flipped magic, non-keyframe tag, empty") {
    val f = fixtures.head
    assert(Vp8Codec.decode(Array.empty[Byte]).isEmpty)
    assert(Vp8Codec.decode(f.webp.take(15)).isEmpty)
    (1 until math.min(f.webp.length, 40)).foreach { k =>
      Vp8Codec.decode(f.webp.take(k)) // must not throw
    }
    val bad = f.webp.clone()
    // corrupt the VP8 start code (inside the chunk payload)
    val idx = (12 until bad.length - 8).find(i =>
      bad(i) == 'V' && bad(i + 1) == 'P' && bad(i + 2) == '8' &&
        bad(i + 3) == ' ').get
    bad(idx + 8 + 3) = 0x00 // 0x9d -> 0x00
    assert(Vp8Codec.decode(bad).isEmpty)
  }
}
