package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** IMA-ADPCM tier: the encoder mirrors the decoder's reconstruction
  * exactly (the meaningful EXACT round-trip for a lossy predictive
  * codec), quantizer tracking stays sane, and the RIFF walk keeps the
  * house strictness. Pure byte seam — no Spark session. */
class AdpcmSpec extends AnyFunSuite {
  import Multimodal.AdpcmCodec

  private def reconstruct(samples: Array[Int], blockAlign: Int)
  : Array[Int] = {
    // independent mirror of the encoder's in-loop reconstruction
    val spb = 2 * (blockAlign - 4) + 1
    val out = new Array[Int](samples.length)
    var idx = 0
    var b = 0
    while (b < samples.length / spb) {
      var pred = samples(b * spb)
      out(b * spb) = pred
      var j = 1
      while (j < spb) {
        val s = samples(b * spb + j)
        val step = AdpcmCodec.stepTable(idx)
        var diff = s - pred
        var nib = 0
        if (diff < 0) { nib = 8; diff = -diff }
        if (diff >= step) { nib |= 4; diff -= step }
        if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
        if (diff >= (step >> 2)) nib |= 1
        var d = step >> 3
        if ((nib & 1) != 0) d += step >> 2
        if ((nib & 2) != 0) d += step >> 1
        if ((nib & 4) != 0) d += step
        pred = math.max(-32768, math.min(32767,
          if ((nib & 8) != 0) pred - d else pred + d))
        idx = math.max(0, math.min(88,
          idx + AdpcmCodec.indexTable(nib & 7)))
        out(b * spb + j) = pred
        j += 1
      }
      b += 1
    }
    out
  }

  test("decode(encode(x)) equals the encoder's mirrored reconstruction " +
      "BIT-FOR-BIT across waveforms, block sizes, and rates") {
    val rnd = new scala.util.Random(5)
    (0 until 200).foreach { t =>
      val blockAlign = Seq(5, 8, 12, 64, 256)(t % 5)
      val spb = 2 * (blockAlign - 4) + 1
      val nBlocks = 1 + rnd.nextInt(4)
      val n = nBlocks * spb
      val samples = t % 4 match {
        case 0 => Array.fill(n)(rnd.nextInt(65536) - 32768) // noise
        case 1 => Array.tabulate(n)(i => // sine-ish ramp
          (12000 * math.sin(i / 7.0)).toInt)
        case 2 => Array.tabulate(n)(i => if (i % 9 < 4) 30000 else -30000)
        case _ => Array.fill(n)(0)
      }
      val rate = Seq(8000, 16000, 44100)(t % 3)
      val wav = AdpcmCodec.encode(samples, rate, blockAlign)
      val (r2, got) = AdpcmCodec.decode(wav).get
      assert(r2 === rate)
      assert(got.toSeq === reconstruct(samples, blockAlign).toSeq,
        s"trial $t blockAlign $blockAlign")
    }
  }

  test("quantizer tracking: a constant signal converges to it and stays") {
    val blockAlign = 64
    val spb = 2 * (blockAlign - 4) + 1
    val samples = Array.fill(2 * spb)(1234)
    val (_, got) = AdpcmCodec.decode(
      AdpcmCodec.encode(samples, 8000, blockAlign)).get
    // after the header sample seeds it exactly, tracking stays within
    // the smallest step size
    got.foreach(v => assert(math.abs(v - 1234) <= 7))
  }

  test("strictness + fuzz: bad step index, stereo, 8-bit, spb mismatch, " +
      "truncation, and random mutations reject or decode, never throw") {
    val docsLike = AdpcmCodec.encode(
      Array.tabulate(17)(i => i * 100 - 800), 8000, 12)
    assert(AdpcmCodec.decode(docsLike).nonEmpty)
    // step index > 88 in a block header must reject
    val badIdx = docsLike.clone()
    val dataAt = docsLike.length - 12 // single 12-byte block at the end
    badIdx(dataAt + 2) = 100
    assert(AdpcmCodec.decode(badIdx).isEmpty)
    // nonzero reserved header byte must reject
    val badRes = docsLike.clone()
    badRes(dataAt + 3) = 1
    assert(AdpcmCodec.decode(badRes).isEmpty)
    (1 until docsLike.length).foreach { k =>
      AdpcmCodec.decode(java.util.Arrays.copyOf(docsLike, k))
    }
    val rnd = new scala.util.Random(9)
    (0 until 500).foreach { _ =>
      val m = docsLike.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      AdpcmCodec.decode(m)
    }
  }
}
