package graft.ext

/** WebM (Matroska/EBML) container walk — the real-world home of VP8
  * alongside MP4's of H.264. Implements the public EBML arithmetic
  * (RFC 8794): variable-length IDs (marker bit kept) and sizes (marker
  * stripped), nested master elements, minimal-byte unsigned integers —
  * and the WebM spine Segment→Info/Tracks/Cluster with SimpleBlock
  * frames, composing the conformance-proved [[Vp8Codec]] for V_VP8
  * keyframe payloads (WebM intra-only videos are all-keyframe streams).
  *
  * Strictness in the house AVI/MP4 mold: wrong DocType, a second
  * track, a non-V_VP8 codec, lacing, a block for an undeclared track,
  * unknown-size elements, a frame disagreeing with the declared
  * PixelWidth/Height, or any non-keyframe block all poison the file
  * (None) — never a partial decode. Unknown ELEMENT IDs are skipped
  * (EBML's forward-compat contract: Void/CRC-32/Tags ride every real
  * muxer's output), which is exactly why block-level strictness, not
  * element-level, is the right boundary.
  */
object WebmCodec {

  // element IDs (marker bit kept, as they appear on the wire)
  private val EBML_HDR = 0x1A45DFA3L
  private val DOCTYPE = 0x4282L
  private val SEGMENT = 0x18538067L
  private val INFO = 0x1549A966L
  private val TRACKS = 0x1654AE6BL
  private val TRACK_ENTRY = 0xAEL
  private val TRACK_NUMBER = 0xD7L
  private val TRACK_TYPE = 0x83L
  private val CODEC_ID = 0x86L
  private val VIDEO = 0xE0L
  private val PIXEL_W = 0xB0L
  private val PIXEL_H = 0xBAL
  private val CLUSTER = 0x1F43B675L
  private val SIMPLE_BLOCK = 0xA3L

  /** Read a vint at `i`: (value, nBytes). `keepMarker` for IDs. None on
    * truncation, a zero first byte, or the all-ones (unknown) size. */
  private def vint(p: Array[Byte], i: Int, keepMarker: Boolean)
  : Option[(Long, Int)] = {
    if (i >= p.length) return None
    val b0 = p(i) & 0xff
    if (b0 == 0) return None
    val n = Integer.numberOfLeadingZeros(b0) - 23 // 1..8
    if (n < 1 || n > 8 || i + n > p.length) return None
    var v = if (keepMarker) b0.toLong else (b0 & (0xff >>> n)).toLong
    var k = 1
    while (k < n) { v = (v << 8) | (p(i + k) & 0xff); k += 1 }
    if (!keepMarker) {
      // all-ones payload = "unknown size": reject (strict walk)
      val ones = (1L << (7 * n)) - 1
      if (v == ones) return None
    }
    Some((v, n))
  }

  /** Iterate child elements of [from, to): f(id, payloadStart,
    * payloadEnd); false on malformed framing. */
  private def walk(p: Array[Byte], from: Int, to: Int)(
    f: (Long, Int, Int) => Boolean): Boolean = {
    var i = from
    while (i < to) {
      val (id, idN) = vint(p, i, keepMarker = true).getOrElse(return false)
      val (sz, szN) = vint(p, i + idN, keepMarker = false)
        .getOrElse(return false)
      val s = i + idN + szN
      if (sz < 0 || s + sz > to) return false
      if (!f(id, s, (s + sz).toInt)) return false
      i = (s + sz).toInt
    }
    i == to
  }

  private def findOne(p: Array[Byte], from: Int, to: Int,
    id: Long): Option[(Int, Int)] = {
    var found: Option[(Int, Int)] = None
    val ok = walk(p, from, to) { (eid, s, e) =>
      if (eid == id) {
        if (found.nonEmpty) return None // duplicates reject
        found = Some((s, e))
      }
      true
    }
    if (ok) found else None
  }

  private def uintAt(p: Array[Byte], s: Int, e: Int): Long = {
    var v = 0L
    var i = s
    while (i < e) { v = (v << 8) | (p(i) & 0xff); i += 1 }
    v
  }

  /** Decode an all-keyframe V_VP8 WebM to RGB frames:
    * (w, h, frames as 0xRRGGBB). None on anything non-conforming. */
  def decodeFrames(p: Array[Byte]): Option[(Int, Int, Array[Array[Int]])] = {
    if (p == null || p.length < 16) return None
    try decodeImpl(p)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  // scalastyle:off method.length cyclomatic.complexity
  private def decodeImpl(p: Array[Byte])
  : Option[(Int, Int, Array[Array[Int]])] = {
    val hdr = findOne(p, 0, p.length, EBML_HDR) match {
      case Some(h) => h
      case None => return None
    }
    // DocType must be webm
    val dt = findOne(p, hdr._1, hdr._2, DOCTYPE).getOrElse(return None)
    if (new String(p, dt._1, dt._2 - dt._1, "US-ASCII") != "webm")
      return None
    // the Segment follows the header; other top-level elements reject
    // (a real file has exactly these two)
    var seg: Option[(Int, Int)] = None
    if (!walk(p, 0, p.length) { (id, s, e) =>
      if (id == SEGMENT) {
        if (seg.nonEmpty) return None
        seg = Some((s, e))
      } else if (id != EBML_HDR) return None
      true
    }) return None
    val (segS, segE) = seg.getOrElse(return None)

    // exactly one track: video, V_VP8
    val tracks = findOne(p, segS, segE, TRACKS).getOrElse(return None)
    var entry: Option[(Int, Int)] = None
    var nEntries = 0
    if (!walk(p, tracks._1, tracks._2) { (id, s, e) =>
      if (id == TRACK_ENTRY) { nEntries += 1; entry = Some((s, e)) }
      true
    }) return None
    if (nEntries != 1) return None // a track we would drop must reject
    val (enS, enE) = entry.get
    val tnum = findOne(p, enS, enE, TRACK_NUMBER).getOrElse(return None)
    val trackNo = uintAt(p, tnum._1, tnum._2)
    val ttype = findOne(p, enS, enE, TRACK_TYPE).getOrElse(return None)
    if (uintAt(p, ttype._1, ttype._2) != 1L) return None // video
    val cid = findOne(p, enS, enE, CODEC_ID).getOrElse(return None)
    if (new String(p, cid._1, cid._2 - cid._1, "US-ASCII") != "V_VP8")
      return None
    val video = findOne(p, enS, enE, VIDEO).getOrElse(return None)
    val pw = findOne(p, video._1, video._2, PIXEL_W).getOrElse(return None)
    val ph = findOne(p, video._1, video._2, PIXEL_H).getOrElse(return None)
    val w = uintAt(p, pw._1, pw._2).toInt
    val h = uintAt(p, ph._1, ph._2).toInt
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None

    // clusters: SimpleBlocks for the declared track, keyframes only
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    if (!walk(p, segS, segE) { (id, s, e) =>
      if (id == CLUSTER) {
        if (!walk(p, s, e) { (cid2, bs, be) =>
          if (cid2 == SIMPLE_BLOCK) {
            val (bTrack, tN) = vint(p, bs, keepMarker = false)
              .getOrElse(return None)
            if (bTrack != trackNo) return None // undeclared track
            if (bs + tN + 3 > be) return None
            val flags = p(bs + tN + 2) & 0xff
            if ((flags & 0x80) == 0) return None // non-keyframe
            if ((flags & 0x06) != 0) return None // lacing out of scope
            Vp8Codec.decodeYuv(java.util.Arrays
              .copyOfRange(p, bs + tN + 3, be)) match {
              case Some((fw, fh, y, u, v)) if fw == w && fh == h =>
                frames += Vp8Codec.yuvToRgb(fw, fh, y, u, v)
              case _ => return None // poison, never partial
            }
          }
          true // other in-cluster elements (Timecode etc.) skip
        }) return None
      }
      true // Info/Tags/Void/unknown segment children skip
    }) return None
    if (frames.isEmpty) None else Some((w, h, frames.toArray))
  }
  // scalastyle:on method.length cyclomatic.complexity

  // ---------------------------------------------------------------
  // muxer
  // ---------------------------------------------------------------

  private def vintIdBytes(id: Long): Array[Byte] = {
    // IDs are stored verbatim (marker included)
    val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    Array.tabulate(n)(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  private def vintSizeBytes(sz: Long): Array[Byte] = {
    // smallest n with sz < 2^(7n)-1 (avoid the all-ones reserved form)
    var n = 1
    while (n < 8 && sz >= (1L << (7 * n)) - 1) n += 1
    val marked = sz | (1L << (7 * n))
    Array.tabulate(n)(i => ((marked >> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    vintIdBytes(id) ++ vintSizeBytes(payload.length.toLong) ++ payload

  private def uintBytes(v: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  /** Mux all-keyframe VP8 frames as a minimal conforming WebM: EBML
    * header (DocType webm), one V_VP8 TrackEntry, one Cluster of
    * keyframe SimpleBlocks with per-frame timecodes. */
  def encodeVp8(w: Int, h: Int, vp8Frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && vp8Frames.nonEmpty)
    val ebml = el(EBML_HDR,
      el(0x4286L, uintBytes(1)) ++ // EBMLVersion
        el(0x42F7L, uintBytes(1)) ++ // EBMLReadVersion
        el(0x42F2L, uintBytes(4)) ++ // EBMLMaxIDLength
        el(0x42F3L, uintBytes(8)) ++ // EBMLMaxSizeLength
        el(DOCTYPE, "webm".getBytes("US-ASCII")) ++
        el(0x4287L, uintBytes(2)) ++ // DocTypeVersion
        el(0x4285L, uintBytes(2))) // DocTypeReadVersion
    val info = el(INFO, el(0x2AD7B1L, uintBytes(1000000L))) // TimecodeScale
    val trackEntry = el(TRACK_ENTRY,
      el(TRACK_NUMBER, uintBytes(1)) ++
        el(0x73C5L, uintBytes(1)) ++ // TrackUID
        el(TRACK_TYPE, uintBytes(1)) ++
        el(CODEC_ID, "V_VP8".getBytes("US-ASCII")) ++
        el(VIDEO, el(PIXEL_W, uintBytes(w.toLong)) ++
          el(PIXEL_H, uintBytes(h.toLong))))
    val tracks = el(TRACKS, trackEntry)
    val blocks = vp8Frames.zipWithIndex.map { case (f, i) =>
      el(SIMPLE_BLOCK, Array[Byte](0x81.toByte, // track 1 vint
        ((i >> 8) & 0xff).toByte, (i & 0xff).toByte, // timecode
        0x80.toByte) ++ f) // keyframe, no lacing
    }
    val cluster = el(CLUSTER,
      el(0xE7L, uintBytes(0)) ++ blocks.flatten.toArray) // Timecode 0
    ebml ++ el(SEGMENT, info ++ tracks ++ cluster)
  }
}
