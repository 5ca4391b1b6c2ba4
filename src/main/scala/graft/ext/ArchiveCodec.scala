package graft.ext

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Archive containers — the OTHER way real corpora ship (document
  * bundles as `.tar` / `.zip`), completing the ingestion family beside
  * [[WebCodec]]'s WARC walk.
  *
  *   - '''TAR (ustar, POSIX.1-1988)''': 512-byte header blocks (octal
  *     size/mtime fields, header checksum computed with the chksum
  *     field blanked), data rounded up to block size, two zero blocks
  *     as the terminator. Pure arithmetic — no compression layer.
  *   - '''ZIP (APPNOTE 4.4.x subset)''': end-of-central-directory
  *     located from the tail, central directory walked to local file
  *     headers, entries STORED or DEFLATEd (raw `Inflater`, the same
  *     JDK seam as PNG/WARC), CRC32 + both sizes verified per entry,
  *     central/local header agreement enforced.
  *
  * House strictness throughout: bad magic, bad checksum/CRC, octal
  * garbage, truncation, central/local disagreement, or trailing bytes
  * poison the whole archive (None) — never a partial parse.
  *
  * Synthesis mirrors the web tier: each document becomes a 2-entry
  * archive (`docs/<id>.txt` carrying the text, `meta/<id>.json` a
  * deterministic JSON string), so every field the parser emits is
  * replayable as a DuckDB formula over `documents`.
  */
object ArchiveCodec {

  final case class Entry(name: String, data: Array[Byte])

  // ------------------------------------------------------------------
  // TAR (ustar)
  // ------------------------------------------------------------------

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL terminated (the classic ustar form)
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes("ISO-8859-1")
  }

  private def tarHeader(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("ISO-8859-1")
    require(nb.length <= 100, "name fits the ustar name field")
    System.arraycopy(nb, 0, h, 0, nb.length)
    System.arraycopy(octal(420, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum blanked
    h(156) = '0' // regular file
    System.arraycopy("ustar\u000000".getBytes("ISO-8859-1"), 0, h, 257, 8)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    val cs = octal(sum, 7) // 6 digits + NUL, then a space
    System.arraycopy(cs, 0, h, 148, 7)
    h(155) = ' '
    h
  }

  /** Serialize entries as a ustar stream (header + padded data each,
    * two zero blocks at the end). */
  def tarBuild(entries: Seq[Entry]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for (e <- entries) {
      out.write(tarHeader(e.name, e.data.length.toLong))
      out.write(e.data)
      val pad = (512 - e.data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    var i = off
    val end = off + len
    // leading spaces permitted, digits, then NUL or space terminator
    while (i < end && b(i) == ' ') i += 1
    var v = 0L
    var digits = 0
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0'); i += 1; digits += 1
    }
    if (digits == 0) return None
    while (i < end) {
      if (b(i) != 0 && b(i) != ' ') return None
      i += 1
    }
    Some(v)
  }

  /** Parse a ustar stream: entries until the two-zero-block terminator;
    * header checksum, magic, octal grammar, and exact EOF all enforced. */
  def tarParse(bytes: Array[Byte]): Option[Vector[Entry]] = {
    var pos = 0
    val out = Vector.newBuilder[Entry]
    var terminated = false
    while (!terminated) {
      if (pos + 512 > bytes.length) return None
      if (bytes.slice(pos, pos + 512).forall(_ == 0)) {
        // terminator: require the SECOND zero block and exact EOF
        if (pos + 1024 != bytes.length) return None
        if (!bytes.slice(pos + 512, pos + 1024).forall(_ == 0)) return None
        terminated = true
      } else {
        val h = java.util.Arrays.copyOfRange(bytes, pos, pos + 512)
        val magic = new String(h, 257, 5, "ISO-8859-1")
        if (magic != "ustar") return None
        var sum = 0L
        var i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toLong else (h(i) & 0xff).toLong)
          i += 1
        }
        val want = parseOctal(h, 148, 8).getOrElse(return None)
        if (want != sum) return None
        val size = parseOctal(h, 124, 12).getOrElse(return None)
        // bound by the BUFFER, not Int.MaxValue: `(size.toInt+511)/512`
        // overflowed for sizes near 2^31, wrapping the truncation guard
        // and attempting a 2 GB allocation from a 1.5 KB input
        // (review r15 overflow hardening — all arithmetic in Long)
        if (size > bytes.length.toLong) return None
        var nameEnd = 0
        while (nameEnd < 100 && h(nameEnd) != 0) nameEnd += 1
        val name = new String(h, 0, nameEnd, "ISO-8859-1")
        if (name.isEmpty) return None
        val dataStart = pos + 512
        // padded stays LONG through the guard (a ~2 GB buffer with a
        // near-2^31 size wrapped the Int form; review r15 second pass)
        val paddedL = ((size + 511L) / 512L) * 512L
        if (dataStart.toLong + paddedL > bytes.length) return None
        val padded = paddedL.toInt
        val data =
          java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + size.toInt)
        // padding must be zero (a smuggled byte is corruption)
        var j = dataStart + size.toInt
        while (j < dataStart + padded) {
          if (bytes(j) != 0) return None
          j += 1
        }
        out += Entry(name, data)
        pos = dataStart + padded
      }
    }
    Some(out.result())
  }

  // ------------------------------------------------------------------
  // ZIP
  // ------------------------------------------------------------------

  // LE byte helpers live once in [[Le]] (shared with WebCodec)
  private def le16(b: Array[Byte], p: Int): Int = Le.le16(b, p)
  private def le32(b: Array[Byte], p: Int): Long = Le.le32(b, p)
  private def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit =
    Le.w16(o, v)
  private def w32(o: java.io.ByteArrayOutputStream, v: Long): Unit =
    Le.w32(o, v)

  /** Serialize entries; `deflate(i)` picks method 8 (raw Deflater) vs 0
    * (STORED) per entry. */
  def zipBuild(entries: Seq[Entry], deflate: Int => Boolean): Array[Byte] = {
    // EOCD entry counts are 16-bit; silently wrapping >65535 would emit
    // an archive the hardened zipParse rejects (or truncates) — refuse
    // loudly on the build side, mirroring tarHeader's name-length require
    require(entries.length <= 0xffff,
      s"zip entry count ${entries.length} exceeds the 16-bit EOCD field")
    val out = new java.io.ByteArrayOutputStream()
    val centrals = Vector.newBuilder[Array[Byte]]
    entries.zipWithIndex.foreach { case (e, i) =>
      val offset = out.size()
      val crc = new CRC32(); crc.update(e.data)
      val method = if (deflate(i)) 8 else 0
      val comp =
        if (method == 0) e.data
        else {
          val d = new Deflater(6, true)
          d.setInput(e.data); d.finish()
          val o = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) { val n = d.deflate(buf); o.write(buf, 0, n) }
          d.end()
          o.toByteArray
        }
      val nb = e.name.getBytes("ISO-8859-1")
      // local file header
      w32(out, 0x04034b50L); w16(out, 20); w16(out, 0); w16(out, method)
      w16(out, 0); w16(out, 0) // time, date
      w32(out, crc.getValue); w32(out, comp.length.toLong)
      w32(out, e.data.length.toLong)
      w16(out, nb.length); w16(out, 0)
      out.write(nb); out.write(comp)
      // central directory twin
      val c = new java.io.ByteArrayOutputStream()
      w32(c, 0x02014b50L); w16(c, 20); w16(c, 20); w16(c, 0); w16(c, method)
      w16(c, 0); w16(c, 0)
      w32(c, crc.getValue); w32(c, comp.length.toLong)
      w32(c, e.data.length.toLong)
      w16(c, nb.length); w16(c, 0); w16(c, 0); w16(c, 0); w16(c, 0)
      w32(c, 0L); w32(c, offset.toLong)
      c.write(nb)
      centrals += c.toByteArray
    }
    val cdStart = out.size()
    val cds = centrals.result()
    cds.foreach(out.write)
    val cdSize = out.size() - cdStart
    w32(out, 0x06054b50L); w16(out, 0); w16(out, 0)
    w16(out, entries.length); w16(out, entries.length)
    w32(out, cdSize.toLong); w32(out, cdStart.toLong); w16(out, 0)
    out.toByteArray
  }

  /** Parse a zip: EOCD from the tail (empty comment ⇒ last 22 bytes),
    * central directory walk, each entry extracted via its local header,
    * CRC32 + compressed + uncompressed sizes verified, central/local
    * agreement enforced, no trailing bytes anywhere. */
  def zipParse(bytes: Array[Byte]): Option[Vector[Entry]] = {
    if (bytes.length < 22) return None
    val ep = bytes.length - 22
    if (le32(bytes, ep) != 0x06054b50L) return None
    val n = le16(bytes, ep + 10)
    if (le16(bytes, ep + 8) != n) return None // disk total == total
    val cdSize = le32(bytes, ep + 12)
    val cdStart = le32(bytes, ep + 16)
    if (le16(bytes, ep + 20) != 0) return None // comment len
    if (cdStart + cdSize != ep.toLong) return None
    var cp = cdStart.toInt
    val out = Vector.newBuilder[Entry]
    // every local entry's [header, data] span; the spans must tile
    // [0, cdStart) exactly — smuggled bytes between entries poison,
    // matching tarParse's zero-padding strictness and the documented
    // "trailing bytes anywhere poison" contract (review r15)
    val spans = Vector.newBuilder[(Int, Int)]
    var i = 0
    while (i < n) {
      if (cp + 46 > ep) return None
      if (le32(bytes, cp) != 0x02014b50L) return None
      val method = le16(bytes, cp + 10)
      if (method != 0 && method != 8) return None
      val crcWant = le32(bytes, cp + 16)
      // 32-bit fields stay LONG until range-checked against the buffer:
      // a signed .toInt made 0x80000000+ values negative, slipping past
      // the bound guards into copyOfRange/le32 crashes (review r15 —
      // reachable by a single-byte mutation of a valid archive)
      val csizeL = le32(bytes, cp + 20)
      val usizeL = le32(bytes, cp + 24)
      val nameLen = le16(bytes, cp + 28)
      val extraLen = le16(bytes, cp + 30)
      val commentLen = le16(bytes, cp + 32)
      val lhoL = le32(bytes, cp + 42)
      // csize is physical bytes in THIS buffer; usize only needs to fit
      // an Int (a compressed archive is legitimately smaller than its
      // contents) — the inflate loop below caps output at usize, so a
      // lying header cannot zip-bomb the decoder either
      if (csizeL > bytes.length.toLong || usizeL > Int.MaxValue.toLong ||
          lhoL > cdStart) return None
      val csize = csizeL.toInt
      val usize = usizeL.toInt
      val lho = lhoL.toInt
      if (cp.toLong + 46 + nameLen > ep) return None
      val name = new String(bytes, cp + 46, nameLen, "ISO-8859-1")
      // local header agreement
      if (lhoL + 30 + nameLen > cdStart) return None
      if (le32(bytes, lho) != 0x04034b50L) return None
      if (le16(bytes, lho + 8) != method) return None
      if (le32(bytes, lho + 14) != crcWant) return None
      if (le32(bytes, lho + 18) != csizeL) return None
      if (le32(bytes, lho + 22) != usizeL) return None
      if (le16(bytes, lho + 26) != nameLen) return None
      val lExtra = le16(bytes, lho + 28)
      // central/local agreement extends to the extra-field LENGTH; the
      // field's content is opaque declared metadata (the gzip-FNAME
      // posture), but an extra field declared only locally was a 64 KB
      // smuggling channel inside the covered span (review r15 2nd pass)
      if (lExtra != extraLen) return None
      if (new String(bytes, lho + 30, nameLen, "ISO-8859-1") != name)
        return None
      // Long until guarded: lho+30+nameLen+lExtra can wrap for ~2 GB
      // archives (review r15 second pass)
      val dataStartL = lhoL + 30L + nameLen + lExtra
      if (dataStartL + csizeL > cdStart) return None
      val dataStart = dataStartL.toInt
      spans += ((lho, dataStart + csize))
      val comp = java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + csize)
      val data =
        if (method == 0) comp
        else {
          val inf = new Inflater(true)
          // JDK quirk: a nowrap Inflater requires one dummy byte after
          // the deflate stream (the gzip path gets it for free from the
          // CRC trailer). Exactly that dummy may remain unconsumed.
          inf.setInput(comp :+ 0.toByte)
          val o = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          try {
            while (!inf.finished()) {
              val k =
                try inf.inflate(buf)
                catch {
                  case _: java.util.zip.DataFormatException => return None
                }
              if (k > 0) {
                o.write(buf, 0, k)
                // zip-bomb cap: never inflate past the declared usize
                if (o.size() > usize) return None
              } else if (inf.needsInput()) return None
            }
            if (inf.getRemaining > 1) return None // compressed overrun
          } finally inf.end()
          o.toByteArray
        }
      if (data.length != usize) return None
      val crc = new CRC32(); crc.update(data)
      if ((crc.getValue & 0xffffffffL) != crcWant) return None
      out += Entry(name, data)
      cp += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    if (cp != ep) return None // central directory must end at EOCD
    val sorted = spans.result().sortBy(_._1)
    var at = 0
    for ((s, e) <- sorted) {
      if (s != at) return None // gap or overlap before this entry
      at = e
    }
    if (at.toLong != cdStart) return None // bytes between data and CD
    Some(out.result())
  }

  // ------------------------------------------------------------------
  // Deterministic synthesis from `documents` + DataFrame seams
  // (JVM twins of the SQL oracle formulas in ExtQueries — LOCKSTEP)
  // ------------------------------------------------------------------

  def metaJson(id: Long, lang: String, source: String): String =
    s"""{"doc_id":$id,"lang":"$lang","source":"$source"}"""

  def docEntries(
      id: Long, text: String, lang: String, source: String): Seq[Entry] =
    Seq(
      Entry(s"docs/$id.txt", text.getBytes("ISO-8859-1")),
      Entry(s"meta/$id.json", metaJson(id, lang, source).getBytes("ISO-8859-1")))

  /** (media_id, payload) tar-per-document table. */
  def docTars(docs0: DataFrame): DataFrame = {
    // r19 optimization: the docs fixture is ONE parquet split at every
    // SF - without a repartition the whole synth+codec chain below
    // runs on a single core (guide §2.5 input skew)
    val docs = TextOps.scanParallel(docs0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, lang, source) =>
          (id, tarBuild(docEntries(id, text, lang, source)))
        }
      }.toDF("media_id", "payload")
  }

  /** (media_id, payload) zip-per-document table; the text entry is
    * DEFLATEd for odd ids and STORED for even (both verify paths), the
    * json entry the reverse. */
  def docZips(docs0: DataFrame): DataFrame = {
    // r19 optimization: the docs fixture is ONE parquet split at every
    // SF - without a repartition the whole synth+codec chain below
    // runs on a single core (guide §2.5 input skew)
    val docs = TextOps.scanParallel(docs0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, lang, source) =>
          (id, zipBuild(docEntries(id, text, lang, source),
            i => (id + i) % 2 == 1))
        }
      }.toDF("media_id", "payload")
  }

  final case class ArchiveRow(
      media_id: Long, entry_index: Int, name: String, n_bytes: Long,
      data_ck: Long)

  private def rows(
      id: Long, parsed: Option[Vector[Entry]]): Iterator[ArchiveRow] =
    parsed.iterator.flatMap { es =>
      es.iterator.zipWithIndex.map { case (e, i) =>
        ArchiveRow(id, i, e.name, e.data.length.toLong,
          WebCodec.weightedCk(e.data))
      }
    }

  /** Per-entry features through the full tar walk. */
  def tarEntries(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => rows(id, tarParse(p)) })
      .toDF()
  }

  /** Per-entry features through the full zip walk (CRC-verified). */
  def zipEntries(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => rows(id, zipParse(p)) })
      .toDF()
  }

  final case class ArchiveText(media_id: Long, name: String, text: String)

  /** Extract the `.txt` entries (the `docs/` files) of each zip back to
    * strings —
    * the seam `archive_zip_text` composes with the web tier's
    * pure-Column extraction/gates. */
  def zipTexts(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        zipParse(p).iterator.flatMap { es =>
          es.filter(_.name.endsWith(".txt")).map { e =>
            ArchiveText(id, e.name, new String(e.data, "ISO-8859-1"))
          }
        }
      }).toDF()
  }
}
