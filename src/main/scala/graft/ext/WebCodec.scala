package graft.ext

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus ingestion tier: the front door of a training-data pipeline
  * (Common-Crawl-shaped WARC archives → HTTP responses → HTML → text).
  *
  * Three real byte-level layers, composed exactly like the media tier's
  * container/codec stacks:
  *
  *   - '''gzip member walk''' (RFC 1952): magic/flags/optional-field
  *     header parse byte-by-byte, raw-DEFLATE inflate via the JDK's
  *     `Inflater` (the same house precedent as [[Multimodal.PngCodec]]'s
  *     zlib), CRC32 + ISIZE verified per member, multi-member streams
  *     walked to EOF — the WARC convention is one gzip member PER RECORD.
  *   - '''WARC record walk''' (ISO 28500 / WARC 1.0): version line,
  *     header block, `Content-Length`-framed payload, the mandatory
  *     `\r\n\r\n` record terminator; truncation, version drift, length
  *     mismatch, or trailing garbage poison the whole file (None).
  *   - '''HTTP/1.1 response parse''': status line, headers,
  *     `Content-Length`-framed body, exact consumption required.
  *
  * The text layer (tag strip, entity decode, whitespace collapse, title
  * extraction) is PURE COLUMN — regexp_replace/replace chains chosen to
  * be dialect-identical between Spark's Java regex and DuckDB's RE2, so
  * every query carries a full SQL oracle.
  *
  * Synthesis mirrors the media tier: deterministic payloads built from
  * the `documents` table (JVM twins of the oracle's string formulas),
  * three compression variants (plain / gzip-STORED hand-rolled / gzip
  * dynamic-Huffman via `Deflater`) keyed by doc_id % 3.
  *
  * Reference behavior covered: none — the reference app has no archive
  * ingestion; this tier exists for the 100 TB training-data mandate
  * (WARC is the format the real corpora arrive in).
  */
object WebCodec {

  // ------------------------------------------------------------------
  // gzip (RFC 1952) — member walk, header parse, CRC32/ISIZE verify
  // ------------------------------------------------------------------

  private val FTEXT = 1
  private val FHCRC = 2
  private val FEXTRA = 4
  private val FNAME = 8
  private val FCOMMENT = 16

  /** Walk a (possibly multi-member) gzip stream; Some(payloads) only if
    * every member's header grammar, CRC32, and ISIZE check out and the
    * stream ends exactly at a member boundary. */
  def gunzipMembers(bytes: Array[Byte]): Option[Vector[Array[Byte]]] = {
    var pos = 0
    val out = Vector.newBuilder[Array[Byte]]
    while (pos < bytes.length) {
      val memberStart = pos
      if (pos + 10 > bytes.length) return None
      if ((bytes(pos) & 0xff) != 0x1f || (bytes(pos + 1) & 0xff) != 0x8b)
        return None
      if (bytes(pos + 2) != 8) return None // CM must be deflate
      val flg = bytes(pos + 3) & 0xff
      if ((flg & ~(FTEXT | FHCRC | FEXTRA | FNAME | FCOMMENT)) != 0)
        return None // reserved flag bits set
      pos += 10 // magic, CM, FLG, MTIME(4), XFL, OS
      if ((flg & FEXTRA) != 0) {
        if (pos + 2 > bytes.length) return None
        val xlen = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8)
        pos += 2 + xlen
        if (pos > bytes.length) return None
      }
      if ((flg & FNAME) != 0) {
        while (pos < bytes.length && bytes(pos) != 0) pos += 1
        if (pos >= bytes.length) return None
        pos += 1
      }
      if ((flg & FCOMMENT) != 0) {
        while (pos < bytes.length && bytes(pos) != 0) pos += 1
        if (pos >= bytes.length) return None
        pos += 1
      }
      if ((flg & FHCRC) != 0) {
        // RFC 1952: CRC16 = low 16 bits of the CRC32 over every header
        // byte so far — VERIFIED, not skipped (review r15)
        if (pos + 2 > bytes.length) return None
        val hc = new CRC32(); hc.update(bytes, memberStart, pos - memberStart)
        val want = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8)
        if ((hc.getValue & 0xffffL).toInt != want) return None
        pos += 2
      }
      // raw DEFLATE body: JDK Inflater in nowrap mode (house precedent:
      // PngCodec's zlib inflate). Feed the remainder; the inflater tells
      // us where the compressed data ended.
      val inf = new Inflater(true)
      inf.setInput(bytes, pos, bytes.length - pos)
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      try {
        while (!inf.finished()) {
          val n =
            try inf.inflate(chunk)
            catch { case _: java.util.zip.DataFormatException => return None }
          if (n > 0) buf.write(chunk, 0, n)
          else if (inf.needsInput()) return None // truncated member
        }
        val consumed = (bytes.length - pos) - inf.getRemaining
        pos += consumed
      } finally inf.end()
      val data = buf.toByteArray
      if (pos + 8 > bytes.length) return None
      val crc = new CRC32(); crc.update(data)
      val wantCrc = le32(bytes, pos); pos += 4
      val wantIsize = le32(bytes, pos); pos += 4
      if ((crc.getValue & 0xffffffffL) != wantCrc) return None
      if ((data.length.toLong & 0xffffffffL) != wantIsize) return None
      out += data
    }
    Some(out.result())
  }

  private def le32(b: Array[Byte], p: Int): Long = Le.le32(b, p)
  private def le32put(out: java.io.ByteArrayOutputStream, v: Long): Unit =
    Le.w32(out, v)

  /** One gzip member holding `data` as hand-rolled STORED deflate blocks
    * (fully deterministic: no compressor involved — the same legal-
    * DEFLATE-subset trick PngCodec's synth uses). */
  def gzipStored(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x1f); out.write(0x8b); out.write(8); out.write(0)
    le32put(out, 0L); out.write(0); out.write(255) // MTIME=0, XFL, OS=unknown
    var p = 0
    if (data.isEmpty) { // one final empty STORED block
      out.write(1); out.write(0); out.write(0); out.write(0xff); out.write(0xff)
    }
    while (p < data.length) {
      val n = math.min(65535, data.length - p)
      val fin = if (p + n >= data.length) 1 else 0
      out.write(fin)
      out.write(n & 0xff); out.write((n >> 8) & 0xff)
      out.write((n ^ 0xffff) & 0xff); out.write(((n ^ 0xffff) >> 8) & 0xff)
      out.write(data, p, n)
      p += n
    }
    val crc = new CRC32(); crc.update(data)
    le32put(out, crc.getValue & 0xffffffffL)
    le32put(out, data.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  /** One gzip member via the JDK `Deflater` (real dynamic-Huffman
    * streams for the inflate path to chew on), with an FNAME field to
    * exercise the optional-header walk. */
  def gzipDeflate(data: Array[Byte], fname: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x1f); out.write(0x8b); out.write(8); out.write(FNAME)
    le32put(out, 0L); out.write(0); out.write(255)
    fname.getBytes("UTF-8").foreach(b => out.write(b & 0xff))
    out.write(0)
    val d = new Deflater(6, true)
    d.setInput(data); d.finish()
    val chunk = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(chunk)
      out.write(chunk, 0, n)
    }
    d.end()
    val crc = new CRC32(); crc.update(data)
    le32put(out, crc.getValue & 0xffffffffL)
    le32put(out, data.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // WARC 1.0 record walk
  // ------------------------------------------------------------------

  final case class WarcRecord(
      warcType: String, targetUri: String, payload: Array[Byte])

  private val CRLF = "\r\n"

  /** Strict bounded decimal parse: digits only, no sign, and the value
    * must fit an Int AND not exceed `cap` — anything else is None
    * rather than a NumberFormatException (the never-throw contract). */
  private def parseDecimal(value: String, cap: Long): Option[Int] = {
    // ASCII '0'..'9' ONLY — Char.isDigit also admits Unicode decimal
    // digits (U+0663 …) whose charAt-'0' arithmetic would be garbage
    // (review r15 second pass)
    if (value.isEmpty ||
        !value.forall(c => c >= '0' && c <= '9')) return None
    var v = 0L
    var i = 0
    while (i < value.length) {
      v = v * 10 + (value.charAt(i) - '0')
      if (v > cap || v > Int.MaxValue) return None
      i += 1
    }
    Some(v.toInt)
  }

  /** Parse one record starting at `pos`; returns (record, nextPos) or
    * None on any grammar violation. */
  private def parseRecord(
      b: Array[Byte], pos0: Int): Option[(WarcRecord, Int)] = {
    var pos = pos0
    def readLine(): Option[String] = {
      var i = pos
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
      if (i + 1 >= b.length) None
      else {
        val s = new String(b, pos, i - pos, "ISO-8859-1")
        pos = i + 2
        Some(s)
      }
    }
    readLine() match {
      case Some("WARC/1.0") => ()
      case _ => return None
    }
    var warcType: String = null
    var uri: String = null
    var clen: Int = -1
    var done = false
    while (!done) {
      readLine() match {
        case None => return None
        case Some("") => done = true
        case Some(line) =>
          val k = line.indexOf(':')
          if (k <= 0) return None
          val name = line.substring(0, k)
          val value = line.substring(k + 1).trim
          name match {
            case "WARC-Type" => warcType = value
            case "WARC-Target-URI" => uri = value
            case "Content-Length" =>
              // digits-only AND in-range: a 10+-digit value must poison,
              // not throw from toInt; any value beyond the buffer can be
              // rejected immediately (review r15: overflow hardening)
              parseDecimal(value, b.length.toLong) match {
                case Some(v) => clen = v
                case None => return None
              }
            case _ => () // other headers carried but not interpreted
          }
      }
    }
    if (warcType == null || uri == null || clen < 0) return None
    if (pos.toLong + clen + 4 > b.length) return None
    val payload = java.util.Arrays.copyOfRange(b, pos, pos + clen)
    pos += clen
    // mandatory two-CRLF record terminator
    if (!(b(pos) == '\r' && b(pos + 1) == '\n' &&
          b(pos + 2) == '\r' && b(pos + 3) == '\n')) return None
    Some((WarcRecord(warcType, uri, payload), pos + 4))
  }

  /** Parse a WARC file: gzip (one member per record, per the WARC
    * convention) or plain concatenated records. All-or-nothing — any
    * bad member/record/trailing byte poisons the file. */
  def parseWarc(bytes: Array[Byte]): Option[Vector[WarcRecord]] = {
    if (bytes == null) return None // a null cell drops at the gate
    if (bytes.length >= 2 &&
        (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
      gunzipMembers(bytes).flatMap { members =>
        val recs = Vector.newBuilder[WarcRecord]
        for (m <- members) {
          parseRecord(m, 0) match {
            case Some((r, next)) if next == m.length => recs += r
            case _ => return None // member ≠ exactly one record
          }
        }
        Some(recs.result())
      }
    } else {
      var pos = 0
      val recs = Vector.newBuilder[WarcRecord]
      if (bytes.isEmpty) return None
      while (pos < bytes.length) {
        parseRecord(bytes, pos) match {
          case Some((r, next)) => recs += r; pos = next
          case None => return None
        }
      }
      Some(recs.result())
    }
  }

  /** HTTP/1.1 response parse: (status, body). Two framings, strictly
    * one per message: exact Content-Length consumption, or
    * Transfer-Encoding: chunked de-chunked (hex size lines, CRLF after
    * every chunk, the 0-chunk terminator ending the payload exactly; no
    * trailer section, no chunk extensions — documented strict subset).
    * Both headers present, neither present, an unknown TE value, bad
    * hex, or trailing bytes all poison. */
  def parseHttpResponse(payload: Array[Byte]): Option[(Int, Array[Byte])] = {
    var pos = 0
    def readLine(): Option[String] = {
      var i = pos
      while (i + 1 < payload.length &&
             !(payload(i) == '\r' && payload(i + 1) == '\n')) i += 1
      if (i + 1 >= payload.length) None
      else {
        val s = new String(payload, pos, i - pos, "ISO-8859-1")
        pos = i + 2
        Some(s)
      }
    }
    val status = readLine() match {
      case Some(sl) if sl.startsWith("HTTP/1.1 ") && sl.length >= 12 =>
        val code = sl.substring(9, 12)
        if (!code.forall(_.isDigit)) return None
        code.toInt
      case _ => return None
    }
    var clen = -1
    var chunked = false
    var done = false
    while (!done) {
      readLine() match {
        case None => return None
        case Some("") => done = true
        case Some(line) =>
          val k = line.indexOf(':')
          if (k <= 0) return None
          line.substring(0, k) match {
            case "Content-Length" =>
              parseDecimal(line.substring(k + 1).trim,
                payload.length.toLong) match {
                case Some(v) => clen = v
                case None => return None
              }
            case "Transfer-Encoding" =>
              if (line.substring(k + 1).trim.toLowerCase != "chunked")
                return None // unknown codings unsupported → poison
              chunked = true
            case _ => ()
          }
      }
    }
    if (chunked) {
      if (clen >= 0) return None // both framings present
      val body = new java.io.ByteArrayOutputStream()
      while (true) {
        val n = readLine() match {
          case Some(sz) if sz.nonEmpty && sz.forall(c =>
            c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')) =>
            try Integer.parseInt(sz, 16)
            catch { case _: NumberFormatException => return None }
          case _ => return None
        }
        if (n == 0) {
          // terminator: the final CRLF must END the payload exactly
          if (pos + 2 != payload.length ||
              payload(pos) != '\r' || payload(pos + 1) != '\n') return None
          return Some((status, body.toByteArray))
        }
        if (pos.toLong + n + 2 > payload.length) return None
        body.write(payload, pos, n)
        pos += n
        if (payload(pos) != '\r' || payload(pos + 1) != '\n') return None
        pos += 2
      }
      None // unreachable
    } else {
      if (clen < 0 || pos + clen != payload.length) return None
      Some((status, java.util.Arrays.copyOfRange(payload, pos, pos + clen)))
    }
  }

  // ------------------------------------------------------------------
  // Deterministic synthesis from `documents` (JVM twins of the SQL
  // oracle formulas — keep in LOCKSTEP with the web* oracles in
  // ExtQueries and with the pure-Column builders below)
  // ------------------------------------------------------------------

  def escapeHtml(text: String): String =
    text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def buildHtml(id: Long, text: String, lang: String, source: String): String =
    s"""<html><head><title>Doc $id [$source]</title>""" +
      """<style>body {color: red;}</style>""" +
      """<script>var u = "x < y && z > 0";</script></head><body>""" +
      """<nav><a href="/home">Home</a> <a href="/about">About</a></nav>""" +
      s"""<h1>$source #$id</h1>""" +
      s"""<p class="main">${escapeHtml(text)}</p>""" +
      s"""<p>lang=&quot;$lang&quot; &amp; id=&#39;$id&#39;</p>""" +
      """<footer>site footer</footer></body></html>"""

  def buildUrl(id: Long, lang: String, source: String): String =
    s"https://WWW.$source.Example${id % 7}.COM:443/docs/$id" +
      s"?lang=$lang&ref=feed#sec-${id % 5}"

  def buildRequest(id: Long, lang: String, source: String): String =
    s"GET /docs/$id?lang=$lang&ref=feed HTTP/1.1$CRLF" +
      s"Host: www.$source.example${id % 7}.com$CRLF$CRLF"

  /** Responses alternate framings on an axis independent of the gzip
    * variant: id % 4 == 1 ships Transfer-Encoding: chunked (256-byte
    * chunks, lowercase hex sizes, no trailers), everything else exact
    * Content-Length — so the corpus exercises chunked-inside-gzip too. */
  def buildResponse(id: Long, text: String, lang: String, source: String): String = {
    val html = buildHtml(id, text, lang, source)
    if (id % 4 == 1) {
      val sb = new StringBuilder
      sb ++= s"HTTP/1.1 200 OK${CRLF}Content-Type: text/html; charset=utf-8$CRLF"
      sb ++= s"Transfer-Encoding: chunked${CRLF}X-Doc: $id$CRLF$CRLF"
      var p = 0
      while (p < html.length) {
        val n = math.min(256, html.length - p)
        sb ++= Integer.toHexString(n); sb ++= CRLF
        sb ++= html.substring(p, p + n); sb ++= CRLF
        p += n
      }
      sb ++= "0"; sb ++= CRLF; sb ++= CRLF
      sb.result()
    } else
      s"HTTP/1.1 200 OK${CRLF}Content-Type: text/html; charset=utf-8$CRLF" +
        s"Content-Length: ${html.length}${CRLF}X-Doc: $id$CRLF$CRLF$html"
  }

  private def warcRecordBytes(
      warcType: String, uri: String, payload: String): Array[Byte] = {
    val s = s"WARC/1.0${CRLF}WARC-Type: $warcType$CRLF" +
      s"WARC-Target-URI: $uri$CRLF" +
      s"WARC-Record-ID: <urn:graft:$warcType:${uri.length}>$CRLF" +
      s"Content-Type: application/http$CRLF" +
      s"Content-Length: ${payload.length}$CRLF$CRLF$payload$CRLF$CRLF"
    s.getBytes("ISO-8859-1")
  }

  /** One WARC file per document: a request record then the response
    * record, compression variant keyed by doc_id % 3 —
    * 0 = plain, 1 = gzip STORED (hand-rolled), 2 = gzip Deflater+FNAME.
    * One gzip member per record, per the WARC convention. */
  def buildWarcFile(
      id: Long, text: String, lang: String, source: String): Array[Byte] = {
    val uri = buildUrl(id, lang, source)
    val req = warcRecordBytes("request", uri, buildRequest(id, lang, source))
    val rsp =
      warcRecordBytes("response", uri, buildResponse(id, text, lang, source))
    (id % 3) match {
      case 0 => req ++ rsp
      case 1 => gzipStored(req) ++ gzipStored(rsp)
      case _ => gzipDeflate(req, s"rec-$id-0.http") ++
        gzipDeflate(rsp, s"rec-$id-1.http")
    }
  }

  /** WET — Common Crawl's extracted-text sidecar format: the same WARC
    * container, `WARC-Type: conversion` records whose payload is the
    * PLAIN TEXT extracted from the page (here: the pure-Column
    * extraction formula's output, so the WET text and `web_html_text`'s
    * body column are definitionally equal). Same per-doc compression
    * variants as [[buildWarcFile]]. */
  def buildWetFile(
      id: Long, text: String, lang: String, source: String): Array[Byte] = {
    val uri = buildUrl(id, lang, source)
    val extracted = extractedText(id, text, lang, source)
    val rec = warcRecordBytes("conversion", uri, extracted)
    (id % 3) match {
      case 0 => rec
      case 1 => gzipStored(rec)
      case _ => gzipDeflate(rec, s"wet-$id.txt")
    }
  }

  /** JVM twin of [[extractTextCol]] ∘ [[buildHtml]] — the extracted
    * plain text of a synth page (kept in lockstep with the Column
    * chain; WebCodecSpec asserts the equivalence row-for-row). */
  def extractedText(
      id: Long, text: String, lang: String, source: String): String = {
    val html = buildHtml(id, text, lang, source)
    val noScript = html.replaceAll("<script[^>]*>.*?</script>", " ")
    val noStyle = noScript.replaceAll("<style[^>]*>.*?</style>", " ")
    val noTags = noStyle.replaceAll("<[^>]*>", " ")
    val ent = noTags.replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&lt;", "<").replace("&gt;", ">").replace("&nbsp;", " ")
      .replace("&amp;", "&")
    ent.replaceAll("\\s+", " ").trim
  }

  /** (media_id, payload) synthesized WET archive table. */
  def webWet(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, lang, source) =>
          (id, buildWetFile(id, text, lang, source))
        }
      }.toDF("media_id", "payload")
  }

  final case class WetRow(
      media_id: Long, target_uri: String, text: String, n_chars: Long)

  /** WET → conversion records → extracted text rows (the format a
    * text-only consumer reads INSTEAD of re-extracting from HTML). */
  def wetTexts(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          parseWarc(payload).iterator.flatMap { recs =>
            recs.filter(_.warcType == "conversion").map { r =>
              val t = new String(r.payload, "ISO-8859-1")
              WetRow(id, r.targetUri, t, t.length.toLong)
            }
          }
        }
      }.toDF()
  }

  /** Order-weighted byte checksum Σ (i+1)·b_i — pins content AND byte
    * order (the media tier's (f+1)-weighted trick at byte granularity).
    * ASCII payloads ⇒ the oracle's per-char ascii() replay is byte-exact. */
  def weightedCk(b: Array[Byte]): Long = {
    var s = 0L; var i = 0
    while (i < b.length) { s += (i + 1).toLong * (b(i) & 0xff); i += 1 }
    s
  }

  // ------------------------------------------------------------------
  // DataFrame seams
  // ------------------------------------------------------------------

  /** (media_id, payload): the synthesized WARC archive table. */
  def webWarc(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text, lang, source) =>
          (id, buildWarcFile(id, text, lang, source))
        }
      }.toDF("media_id", "payload")
  }

  final case class WarcRow(
      media_id: Long, rec_index: Int, warc_type: String, target_uri: String,
      content_length: Long, gzip_members: Int, payload_ck: Long)

  /** Per-record features through the full gzip→WARC walk. */
  def warcRecords(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val gz = payload.length >= 2 &&
            (payload(0) & 0xff) == 0x1f && (payload(1) & 0xff) == 0x8b
          parseWarc(payload).toSeq.flatMap { recs =>
            recs.zipWithIndex.map { case (r, i) =>
              WarcRow(id, i, r.warcType, r.targetUri,
                r.payload.length.toLong, if (gz) recs.length else 0,
                weightedCk(r.payload))
            }
          }
        }
      }.toDF()
  }

  final case class WebDoc(
      media_id: Long, target_uri: String, http_status: Int, body: String)

  /** WARC → response records → HTTP parse → HTML body as a string
    * column (the codec half of the pipeline; the text half is the
    * pure-Column chain below). */
  def warcResponses(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          parseWarc(payload).toSeq.flatMap { recs =>
            recs.filter(_.warcType == "response").flatMap { r =>
              parseHttpResponse(r.payload).map { case (status, body) =>
                WebDoc(id, r.targetUri, status, new String(body, "ISO-8859-1"))
              }
            }
          }
        }
      }.toDF()
  }

  // ------------------------------------------------------------------
  // Pure-Column text layer (dialect-identical Spark/DuckDB regexes;
  // DuckDB twins live in ExtQueries' web* oracles — keep in lockstep)
  // ------------------------------------------------------------------

  /** Column twin of [[buildHtml]] — used by the pure-Column queries so
    * the whole chain (build + extract) stays inside codegen. */
  def htmlCol(id: Column, text: Column, lang: Column, source: Column): Column = {
    val etext = regexp_replace(
      regexp_replace(regexp_replace(text, "&", "&amp;"), "<", "&lt;"),
      ">", "&gt;")
    concat(
      lit("<html><head><title>Doc "), id.cast("string"),
      lit(" ["), source, lit("]</title>"),
      lit("<style>body {color: red;}</style>"),
      lit("<script>var u = \"x < y && z > 0\";</script></head><body>"),
      lit("<nav><a href=\"/home\">Home</a> <a href=\"/about\">About</a></nav>"),
      lit("<h1>"), source, lit(" #"), id.cast("string"), lit("</h1>"),
      lit("<p class=\"main\">"), etext, lit("</p>"),
      lit("<p>lang=&quot;"), lang, lit("&quot; &amp; id=&#39;"),
      id.cast("string"), lit("&#39;</p>"),
      lit("<footer>site footer</footer></body></html>"))
  }

  /** Column twin of [[buildUrl]]. */
  def urlCol(id: Column, lang: Column, source: Column): Column =
    concat(lit("https://WWW."), source, lit(".Example"),
      (id % 7).cast("string"), lit(".COM:443/docs/"),
      id.cast("string"), lit("?lang="), lang, lit("&ref=feed#sec-"),
      (id % 5).cast("string"))

  /** script/style block removal → tag strip → entity decode (quot, #39,
    * lt, gt, nbsp, then amp LAST — the standard order that avoids
    * double-decoding) → whitespace collapse → trim. Every step uses
    * regex constructs RE2 and java.util.regex agree on. */
  def extractTextCol(html: Column): Column = {
    val noScript =
      regexp_replace(html, "<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val ent1 = regexp_replace(noTags, "&quot;", "\"")
    val ent2 = regexp_replace(ent1, "&#39;", "'")
    val ent3 = regexp_replace(ent2, "&lt;", "<")
    val ent4 = regexp_replace(ent3, "&gt;", ">")
    val ent5 = regexp_replace(ent4, "&nbsp;", " ")
    val ent6 = regexp_replace(ent5, "&amp;", "&")
    trim(regexp_replace(ent6, "\\s+", " "))
  }

  /** `<title>` contents (first match; empty string when absent). */
  def titleCol(html: Column): Column =
    regexp_extract(html, "<title>([^<]*)</title>", 1)

  /** The composed front door over a raw (media_id, payload) WARC table:
    * parse gate (unparseable archives drop, the codec contract) → HTTP
    * responses → pure-Column HTML extraction → quality gates. ONE code
    * path shared by the batch query `web_pipeline` and the streaming
    * [[graft.sinks.WebSink]] — which is what lets the streamed serving
    * table ride the SAME DuckDB oracle as the batch operator. */
  def pipeline(media: DataFrame): DataFrame = {
    val resp = warcResponses(media)
    val host = urlParts(col("target_uri")).toMap.apply("host")
    resp.select(col("media_id"), host.as("host"), col("http_status"),
        extractTextCol(col("body")).as("body"))
      .select(col("media_id"), col("host"), col("http_status"), col("body"),
        size(split(col("body"), "\\s+")).cast("long").as("n_words"),
        expr("CAST((1000 * length(regexp_replace(body, " +
          "'[^a-zA-Z ]', ''))) DIV length(body) AS BIGINT)")
          .as("alpha_milli"))
      .withColumn("kept", col("n_words") >= 40 && col("alpha_milli") >= 900)
  }

  // ------------------------------------------------------------------
  // robots.txt — crawl politeness (RFC 9309 subset)
  // ------------------------------------------------------------------

  /** robots.txt parse + evaluation: User-agent groups, Allow/Disallow
    * path rules, LONGEST-match-wins with allow preferred on ties, the
    * most specific matching group (exact agent name beats `*`) selected
    * exclusively, default-allow when nothing matches. Simplifications
    * documented: no `*`/`$` wildcards inside paths, agent match is
    * exact-or-star (the synth corpus needs no substring UA matching). */
  object Robots {
    final case class Rule(allow: Boolean, path: String)

    /** Parse to agent → rules (groups merged per agent name; later
      * groups for the same agent extend earlier ones, per the RFC). A
      * rule line before any User-agent line is a grammar error → None. */
    def parse(text: String): Option[Map[String, Vector[Rule]]] = {
      val groups = scala.collection.mutable.Map.empty[String, Vector[Rule]]
      var agents: List[String] = Nil
      var inHeader = false // consecutive User-agent lines share a group
      for (raw <- text.split("\n", -1)) {
        val line = raw.takeWhile(_ != '#').trim
        if (line.nonEmpty) {
          val k = line.indexOf(':')
          if (k <= 0) return None
          val key = line.substring(0, k).trim.toLowerCase
          val value = line.substring(k + 1).trim
          key match {
            case "user-agent" =>
              if (value.isEmpty) return None
              val a = value.toLowerCase
              agents = if (inHeader) a :: agents else List(a)
              inHeader = true
              groups.getOrElseUpdate(a, Vector.empty)
            case "allow" | "disallow" =>
              if (agents.isEmpty) return None // rule outside any group
              inHeader = false
              if (value.nonEmpty) { // empty Disallow: = no rule
                for (a <- agents)
                  groups(a) = groups(a) :+ Rule(key == "allow", value)
              }
            case _ => inHeader = false // crawl-delay etc: tolerated
          }
        }
      }
      Some(groups.toMap)
    }

    /** (allowed, matched rule path — "" when no rule matched). */
    def evaluate(groups: Map[String, Vector[Rule]], agent: String,
        path: String): (Boolean, String) = {
      val rules = groups.getOrElse(agent.toLowerCase,
        groups.getOrElse("*", Vector.empty))
      val hits = rules.filter(r => path.startsWith(r.path))
      if (hits.isEmpty) (true, "")
      else {
        val best = hits.maxBy(r => (r.path.length, r.allow)) // allow ties
        (best.allow, best.path)
      }
    }
  }

  /** Deterministic robots.txt for synth domain k — the JVM twin of the
    * `web_robots_gate` oracle's decision table. Exercises group
    * selection (graftbot group on k%5==0), allow-vs-disallow ties
    * (k%3==0 Allow meets k%2==1 Disallow at equal length → allow wins),
    * and default-allow. */
  def buildRobots(k: Long): String = {
    val sb = new StringBuilder
    sb ++= "# synth robots for example" + k + ".com\n"
    sb ++= "User-agent: *\n"
    sb ++= "Disallow: /private/\n"
    if (k % 2 == 1) sb ++= "Disallow: /docs/\n"
    if (k % 3 == 0) sb ++= "Allow: /docs/\n"
    sb ++= "Crawl-delay: " + (k + 1) + "\n"
    if (k % 5 == 0) {
      sb ++= "\nUser-agent: graftbot\n"
      sb ++= "Disallow: /docs/9\n"
    }
    sb.result()
  }

  /** The crawl-politeness gate over the synth corpus: each document's
    * URL path evaluated for agent "graftbot" against its domain's
    * PARSED robots.txt (real parse per row — the codec seam), emitting
    * the verdict and the matched rule. */
  def robotsGate(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      // one parse per distinct domain per partition (7 domains)
      val cache = scala.collection.mutable.Map
        .empty[Long, Map[String, Vector[Robots.Rule]]]
      ids.map { id =>
        val k = id % 7
        val groups = cache.getOrElseUpdate(k,
          Robots.parse(buildRobots(k)).get)
        val path = s"/docs/$id"
        val (allowed, rule) = Robots.evaluate(groups, "graftbot", path)
        (id, s"example$k.com", path, allowed, rule)
      }
    }.toDF("media_id", "domain", "path", "allowed", "matched_rule")
  }

  /** URL normalization: drop the fragment, lowercase scheme+host, strip
    * the https default port. Returns (normalized, scheme, host, path,
    * query, registered domain) as a struct-free tuple of Columns via a
    * helper — callers select the pieces. */
  def urlParts(url: Column): Seq[(String, Column)] = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val hostRaw = lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?#]+)", 1))
    val host = regexp_replace(hostRaw, ":443$", "")
    val path = regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val domain = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val norm = concat(scheme, lit("://"), host, path,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
    Seq("url_norm" -> norm, "scheme" -> scheme, "host" -> host,
      "path" -> path, "qs" -> query, "domain" -> domain)
  }
}

/** Little-endian byte helpers shared by the ingestion codecs (gzip
  * trailers, zip headers) — one copy, package-private (review r15:
  * WebCodec and ArchiveCodec each carried an identical private set). */
private[ext] object Le {
  def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  def w32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }
}
