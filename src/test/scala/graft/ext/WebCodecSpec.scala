package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Web ingestion tier: gzip member walk (RFC 1952 header grammar,
  * CRC32/ISIZE, multi-member), WARC 1.0 record framing, HTTP response
  * parse, and the JVM-twin ↔ pure-Column lockstep the oracles rest on.
  * House strictness: every malformed byte stream poisons to None, never
  * throws, never misframes. */
class WebCodecSpec extends SparkSuite {
  import WebCodec._

  private val docsSample = Seq(
    (0L, "the quick brown fox", "en", "src0"),
    (7L, "alpha & beta < gamma > delta", "de", "src3"),
    (12L, "one two three four five six seven eight", "zh", "src1"))

  /** Extra request/response pairs per doc (r17 redirect; r18 retry ×1
    * pair, chain/loop ×2 pairs) — the expected-record-count twin of
    * buildWarcFile's axis layout. */
  private def extraRecs(id: Long): Int =
    (if (redirectAxis(id) || retryAxis(id)) 2 else 0) +
      (if (chainAxis(id) || loopAxis(id)) 4 else 0)
  private def recCount(id: Long): Int =
    (if (hasMetadata(id)) 3 else 2) + extraRecs(id)

  // ------------------------------------------------------------- gzip

  test("gzip: stored and deflate members round-trip, multi-member walks") {
    val a = "hello warc world".getBytes("ISO-8859-1")
    val b = Array.tabulate(70000)(i => (i * 31 % 251).toByte) // >1 block
    assert(gunzipMembers(gzipStored(a)).get.map(_.toSeq) == Vector(a.toSeq))
    assert(gunzipMembers(gzipStored(b)).get.map(_.toSeq) == Vector(b.toSeq))
    assert(gunzipMembers(gzipDeflate(a, "a.http")).get.map(_.toSeq)
      == Vector(a.toSeq))
    val multi = gzipStored(a) ++ gzipDeflate(b, "b.bin") ++ gzipStored(a)
    assert(gunzipMembers(multi).get.map(_.toSeq)
      == Vector(a.toSeq, b.toSeq, a.toSeq))
    assert(gunzipMembers(gzipStored(Array.emptyByteArray)).get
      .map(_.length) == Vector(0))
  }

  test("gzip strictness: magic, method, reserved flags, CRC, ISIZE, " +
      "truncation, trailing garbage all poison") {
    val ok = gzipStored("payload bytes".getBytes("ISO-8859-1"))
    def mut(i: Int, v: Int): Array[Byte] = {
      val c = ok.clone(); c(i) = v.toByte; c
    }
    assert(gunzipMembers(mut(0, 0x1e)).isEmpty) // magic
    assert(gunzipMembers(mut(2, 9)).isEmpty) // CM != 8
    assert(gunzipMembers(mut(3, 0x80)).isEmpty) // reserved flag bit
    assert(gunzipMembers(mut(ok.length - 6, ok(ok.length - 6) ^ 1))
      .isEmpty) // CRC32
    assert(gunzipMembers(mut(ok.length - 1, ok(ok.length - 1) ^ 1))
      .isEmpty) // ISIZE
    assert(gunzipMembers(ok.dropRight(3)).isEmpty) // truncated trailer
    assert(gunzipMembers(ok ++ Array[Byte](0, 1, 2)).isEmpty) // garbage
  }

  // ------------------------------------------------------------- WARC

  test("warc: all three compression variants demux to the same records " +
      "(request, response, + metadata on id%6>=3) with byte-identical " +
      "payloads") {
    val ref = (0L to 2L).map { v =>
      // ids 0,1,2 hit variants plain/stored/deflate respectively
      // (id 2 is ALSO on the r18 chain axis — 2%9==2 — so its two hop
      // pairs follow the base records; by construction every deflate
      // file, id%3==2, carries a chain/loop/retry pair since 9 = 3·3)
      val bytes = buildWarcFile(v, "sample text words", "en", "src0")
      val recs = parseWarc(bytes).get
      assert(recs.map(_.warcType) ==
        Vector.fill(recCount(v) / 2)(Vector("request", "response"))
          .flatten, s"id=$v")
      assert(recs.take(2).forall(_.targetUri == buildUrl(v, "en", "src0")))
      // every record is stamped with the doc's crawl instant (r18)
      assert(recs.forall(_.date == warcDateOf(v)), s"id=$v")
      recs.take(2).map(r => weightedCk(r.payload))
    }
    // payload content is id-dependent, so compare against the formulas
    for (v <- 0L to 2L) {
      val req = buildRequest(v, "en", "src0").getBytes("ISO-8859-1")
      val rsp = buildResponse(v, "sample text words", "en", "src0")
      assert(ref(v.toInt) == Vector(weightedCk(req), weightedCk(rsp)))
    }
    // the metadata sidecar axis (id%6>=3) rides all THREE file
    // variants: 9%6==3 plain, 10%6==4 gzip STORED (3 members),
    // 17%6==5 gzip Deflater (17 is also on the r18 retry axis:
    // 3 + its 503 attempt pair) — ADVICE r16
    for (id <- Seq(9L, 10L, 17L)) {
      val recs = parseWarc(buildWarcFile(id, "t", "en", "src0")).get
      assert(recs.map(_.warcType).take(3)
        == Vector("request", "response", "metadata"), s"id=$id")
      assert(recs.length == recCount(id), s"id=$id")
      assert(new String(recs(2).payload, "ISO-8859-1")
        == metadataFields(id), s"id=$id")
    }
  }

  test("warc strictness: version drift, length mismatch, lost " +
      "terminator, trailing garbage, junk header line all poison") {
    val plain = buildWarcFile(0L, "words here", "en", "src0") // plain variant
    val s = new String(plain, "ISO-8859-1")
    assert(parseWarc(s.replaceFirst("WARC/1.0", "WARC/1.1")
      .getBytes("ISO-8859-1")).isEmpty)
    // Content-Length off by one on the first record
    val cl = "Content-Length: "
    val i = s.indexOf(cl) + cl.length
    val n = s.substring(i, s.indexOf('\r', i)).toInt
    assert(parseWarc((s.substring(0, i) + (n + 1) +
      s.substring(s.indexOf('\r', i))).getBytes("ISO-8859-1")).isEmpty)
    assert(parseWarc(plain.dropRight(2)).isEmpty) // lost final CRLF
    assert(parseWarc(plain ++ "x".getBytes).isEmpty) // trailing garbage
    assert(parseWarc(s.replaceFirst("WARC-Type: ", "WARCTypeNoColon")
      .getBytes("ISO-8859-1")).isEmpty)
    assert(parseWarc(Array.emptyByteArray).isEmpty)
    // gzip variant: one member holding TWO records is rejected (the
    // one-member-per-record WARC convention is enforced)
    val both = gzipStored(plain)
    assert(parseWarc(both).isEmpty)
  }

  test("http response parse: status + exact-length body; strictness") {
    // id 0 → Content-Length framing (0 % 4 == 0), utf-8, no entity gzip
    val rspB = buildResponse(0L, "alpha beta", "fr", "src2")
    val rsp = new String(rspB, "ISO-8859-1")
    val m = parseHttpResponse(rspB).get
    assert(m.status == 200 && m.charset == "utf-8"
      && m.contentEncoding == "identity" && !m.chunked)
    assert(m.bodyText == buildHtml(0L, "alpha beta", "fr", "src2"))
    def bytes(s: String) = s.getBytes("ISO-8859-1")
    assert(parseHttpResponse(bytes(rsp + "x")).isEmpty)
    assert(parseHttpResponse(rspB.dropRight(1)).isEmpty)
    assert(parseHttpResponse(bytes(rsp.replaceFirst("HTTP/1.1 200",
      "ICY 200"))).isEmpty)
  }

  test("http charset axis (r17): cp1252 bodies decode via the WHATWG " +
      "table whether labeled iso-8859-1 or windows-1252; utf-8 bodies " +
      "strict-decode; a BOM outranks declarations; nothing-declared " +
      "sniffs") {
    // id 7 → %5==2 cp1252 wire LABELED iso-8859-1 (7%10==7), declared
    // in the header (7%7==0); phrase 7%2==1 carries LITERAL 0x80–0x9F
    // punctuation (€ “ ”) — the WHATWG-aliasing case
    val html7 = buildHtml(7L, "words", "en", "src0")
    val m7 = parseHttpResponse(buildResponse(7L, "words", "en", "src0")).get
    assert(m7.charset == "iso-8859-1" && m7.charsetSrc == "header")
    assert(m7.body.length == html7.length) // cp1252: 1 byte per char
    assert(m7.body.exists(b => (b & 0xff) >= 0x80 && (b & 0xff) < 0xa0),
      "the wire must actually carry 0x80-0x9F bytes")
    assert(m7.bodyText == html7) // latin-1 label, cp1252 semantics
    // id 2 → windows-1252 LABEL (2%10==2), header omits (2%7==2),
    // resolved from the in-document meta tag
    val html2 = buildHtml(2L, "words", "en", "src0")
    val m2 = parseHttpResponse(buildResponse(2L, "words", "en", "src0")).get
    assert(m2.charset == "windows-1252" && m2.charsetSrc == "meta")
    assert(m2.bodyText == html2)
    // id 82 → %7==5 AND even: header omits AND the page omits its meta
    // tag → SNIFF; strict UTF-8 fails on the real cp1252 bytes and the
    // fallback decodes them exactly (82, not 12: 12 moved to the r18
    // MIME axis — covered in its own test below)
    val html12 = buildHtml(82L, "words", "en", "src0")
    assert(!html12.contains("<meta"), "sniff-axis page carries no meta")
    val m12 = parseHttpResponse(buildResponse(82L, "words", "en", "src0")).get
    assert(m12.charset == "" && m12.charsetSrc == "sniff")
    assert(m12.body.length == html12.length)
    assert(m12.bodyText == html12)
    // id 6 → %5==1 utf-8 with the 中文 phrase (6%4==2): multi-byte
    // wire, body_bytes > chars, header-declared (6%7==6)
    val html6 = buildHtml(6L, "words", "en", "src0")
    val m6 = parseHttpResponse(buildResponse(6L, "words", "en", "src0")).get
    assert(m6.charset == "utf-8")
    assert(m6.charsetSrc == "header")
    assert(m6.body.length == html6.getBytes("UTF-8").length)
    assert(m6.body.length > html6.codePointCount(0, html6.length))
    assert(m6.bodyText == html6)
    // id 100 → BOM axis (100%7==2, 100%5==0): the EF BB BF signature
    // outranks the meta tag the page still carries; decode strips it
    val html30 = buildHtml(100L, "words", "en", "src0")
    val m30 = parseHttpResponse(buildResponse(100L, "words", "en", "src0")).get
    assert(m30.charset == "utf-8" && m30.charsetSrc == "bom")
    assert((m30.body(0) & 0xff) == 0xef && (m30.body(1) & 0xff) == 0xbb
      && (m30.body(2) & 0xff) == 0xbf)
    assert(m30.body.length == html30.getBytes("UTF-8").length + 3)
    assert(m30.bodyText == html30) // BOM is a signature, not content
    // http-equiv pragma form (r17): id 72 → %7==2 (header omits),
    // %5==2 + %10==2 (windows-1252 label), %3==0 (http-equiv form) —
    // the charset resolves from the PRAGMA meta, not <meta charset>
    val html72 = buildHtml(72L, "words", "en", "src0")
    assert(html72.contains("http-equiv=\"Content-Type\"")
      && !html72.contains("<meta charset"))
    val m72 = parseHttpResponse(buildResponse(72L, "words", "en", "src0")).get
    assert(m72.charset == "windows-1252" && m72.charsetSrc == "meta")
    assert(m72.bodyText == html72)
    // id 33 → %7==5 odd (meta-resolved), %3==0 (pragma), %5==3 (gzip
    // entity): pragma meta through a content-coded body
    val m33 = parseHttpResponse(buildResponse(33L, "words", "en", "src0")).get
    assert(m33.charset == "utf-8" && m33.charsetSrc == "meta")
    // standalone pragma parse, quoted + charset attr mixed case
    val pragma = ("<html><head><meta http-equiv='Content-Type' " +
      "content='text/html; charset=ISO-8859-1'></head>" +
      "<body>café</body></html>").getBytes("ISO-8859-1")
    val pm = parseHttpResponse(
      ("HTTP/1.1 200 OK\r\nContent-Length: " + pragma.length +
        "\r\n\r\n").getBytes("ISO-8859-1") ++ pragma).get
    assert(pm.charset == "iso-8859-1" && pm.charsetSrc == "meta")
    // sniff: cp1252 bytes with NO header charset and NO meta tag fall
    // back cleanly, reported as sniffed — 0x80-0x9F decode per WHATWG
    val latin = encodeCp1252("café ±5° — ‘x’ €")
    val undeclared = ("HTTP/1.1 200 OK\r\nContent-Length: " +
      latin.length + "\r\n\r\n").getBytes("ISO-8859-1") ++ latin
    val ms = parseHttpResponse(undeclared).get
    assert(ms.bodyText == "café ±5° — ‘x’ €" && ms.charsetSrc == "sniff")
    // meta resolution: no header param, a meta tag inside the first KiB
    val metaBody = ("<html><head><meta charset='ISO-8859-1'></head>" +
      "<body>café</body></html>").getBytes("ISO-8859-1")
    val metaMsg = parseHttpResponse(
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: " +
        metaBody.length + "\r\n\r\n").getBytes("ISO-8859-1") ++ metaBody).get
    assert(metaMsg.charset == "iso-8859-1" && metaMsg.charsetSrc == "meta")
    assert(metaMsg.bodyText.contains("café"))
    // and valid UTF-8 with no declared charset decodes as UTF-8
    val utf = "café 中文".getBytes("UTF-8")
    val undeclaredU = ("HTTP/1.1 200 OK\r\nContent-Length: " +
      utf.length + "\r\n\r\n").getBytes("ISO-8859-1") ++ utf
    assert(parseHttpResponse(undeclaredU).get.bodyText
      == "café 中文")
  }

  test("charset plumbing (r17): WHATWG cp1252 table is bijective on its " +
      "repertoire, undefined bytes map to C1 controls, UTF-16 BOMs " +
      "resolve and decode with the signature stripped") {
    // the five undefined cp1252 bytes → matching C1 controls (WHATWG),
    // NOT U+FFFD (the JDK Cp1252 choice) — keeps decode∘encode bijective
    for (b <- Seq(0x81, 0x8d, 0x8f, 0x90, 0x9d))
      assert(decodeCp1252(Array(b.toByte)).codePointAt(0) == b)
    // spot values from the published index
    assert(decodeCp1252(Array(0x80.toByte)) == "€")
    assert(decodeCp1252(Array(0x91.toByte, 0x92.toByte)) == "‘’")
    assert(decodeCp1252(Array(0x97.toByte)) == "—")
    assert(decodeCp1252(Array(0x9e.toByte)) == "ž")
    // full-byte-space round trip: decode then encode is identity
    val all = Array.tabulate[Byte](256)(_.toByte)
    assert(encodeCp1252(decodeCp1252(all)).sameElements(all))
    assert(cp1252Encodable("€‘’“”–—…†•™ ±°«»ßñé"))
    assert(!cp1252Encodable("中文"))
    // encode of a non-representable char throws (fail-fast, never '?')
    intercept[IllegalArgumentException] { encodeCp1252("中") }
    // UTF-16 BOMs: resolution reports bom + the right endianness, and
    // decode strips the signature
    val le = Array(0xff.toByte, 0xfe.toByte) ++ "hé€".getBytes("UTF-16LE")
    assert(bomCharset(le) == Some("utf-16le"))
    assert(resolveCharset("", le) == (("utf-16le", "bom")))
    assert(decodeText(le, "utf-16le") == "hé€")
    val be = Array(0xfe.toByte, 0xff.toByte) ++ "hé€".getBytes("UTF-16BE")
    assert(bomCharset(be) == Some("utf-16be"))
    assert(decodeText(be, "utf-16be") == "hé€")
    // the default path honors a UTF-16 BOM before the UTF-8 sniff
    assert(decodeText(le, "") == "hé€")
    assert(decodeText(be, "") == "hé€")
    // a BOM outranks even an explicit header declaration (WHATWG)
    assert(resolveCharset("iso-8859-1",
      Utf8Bom ++ "x".getBytes("UTF-8")) == (("utf-8", "bom")))
  }

  test("http content-encoding axis: gzip (id%5==3) inflates through the " +
      "member walk, deflate (id%5==4, zlib per RFC 9110) through the " +
      "zlib inflater; both compose with chunked framing; corrupt/" +
      "unknown codings poison") {
    for (id <- Seq(3L, 4L, 8L, 13L, 14L, 9L)) { // 13 chunked+gzip,
      // 9 chunked+deflate+BOM (9%4==1, 9%5==4, 9%7==2); 3 is ALSO on
      // the r18 MIME axis — a gzip-coded text/plain entity
      val want =
        if (mimeAxis(id)) "coded body words"
        else buildHtml(id, "coded body words", "en", "src1")
      val m = parseHttpResponse(
        buildResponse(id, "coded body words", "en", "src1")).get
      assert(m.contentEncoding == contentCoding(id), s"id=$id")
      assert(m.chunked == (id % 4 == 1), s"id=$id")
      assert(m.bodyText == want, s"id=$id")
      assert(m.mime == (if (mimeAxis(id)) "text/plain" else "text/html"),
        s"id=$id")
    }
    // zlib round trip + strictness at the helper level
    val data = "zlib payload bytes".getBytes("ISO-8859-1")
    assert(inflateZlib(zlibDeflate(data)).exists(_.sameElements(data)))
    assert(inflateZlib(zlibDeflate(data) ++ Array[Byte](1)).isEmpty) // trailing
    assert(inflateZlib(zlibDeflate(data).dropRight(2)).isEmpty) // truncated
    assert(inflateZlib(gzipStored(data)).isEmpty) // gzip bytes ≠ zlib
    // zero-output final inflate() calls are NOT truncation (r19: an empty
    // text/plain deflate capture, and any payload inflating to an exact
    // multiple of the 8 KiB inflate chunk, both end with inflate() == 0
    // and finished() == true — the old needsInput check poisoned them)
    assert(inflateZlib(zlibDeflate(Array.emptyByteArray))
      .exists(_.isEmpty))
    val exact8k = Array.fill[Byte](8192 * 2)(7)
    assert(inflateZlib(zlibDeflate(exact8k)).exists(_.sameElements(exact8k)))
    // unknown coding poisons
    assert(parseHttpResponse(
      ("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n" +
        "Content-Length: 2\r\n\r\nhi").getBytes("ISO-8859-1")).isEmpty)
    // declared gzip but non-gzip bytes poisons
    assert(parseHttpResponse(
      ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
        "Content-Length: 2\r\n\r\nhi").getBytes("ISO-8859-1")).isEmpty)
    // declared deflate but non-zlib bytes poisons
    assert(parseHttpResponse(
      ("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n" +
        "Content-Length: 2\r\n\r\nhi").getBytes("ISO-8859-1")).isEmpty)
    // corrupt gzip entity (CRC flip) poisons
    val ok = buildResponse(8L, "words", "en", "src1") // 8%5==3 stored gzip
    val bad = ok.clone()
    bad(bad.length - 6) = (bad(bad.length - 6) ^ 1).toByte
    assert(parseHttpResponse(bad).isEmpty)
    // corrupt deflate entity (Adler flip) poisons
    val okD = buildResponse(4L, "words", "en", "src1") // 4%5==4 deflate
    val badD = okD.clone()
    badD(badD.length - 1) = (badD(badD.length - 1) ^ 1).toByte
    assert(parseHttpResponse(badD).isEmpty)
  }

  test("http chunked transfer-encoding: de-chunks to the exact html " +
      "(multi-chunk), and every framing violation poisons") {
    // id 5 → chunked (5 % 4 == 1), utf-8, no entity gzip (5 % 5 == 0);
    // long text forces several 256-codepoint chunks
    val text = Array.fill(30)("lorem ipsum dolor sit amet").mkString(" ")
    val rspB = buildResponse(5L, text, "fr", "src2")
    val rsp = new String(rspB, "ISO-8859-1")
    assert(rsp.contains("Transfer-Encoding: chunked")
      && !rsp.contains("Content-Length"))
    val m = parseHttpResponse(rspB).get
    assert(m.status == 200 && m.chunked)
    val html = buildHtml(5L, text, "fr", "src2")
    assert(html.length > 512, "must span 3+ chunks")
    assert(m.bodyText == html)
    def poison(s: String): Unit =
      assert(parseHttpResponse(s.getBytes("ISO-8859-1")).isEmpty, s.take(60))
    poison(rsp + "x") // bytes after the 0-chunk terminator
    poison(rsp.replaceFirst("100\r\n", "10g\r\n")) // non-hex size line
    poison(rsp.replaceFirst("100\r\n", "ff\r\n")) // size lies → CRLF miss
    poison(rsp.dropRight(2)) // lost final CRLF
    poison(rsp.replaceFirst("Transfer-Encoding: chunked",
      "Transfer-Encoding: deflate")) // unknown transfer coding
    poison(rsp.replaceFirst("Transfer-Encoding: chunked",
      "Transfer-Encoding: chunked\r\nContent-Length: 3")) // both framings
    // trailer section (r17): id 5 is on the trailer axis (5%8==5) —
    // the wire carries 'X-Graft-Trailer: <entity bytes>' between the
    // 0-chunk and the final CRLF, the parse counts it, and the body
    // is unchanged
    assert(rsp.contains("0\r\nX-Graft-Trailer: "))
    assert(m.trailers == 1)
    // a trailer line without a colon poisons; a trailer AFTER the
    // final CRLF is trailing garbage and poisons
    poison(rsp.replaceFirst("X-Graft-Trailer: ", "XGraftTrailerNoColon"))
    // non-trailer chunked docs still parse with zero trailers (id 21,
    // 21%8==5? no: 21%8==5 → yes... use id 1: 1%4==1, 1%8==1)
    val m1 = parseHttpResponse(
      buildResponse(1L, "one words here", "en", "src0")).get
    assert(m1.chunked && m1.trailers == 0)
    // round-trip through the FULL stack: chunked response inside a
    // gzip-deflate WARC member (id 5: gzip variant 2, chunked variant 1)
    val recs = parseWarc(buildWarcFile(5L, text, "fr", "src2")).get
    assert(parseHttpResponse(recs(1).payload).get.bodyText == html)
    // chunk boundaries are CODEPOINT-aligned: a multi-byte phrase doc
    // (id 1: chunked, utf-8 wire, 1%4==1, 1%5==1, phrase 1%6==1 with
    // curly quotes + €) still decodes exactly
    val html01 = buildHtml(1L, text, "fr", "src2")
    assert(parseHttpResponse(
      buildResponse(1L, text, "fr", "src2")).get.bodyText == html01)
  }

  test("mutation fuzz: random single-byte flips never throw and never " +
      "misframe (gzip variants poison via CRC; plain either poisons or " +
      "keeps exact record framing)") {
    val rnd = new scala.util.Random(20260816)
    for (id <- 0L to 5L; _ <- 0 until 40) {
      val ok = buildWarcFile(id, "some words in a row", "en", "src1")
      val c = ok.clone()
      val at = rnd.nextInt(c.length)
      c(at) = (c(at) ^ (1 << rnd.nextInt(8))).toByte
      parseWarc(c) match {
        case None => ()
        case Some(recs) =>
          // a surviving parse must still be well-framed records
          // (2, +1 metadata on id%6>=3, + the axis pairs per r17/r18)
          assert(recs.length == recCount(id))
          assert(recs.forall(_.payload != null))
      }
    }
  }

  test("overflow hardening (review r15): oversized length fields poison " +
      "instead of throwing or allocating") {
    // WARC Content-Length: >Int digits used to throw NumberFormatException;
    // near-Int.MaxValue values used to wrap the bound check into
    // copyOfRange crashes
    def warcWith(cl: String): Array[Byte] =
      ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n" +
        s"Content-Length: $cl\r\n\r\nx\r\n\r\n").getBytes("ISO-8859-1")
    assert(parseWarc(warcWith("99999999999")).isEmpty)
    assert(parseWarc(warcWith("2147483640")).isEmpty)
    assert(parseWarc(warcWith("4294967295")).isEmpty)
    // HTTP Content-Length: same two families
    def httpWith(cl: String): Array[Byte] =
      s"HTTP/1.1 200 OK\r\nContent-Length: $cl\r\n\r\nhi".getBytes("ISO-8859-1")
    assert(parseHttpResponse(httpWith("99999999999")).isEmpty)
    assert(parseHttpResponse(httpWith("2147483640")).isEmpty)
    // chunked: a 7fffffff size line used to wrap the bound check into
    // body.write crashing
    assert(parseHttpResponse(
      ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
        "7fffffff\r\nhi\r\n0\r\n\r\n").getBytes("ISO-8859-1")).isEmpty)
  }

  test("duplicate framing headers poison — the smuggling ambiguity " +
      "class is rejected, never last-wins (review r16)") {
    def bytes(s: String) = s.getBytes("ISO-8859-1")
    // two Content-Lengths (HTTP)
    assert(parseHttpResponse(bytes(
      "HTTP/1.1 200 OK\r\nContent-Length: 2\r\nContent-Length: 2\r\n\r\nhi"))
      .isEmpty)
    // two Transfer-Encodings
    assert(parseHttpResponse(bytes(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n0\r\n\r\n")).isEmpty)
    // two Content-Encodings
    assert(parseHttpResponse(bytes(
      "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
        "Content-Encoding: gzip\r\nContent-Length: 2\r\n\r\nhi")).isEmpty)
    // two WARC Content-Lengths
    assert(parseWarc(bytes(
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n" +
        "Content-Length: 1\r\nContent-Length: 1\r\n\r\nx\r\n\r\n")).isEmpty)
    // the single-header forms still parse
    assert(parseHttpResponse(bytes(
      "HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nhi")).nonEmpty)
  }

  test("gzip bomb cap (review r16): a member inflating past the 256 MiB " +
      "bound poisons instead of buffering gigabytes before ISIZE") {
    // 257 MiB of zeros deflates to ~260 KB — a classic high-ratio bomb
    val zeros = new Array[Byte]((257 << 20))
    val bomb = gzipDeflate(zeros, "bomb.bin")
    assert(bomb.length < (2 << 20), "bomb must be small on the wire")
    assert(gunzipMembers(bomb).isEmpty)
    // and a member just under any legitimate size still inflates fine
    val ok = gzipDeflate(new Array[Byte](1 << 20), "ok.bin")
    assert(gunzipMembers(ok).exists(_.head.length == (1 << 20)))
  }

  test("gzip FHCRC header checksum is verified, not skipped (review r15)") {
    // build a member with FHCRC set and the correct RFC 1952 CRC16
    val payload = "fhcrc payload".getBytes("ISO-8859-1")
    val base = gzipStored(payload)
    val withHcrc = new java.io.ByteArrayOutputStream()
    withHcrc.write(base, 0, 3)
    withHcrc.write(base(3) | 2) // set FHCRC
    withHcrc.write(base, 4, 6) // MTIME, XFL, OS
    val hdr = withHcrc.toByteArray
    val crc = new java.util.zip.CRC32(); crc.update(hdr)
    val c16 = (crc.getValue & 0xffffL).toInt
    withHcrc.write(c16 & 0xff); withHcrc.write((c16 >> 8) & 0xff)
    withHcrc.write(base, 10, base.length - 10) // deflate body + trailer
    val good = withHcrc.toByteArray
    assert(gunzipMembers(good).exists(_.head.sameElements(payload)))
    val bad = good.clone(); bad(10) = (bad(10) ^ 1).toByte // corrupt CRC16
    assert(gunzipMembers(bad).isEmpty)
  }

  // ----------------------------------------- JVM twin ↔ Column lockstep

  test("htmlCol/urlCol are exact Column twins of buildHtml/buildUrl") {
    val sp = spark
    import sp.implicits._
    val df = docsSample.toDF("doc_id", "text", "lang", "source")
    val rows = df.select(col("doc_id"),
      htmlCol(col("doc_id"), col("text"), col("lang"), col("source")),
      urlCol(col("doc_id"), col("lang"), col("source")))
      .collect()
    for (r <- rows) {
      val (id, h, u) = (r.getLong(0), r.getString(1), r.getString(2))
      val doc = docsSample.find(_._1 == id).get
      assert(h == buildHtml(id, doc._2, doc._3, doc._4))
      assert(u == buildUrl(id, doc._3, doc._4))
    }
  }

  test("extractTextCol: scripts/styles vanish, tags strip, entities " +
      "decode in the amp-last order, whitespace collapses") {
    val sp = spark
    import sp.implicits._
    val html = "<html><head><title>T</title><style>b {x}</style>" +
      "<script>if (a < b && c > d) { run(); }</script></head>" +
      "<body><p>one&nbsp;two</p> <p>&amp;lt; stays</p>" +
      "<div>it&#39;s &quot;q&quot; &lt;tag&gt;</div></body></html>"
    val out = Seq(html).toDF("h")
      .select(extractTextCol(col("h"))).head().getString(0)
    // &amp;lt; decodes to &lt; (literal), NOT to < — amp runs last
    assert(out == "T one two &lt; stays it's \"q\" <tag>")
    val title = Seq(html).toDF("h")
      .select(titleCol(col("h"))).head().getString(0)
    assert(title == "T")
  }

  test("comment stripping (r18): commented-out markup never reaches the " +
      "extracted text, the main content, or the block census") {
    val sp = spark
    import sp.implicits._
    // the exact leak VERDICT r17 pinned: tag-strip alone eats
    // "<!-- <div>" up to the first '>' and leaves "old nav -->" behind
    val html = "<html><body><p>keep this sentence of content here</p>" +
      "<!-- <div class=\"x\">old nav copy that must never leak</div> " +
      "<p>draft paragraph also hidden</p> -->" +
      "<p>and keep this one too</p></body></html>"
    assert(extractText(html) ==
      "keep this sentence of content here and keep this one too")
    val colOut = Seq(html).toDF("h")
      .select(extractTextCol(col("h"))).head().getString(0)
    assert(colOut == extractText(html))
    // block segmentation: the commented <div>/<p> are NOT phantom
    // blocks — 2 real blocks, both kept, zero boilerplate
    val mc = Seq(html).toDF("h")
      .select(mainContentStruct(col("h")).as("mc"))
      .select(col("mc.main_text"), col("mc.n_blocks"), col("mc.n_kept"))
      .head()
    assert(mc.getString(0) ==
      "keep this sentence of content here and keep this one too")
    assert(mc.getLong(1) == 2L && mc.getLong(2) == 2L)
    // the synth corpus carries the axis on every page: extracted text
    // must not contain the commented strings
    for ((id, text, lang, source) <- docsSample) {
      val t = extractedText(id, text, lang, source)
      assert(!t.contains("retired navigation"))
      assert(!t.contains("draft"))
    }
  }

  test("urlParts: fragment dropped, host lowercased, default port " +
      "stripped, components split, registered domain extracted") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      "https://WWW.src3.Example5.COM:443/docs/7?lang=de&ref=feed#sec-2",
      "http://Plain.Host.ORG/a/b").toDF("url")
    val parts = urlParts(col("url")).map { case (n, c) => c.as(n) }
    val rows = df.select(parts: _*).collect()
    assert(rows(0).getString(0)
      == "https://www.src3.example5.com/docs/7?lang=de&ref=feed")
    assert(rows(0).getString(2) == "www.src3.example5.com")
    assert(rows(0).getString(5) == "example5.com")
    assert(rows(1).getString(0) == "http://plain.host.org/a/b")
    assert(rows(1).getString(4) == "") // no query string
    assert(rows(1).getString(5) == "host.org")
  }

  test("urlCanonicalCol (r17): RFC 3986 §6 — pct-normalization, dot " +
      "segments, case, default ports, empty path, fragments") {
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      // decode unreserved %-encodings, uppercase the reserved ones
      "https://h.com/%64ocs/%7Euser%2Fx?q=%41%2f" ->
        "https://h.com/docs/~user%2Fx?q=A%2F",
      // dot segments: . drops, .. pops (not below root)
      "https://h.com/a/./../docs/./7" -> "https://h.com/docs/7",
      "https://h.com/../../a" -> "https://h.com/a",
      // trailing dot segments leave the trailing slash (RFC output)
      "https://h.com/a/b/.." -> "https://h.com/a/",
      "https://h.com/a/." -> "https://h.com/a/",
      // empty segments (double/trailing slashes) pass through
      "https://h.com/a//b/" -> "https://h.com/a//b/",
      // case + default port + fragment + empty path
      "HTTPS://WWW.Ex.COM:443#frag" -> "https://www.ex.com/",
      "HTTP://H.ORG:80/x" -> "http://h.org/x",
      // NON-default port survives
      "https://h.com:8443/x" -> "https://h.com:8443/x",
      // query order and reserved encodings preserved
      "https://h.com/p?b=2&a=%2f#s" -> "https://h.com/p?b=2&a=%2F")
    val out = cases.map(_._1).toDF("url")
      .select(urlCanonicalCol(col("url"))).collect().map(_.getString(0))
    for (((in, want), got) <- cases.zip(out))
      assert(got == want, s"url: $in")
    // idempotence: canonical(canonical(u)) == canonical(u)
    val twice = cases.map(_._2).toDF("url")
      .select(urlCanonicalCol(col("url"))).collect().map(_.getString(0))
    assert(twice.toSeq == cases.map(_._2))
  }

  test("urlResolveCol (r17): RFC 3986 §5 reference resolution — scheme/" +
      "network-path/absolute-path/empty/relative-path refs against a " +
      "base, composing with canonicalization for dot segments") {
    val sp = spark
    import sp.implicits._
    val base = "https://www.ex.com/r/17?q=1#frag"
    val cases = Seq(
      // absolute ref wins outright
      "http://other.org/x" -> "http://other.org/x",
      // network-path adopts the base scheme
      "//cdn.ex.com/y" -> "https://cdn.ex.com/y",
      // absolute-path adopts the base origin (the Location form)
      "/docs/17?lang=en" -> "https://www.ex.com/docs/17?lang=en",
      // empty ref = base sans fragment
      "" -> "https://www.ex.com/r/17?q=1",
      // relative path merges onto the base path's directory
      "sub/page" -> "https://www.ex.com/r/sub/page",
      "../docs/17" -> "https://www.ex.com/r/../docs/17")
    val out = cases.map(_._1).toDF("ref")
      .select(urlResolveCol(lit(base), col("ref")))
      .collect().map(_.getString(0))
    for (((in, want), got) <- cases.zip(out))
      assert(got == want, s"ref: $in")
    // a host-only base merges relative refs at the root
    assert(Seq("p").toDF("r")
      .select(urlResolveCol(lit("https://h.com"), col("r")))
      .head().getString(0) == "https://h.com/p")
    // resolve → canonicalize removes merge-introduced dot segments
    assert(Seq("../docs/17").toDF("r")
      .select(urlCanonicalCol(urlResolveCol(lit(base), col("r"))))
      .head().getString(0) == "https://www.ex.com/docs/17")
  }

  test("IDN host folding (r18): the planted label table IS java.net.IDN " +
      "output, ASCII hosts are identity, folding is idempotent, ports " +
      "survive, relative refs pass through") {
    // the committed punycode strings must be exactly what the JDK's
    // RFC 3490 ToASCII produces — this pins the clean-room table
    for ((uni, ascii) <- idnLabels) {
      assert(java.net.IDN.toASCII(uni) == ascii, s"label $uni")
      assert(idnHostToAscii(s"www.$uni.example3.com")
        == s"www.$ascii.example3.com")
      // already-folded (and any ASCII) hosts are identity
      assert(idnHostToAscii(s"www.$ascii.example3.com")
        == s"www.$ascii.example3.com")
      // idempotence
      assert(idnHostToAscii(idnHostToAscii(s"www.$uni.example3.com"))
        == s"www.$ascii.example3.com")
    }
    assert(idnHostToAscii("www.plain.example.com")
      == "www.plain.example.com")
    // non-default port rides along unfolded
    assert(idnHostToAscii("www.zürich.ex.com:8443")
      == "www.xn--zrich-kva.ex.com:8443")
    // URL-level fold touches ONLY the authority
    assert(idnUrlHostToAscii("https://www.zürich.ex.com/p?q=zürich#f")
      == "https://www.xn--zrich-kva.ex.com/p?q=zürich#f")
    // a relative reference has no host — passes through
    assert(idnUrlHostToAscii("/docs/7?lang=en") == "/docs/7?lang=en")
    // an unfoldable host never throws (the codec contract)
    assert(idnUrlHostToAscii("https://bad höst/x").nonEmpty)
  }

  test("redirectChaseMulti (r18): 1-hop alias resolves fetched, the " +
      "2-hop chain crosses the unicode→punycode IDN hop, and the " +
      "A→B→A loop is detected — never followed to the hop cap") {
    val sp = spark
    import sp.implicits._
    // 13 → r17 alias (13%9=4); 2 → chain (2%9=2); 5 → loop (5%9=5)
    val sample = Seq(
      (13L, "thirteen words here", "fr", "src0"),
      (2L, "two words here", "en", "src1"),
      (5L, "five words here", "de", "src2"))
    val docs = sample.toDF("doc_id", "text", "lang", "source")
    val rows = redirectChaseMulti(docs).orderBy("media_id", "start_uri")
      .collect()
      .map(r => r.getAs[String]("start_uri") ->
        ((r.getAs[String]("final_canonical"), r.getAs[Int]("hops"),
          r.getAs[Boolean]("loop"), r.getAs[Boolean]("already_fetched"))))
      .toMap
    // alias: one hop to the (already captured) doc
    assert(rows(redirectAliasUrl(13L, "fr", "src0")) ==
      (("https://www.src0.example6.com/docs/13?lang=fr&ref=feed",
        1, false, true)))
    // chain /h2: two hops — the unicode Location folds to the punycode
    // /h1 capture, whose own Location lands on the canonical doc
    assert(rows(chainHop2Url(2L, "src1")) ==
      (("https://www.src1.example2.com/docs/2?lang=en&ref=feed",
        2, false, true)))
    // chain /h1 start: one hop
    assert(rows(chainHop1UrlAscii(2L)) ==
      (("https://www.src1.example2.com/docs/2?lang=en&ref=feed",
        1, false, true)))
    // loop: both starts detect the cycle at hop 2 and stop
    assert(rows(loopAUrl(5L, "src2")) ==
      (("https://www.src2.example5.com/la/5", 2, true, false)))
    assert(rows(loopBUrl(5L, "src2")) ==
      (("https://www.src2.example5.com/lb/5", 2, true, false)))
    assert(rows.size == 5)
  }

  test("MIME axis (r18): text/plain captures parse with their media " +
      "type, skip the HTML meta prescan, and route through the pipeline " +
      "as a whitespace collapse — never tag-stripped") {
    val sp = spark
    import sp.implicits._
    val id = 12L // 12%9==3; ALSO cp1252-wire (12%5==2) + header omits
    assert(mimeAxis(id))
    val text = "plain   text with  <angle> brackets & ampersands"
    // '<angle>' would be EATEN by the html extractor — text/plain
    // must keep it (cp1252-encodable: all ASCII)
    val m = parseHttpResponse(
      buildResponse(id, text, "en", "src0")).get
    assert(m.mime == "text/plain")
    assert(m.bodyText == text)
    // no meta prescan for non-HTML: header omits (12%7==5) → sniff
    assert(m.charsetSrc == "sniff")
    // pipeline routing: collapse only, the markup-ish chars survive
    val pm = pipeline(webWarc(
      Seq((id, text, "en", "src0")).toDF("doc_id", "text", "lang",
        "source"))).head()
    assert(pm.getAs[String]("body")
      == "plain text with <angle> brackets & ampersands")
    // main-content routing: no block census for plain text
    val mc = pipelineMain(webWarc(
      Seq((id, text, "en", "src0")).toDF("doc_id", "text", "lang",
        "source"))).head()
    assert(mc.getAs[String]("body")
      == "plain text with <angle> brackets & ampersands")
    assert(mc.getAs[Long]("n_blocks") == 0L
      && mc.getAs[Long]("n_kept") == 0L
      && mc.getAs[Long]("boiler_chars") == 0L)
    // an html doc is unaffected: the meta prescan still runs
    val mh = parseHttpResponse(
      buildResponse(2L, "words", "en", "src0")).get
    assert(mh.mime == "text/html" && mh.charsetSrc == "meta")
  }

  test("WARC-Truncated captures (r18): the header gates tolerance — the " +
      "declared full length with a stored prefix parses to exactly the " +
      "received codepoints; an unmarked short payload still poisons") {
    val sp = spark
    import sp.implicits._
    val id = 55L // 55%18==1, %4==3, %5==0 → the truncation axis
    assert(truncAxis(id))
    val text = "some words here for doc fifty five"
    val html = buildHtml(id, text, "en", "src1")
    val half = truncatedHtml(html)
    assert(half.length < html.length &&
      half == html.substring(0, half.length))
    val recs = parseWarc(buildWarcFile(id, text, "en", "src1")).get
    val resp = recs.find(_.warcType == "response").get
    assert(resp.truncated == "length")
    // tolerant parse: body = the received prefix; the header still
    // declares the FULL entity
    val m = parseHttpResponse(resp.payload,
      tolerateTruncated = true).get
    assert(m.bodyText == half)
    assert(m.contentLengthHdr == html.getBytes("UTF-8").length.toLong)
    // strictness survives: without the record-level header the same
    // payload is misframed
    assert(parseHttpResponse(resp.payload).isEmpty)
    // an unmarked record with bytes chopped off still poisons the file
    val plain = buildWarcFile(0L, text, "en", "src1")
    assert(parseWarc(plain.dropRight(10)).isEmpty)
    // the DataFrame seam surfaces the flag and the prefix checksums
    val row = warcRecords(webWarc(
      Seq((id, text, "en", "src1")).toDF("doc_id", "text", "lang",
        "source")))
      .where(col("warc_type") === "response").head()
    assert(row.getAs[Boolean]("truncated"))
    assert(row.getAs[Long]("body_chars")
      == half.codePointCount(0, half.length).toLong)
    assert(row.getAs[Long]("body_ck") == cpWeightedCk(half))
  }

  test("stripTrackingParamsCol (r18): utm_*/gclid/fbclid strip, real " +
      "params and their order survive, empty results drop the '?'") {
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      "https://h.com/p?utm_source=a&lang=de&utm_campaign=b&ref=feed" ->
        "https://h.com/p?lang=de&ref=feed",
      "https://h.com/p?gclid=x&fbclid=y&msclkid=z" -> "https://h.com/p",
      "https://h.com/p?a=1&b=2" -> "https://h.com/p?a=1&b=2",
      "https://h.com/p" -> "https://h.com/p",
      // a VALUE containing 'utm_' is not a tracking KEY
      "https://h.com/p?q=utm_source&utm_term=x" -> "https://h.com/p?q=utm_source")
    val out = cases.map(_._1).toDF("u")
      .select(stripTrackingParamsCol(col("u"))).collect()
      .map(_.getString(0))
    for (((in, want), got) <- cases.zip(out)) assert(got == want, in)
  }

  test("conditional recrawl (r18): revisit payloads are real 304 " +
      "exchanges — ETag restates the crawl-1 validator and the " +
      "If-None-Match request carries it") {
    val sp = spark
    import sp.implicits._
    val sample = Seq((12L, "twelve words here", "zh", "src1"))
    // id 12 is ALSO on the r18 MIME axis: the validator covers the
    // SERVED content — the raw text, not an html rendering
    val content = "twelve words here"
    val want = s""""graft:ck:${cpWeightedCk(content)}""""
    val recs = parseWarc(
      buildRecrawlFile(12L, "twelve words here", "zh", "src1")).get
    val req = new String(recs.head.payload, "ISO-8859-1")
    assert(req.contains(s"If-None-Match: $want"))
    val m = parseHttpResponse(recs(1).payload).get
    assert(m.status == 304 && m.etag == want && m.body.isEmpty)
    val row = recrawlRecords(webWarcRecrawl(
      sample.toDF("doc_id", "text", "lang", "source"))).head()
    assert(row.getAs[String]("fetched") == "revisit")
    assert(row.getAs[Int]("http_status") == 304)
    assert(row.getAs[String]("etag") == want)
    assert(row.getAs[String]("digest")
      == s"graft:ck:${cpWeightedCk(content)}")
  }

  test("wet: conversion records round-trip the extracted text across " +
      "all gzip variants, and extractedText is the Column chain's twin") {
    val sp = spark
    import sp.implicits._
    val df = docsSample.toDF("doc_id", "text", "lang", "source")
    // JVM twin ≡ Column chain, row for row
    val colRows = df.select(col("doc_id"),
      extractTextCol(htmlCol(col("doc_id"), col("text"), col("lang"),
        col("source")))).collect()
    for (r <- colRows) {
      val doc = docsSample.find(_._1 == r.getLong(0)).get
      assert(r.getString(1) == extractedText(doc._1, doc._2, doc._3, doc._4))
    }
    // WET parse: one conversion record per LIVE doc (dead URLs — r18,
    // id 7 here — have no capture to convert), text byte-faithful;
    // MIME-axis docs (id 12) convert as a collapse of the raw text
    val rows = wetTexts(webWet(df)).orderBy("media_id").collect()
    assert(rows.length == docsSample.count(d => !deadAxis(d._1)))
    for (r <- rows) {
      val doc = docsSample.find(_._1 == r.getAs[Long]("media_id")).get
      val want =
        if (mimeAxis(doc._1)) doc._2.replaceAll("\\s+", " ").trim
        else extractedText(doc._1, doc._2, doc._3, doc._4)
      assert(r.getAs[String]("text") == want)
      assert(r.getAs[String]("target_uri") == buildUrl(doc._1, doc._3, doc._4))
    }
    // strictness rides the shared WARC walk: flip one byte of a STORED
    // gzip member → CRC poisons the file
    val wet = buildWetFile(1L, "some words", "en", "src0") // 1%3==1 stored
    val bad = wet.clone(); bad(wet.length / 2) = (bad(wet.length / 2) ^ 1).toByte
    assert(parseWarc(bad).isEmpty)
  }

  test("robots: group selection, longest-match, allow-tie-break, " +
      "default-allow, comments, merged groups, grammar strictness") {
    import WebCodec.Robots
    val txt =
      """# politeness
        |User-agent: *
        |Disallow: /a/
        |Allow: /a/pub/
        |
        |User-agent: graftbot
        |User-agent: otherbot
        |Disallow: /b/
        |
        |User-agent: graftbot
        |Allow: /b/ok/
        |Crawl-delay: 3
        |Disallow:
        |""".stripMargin
    val g = Robots.parse(txt).get
    // specific group beats *, later group for same agent MERGES
    assert(Robots.evaluate(g, "graftbot", "/b/x") == ((false, "/b/")))
    assert(Robots.evaluate(g, "graftbot", "/b/ok/x") == ((true, "/b/ok/")))
    // the graftbot group is exclusive: /a/ rules do NOT apply to it
    assert(Robots.evaluate(g, "graftbot", "/a/x") == ((true, "")))
    // star group: longest match wins (allow /a/pub/ over disallow /a/)
    assert(Robots.evaluate(g, "unknown", "/a/pub/x") == ((true, "/a/pub/")))
    assert(Robots.evaluate(g, "unknown", "/a/x") == ((false, "/a/")))
    assert(Robots.evaluate(g, "unknown", "/c") == ((true, "")))
    // equal-length allow/disallow tie → allow
    val tie = Robots.parse(
      "User-agent: *\nDisallow: /d/\nAllow: /d/\n").get
    assert(Robots.evaluate(tie, "any", "/d/x") == ((true, "/d/")))
    // grammar strictness: a rule before any group, junk lines
    assert(Robots.parse("Disallow: /x/\n").isEmpty)
    assert(Robots.parse("User-agent: *\nnocolonhere\n").isEmpty)
    assert(Robots.parse("User-agent:\nDisallow: /x/\n").isEmpty)
    // empty Disallow: is legal and adds no rule
    assert(Robots.evaluate(Robots.parse("User-agent: *\nDisallow:\n").get,
      "a", "/x") == ((true, "")))
  }

  test("robots RFC 9309 wildcards: * spans, $ anchors, precedence is " +
      "pattern octets, and exotic shapes match linearly") {
    import WebCodec.Robots.pathMatches
    assert(pathMatches("/docs/*7$", "/docs/17"))
    assert(!pathMatches("/docs/*7$", "/docs/171"))
    assert(pathMatches("/docs/*7$", "/docs/7")) // '*' matches empty
    assert(pathMatches("/*.tmp$", "/a/b/x.tmp"))
    assert(!pathMatches("/*.tmp$", "/a/b/x.tmpx"))
    assert(pathMatches("/a/*/c", "/a/b/c/d")) // prefix semantics
    assert(!pathMatches("/a/*/c", "/a/bc"))
    assert(pathMatches("/a*b*c", "/aXXbYYcZZ"))
    assert(pathMatches("/exact$", "/exact"))
    assert(!pathMatches("/exact$", "/exactx"))
    assert(pathMatches("/p*$", "/p/anything"))
    assert(pathMatches("/**x", "/zzzx")) // collapsed double star
    // greedy-scan soundness: first-match segment placement must not
    // miss a later valid placement ("a*bc$" on "abXbc")
    assert(pathMatches("/a*bc$", "/abXbc"))
    // precedence: the RAW pattern length (incl * and $) decides
    val g = WebCodec.Robots.parse(
      "User-agent: *\nAllow: /docs/\nDisallow: /docs/*9$\n").get
    assert(WebCodec.Robots.evaluate(g, "any", "/docs/19")
      == ((false, "/docs/*9$")))
    assert(WebCodec.Robots.evaluate(g, "any", "/docs/18")
      == ((true, "/docs/")))
  }

  test("robots RFC 9309 UA matching: case-insensitive product token, " +
      "longest named-group prefix wins, star fallback") {
    import WebCodec.Robots
    val g = Robots.parse(
      """User-agent: GraftBot
        |Disallow: /a/
        |
        |User-agent: graftbot-news
        |Disallow: /b/
        |
        |User-agent: *
        |Disallow: /c/
        |""".stripMargin).get
    // product token strips version + comment, folds case
    assert(Robots.productToken("GraftBot/1.7 (+https://x)") == "graftbot")
    assert(Robots.evaluate(g, "GraftBot/1.7 (+https://x)", "/a/z")
      == ((false, "/a/")))
    // longest prefix: graftbot-news token prefers its own group and
    // does NOT inherit the shorter group's rules
    assert(Robots.evaluate(g, "GraftBot-News/2.0", "/b/z")
      == ((false, "/b/")))
    assert(Robots.evaluate(g, "GraftBot-News/2.0", "/a/z") == ((true, "")))
    // unrelated agents fall back to *
    assert(Robots.evaluate(g, "OtherBot/1.0", "/c/z") == ((false, "/c/")))
  }

  test("robots Sitemap: directives collect file-wide, any case, comments " +
      "stripped; the synth robots declare the sitemap index (r17)") {
    import WebCodec.Robots
    assert(Robots.parseSitemapUrls(
      """# c
        |SITEMAP: https://a/s1.xml
        |User-agent: *
        |Disallow: /x/
        |sitemap: https://a/s2.xml # trailing comment
        |Sitemap:
        |""".stripMargin) == Vector("https://a/s1.xml", "https://a/s2.xml"))
    for (k <- 0L to 6L)
      assert(Robots.parseSitemapUrls(WebCodec.buildRobots(k))
        == Vector(s"https://www.example$k.com/sitemap-index.xml"))
    // and the Sitemap line does not perturb rule parsing
    val g = Robots.parse(WebCodec.buildRobots(1L)).get
    assert(Robots.evaluate(g, "any", "/private/x") == ((false, "/private/")))
  }

  test("crawl-delay: parsed per group, resolved for the SELECTED group, " +
      "non-numeric tolerated, directive outside a group poisons") {
    import WebCodec.Robots
    val (g, delays) = Robots.parseWithDelays(
      """User-agent: graftbot
        |Disallow: /a/
        |Crawl-delay: 2
        |
        |User-agent: *
        |Crawl-delay: 7
        |Crawl-delay: nonsense
        |""".stripMargin).get
    assert(delays == Map("graftbot" -> 2L, "*" -> 7L))
    assert(delays(Robots.selectGroup(g.keys, WebCodec.crawlAgent)) == 2L)
    assert(delays(Robots.selectGroup(g.keys, "OtherBot/9")) == 7L)
    // a Crawl-delay before any group is the grammar error class
    assert(Robots.parseWithDelays("Crawl-delay: 3\n").isEmpty)
    // the synth gate carries the resolved delay: named-group domains
    // (k%5==0) use the GraftBot group's 2, others the star group's k+1
    val sp = spark
    import sp.implicits._
    val rows = WebCodec.robotsGate((0L to 13L).toDF("doc_id"))
      .select("media_id", "crawl_delay").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- 0L to 13L) {
      val k = id % 7
      assert(rows(id) == (if (k % 5 == 0) 2L else k + 1), s"id=$id")
    }
  }

  test("robotsGate seam matches Robots.evaluate over the synth corpus") {
    val sp = spark
    import sp.implicits._
    val docs = (0L to 40L).toDF("doc_id")
    val rows = WebCodec.robotsGate(docs).orderBy("media_id").collect()
    assert(rows.length == 41)
    for (r <- rows) {
      val id = r.getAs[Long]("media_id")
      val g = WebCodec.Robots.parse(WebCodec.buildRobots(id % 7)).get
      val (want, rule) =
        WebCodec.Robots.evaluate(g, WebCodec.crawlAgent, s"/docs/$id")
      assert(r.getAs[Boolean]("allowed") == want, s"id=$id")
      assert(r.getAs[String]("matched_rule") == rule, s"id=$id")
    }
    // the GraftBot-specific group actually fires (mixed-case group vs
    // "GraftBot/1.7 …" agent): id=9009 → k=0, starts with 9 → blocked
    val blocked = WebCodec.robotsGate(Seq(9009L).toDF("doc_id")).head()
    assert(!blocked.getAs[Boolean]("allowed")
      && blocked.getAs[String]("matched_rule") == "/docs/9")
    // the wildcard rules fire through the seam:
    // 17 → k=3, not ending 9 → the TIE, allow '/docs/'
    // 29 → k=1, not ending 7 → star disallow '/docs/'
    // 57 → k=1, ends in 7 → '/docs/*7$' (9 octets) beats '/docs/' (6)
    // 67 → k=4, ends in 7 → wildcard-only domain blocks
    // 69 → k=6, ends in 9 → '/docs/*9$' beats the Allow
    // 39 → k=4, ends in 9 → no matching rule → default-allow
    val w = WebCodec
      .robotsGate(Seq(17L, 29L, 57L, 67L, 69L, 39L).toDF("doc_id"))
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Boolean]("allowed"), r.getAs[String]("matched_rule"))))
      .toMap
    assert(w(17L) == ((true, "/docs/")))
    assert(w(29L) == ((false, "/docs/")))
    assert(w(57L) == ((false, "/docs/*7$")))
    assert(w(67L) == ((false, "/docs/*7$")))
    assert(w(69L) == ((false, "/docs/*9$")))
    assert(w(39L) == ((true, "")))
  }

  test("warcRecords/warcResponses DataFrame seams: per-record HTTP-level " +
      "rows with codepoint checksums; responses carry the decoded html") {
    val sp = spark
    import sp.implicits._
    // 0: plain/utf8/CL; 7: stored-gz/LATIN1/CL; 12: plain/latin1/CL;
    // add 9 (metadata axis, plain), 10/17 (metadata on BOTH gzip
    // variants — 3-member files, ADVICE r16), 13 (chunked + entity gzip)
    val sample = docsSample ++ Seq(
      (9L, "nine words here", "en", "src2"),
      (10L, "ten words here", "en", "src1"),
      (17L, "seventeen words here", "es", "src3"),
      (13L, "thirteen words here", "fr", "src0"))
    val docs = sample.toDF("doc_id", "text", "lang", "source")
    val recs = warcRecords(webWarc(docs)).orderBy("media_id", "rec_index")
      .collect()
    assert(recs.length == sample.map(d => recCount(d._1)).sum)
    for (r <- recs) {
      val id = r.getAs[Long]("media_id")
      val doc = sample.find(_._1 == id).get
      val members = if (id % 3 == 0) 0 else recCount(id)
      assert(r.getAs[Int]("gzip_members") == members, s"id=$id")
      // every record carries the doc's crawl instant (r18)
      assert(r.getAs[String]("warc_date") == warcDateOf(id), s"id=$id")
      r.getAs[String]("warc_type") match {
        case "request" =>
          assert(r.getAs[String]("http_method") == "GET")
          assert(r.getAs[Long]("body_chars") == 0L
            && r.getAs[Long]("body_ck") == 0L)
        case "response" if r.getAs[Int]("http_status") == 301 =>
          // the redirect fetch row (r17): alias target, Location
          // surfaced, stub body, charset sniffed
          assert(redirectAxis(id), s"id=$id")
          assert(r.getAs[String]("target_uri")
            == redirectAliasUrl(id, doc._3, doc._4))
          assert(r.getAs[String]("location")
            == redirectLocation(id, doc._3, doc._4))
          assert(r.getAs[String]("charset") == ""
            && r.getAs[String]("charset_src") == "sniff")
          assert(r.getAs[String]("content_encoding") == "identity")
          val stub = redirectBody(id)
          assert(r.getAs[Long]("body_bytes") == stub.length.toLong)
          assert(r.getAs[Long]("body_ck") == cpWeightedCk(stub))
        case "response" if Set(404, 410)(r.getAs[Int]("http_status")) =>
          // the dead fetch row (r18): the URL's ONLY capture
          assert(deadAxis(id), s"id=$id")
          assert(r.getAs[Int]("http_status") == errorStatus(id))
          assert(r.getAs[String]("target_uri")
            == buildUrl(id, doc._3, doc._4))
          val stub = errorBody(id)
          assert(r.getAs[Long]("body_bytes") == stub.length.toLong)
          assert(r.getAs[Long]("body_ck") == cpWeightedCk(stub))
          assert(r.getAs[String]("charset_src") == "sniff")
        case "response" if r.getAs[Int]("http_status") == 503 =>
          // the failed attempt before the successful retry (r18)
          assert(retryAxis(id), s"id=$id")
          assert(r.getAs[String]("target_uri")
            == buildUrl(id, doc._3, doc._4))
          assert(r.getAs[Long]("retry_after") == retryAfterOf(id))
          val stub = retryBody(id)
          assert(r.getAs[Long]("body_ck") == cpWeightedCk(stub))
        case "response" if mimeAxis(id) =>
          // the r18 MIME axis: text/plain, no meta fallback → the
          // header-omitting subset sniffs; body is the raw text
          assert(r.getAs[Int]("http_status") == 200)
          assert(r.getAs[String]("content_type") == "text/plain")
          assert(r.getAs[Long]("body_chars")
            == doc._2.codePointCount(0, doc._2.length).toLong)
          assert(r.getAs[Long]("body_ck") == cpWeightedCk(doc._2))
          val (wantCs, wantSrc) =
            if (bomAxis(id)) ("utf-8", "bom")
            else if (headerOmitsCharset(id)) ("", "sniff")
            else (charsetOf(id), "header")
          assert(r.getAs[String]("charset") == wantCs, s"id=$id")
          assert(r.getAs[String]("charset_src") == wantSrc, s"id=$id")
        case "response" =>
          val html = buildHtml(id, doc._2, doc._3, doc._4)
          assert(r.getAs[Int]("http_status") == 200)
          assert(r.getAs[String]("content_type") == "text/html")
          // resolution decision table (r17): bom → header → meta → sniff
          val (wantCs, wantSrc) =
            if (bomAxis(id)) ("utf-8", "bom")
            else if (metaOmitsCharset(id)) ("", "sniff")
            else if (headerOmitsCharset(id)) (charsetOf(id), "meta")
            else (charsetOf(id), "header")
          assert(r.getAs[String]("charset") == wantCs, s"id=$id")
          assert(r.getAs[String]("charset_src") == wantSrc, s"id=$id")
          assert(r.getAs[String]("content_encoding")
            == contentCoding(id))
          assert(r.getAs[String]("transfer")
            == (if (id % 4 == 1) "chunked" else "identity"))
          val wireBytes =
            if (charsetOf(id) == "utf-8") html.getBytes("UTF-8")
            else encodeCp1252(html)
          assert(r.getAs[Long]("body_bytes")
            == wireBytes.length.toLong + (if (bomAxis(id)) 3 else 0),
            s"id=$id")
          assert(r.getAs[Long]("body_chars")
            == html.codePointCount(0, html.length).toLong)
          assert(r.getAs[Long]("body_ck") == cpWeightedCk(html))
        case "metadata" =>
          val mt = metadataFields(id)
          assert(r.getAs[Long]("body_bytes") == mt.length.toLong)
          assert(r.getAs[Long]("body_ck") == cpWeightedCk(mt))
        case other => fail(s"unexpected type $other")
      }
    }
    val resp = warcResponses(webWarc(docs))
      .orderBy("media_id", "http_status").collect()
    assert(resp.length == sample.map(d => 1 + extraRecs(d._1) / 2).sum)
    // quoted charset parameter (ADVICE r16): legal HTTP, unwrapped
    val quoted = parseHttpResponse(
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=\"utf-8\"\r\n" +
        "Content-Length: 2\r\n\r\nhi").getBytes("ISO-8859-1")).get
    assert(quoted.charset == "utf-8" && quoted.charsetSrc == "header")
    val squoted = parseHttpResponse(
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset='utf-8'\r\n" +
        "Content-Length: 2\r\n\r\nhi").getBytes("ISO-8859-1")).get
    assert(squoted.charset == "utf-8")
    for (r <- resp) {
      val id = r.getAs[Long]("media_id")
      val doc = sample.find(_._1 == id).get
      r.getAs[Int]("http_status") match {
        case 301 => assert(r.getAs[String]("body") == redirectBody(id))
        case 404 | 410 =>
          assert(r.getAs[String]("body") == errorBody(id))
        case 503 => assert(r.getAs[String]("body") == retryBody(id))
        case st =>
          assert(st == 200)
          assert(r.getAs[String]("body") ==
            (if (mimeAxis(id)) doc._2
             else buildHtml(id, doc._2, doc._3, doc._4)))
      }
    }
  }

  test("httpFraming seam: raw payload codepoint checksum over the text " +
      "subset matches a by-hand decode, and gzip-entity rows are excluded") {
    val sp = spark
    import sp.implicits._
    val sample = (0L to 14L).map(i => (i, s"some words $i", "en", "src1"))
    val docs = sample.toDF("doc_id", "text", "lang", "source")
    val rows = httpFraming(webWarc(docs)).orderBy("media_id").collect()
    // ids with id%5 in {3,4} are content-encoded → excluded; dead ids
    // (r18, id%9==7) have no 200 capture at all
    assert(rows.map(_.getAs[Long]("media_id")).toSeq
      == (0L to 14L).filterNot(id => contentCoded(id) || deadAxis(id)))
    for (r <- rows) {
      val id = r.getAs[Long]("media_id")
      val payload = parseWarc(
        buildWarcFile(id, s"some words $id", "en", "src1")).get
        .find(_.warcType == "response").get.payload
      val text = decodeText(payload, "")
      assert(r.getAs[Long]("payload_chars")
        == text.codePointCount(0, text.length).toLong)
      assert(r.getAs[Long]("payload_ck") == cpWeightedCk(text))
      // MIME-axis docs (ids 3, 12) serve the raw text as text/plain
      val content =
        if (mimeAxis(id)) s"some words $id"
        else buildHtml(id, s"some words $id", "en", "src1")
      val wire =
        if (charsetOf(id) == "utf-8") content.getBytes("UTF-8")
        else encodeCp1252(content)
      assert(r.getAs[Long]("content_length_hdr")
        == (if (id % 4 == 1) -1L
            else wire.length.toLong + (if (bomAxis(id)) 3 else 0)))
    }
  }

  test("character references: JVM and Column decoders agree on decimal/" +
      "hex/supplementary/invalid numeric refs, named refs, unknown " +
      "names, and the single-pass no-double-decode behavior") {
    val sp = spark
    import sp.implicits._
    val cases = Seq(
      "plain text, no refs",
      "it&#39;s here",
      "caf&#233; and &#x4E2D;&#x6587;",
      "emoji &#128512; end",
      "back-to-back &#65;&#66;&#67;",
      "id=&#39;7&#39;", // digit literal BETWEEN two refs (the seg trap)
      "invalid &#0; &#xD800; &#1114112; kept",
      "&#233;", // ref at string start
      "tail &#233;", // ref at string end
      "&amp;#39; stays literal",
      // named refs (r17): known, mixed with numeric, unknown-literal
      "caf&eacute; &mdash; &hellip; &copy;2026",
      "AT&amp;T &lt;ok&gt; &quot;q&quot; &apos;a&apos;",
      "&euro;9 se&ntilde;or Gr&uuml;&szlig;e",
      "unknown &zzzqq; stays &verybiglongentityname; too",
      "&amp;eacute; stays literal",
      "&laquo;&nbsp;&raquo; and &#x4E2D;&eacute;&#233;")
    val out = cases.toDF("s")
      .select(decodeEntitiesCol(org.apache.spark.sql.functions.col("s")))
      .collect().map(_.getString(0))
    for ((c, got) <- cases.zip(out))
      assert(got == decodeEntities(c), s"case: $c")
    assert(decodeEntities("it&#39;s") == "it's")
    assert(decodeEntities("caf&#233;") == "café")
    assert(decodeEntities("&#x4E2D;") == "中")
    assert(decodeEntities("&#128512;") == "😀")
    assert(decodeEntities("id=&#39;7&#39;") == "id='7'")
    assert(decodeEntities("&#0;x&#xD800;y&#1114112;")
      == "�x�y�")
    // named refs decode via the shared table; unknown names stay literal
    assert(decodeEntities("caf&eacute; &mdash; ok") == "café — ok")
    assert(decodeEntities("&euro;&copy;&hellip;") == "€©…")
    assert(decodeEntities("&zzzqq; stays") == "&zzzqq; stays")
    // single left-to-right pass, no re-scan of decoded output:
    // &amp;#233; → '&' + literal '#233;'; &amp;eacute; → '&eacute;'
    assert(decodeEntities("&amp;#233; vs &#233;") == "&#233; vs é")
    assert(decodeEntities("&amp;eacute;") == "&eacute;")
    // full extraction chain rides the same pass
    assert(extractText("<p>&amp;#233; vs &#233;</p>") == "&#233; vs é")
    assert(extractText("<p>caf&eacute; &ndash; &trade;</p>") == "café – ™")
  }

  test("sitemap discovery: index → gzipped urlsets → frontier rows, " +
      "one per doc, robots-gated; both inflate paths exercised") {
    val sp = spark
    import sp.implicits._
    val docs = (0L to 30L).map(i => (i, s"t$i", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
    val table = WebCodec.sitemapTable(docs).collect()
    // 7 domains × (1 index + up to 2 urlset parts)
    assert(table.count(_.getAs[String]("kind") == "index") == 7)
    val gz = table.filter(_.getAs[String]("kind").startsWith("urlset-"))
    assert(gz.forall { r =>
      val p = r.getAs[Array[Byte]]("payload")
      (p(0) & 0xff) == 0x1f && (p(1) & 0xff) == 0x8b
    })
    val rows = WebCodec.crawlFrontier(docs).orderBy("media_id").collect()
    assert(rows.length == 31) // one frontier row per doc
    for (r <- rows) {
      val id = r.getAs[Long]("media_id")
      val k = id % 7
      assert(r.getAs[String]("url")
        == s"https://www.example$k.com/docs/$id")
      // discovery provenance (r17): the robots-declared index URL
      assert(r.getAs[String]("robots_sitemap")
        == s"https://www.example$k.com/sitemap-index.xml")
      assert(r.getAs[String]("sitemap_url")
        == s"https://www.example$k.com/sitemap-${(id / 7) % 2}.xml.gz")
      val g = WebCodec.Robots.parse(WebCodec.buildRobots(k)).get
      val (want, rule) =
        WebCodec.Robots.evaluate(g, WebCodec.crawlAgent, s"/docs/$id")
      assert(r.getAs[Boolean]("allowed") == want, s"id=$id")
      assert(r.getAs[String]("matched_rule") == rule, s"id=$id")
    }
  }

  test("recrawl: revisit records carry referral + digest and no body; " +
      "responses parse; a digest over DIFFERENT content would not verify") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((2L, "even doc text", "en", "src0"),
      (3L, "odd doc text", "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = WebCodec.recrawlRecords(WebCodec.webWarcRecrawl(docs))
      .orderBy("media_id").collect()
    assert(rows.length == 2)
    val rev = rows(0)
    assert(rev.getAs[String]("fetched") == "revisit")
    assert(rev.getAs[String]("refers_to")
      == WebCodec.buildUrl(2L, "en", "src0"))
    val html2 = WebCodec.buildHtml(2L, "even doc text", "en", "src0")
    assert(rev.getAs[String]("digest")
      == s"graft:ck:${WebCodec.cpWeightedCk(html2)}")
    assert(rev.getAs[Long]("n_chars") == 0L)
    val live = rows(1)
    assert(live.getAs[String]("fetched") == "response")
    // id 3 is on the r18 MIME axis: its re-fetch serves the raw text
    val content3 = "odd doc text"
    assert(live.getAs[Long]("body_ck") == WebCodec.cpWeightedCk(content3))
    // digest discrimination: different content → different ck
    assert(WebCodec.cpWeightedCk(html2) != WebCodec.cpWeightedCk(content3))
  }

  test("i18n corpus axis: extracted text decodes the phrase refs " +
      "(numeric AND named); the corpus never contains the sentinel " +
      "control chars") {
    // phrase 0 (id 6: 6%5=1, 6%6=0) — &eacute; named + literal — ‘ ’
    assert(extractedText(6L, "t", "en", "s")
      .contains("naïve façade Café ±5° — ‘ok’"))
    // phrase 1 (id 25: 25%5=0, 25%6=1) — named refs + literal “ ” €
    assert(extractedText(25L, "t", "en", "s")
      .contains("Grüße señor «café» “deal” €9 …©2026"))
    // phrase 2 via hex refs + &mdash;/&euro;/&trade; (id 20)
    assert(extractedText(20L, "t", "en", "s")
      .contains("中文 測試 — тест €™"))
    // phrase 3 with the supplementary-plane emoji (id 21: 21%5=1,
    // 21%6=3); &nbsp; normalizes to a plain space between « »
    assert(extractedText(21L, "t", "en", "s")
      .contains("😀 emoji αβγ ∑√∞ « »"))
    // phrase 4 (r18 ja: id 28, 28%5=3, 28%6=4) — kana + kanji + &mdash;
    assert(extractedText(28L, "t", "en", "s")
      .contains("日本語のテスト — 完了です"))
    // phrase 5 (r18 ko: id 11, 11%5=1, 11%6=5) — Hangul + &copy;
    assert(extractedText(11L, "t", "en", "s")
      .contains("한국어 테스트 문서 © 준비 완료"))
    // cp1252-wire docs never get a non-cp1252-representable RAW phrase
    // (named refs are ASCII until extraction decodes them; the literal
    // curly-quote/dash/€ chars are exactly the 0x80–0x9F wire axis)
    for (id <- 0L to 100L if id % 5 == 2) {
      val html = buildHtml(id, "t", "en", "s")
      assert(cp1252Encodable(html), s"id=$id not cp1252-representable")
    }
    // sentinel safety for the Column decoder
    for (id <- 0L to 100L) {
      val html = buildHtml(id, "text", "en", "src0")
      assert(!html.exists(c => c == '\u0001' || c == '\u0002'))
    }
  }
}
