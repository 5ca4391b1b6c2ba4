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

  test("warc: all three compression variants demux to the same two " +
      "records (request then response) with byte-identical payloads") {
    val ref = (0L to 2L).map { v =>
      // ids 0,1,2 hit variants plain/stored/deflate respectively
      val bytes = buildWarcFile(v, "sample text words", "en", "src0")
      val recs = parseWarc(bytes).get
      assert(recs.map(_.warcType) == Vector("request", "response"))
      assert(recs.forall(_.targetUri == buildUrl(v, "en", "src0")))
      recs.map(r => weightedCk(r.payload))
    }
    // payload content is id-dependent, so compare against the formulas
    for (v <- 0L to 2L) {
      val req = buildRequest(v, "en", "src0").getBytes("ISO-8859-1")
      val rsp = buildResponse(v, "sample text words", "en", "src0")
        .getBytes("ISO-8859-1")
      assert(ref(v.toInt) == Vector(weightedCk(req), weightedCk(rsp)))
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
    // id 4 → Content-Length framing (4 % 4 == 0)
    val rsp = buildResponse(4L, "alpha beta", "fr", "src2")
    val (status, body) = parseHttpResponse(rsp.getBytes("ISO-8859-1")).get
    assert(status == 200)
    assert(new String(body, "ISO-8859-1")
      == buildHtml(4L, "alpha beta", "fr", "src2"))
    assert(parseHttpResponse((rsp + "x").getBytes("ISO-8859-1")).isEmpty)
    assert(parseHttpResponse(rsp.getBytes("ISO-8859-1").dropRight(1))
      .isEmpty)
    assert(parseHttpResponse(rsp.replaceFirst("HTTP/1.1 200", "ICY 200")
      .getBytes("ISO-8859-1")).isEmpty)
  }

  test("http chunked transfer-encoding: de-chunks to the exact html " +
      "(multi-chunk), and every framing violation poisons") {
    // id 5 → chunked (5 % 4 == 1); long text forces several 256B chunks
    val text = Array.fill(30)("lorem ipsum dolor sit amet").mkString(" ")
    val rsp = buildResponse(5L, text, "fr", "src2")
    assert(rsp.contains("Transfer-Encoding: chunked")
      && !rsp.contains("Content-Length"))
    val (status, body) = parseHttpResponse(rsp.getBytes("ISO-8859-1")).get
    assert(status == 200)
    val html = buildHtml(5L, text, "fr", "src2")
    assert(html.length > 512, "must span 3+ chunks")
    assert(new String(body, "ISO-8859-1") == html)
    def poison(s: String): Unit =
      assert(parseHttpResponse(s.getBytes("ISO-8859-1")).isEmpty, s.take(60))
    poison(rsp + "x") // bytes after the 0-chunk terminator
    poison(rsp.replaceFirst("100\r\n", "10g\r\n")) // non-hex size line
    poison(rsp.replaceFirst("100\r\n", "ff\r\n")) // size lies → CRLF miss
    poison(rsp.dropRight(2)) // lost final CRLF
    poison(rsp.replaceFirst("Transfer-Encoding: chunked",
      "Transfer-Encoding: gzip")) // unknown coding
    poison(rsp.replaceFirst("Transfer-Encoding: chunked",
      "Transfer-Encoding: chunked\r\nContent-Length: 3")) // both framings
    // round-trip through the FULL stack: chunked response inside a
    // gzip-deflate WARC member (id 5: gzip variant 2, chunked variant 1)
    val recs = parseWarc(buildWarcFile(5L, text, "fr", "src2")).get
    val (_, b2) = parseHttpResponse(recs(1).payload).get
    assert(new String(b2, "ISO-8859-1") == html)
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
          // a surviving parse must still be two well-framed records
          assert(recs.length == 2)
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
    // WET parse: one conversion record per doc, text byte-faithful
    val rows = wetTexts(webWet(df)).orderBy("media_id").collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val doc = docsSample.find(_._1 == r.getAs[Long]("media_id")).get
      assert(r.getAs[String]("text")
        == extractedText(doc._1, doc._2, doc._3, doc._4))
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

  test("robotsGate seam matches Robots.evaluate over the synth corpus") {
    val sp = spark
    import sp.implicits._
    val docs = (0L to 40L).toDF("doc_id")
    val rows = WebCodec.robotsGate(docs).orderBy("media_id").collect()
    assert(rows.length == 41)
    for (r <- rows) {
      val id = r.getAs[Long]("media_id")
      val g = WebCodec.Robots.parse(WebCodec.buildRobots(id % 7)).get
      val (want, rule) = WebCodec.Robots.evaluate(g, "graftbot", s"/docs/$id")
      assert(r.getAs[Boolean]("allowed") == want, s"id=$id")
      assert(r.getAs[String]("matched_rule") == rule, s"id=$id")
    }
    // the graftbot-specific group actually fires: id=9, k=2? no —
    // 9 % 7 = 2 (star group); id=35 → k=0 (graftbot) and "35" doesn't
    // start with 9 → allowed; id=9009 → k=0, starts with 9 → blocked
    val blocked = WebCodec.robotsGate(Seq(9009L).toDF("doc_id")).head()
    assert(!blocked.getAs[Boolean]("allowed")
      && blocked.getAs[String]("matched_rule") == "/docs/9")
  }

  test("warcRecords/warcResponses DataFrame seams: per-record rows with " +
      "the formula checksums; responses carry the parsed html") {
    val sp = spark
    import sp.implicits._
    val docs = docsSample.toDF("doc_id", "text", "lang", "source")
    val recs = warcRecords(webWarc(docs)).orderBy("media_id", "rec_index")
      .collect()
    assert(recs.length == 6)
    for (r <- recs) {
      val id = r.getAs[Long]("media_id")
      val doc = docsSample.find(_._1 == id).get
      val payload = (if (r.getAs[Int]("rec_index") == 0)
        buildRequest(id, doc._3, doc._4)
      else buildResponse(id, doc._2, doc._3, doc._4))
        .getBytes("ISO-8859-1")
      assert(r.getAs[Long]("content_length") == payload.length.toLong)
      assert(r.getAs[Long]("payload_ck") == weightedCk(payload))
      assert(r.getAs[Int]("gzip_members") == (if (id % 3 == 0) 0 else 2))
    }
    val resp = warcResponses(webWarc(docs)).orderBy("media_id").collect()
    assert(resp.length == 3)
    for (r <- resp) {
      val id = r.getAs[Long]("media_id")
      val doc = docsSample.find(_._1 == id).get
      assert(r.getAs[Int]("http_status") == 200)
      assert(r.getAs[String]("body")
        == buildHtml(id, doc._2, doc._3, doc._4))
    }
  }
}
