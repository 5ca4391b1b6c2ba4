package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Archive container tier: ustar block walk and zip central-directory
  * walk — round-trips, the full house strictness matrix, mutation fuzz,
  * and the DataFrame seams' formula agreement. */
class ArchiveCodecSpec extends SparkSuite {
  import ArchiveCodec._

  private def bytes(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  private val sample = Seq(
    Entry("docs/1.txt", bytes("hello archive world")),
    Entry("meta/1.json", bytes("""{"doc_id":1,"lang":"en","source":"src0"}""")),
    Entry("big.bin", Array.tabulate(1500)(i => (i * 7 % 251).toByte)),
    Entry("empty.txt", Array.emptyByteArray))

  // -------------------------------------------------------------- tar

  test("tar: build→parse round-trips names, sizes, bytes, order") {
    val got = tarParse(tarBuild(sample)).get
    assert(got.map(_.name) == sample.map(_.name).toVector)
    assert(got.map(_.data.toSeq) == sample.map(_.data.toSeq).toVector)
    // single empty-entry archive too
    val one = tarParse(tarBuild(Seq(Entry("a", Array.emptyByteArray)))).get
    assert(one.map(_.name) == Vector("a"))
    assert(one.head.data.isEmpty)
  }

  test("tar strictness: checksum, magic, octal garbage, truncation, " +
      "short terminator, trailing garbage, smuggled pad byte all poison") {
    val ok = tarBuild(sample)
    def mut(i: Int, v: Int): Array[Byte] = {
      val c = ok.clone(); c(i) = v.toByte; c
    }
    assert(tarParse(mut(0, 'X')).isEmpty) // name change breaks checksum
    assert(tarParse(mut(257, 'v')).isEmpty) // magic
    assert(tarParse(mut(124, 'Z')).isEmpty) // octal garbage in size
    assert(tarParse(ok.dropRight(1)).isEmpty) // truncated terminator
    assert(tarParse(ok.dropRight(512)).isEmpty) // only ONE zero block
    assert(tarParse(ok ++ Array[Byte](1)).isEmpty) // trailing garbage
    // smuggle a byte into the data padding of the first entry
    val dataStart = 512
    val padAt = dataStart + sample.head.data.length // inside the pad
    assert(tarParse(mut(padAt, 7)).isEmpty)
    assert(tarParse(Array.emptyByteArray).isEmpty)
    assert(tarParse(new Array[Byte](1024)).nonEmpty) // empty archive OK
    assert(tarParse(new Array[Byte](512)).isEmpty) // half a terminator
  }

  // -------------------------------------------------------------- zip

  test("zip: build→parse round-trips across STORED and DEFLATE, " +
      "any method assignment") {
    for (pick <- Seq[Int => Boolean](_ => false, _ => true, _ % 2 == 0)) {
      val got = zipParse(zipBuild(sample, pick)).get
      assert(got.map(_.name) == sample.map(_.name).toVector)
      assert(got.map(_.data.toSeq) == sample.map(_.data.toSeq).toVector)
    }
    assert(zipParse(zipBuild(Nil, _ => false)).get.isEmpty)
  }

  test("zip strictness: EOCD magic, count mismatch, CRC, size lies, " +
      "central/local disagreement, truncation, trailing bytes all poison") {
    val ok = zipBuild(sample, _ % 2 == 1)
    def mut(i: Int, f: Byte => Byte): Array[Byte] = {
      val c = ok.clone(); c(i) = f(c(i)); c
    }
    val ep = ok.length - 22
    assert(zipParse(mut(ep, b => (b ^ 1).toByte)).isEmpty) // EOCD magic
    assert(zipParse(mut(ep + 10, b => (b ^ 1).toByte)).isEmpty) // count
    assert(zipParse(ok.dropRight(1)).isEmpty) // truncated EOCD
    assert(zipParse(ok ++ Array[Byte](0)).isEmpty) // trailing byte
    // flip one payload byte of the first (STORED) entry: CRC catches it
    val firstData = 30 + "docs/1.txt".length
    assert(zipParse(mut(firstData, b => (b ^ 1).toByte)).isEmpty)
    // lie about the uncompressed size in the LOCAL header only:
    // central/local agreement check fires before any inflate
    assert(zipParse(mut(22, b => (b ^ 1).toByte)).isEmpty)
    assert(zipParse(Array.emptyByteArray).isEmpty)
  }

  test("mutation fuzz: random flips anywhere never throw; a surviving " +
      "parse preserves the entry count") {
    val rnd = new scala.util.Random(15082026)
    val tarOk = tarBuild(sample)
    val zipOk = zipBuild(sample, _ % 2 == 0)
    for (_ <- 0 until 150) {
      val t = tarOk.clone()
      val z = zipOk.clone()
      val ti = rnd.nextInt(t.length)
      val zi = rnd.nextInt(z.length)
      t(ti) = (t(ti) ^ (1 << rnd.nextInt(8))).toByte
      z(zi) = (z(zi) ^ (1 << rnd.nextInt(8))).toByte
      tarParse(t).foreach(es => assert(es.length == sample.length))
      zipParse(z).foreach(es => assert(es.length == sample.length))
    }
  }

  // ------------------------------------------------- DataFrame seams

  test("docTars/docZips → tarEntries/zipEntries agree with each other " +
      "and with the synthesis formulas") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma", "en", "src0"),
      (1L, "delta epsilon", "fr", "src1"),
      (2L, "zeta", "de", "src2"))
      .toDF("doc_id", "text", "lang", "source")
    val t = tarEntries(docTars(docs)).orderBy("media_id", "entry_index")
      .collect()
    val z = zipEntries(docZips(docs)).orderBy("media_id", "entry_index")
      .collect()
    assert(t.map(_.toSeq).toSeq == z.map(_.toSeq).toSeq,
      "two byte paths, one output")
    assert(t.length == 6)
    for (r <- t) {
      val id = r.getAs[Long]("media_id")
      val (name, data) =
        if (r.getAs[Int]("entry_index") == 0)
          (s"docs/$id.txt",
            docs.where(col("doc_id") === id).head().getAs[String]("text"))
        else (s"meta/$id.json", metaJson(id,
          docs.where(col("doc_id") === id).head().getAs[String]("lang"),
          docs.where(col("doc_id") === id).head().getAs[String]("source")))
      assert(r.getAs[String]("name") == name)
      assert(r.getAs[Long]("n_bytes") == data.length.toLong)
      assert(r.getAs[Long]("data_ck")
        == WebCodec.weightedCk(data.getBytes("ISO-8859-1")))
    }
    val texts = zipTexts(docZips(docs)).orderBy("media_id").collect()
    assert(texts.map(_.getAs[String]("text")).toSeq
      == Seq("alpha beta gamma", "delta epsilon", "zeta"))
  }
}
