package graft.expr

import graft.SparkSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Native codegen expressions: numeric correctness, and SQL registration
  * via SparkSessionExtensions. */
class VectorExprsSpec extends SparkSuite {

  import spark.implicits._

  test("DotProduct and CosineSim match hand computation") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .select(
        VectorExprs.dot(col("a"), col("b")).as("dot"),
        VectorExprs.cosineSim(col("a"), col("b")).as("cos"))
    val r = df.collect().head
    assert(r.getAs[Double]("dot") === 32.0)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(r.getAs[Double]("cos") - expected) < 1e-15)
  }

  test("expressions survive both codegen and interpreted paths") {
    val df = (1 to 100).map(i => (Array.fill(64)(i * 0.5), Array.fill(64)(2.0)))
      .toDF("a", "b")
    // many distinct rows → exercises the generated loop
    val sums = df.select(VectorExprs.dot(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0))
    // dot = 64 elements × (i·0.5 × 2.0) = 64·i
    assert(sums.zipWithIndex.forall { case (d, i) => d == 64.0 * (i + 1) })
  }

  test("MinHashSignature: identical sets agree, disjoint sets do not") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "d")),
      (3L, Seq("w", "x", "y", "z")))
      .toDF("id", "sh")
      .select(col("id"),
        MinHashSignature(transform(col("sh"), t => xxhash64(t)), 96).as("sig"))
    val sigs = df.collect().map(r => r.getAs[Long]("id") -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
    assert(sigs(1L).length === 96)
  }

  test("cosine_sim / dot_product register as SQL functions via extensions") {
    spark // force the shared session first so the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT cosine_sim(array(1d, 0d), array(1d, 0d)) AS c,
                  dot_product(array(1d, 2d), array(3d, 4d)) AS d""").collect().head
      assert(r.getAs[Double]("c") === 1.0)
      assert(r.getAs[Double]("d") === 11.0)
      val t = s2.sql(
        """SELECT min_md5(array('b', 'a')) AS m,
                  min_shingle_md5(array('a', 'b', 'c'), 3) AS ms,
                  size(minhash_signature(array(1L, 2L), 96)) AS nh,
                  size(simhash_bits(array(1L, 2L))) AS nb""").collect().head
      assert(t.getAs[String]("m") ===
        org.apache.commons.codec.digest.DigestUtils.md5Hex("a"))
      assert(t.getAs[String]("ms") ===
        org.apache.commons.codec.digest.DigestUtils.md5Hex("a b c"))
      assert(t.getAs[Int]("nh") === 96)
      assert(t.getAs[Int]("nb") === 64)
      val u = s2.sql(
        """SELECT sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS ic,
                  simhash64(array(1L)) AS sh,
                  deflate_len('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa') AS dl,
                  nfc_normalize('café') AS nfc""").collect().head
      assert(u.getAs[Int]("ic") === 2)
      assert(u.getAs[Long]("sh") === 1L) // one hash votes its own bits
      assert(u.getAs[Int]("dl") > 0 && u.getAs[Int]("dl") < 32,
        "run of 'a' must compress below raw length")
      assert(u.getAs[String]("nfc") === "café")
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
