package graft.ext

import graft.SparkSuite

/** PCA contracts: dominant-axis recovery on crafted data, orthonormal
  * components and variance accounting on the fixture. */
class PcaSpec extends SparkSuite {

  import spark.implicits._

  test("component 1 recovers a planted dominant axis") {
    // variance overwhelmingly along dim 3 (index 3 of 64)
    val vecs = (0 until 40).map { k =>
      val arr = Array.fill(64)(0f)
      arr(3) = if (k % 2 == 0) 10f + k else -10f - k
      arr(7) = (k % 3).toFloat * 0.1f
      (k.toLong, arr)
    }.toDF("vec_id", "embedding")
    val m = Pca.fit(vecs, p = 1)
    val v = m.comps(0)
    assert(math.abs(v(3)) > 0.99, s"dominant axis weight ${v(3)}")
    assert(v.zipWithIndex.filter(_._2 != 3).forall(w => math.abs(w._1) < 0.1))
  }

  test("fixture components are orthonormal with ordered positive eigenvalues") {
    val fx = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val m = Pca.fit(fx, p = 2)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    // the 1e-12 decimal grid contributes ~64·5e-13 per norm sum
    assert(math.abs(dot(m.comps(0), m.comps(0)) - 1.0) < 1e-7)
    assert(math.abs(dot(m.comps(1), m.comps(1)) - 1.0) < 1e-7)
    assert(math.abs(dot(m.comps(0), m.comps(1))) < 1e-6,
      "deflated component must be orthogonal to the first")
    assert(m.eigvals(0) >= m.eigvals(1) && m.eigvals(1) > 0)
    assert(m.eigvals(0) / m.totalVar <= 1.0)
  }

  test("projection variance matches the eigenvalue") {
    val fx = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val m = Pca.fit(fx, p = 1)
    val pcs = Pca.project(fx, p = 1).collect().map(_.getAs[Double]("pc0_r"))
    val n = pcs.length
    val mean = pcs.sum / n
    val variance = pcs.map(x => (x - mean) * (x - mean)).sum / n
    // projected variance onto the top eigenvector ≈ its eigenvalue
    assert(math.abs(variance - m.eigvals(0)) / m.eigvals(0) < 0.01,
      s"var $variance vs eigval ${m.eigvals(0)}")
  }
}
