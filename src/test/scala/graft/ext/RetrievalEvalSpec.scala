package graft.ext

import graft.SparkSuite

/** Retrieval-eval contracts: hand-checkable metrics on a tiny corpus,
  * range sanity on the fixture. */
class RetrievalEvalSpec extends SparkSuite {

  import spark.implicits._

  test("recall/MRR/NDCG match hand computation on a crafted corpus") {
    // query 0 (label 1): retrieved order is 10 (rel), 11 (not), 12 (rel)
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 1),
      (10L, Array(1f, 0.05f, 0f, 0f), 1),
      (11L, Array(1f, 0.4f, 0f, 0f), 2),
      (12L, Array(1f, 1f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val row = RetrievalEval.denseEval(vecs, numQueries = 1, k = 3)
      .collect().head
    assert(row.getAs[Long]("n_rel") === 2L)
    assert(row.getAs[Long]("hits") === 2L)
    assert(row.getAs[Double]("recall_r") === 1.0) // 2 / min(3, 2)
    assert(row.getAs[Double]("mrr_r") === 1.0)    // first relevant at rank 1
    // dcg = 1/log2(2) + 1/log2(4) = 1.5; idcg(m=2) = 1 + 1/log2(3)
    val expected = BigDecimal(1.5 / (1.0 + 1.0 / (math.log(3) / math.log(2))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("ndcg_r") - expected) < 2e-6)
  }

  test("fixture metrics are well-formed for dense and PQ retrievers") {
    val fx = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val dense = RetrievalEval.denseEval(fx, numQueries = 10, k = 10).collect()
    val pq = RetrievalEval.pqEval(fx, numQueries = 10, k = 10).collect()
    assert(dense.length === 10 && pq.length === 10)
    (dense ++ pq).foreach { r =>
      Seq("recall_r", "mrr_r", "ndcg_r").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c = $v out of range")
      }
      assert(r.getAs[Long]("hits") <= math.min(10L, r.getAs[Long]("n_rel")))
    }
  }
}
