package graft.ext

import graft.SparkSuite

/** Contrastive-mining contracts: positives are the true rank-1 IVF
  * neighbor, negatives sit strictly under the dup ceiling with
  * non-negative margins, and the label audit stays in range. */
class ContrastiveSpec extends SparkSuite {

  private lazy val fx =
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("positives outrank every mined negative (non-negative margins)") {
    val rows = Contrastive.pairs(fx, numQueries = 10, kNeg = 3).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("margin_r") >= 0.0,
        s"negative outscored the positive for anchor ${r.getAs[Long]("q_id")}")
      assert(r.getAs[Double]("neg_sim_r") < 0.95, "dup ceiling violated")
      assert(r.getAs[Long]("neg_id") !== r.getAs[Long]("pos_id"),
        "positive mined as its own negative")
    }
    val perAnchor = rows.groupBy(_.getAs[Long]("q_id"))
    perAnchor.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("neg_rnk")).sorted.sameElements(1 to rs.length),
        s"negative ranks not dense for anchor $q")
    }
  }

  test("positive is the rank-1 IVF neighbor") {
    val top1 = Similarity.ivfTopK(fx, numQueries = 10, k = 1)
      .collect().map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("neighbor_id")).toMap
    Contrastive.pairs(fx, numQueries = 10, kNeg = 3).collect().foreach { r =>
      assert(top1(r.getAs[Long]("q_id")) === r.getAs[Long]("pos_id"))
    }
  }

  test("label audit shares are well-formed") {
    val rows = Contrastive.labelAudit(fx, numQueries = 10, kNeg = 3).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("false_neg_share_r")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Long]("n_false_negs") <= r.getAs[Long]("n_negs"))
      assert(Set(0, 1).contains(r.getAs[Int]("pos_label_match")))
    }
  }
}
