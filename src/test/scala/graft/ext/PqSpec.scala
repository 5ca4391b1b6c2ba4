package graft.ext

import graft.SparkSuite

/** Product-quantization contracts: code validity, the recall ladder vs
  * exact float search, and refine dominance. */
class PqSpec extends SparkSuite {

  private lazy val fx =
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("codes assign every (vector, subspace) to a real codeword") {
    val cds = Pq.codes(fx).collect()
    val n = fx.count()
    assert(cds.length === n * Pq.pqM, "m codes per vector, no drops")
    val cwIds = Pq.codebook(fx).select("cw_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cds.forall(r => cwIds.contains(r.getAs[Long]("code"))),
      "every assigned code is an existing codeword id")
  }

  test("ADC recall@10 clears a floor and refine strictly dominates") {
    val raw = Pq.adcRecall(fx, numQueries = 10, k = 10)
      .collect().map(r => r.getAs[Double]("recall_r"))
    val meanRaw = raw.sum / raw.length
    info(s"PQ ADC mean recall@10 = $meanRaw")
    assert(meanRaw >= 0.5, s"ADC recall $meanRaw below floor")

    // refine re-ranks a 4k shortlist with exact float cosine: its hit set
    // vs the exact top-10 must be ≥ the raw ADC hit set per query
    val exact = Similarity.cosineTopK(fx, numQueries = 10, k = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val adc = Pq.adcTopK(fx, numQueries = 10, k = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ref = Pq.adcRefineTopK(fx, numQueries = 10, k = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val adcHits = adc.count(exact.contains)
    val refHits = ref.count(exact.contains)
    info(s"hits vs exact: adc=$adcHits refined=$refHits of ${exact.size}")
    assert(refHits >= adcHits, "refine must not lose recall vs raw ADC")
  }

  test("IVFADC candidates are cell-pruned yet recall survives the stack") {
    // the IVFADC result must be a subset of the IVF candidate universe
    // (cell pruning really prunes) and still overlap the exact top-10
    val ivfpq = Pq.ivfAdcTopK(fx, numQueries = 10, k = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
    assert(ivfpq.nonEmpty)
    val q8 = Similarity.quantize(fx)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("qv").as("embedding"))
    val cellCands = Similarity.ivfTopK(q8, numQueries = 10, k = Int.MaxValue)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(ivfpq.forall(cellCands.contains),
      "IVFADC returned a vector outside the probed cells")
    val exact = Similarity.cosineTopK(fx, numQueries = 10, k = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = ivfpq.count(exact.contains).toDouble / exact.size
    info(s"IVFADC recall@10 = $recall")
    assert(recall >= 0.4, s"IVFADC recall $recall below floor")
  }

  test("code stats cover all subspaces with sane utilization") {
    val rows = Pq.codeStats(fx).collect()
    assert(rows.map(_.getAs[Int]("j")).sorted.sameElements(0 until Pq.pqM))
    val n = fx.count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") === n, "every vector must carry a code")
      assert(r.getAs[Long]("n_codes_used") > 1, "degenerate subspace codebook")
      val share = r.getAs[Double]("max_share_r")
      assert(share > 0.0 && share <= 1.0)
    }
  }

  test("codeNearDup finds a planted near-duplicate with precision 1.0") {
    import spark.implicits._
    // vec 59 is vec 58 with one dimension nudged — a true near-dup whose
    // subspace codes mostly agree; all other vectors are far apart
    def shape(k: Int): Array[Float] =
      Array.tabulate(64)(i => math.sin(0.1 * (k + 1) * (i + 1)).toFloat)
    val vecs = (0 until 60).map { k =>
      val arr =
        if (k == 59) shape(58).updated(0, shape(58)(0) + 0.001f)
        else shape(k)
      (k.toLong, arr)
    }.toDF("vec_id", "embedding")
    val pairs = Pq.codeNearDup(vecs, minShared = 4, threshold = 0.9)
      .collect()
    assert(pairs.exists(r =>
      r.getAs[Long]("id_a") === 58L && r.getAs[Long]("id_b") === 59L),
      "the planted near-dup pair must surface")
    pairs.foreach(r => assert(r.getAs[Double]("sim_r") >= 0.9,
      "every reported pair is exact-verified (precision 1.0)"))
  }

  test("codeNearDup never pairs ragged vectors on the -1 sentinel") {
    import spark.implicits._
    // two corrupt (short) vectors encode to the fail-closed -1 sentinel
    // in every subspace; before the sentinel filter they collided on all
    // 8 (j, -1) keys and surfaced as a bogus n_shared=8 candidate whose
    // verify cosine then ran over mismatched-length arrays (ADVICE r9)
    def shape(k: Int): Array[Float] =
      Array.tabulate(64)(i => math.sin(0.1 * (k + 1) * (i + 1)).toFloat)
    val vecs = (0 until 40).map { k =>
      val arr =
        if (k >= 38) Array.tabulate(17)(i => shape(k)(i)) // ragged
        else shape(k)
      (k.toLong, arr)
    }.toDF("vec_id", "embedding")
    val pairs = Pq.codeNearDup(vecs, minShared = 2, threshold = 0.0).collect()
    assert(!pairs.exists(r =>
      r.getAs[Long]("id_a") >= 38L || r.getAs[Long]("id_b") >= 38L),
      "ragged vectors must not surface as near-dup candidates")
  }

  test("reported refined sims are true float cosines") {
    // every (q, neighbor) the refined path reports must carry the same
    // rounded sim the exact brute-force assigns that pair
    val exactSims = Similarity.cosineTopK(fx, numQueries = 5, k = 50)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("sim_r")).toMap
    val refined = Pq.adcRefineTopK(fx, numQueries = 5, k = 10).collect()
    refined.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))
      exactSims.get(key).foreach { s =>
        assert(s === r.getAs[Double]("sim_r"),
          s"refined sim for $key is not the true cosine")
      }
    }
  }
}
