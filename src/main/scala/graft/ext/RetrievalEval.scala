package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label-based retrieval evaluation — the measurement harness a
  * retrieval pipeline ships with (BEIR/MTEB-style): treat each query
  * vector's `label` as its relevance class (every other same-label
  * vector is relevant), run a retriever's top-k, and score Recall@k,
  * MRR@k, and NDCG@k per query. The engine already MEASURES its ANN
  * approximations against exact search (`*_recall`); this closes the
  * other half — measuring retrieval QUALITY against ground-truth labels,
  * so the compression ladder can be read in end-metric terms ("PQ costs
  * 0.02 NDCG") rather than rank-overlap terms.
  *
  * Float discipline: each DCG term `rel/log2(rank+1)` truncates to
  * DECIMAL(28,12) before the per-query sum (order-free, the Lm rule);
  * the ideal DCG divides on the same grid, so `ndcg_r` is deterministic
  * in both engines. Recall's denominator is `min(k, n_rel)` (bounded
  * recall — a query with 40 relevant docs is not penalized for a k=10
  * budget).
  *
  * Scale: the retriever dominates; the eval adds two broadcast joins
  * against the 2-column label table, one per-query aggregate, and a
  * broadcast k-row ideal-DCG frame. Nothing corpus-global.
  */
object RetrievalEval {

  private val DcgDec = "decimal(28,12)"

  /** log2(x) on doubles — `ln(x)/ln(2)`, the same expression the DuckDB
    * twin evaluates (`ln(x)/ln(2)`), so both engines round identically. */
  private def log2(x: Column): Column = log(x) / log(lit(2.0))

  /** Evaluate a retriever's ranked output `(q_id, rnk, neighbor_id)`
    * against the `label` column of `embeddings`: one row per query with
    * `n_rel`, `hits`, `recall_r`, `mrr_r`, `ndcg_r`. */
  def evalRanking(
      embeddings: DataFrame,
      ranked: DataFrame,
      k: Int): DataFrame = {
    val lbl = embeddings.select(col("vec_id"), col("label"))
    // per-label corpus counts → n_rel per query (its class size minus
    // itself); broadcast — |labels| rows
    val classSizes = lbl.groupBy("label").agg(count(lit(1)).as("n_class"))
    val qRel = lbl
      .join(broadcast(classSizes), Seq("label"))
      .select(col("vec_id").as("q_id"), col("label").as("q_lbl"),
        (col("n_class") - 1).as("n_rel"))
    // ideal DCG by number of relevant positions m = 1..k (broadcast,
    // k rows): idcg(m) = Σ_{i=1..m} 1/log2(i+1) on the decimal grid
    val iw = org.apache.spark.sql.expressions.Window
      .orderBy(col("i")).rowsBetween(Window.unboundedPreceding, 0)
    val ideal = embeddings.sparkSession.range(1, k + 1).toDF("i")
      .withColumn("term",
        (lit(1.0) / log2(col("i") + 1)).cast(DcgDec))
      .withColumn("idcg", sum(col("term")).over(iw))
      .select(col("i").as("m"), col("idcg"))
    val scored = ranked
      .join(broadcast(qRel), Seq("q_id"))
      .join(broadcast(lbl.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_lbl"))), Seq("neighbor_id"))
      .withColumn("rel", when(col("n_lbl") === col("q_lbl"), 1).otherwise(0))
      .groupBy(col("q_id"), col("n_rel"))
      .agg(
        sum(col("rel")).as("hits"),
        min(when(col("rel") === 1, col("rnk"))).as("first_rel"),
        sum((col("rel") / log2(col("rnk") + 1)).cast(DcgDec)).as("dcg"))
    scored
      .join(broadcast(ideal),
        col("m") === least(lit(k.toLong), col("n_rel")), "left")
      .select(col("q_id"), col("n_rel"), col("hits"),
        // greatest(…, 1): a singleton label class has n_rel = 0 and
        // hits = 0 — recall reads 0, never NaN (the tiny-floor rule)
        round(col("hits").cast("double") /
          greatest(least(lit(k.toLong), col("n_rel")), lit(1L)), 6)
          .as("recall_r"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6).as("mrr_r"),
        round(coalesce(
          col("dcg").cast("double") / col("idcg").cast("double"),
          lit(0.0)), 6).as("ndcg_r"))
      .orderBy("q_id")
  }

  private val Window = org.apache.spark.sql.expressions.Window

  /** Exact dense retrieval ([[Similarity.cosineTopK]]) under the label
    * ground truth — the reference row every compressed retriever is
    * compared to. */
  def denseEval(embeddings: DataFrame, numQueries: Int, k: Int): DataFrame =
    evalRanking(embeddings,
      Similarity.cosineTopK(embeddings, numQueries, k)
        .select(col("q_id"), col("rank").as("rnk"), col("neighbor_id")),
      k)

  /** The PQ refined retriever ([[Pq.adcRefineTopK]]) under the same
    * ground truth: the 32×-compression cost in END-METRIC terms. */
  def pqEval(embeddings: DataFrame, numQueries: Int, k: Int): DataFrame =
    evalRanking(embeddings,
      Pq.adcRefineTopK(embeddings, numQueries, k)
        .select(col("q_id"), col("rnk"), col("neighbor_id")),
      k)
}
