package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid — "Product Quantization for
  * Nearest Neighbor Search", PAMI 2011) — the compression rung between
  * [[Similarity.quantize]]'s int8 (4×) and [[Similarity.binarize]]'s sign
  * bits (32×): the 64-dim vector splits into `m = 8` subspaces of 8 dims,
  * each subvector snaps to its nearest codeword from a per-subspace
  * codebook, and a vector is stored as 8 one-byte codeword ids — 32×
  * smaller than float32 with far better dot-product fidelity than sign
  * bits, because each subspace keeps a real (quantized) direction instead
  * of one bit per dimension.
  *
  * Everything runs over the int8 codes of [[Similarity.quantize]], not the
  * raw floats: subvector distances, codeword dots, and ADC lookups are
  * then sums of products of integers ≤ 127 — EXACT in doubles — so the
  * whole family is deterministic and carries complete DuckDB oracles
  * (the same trick [[Similarity.quantizedIvfTopK]] uses). Codebooks are
  * data-sampled exactly like the IVF centroids — every [[pqStride]]-th
  * vector's subvector is a codeword (codeword id = donor vec_id), CAPPED
  * at [[pqMaxCw]] codewords per subspace (`vec_id < stride·256`), so C is
  * a fixed design constant at any corpus size, the FAISS convention — and
  * there is no trained model to ship: bit-reproducible on any cluster.
  *
  * Scale shape (the FAISS serving layout, re-expressed in Spark):
  *  - codebooks are `m·C` tiny rows — broadcast everywhere, never shuffled;
  *  - encoding is one corpus scan × broadcast codebooks with a map-side
  *    partial argmin (`max_by` over a struct) — the vectors never shuffle;
  *  - an ADC query builds a `|q|·m·C` lookup table (broadcast), scans ONLY
  *    the 8-byte code rows, and reduces per (query, vector) with map-side
  *    partials — the float vectors are touched by nothing but the final
  *    refine fetch on `refineFactor·k` survivors.
  * At 100 TB the code table is what lives hot (32× less scan bandwidth);
  * the float table is point-read by the refine stage only, which is the
  * [[graft.sinks.AnnIndex]] bucketed-fetch discipline.
  */
object Pq {

  import Similarity.{asDouble, cosine, dot}

  /** Subspace count; 64 dims / 8 = 8 dims per subvector. */
  val pqM = 8
  val pqSubDim = 8

  /** Codebook sampling: every 2nd vector donates, capped at 256 codewords
    * per subspace (the FAISS 8-bit-PQ codebook size) — C stays a constant
    * independent of corpus size, so encoding is O(N·C·m) flops with a
    * broadcast codebook at any scale. */
  val pqStride = 2
  val pqMaxCw = 256

  /** Tiny positive floor — keeps all-zero codes (possible on a degenerate
    * corpus) from dividing to NaN, without perturbing any real norm. */
  private val tiny = java.lang.Double.MIN_VALUE

  /** Per-subspace int8 codebooks: every `stride`-th vector donates its j-th
    * subvector, codeword id = donor vec_id. `cwdot` (‖cw‖², exact int) rides
    * along so encoders and ADC both read it instead of recomputing. */
  def codebook(embeddings: DataFrame, stride: Int = pqStride): DataFrame = {
    val q8 = Similarity.quantize(embeddings).select(col("vec_id"), col("qv"))
    q8.where(pmod(col("vec_id"), lit(stride)) === 0 &&
        col("vec_id") < stride.toLong * pqMaxCw)
      .select(col("vec_id").as("cw_id"), posexplode(subvectors(col("qv"))))
      .select(col("pos").as("j"), col("cw_id"),
        col("col").as("cw"), dot(col("col"), col("col")).as("cwdot"))
  }

  /** array(64 int8-as-double) → array of `pqM` 8-dim subvectors. */
  private def subvectors(qv: Column): Column =
    array((0 until pqM).map(j =>
      slice(transform(qv, x => x.cast("double")), j * pqSubDim + 1, pqSubDim)): _*)

  /** PQ encoding: per (vector, subspace) the nearest codeword by L2 over
    * the int8 subvectors (d² = ‖s‖² − 2·s·cw + ‖cw‖², every term an exact
    * integer; ties → lowest cw_id). One scan × broadcast codebooks with a
    * map-side-partial argmin — the N×C flops never become an N×C shuffle. */
  def codes(embeddings: DataFrame, stride: Int = pqStride): DataFrame = {
    val cb = codebook(embeddings, stride)
    val subs = Similarity.quantize(embeddings)
      .select(col("vec_id"), posexplode(subvectors(col("qv"))))
      .select(col("vec_id"), col("pos").as("j"), col("col").as("sub"))
    subs
      .join(broadcast(cb), Seq("j"))
      .withColumn("d2",
        dot(col("sub"), col("sub")) - lit(2.0) * dot(col("sub"), col("cw"))
          + col("cwdot"))
      .groupBy("vec_id", "j")
      .agg(max_by(col("cw_id"),
        struct((-col("d2")).as("nd2"), (-col("cw_id")).as("nid"))).as("code"))
  }

  /** ADC (asymmetric-style distance computation, here symmetric-int8)
    * top-k: the query's int8 subvectors dot every codeword once into a
    * `|q|·m·C` lookup table; each candidate then costs m table lookups
    * summed — never a 64-dim dot. Similarity = ADC-dot / (‖q8‖·‖recon‖)
    * with the reconstruction norm Σⱼ‖cw(codeⱼ)‖² (exact int), so the
    * ranking is bit-deterministic and fully oracle-able. */
  def adcTopK(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int,
      stride: Int = pqStride): DataFrame = {
    val cb = codebook(embeddings, stride)
    val cds = codes(embeddings, stride)
    // query-side: int8 subvectors + exact int8 norm
    val q8 = Similarity.quantize(embeddings)
      .where(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"),
        sqrt(dot(transform(col("qv"), x => x.cast("double")),
          transform(col("qv"), x => x.cast("double")))).as("qn"),
        posexplode(subvectors(col("qv"))))
      .select(col("q_id"), col("qn"), col("pos").as("j"), col("col").as("qsub"))
    val lut = q8
      .join(broadcast(cb), Seq("j"))
      .select(col("q_id"), col("qn"), col("j"), col("cw_id"),
        dot(col("qsub"), col("cw")).as("pdot"))
    // candidate-side: reconstruction norm² = Σⱼ cwdot(codeⱼ)
    val recon = cds
      .join(broadcast(cb.select(col("j"), col("cw_id").as("code"), col("cwdot"))),
        Seq("j", "code"))
      .groupBy("vec_id")
      .agg(sum("cwdot").as("recon2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("asim").desc, col("vec_id"))
    cds
      .join(broadcast(lut),
        cds("j") === lut("j") && cds("code") === lut("cw_id") &&
          cds("vec_id") =!= lut("q_id"))
      .groupBy(col("q_id"), col("vec_id"), col("qn"))
      .agg(sum(col("pdot")).as("adot"))
      .join(recon, Seq("vec_id"))
      .withColumn("asim",
        col("adot") / greatest(col("qn") * sqrt(col("recon2")), lit(tiny)))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        round(col("asim"), 6).as("asim_r"))
      .orderBy("q_id", "rnk")
  }

  /** ADC shortlist (`refineFactor·k`) → exact float cosine re-rank — the
    * FAISS refine pattern over PQ codes: the 32×-cheap scan proposes,
    * `|q|·refineFactor·k` float point-reads decide. Reported similarities
    * are the TRUE cosines; recall dominates the raw ADC rank at equal k. */
  def adcRefineTopK(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int,
      refineFactor: Int = 4,
      stride: Int = pqStride): DataFrame = {
    val cands = adcTopK(embeddings, numQueries, k * refineFactor, stride)
      .select(col("q_id"), col("neighbor_id"))
    val base = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor_id"))
    cands
      .join(broadcast(base.where(col("vec_id") < numQueries)
        .select(col("vec_id").as("q_id"), col("v").as("q"))), Seq("q_id"))
      .join(base.select(col("vec_id").as("neighbor_id"), col("v")),
        Seq("neighbor_id"))
      .withColumn("sim", cosine(col("q"), col("v")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("neighbor_id"),
        round(col("sim"), 6).as("sim_r"))
      .orderBy("q_id", "rnk")
  }

  /** Recall@k of the raw ADC ranking vs the exact float top-k — the
    * honest price of 32× compression, deterministic on both sides (same
    * contract as [[Similarity.quantizeRecall]] / binaryRecall), so the
    * compression-vs-recall ladder float→int8→PQ→binary is measured, not
    * asserted. */
  def adcRecall(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int,
      stride: Int = pqStride): DataFrame = {
    val exact = Similarity.cosineTopK(embeddings, numQueries, k)
      .select(col("q_id"), col("neighbor_id"))
    val approx = adcTopK(embeddings, numQueries, k, stride)
      .select(col("q_id").as("aq"), col("neighbor_id").as("approx_id"))
    exact
      .join(approx,
        exact("q_id") === col("aq") && col("neighbor_id") === col("approx_id"),
        "left")
      .groupBy(exact("q_id").as("qid"))
      .agg(round(count(col("approx_id")).cast("double") / k, 6).as("recall_r"))
      .orderBy("qid")
  }
}
