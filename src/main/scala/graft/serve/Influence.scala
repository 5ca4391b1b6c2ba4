package graft.serve

import graft.ext.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank-style influence over the follower graph — the feed domain's
  * iterative-numeric operator (the reference ranks feeds by recency only;
  * an influence score is the standard next signal, and `components`
  * exercises only min-propagation). Fixed iteration count + damping over
  * the creates-only follow edges (reference strategy.py follower
  * semantics: only `__op = 'c'` edges exist downstream).
  *
  * EXACT INTEGER ARITHMETIC: rank is carried as BIGINT micro-units of
  * probability mass (total [[Mass]] = 10¹²), every per-edge share is an
  * integer `div`, and dangling + division-remainder mass is redistributed
  * uniformly (its own remainder dropped — deterministically). No doubles
  * anywhere, so sums are order-free under any partitioning and the DuckDB
  * oracle replays the identical iterations as unrolled MATERIALIZED CTEs
  * — the same discipline the LM gate gets from decimals, taken all the
  * way to exactness. Damping 85/100 in the same integer form.
  *
  * Scale: per iteration, one edge×rank hash-join (skinny: two id strings
  * + two longs) and one dst-keyed sum — the canonical distributed
  * PageRank shape; the spill aggregate collects ONE long to the driver
  * per iteration (the `components`/BPE loop pattern), and rank lineage is
  * checkpoint-truncated every round (two actions per round read the
  * state, so a lazy chain re-executes multiplicatively — see the loop
  * comment). Nothing corpus-global; the edge frame is built once and
  * checkpointed. */
object Influence {

  /** Total probability mass, in micro-units. */
  val Mass = 1000000000000L

  /** (user_id, pr_units) after `iterations` damped rounds, one row per
    * node of the creates-only, self-loop-free, deduplicated follow graph.
    * `followers` is the CDC branch frame ([[graft.sources.CdcSource]]). */
  def pageRank(followers: DataFrame, iterations: Int = 10): DataFrame = {
    val edges = followers.where(col("__op") === "c")
      .select(col("follower_id").as("src"), col("following_id").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    val nodes = Dedup.checkpointed(
      edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct())
    // static per-node and per-edge frames — built once, checkpointed, so
    // no round re-runs the CDC parse → distinct → aggregate pipeline
    // (the spill join reads outdeg every iteration)
    val outdeg = Dedup.checkpointed(
      edges.groupBy("src").agg(count(lit(1)).as("outdeg")))
    val ewd = Dedup.checkpointed(edges.join(outdeg, "src"))
    val n = nodes.count()
    if (n == 0)
      return nodes.select(col("id").as("user_id"), col("id").cast("long").as("pr_units"))
    val baseUnit = (Mass * 15L / 100L) / n
    // the rank state is checkpointed EVERY round: each round runs two
    // actions (the spill scalar + the next-state materialization), and a
    // lazy chain would re-execute every round since the last truncation
    // inside each spill aggregate — measured 7.2 s → ~2 s at sf0.1 for
    // the same 10 iterations
    var pr = Dedup.checkpointed(
      nodes.select(col("id"), lit(Mass / n).as("pr")))
    for (it <- 1 to iterations) {
      // spill = dangling mass + per-node division remainders, shared out
      // uniformly — kept IN-PLAN as a broadcast single-row aggregate, so
      // each round is exactly ONE Spark job (the state checkpoint); a
      // driver-collected scalar doubled the per-round job count for no
      // informational gain
      val spillF = pr
        .join(outdeg, pr("id") === outdeg("src"), "left")
        .agg(coalesce(sum(when(col("outdeg").isNull, col("pr"))
          .otherwise(expr("pr % outdeg"))), lit(0L)).as("spill"))
      val contrib = ewd.join(pr, ewd("src") === pr("id"))
        .select(col("dst"), expr("pr div outdeg").as("share"))
        .groupBy("dst").agg(sum("share").as("contrib"))
      val next = nodes
        .join(contrib, nodes("id") === contrib("dst"), "left")
        .crossJoin(broadcast(spillF))
        .select(col("id"),
          expr(s"$baseUnit + (85 * (coalesce(contrib, 0) + spill div $n)) div 100")
            .as("pr"))
      pr = if (it < iterations) Dedup.checkpointed(next) else next
    }
    pr.select(col("id").as("user_id"), col("pr").as("pr_units"))
      .orderBy("user_id")
  }
}
