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
  * checkpoint-truncated every 4 rounds. Nothing corpus-global; the edge
  * frame is built once and checkpointed. */
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
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // static per-edge frame: (src, dst, outdeg) — built once, reused by
    // every iteration's contribution join
    val ewd = Dedup.checkpointed(edges.join(outdeg, "src"))
    val n = nodes.count()
    if (n == 0)
      return nodes.select(col("id").as("user_id"), col("id").cast("long").as("pr_units"))
    val baseUnit = (Mass * 15L / 100L) / n
    var pr = nodes.select(col("id"), lit(Mass / n).as("pr"))
    for (it <- 1 to iterations) {
      // spill = dangling mass + per-node division remainders, shared out
      // uniformly next round (one scalar to the driver per iteration)
      val spillRow = pr
        .join(outdeg, pr("id") === outdeg("src"), "left")
        .agg(sum(when(col("outdeg").isNull, col("pr"))
          .otherwise(expr("pr % outdeg"))).as("spill"))
        .head()
      val spill = if (spillRow.isNullAt(0)) 0L else spillRow.getLong(0)
      val extra = spill / n
      val contrib = ewd.join(pr, ewd("src") === pr("id"))
        .select(col("dst"), expr("pr div outdeg").as("share"))
        .groupBy("dst").agg(sum("share").as("contrib"))
      val next = nodes
        .join(contrib, nodes("id") === contrib("dst"), "left")
        .select(col("id"),
          expr(s"$baseUnit + (85 * (coalesce(contrib, 0) + $extra)) div 100")
            .as("pr"))
      pr = if (it % 4 == 0 && it < iterations) Dedup.checkpointed(next) else next
    }
    pr.select(col("id").as("user_id"), col("pr").as("pr_units"))
      .orderBy("user_id")
  }
}
