package graft.serve

import graft.SparkSuite

/** PageRank influence: closed-form fixed points, hand-computed damped
  * steps, exact mass accounting, and ranking sanity on the fixture. */
class InfluenceSpec extends SparkSuite {

  import spark.implicits._

  private val M = Influence.Mass

  /** Minimal CDC-shaped follower frame (only the columns pageRank reads). */
  private def followersOf(edges: (String, String)*) =
    edges.map { case (a, b) => (a, b, "c") }
      .toDF("follower_id", "following_id", "__op")

  private def rankMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
    val m = df.collect()
      .map(r => r.getAs[String]("user_id") -> r.getAs[Long]("pr_units")).toMap
    graft.ext.Dedup.releaseCaches()
    m
  }

  test("two-node cycle is the closed-form fixed point: half the mass each") {
    val pr = rankMap(Influence.pageRank(followersOf("a" -> "b", "b" -> "a")))
    assert(pr === Map("a" -> M / 2, "b" -> M / 2))
  }

  test("single edge a→b, one iteration, matches the hand computation") {
    // pr0 = M/2 each; spill = pr(b) (dangling) = M/2; extra = M/4
    // pr'(a) = 15%·M/2 + 85%·(0 + M/4)     = 75e9 + 212.5e9 = 287.5e9
    // pr'(b) = 15%·M/2 + 85%·(M/2 + M/4)   = 75e9 + 637.5e9 = 712.5e9
    val pr = rankMap(
      Influence.pageRank(followersOf("a" -> "b"), iterations = 1))
    assert(pr === Map("a" -> 287500000000L, "b" -> 712500000000L))
  }

  test("mass is conserved exactly when divisions are exact") {
    // 4-cycle: every outdeg is 1, N divides M → no remainders anywhere
    val pr = rankMap(Influence.pageRank(
      followersOf("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")))
    assert(pr.values.sum === M)
    assert(pr.values.toSet === Set(M / 4), "symmetric cycle: equal ranks")
  }

  test("non-create ops, self-follows and duplicate edges are excluded") {
    val edges = Seq(
      ("a", "b", "c"), ("a", "b", "c"), // duplicate create
      ("a", "a", "c"),                  // self-follow
      ("b", "a", "u"), ("b", "a", "d")) // non-creates never materialize
      .toDF("follower_id", "following_id", "__op")
    val pr = rankMap(Influence.pageRank(edges, iterations = 1))
    // surviving graph is exactly a→b: same hand computation as above
    assert(pr === Map("a" -> 287500000000L, "b" -> 712500000000L))
  }

  test("on the fixture graph the most-followed users outrank the rest") {
    val flw = graft.sources.CdcSource.followers(
      graft.sources.CdcSource.events(spark, "/root/testdata/sf0.001"))
    val pr = rankMap(Influence.pageRank(flw))
    assert(pr.nonEmpty)
    // total mass stays within iterations × N × 2 units of M (each
    // iteration can drop up to ~2 units per node in div remainders)
    val slack = 10L * pr.size * 2
    assert(math.abs(pr.values.sum - M) <= slack, s"sum ${pr.values.sum}")
    // in-degree correlates with rank: the top-ranked node has at least
    // the median in-degree
    val indeg = flw.where($"__op" === "c")
      .select($"follower_id", $"following_id").distinct()
      .groupBy($"following_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val top = pr.maxBy(_._2)._1
    val degs = indeg.values.toSeq.sorted
    assert(indeg.getOrElse(top, 0L) >= degs(degs.size / 2))
  }
}
