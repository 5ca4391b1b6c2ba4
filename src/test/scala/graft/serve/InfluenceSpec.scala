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
    graft.ext.Dedup.releaseAll()
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

  test("personalized PageRank, single edge a→b: two hand-computed rounds " +
      "(teleport + spill return to the source, init all-mass-at-source)") {
    // p0: a=M, b=0. Round 1: spill = p0(b) dangling = 0; contrib(b) = M.
    //   a = 15%·M + 85%·(0 + 0)  = 150e9
    //   b = 0     + 85%·(M + 0)  = 850e9
    // Round 2: spill = p1(b) = 850e9 (dangling), returns to a only.
    //   a = 150e9 + 85%·(0 + 850e9) = 872.5e9
    //   b = 0     + 85%·(150e9 + 0) = 127.5e9
    val one = rankMap(Influence.personalizedPageRank(
      followersOf("a" -> "b"), iterations = 1))
    assert(one === Map("a" -> 150000000000L, "b" -> 850000000000L))
    val two = rankMap(Influence.personalizedPageRank(
      followersOf("a" -> "b"), iterations = 2))
    assert(two === Map("a" -> 872500000000L, "b" -> 127500000000L))
    assert(two.values.sum === M, "no divide-by-n: mass conserved exactly")
  }

  test("personalized PageRank localizes: mass concentrates near the " +
      "source, and an explicit source overrides the min-id default") {
    // a→b→c chain plus far pair x→y reachable only from x
    val g = followersOf("a" -> "b", "b" -> "c", "x" -> "y")
    val fromA = rankMap(Influence.personalizedPageRank(g)) // min id = a
    // the x,y island is unreachable from a: it holds no mass
    assert(fromA("x") === 0L && fromA("y") === 0L)
    assert(fromA("a") > 0L && fromA("b") > 0L && fromA("c") > 0L)
    val fromX = rankMap(
      Influence.personalizedPageRank(g, source = Some("x")))
    assert(fromX("x") > 0L && fromX("y") > 0L)
    assert(fromX("a") === 0L && fromX("b") === 0L && fromX("c") === 0L)
  }

  test("personalized PageRank fails fast on a source absent from the " +
      "graph (ADVICE r7: it previously drained all mass silently)") {
    val g = followersOf("a" -> "b")
    val e = intercept[IllegalArgumentException] {
      Influence.personalizedPageRank(g, source = Some("nobody"))
    }
    assert(e.getMessage.contains("nobody"))
    graft.ext.Dedup.releaseAll()
  }
}
