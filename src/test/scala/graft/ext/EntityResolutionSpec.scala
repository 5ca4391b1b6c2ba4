package graft.ext

import graft.SparkSuite

/** Blocked fuzzy ER: within-block levenshtein pairs with row support,
  * cross-block pairs never generated (the blocking contract), null and
  * identical names excluded. */
class EntityResolutionSpec extends SparkSuite {
  import spark.implicits._

  private def parts(names: Seq[String]) =
    names.zipWithIndex.map { case (n, i) => (i.toLong, Option(n)) }
      .toDF("p_partkey", "p_name")

  test("finds within-block near pairs with distances and row support") {
    val df = parts(Seq(
      "red gear", "old gear", "red gear", // "red gear" ×2
      "cold ring", "old ring",
      "red widget"))
    val got = EntityResolution.fuzzyNameMatches(df, maxDist = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toList
    assert(got === List(
      ("cold ring", "old ring", 1, 1L, 1L),
      ("old gear", "red gear", 2, 1L, 2L)))
  }

  test("a near pair in DIFFERENT blocks is not generated — blocking semantics") {
    // levenshtein("red bat","red cat") = 1 but the head nouns differ:
    // the registered operator is the BLOCKED join, so no pair
    val df = parts(Seq("red bat", "red cat"))
    assert(EntityResolution.fuzzyNameMatches(df, maxDist = 2).isEmpty)
  }

  test("identical names and nulls never pair") {
    val df = parts(Seq("red gear", "red gear", null, null))
    assert(EntityResolution.fuzzyNameMatches(df, maxDist = 2).isEmpty)
  }

  test("distance gate is strict: dist 4 excluded below maxDist 4") {
    val df = parts(Seq("small ring", "cold ring")) // lev = 4
    assert(EntityResolution.fuzzyNameMatches(df, maxDist = 2).isEmpty)
    assert(EntityResolution.fuzzyNameMatches(df, maxDist = 3).isEmpty)
    assert(EntityResolution.fuzzyNameMatches(df, maxDist = 4).count() === 1)
  }
}
