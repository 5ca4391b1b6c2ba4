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

  test("multi-pass blocking (r11 item 5): a head-noun variant the " +
      "last-token pass provably misses is found via the first token") {
    // "steel anvil" / "steel anvils": last tokens DIFFER (single-pass
    // head-noun blocking never compares them) but the shared first
    // token blocks them — the recall hole the second pass closes
    val df = parts(Seq("steel anvil", "steel anvils"))
    val got = EntityResolution.fuzzyNameMatches(df, maxDist = 2).collect()
    assert(got.length === 1)
    assert(got.head.getString(0) === "steel anvil")
    assert(got.head.getString(1) === "steel anvils")
    assert(got.head.getInt(2) === 1)
    // likewise "red bat"/"red cat" (head nouns differ, lev 1) now pair
    val rb = parts(Seq("red bat", "red cat"))
    assert(EntityResolution.fuzzyNameMatches(rb, maxDist = 2).count() === 1)
  }

  test("a near pair agreeing on NEITHER key is not generated — the " +
      "documented residual blocking limit") {
    // levenshtein("red bat","ted cat") = 2 but first AND last tokens
    // differ: the registered operator is the BLOCKED join, so no pair
    val df = parts(Seq("red bat", "ted cat"))
    assert(EntityResolution.fuzzyNameMatches(df, maxDist = 2).isEmpty)
  }

  test("a pair blocking in BOTH passes appears once (pair dedup before " +
      "the verify)") {
    // identical first AND last tokens with a middle edit → the pair is
    // a candidate in BOTH blocking passes; the pre-verify dedup must
    // collapse it to one output row
    val df = parts(Seq("red big gear", "red bug gear"))
    val got = EntityResolution.fuzzyNameMatches(df, maxDist = 2).collect()
    assert(got.length === 1)
    assert(got.head.getInt(2) === 1)
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
