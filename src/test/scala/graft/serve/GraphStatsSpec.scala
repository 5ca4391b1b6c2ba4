package graft.serve

import graft.SparkSuite

/** Degree-ordered triangle counting: exact per-vertex counts on planted
  * graphs (complete, star, messy-input), with dup/reverse/self-loop/
  * non-create edges cleaned exactly once. */
class GraphStatsSpec extends SparkSuite {
  import spark.implicits._

  private def edges(rows: Seq[(String, String, String)]) =
    rows.toDF("follower_id", "following_id", "__op")

  private def result(rows: Seq[(String, String, String)]) =
    GraphStats.triangles(edges(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList

  test("K4: every vertex has degree 3 and sits in 3 triangles") {
    val k4 = for {
      a <- Seq("1", "2", "3", "4"); b <- Seq("1", "2", "3", "4")
      if a < b
    } yield (a, b, "c")
    assert(result(k4) ===
      List(("1", 3L, 3L), ("2", 3L, 3L), ("3", 3L, 3L), ("4", 3L, 3L)))
  }

  test("star: the skew shape — hub degree n, zero triangles anywhere") {
    val star = (1 to 9).map(i => ("hub", s"s$i", "c"))
    val got = result(star)
    assert(got.find(_._1 == "hub").get === (("hub", 9L, 0L)))
    assert(got.forall(_._3 == 0L))
  }

  test("messy input: dups, reversed edges, self-loops, non-creates") {
    // one real triangle {a,b,c}; (a,b) also arrives reversed and
    // duplicated; a self-loop on a; a 'd'-op edge that would close a
    // second triangle {a,b,x} but must be ignored
    val rows = Seq(
      ("a", "b", "c"), ("b", "a", "c"), ("a", "b", "c"),
      ("b", "c", "c"), ("a", "c", "c"),
      ("a", "a", "c"),
      ("a", "x", "c"), ("b", "x", "d"))
    assert(result(rows) === List(
      ("a", 3L, 1L), ("b", 2L, 1L), ("c", 2L, 1L), ("x", 1L, 0L)))
  }

  test("two triangles sharing an edge attribute to the shared pair twice") {
    // {a,b,c} and {a,b,d}: a,b in 2 each; c,d in 1 each
    val rows = Seq(("a", "b", "c"), ("a", "c", "c"), ("b", "c", "c"),
      ("a", "d", "c"), ("b", "d", "c"))
    assert(result(rows) === List(
      ("a", 3L, 2L), ("b", 3L, 2L), ("c", 2L, 1L), ("d", 2L, 1L)))
  }
}
