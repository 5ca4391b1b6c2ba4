package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench.parsePrior — the committed-priors reader behind the relative
  * outlier re-measure trigger (VERDICT r10 item 7): well-formed output
  * round-trips; malformed input degrades to an EMPTY map (main warns on
  * stderr) instead of throwing and killing the bench. */
class BenchPriorSpec extends AnyFunSuite {

  test("round-trips its own output format, scientific notation included") {
    val json =
      """{"queries":{"q1":0.42,"q2":1.5e-2,"q3":-1.0},"calibration_sec":0.3,"value":2}"""
    assert(Bench.parsePrior(json) ===
      Map("q1" -> 0.42, "q2" -> 0.015, "q3" -> -1.0))
  }

  test("the committed bench_queries.json parses to a non-empty prior map") {
    val p = java.nio.file.Paths.get("bench_queries.json")
    assume(java.nio.file.Files.exists(p))
    val prior = Bench.parsePrior(new String(
      java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8))
    assert(prior.size > 100,
      s"committed priors parsed to ${prior.size} entries — the relative " +
        "outlier trigger would be effectively disabled")
    assert(prior.values.forall(v => !v.isNaN))
  }

  test("malformed input degrades to empty, never throws") {
    assert(Bench.parsePrior("").isEmpty)
    assert(Bench.parsePrior("not json at all").isEmpty)
    assert(Bench.parsePrior("""{"value":1.0}""").isEmpty)
    assert(Bench.parsePrior("""{"queries":{""").isEmpty)
    // a value the regex admits but parseDouble rejects skips only its
    // own entry, never the map
    assert(Bench.parsePrior("""{"queries":{"a":1.2.3,"b":0.5}}""") ===
      Map("b" -> 0.5))
  }

  test("parseMap/parseScalar read the trend inputs from a real-shaped " +
      "artifact (prior builds map and calibration scalar)") {
    val json =
      """{"queries":{"a":0.1},"artifact_builds":{"ann-index":2.5,"bpe-learner":-1.0},""" +
        """"trend":{"serve_sec":9.9},"calibration_sec":0.31,"value":12.0}"""
    assert(Bench.parseMap(json, "artifact_builds") ===
      Map("ann-index" -> 2.5, "bpe-learner" -> -1.0))
    assert(Bench.parseScalar(json, "calibration_sec") === Some(0.31))
    // a key that is absent degrades to empty/None, never throws
    assert(Bench.parseMap(json, "no_such_map").isEmpty)
    assert(Bench.parseScalar(json, "no_such_scalar").isEmpty)
    // the nested trend object must not confuse the queries scan
    assert(Bench.parsePrior(json) === Map("a" -> 0.1))
  }

  test("a nested object inside queries does not truncate the map " +
      "(ADVICE r11: scan to the matching brace, not the first '}')") {
    val json =
      """{"queries":{"a":0.1,"x":{"inner":9.9},"b":0.2},"value":3}"""
    val prior = Bench.parsePrior(json)
    // 'b', AFTER the nested object, must survive; the old first-'}' scan
    // dropped it silently
    assert(prior.get("a") === Some(0.1))
    assert(prior.get("b") === Some(0.2))
  }
}
