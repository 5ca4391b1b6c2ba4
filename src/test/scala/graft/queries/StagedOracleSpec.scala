package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The oracle staging rewriter's contracts: verbatim bodies/tail,
  * transitive dead-stage elimination, recursive-tail inlining with
  * round-tripped MATERIALIZED hints, and fixture-shadow rejection. */
class StagedOracleSpec extends AnyFunSuite {

  test("stages a plain WITH chain; tail verbatim; dead-for-tail stages " +
      "dropped after creation") {
    val sql = """WITH a AS (SELECT 1 AS x),
b AS (SELECT x + 1 AS y FROM a)
SELECT y FROM b ORDER BY y"""
    val out = StagedOracle.rewrite(sql)
    assert(out.contains("CREATE OR REPLACE TEMP TABLE a AS (\nSELECT 1 AS x\n);"))
    assert(out.contains("CREATE OR REPLACE TEMP TABLE b AS"))
    // `a` feeds only `b`, so it is dropped before the final statement
    assert(out.contains("DROP TABLE IF EXISTS a;"))
    assert(!out.contains("DROP TABLE IF EXISTS b;"))
    assert(out.endsWith("SELECT y FROM b ORDER BY y"))
  }

  test("transitively dead stages are never created (the unused " +
      "shared-prefix tail)") {
    val sql = """WITH a AS (SELECT 1 AS x),
dead1 AS (SELECT x FROM a),
dead2 AS (SELECT x FROM dead1)
SELECT x FROM a ORDER BY x"""
    val out = StagedOracle.rewrite(sql)
    assert(out.contains("TEMP TABLE a AS"))
    assert(!out.contains("dead1"), "a stage only dead stages read must not exist")
    assert(!out.contains("dead2"))
  }

  test("recursive chains: prefix staged, tail inline from the first " +
      "self-referencing CTE, hints round-tripped") {
    val sql = """WITH RECURSIVE base AS (SELECT 1 AS u),
r AS (SELECT u FROM base UNION ALL SELECT u + 1 FROM r WHERE u < 3),
agg AS MATERIALIZED (SELECT max(u) AS m FROM r),
agg2 AS NOT MATERIALIZED (SELECT m FROM agg)
SELECT m FROM agg2 ORDER BY m"""
    val out = StagedOracle.rewrite(sql)
    assert(out.contains("TEMP TABLE base AS"), "pre-recursive prefix stages")
    assert(!out.contains("TEMP TABLE r AS"), "the fixpoint stays a CTE")
    assert(out.contains("WITH RECURSIVE r AS ("))
    assert(out.contains("agg AS MATERIALIZED ("), "hint preserved")
    assert(out.contains("agg2 AS NOT MATERIALIZED ("), "NOT hint not inverted")
  }

  test("non-WITH SQL passes through unchanged") {
    val sql = "SELECT count(*) AS n FROM embeddings"
    assert(StagedOracle.rewrite(sql) === sql)
  }

  test("a CTE shadowing a fixture table is rejected loudly") {
    val sql = "WITH documents AS (SELECT 1 AS x) SELECT x FROM documents"
    val e = intercept[IllegalArgumentException](StagedOracle.rewrite(sql))
    assert(e.getMessage.contains("shadows a fixture table"))
  }

  test("quoted parens and doubled quotes don't derail the body scanner") {
    val sql = """WITH a AS (SELECT 'it''s (tricky)' AS s, ")" AS q)
SELECT s FROM a ORDER BY s"""
    val out = StagedOracle.rewrite(sql)
    assert(out.contains("""TEMP TABLE a AS (
SELECT 'it''s (tricky)' AS s, ")" AS q
);"""))
  }

  test("SQL comments — between CTE clauses and containing unbalanced " +
      "parens/quotes — don't derail the scanner (ADVICE r10)") {
    val sql = """WITH a AS (
  -- an unbalanced ( paren and a stray ' quote in a line comment
  SELECT 1 AS x /* and a block ) comment with ( parens */
), -- trailing comment after the stage
/* a block comment
   spanning lines before the next CTE name */
b AS (SELECT x + 1 AS y FROM a)
SELECT y FROM b ORDER BY y"""
    val out = StagedOracle.rewrite(sql)
    assert(out.contains("TEMP TABLE a AS"))
    assert(out.contains("TEMP TABLE b AS"))
    assert(out.endsWith("SELECT y FROM b ORDER BY y"))
    // comment text inside a body is carried verbatim (DuckDB handles it)
    assert(out.contains("block ) comment"))
  }

  test("every registered embeddings oracle rewrites cleanly into staged " +
      "form (the production inputs)") {
    val staged = graft.SparkEntry.oracleSql.filter(_._2.contains("embeddings"))
    assert(staged.size >= 40, s"expected the similarity tier, got ${staged.size}")
    staged.foreach { case (name, sql) =>
      // registered oracles are PRE-rewritten by ExtQueries — each must be
      // multi-statement staged (or a legitimately WITH-less passthrough)
      assert(sql.contains("CREATE OR REPLACE TEMP TABLE") ||
        !sql.trim.toUpperCase.startsWith("WITH"),
        s"$name did not stage")
      // and stage names never shadow fixture views (rewrite enforces it;
      // re-running it on the emitted form must be a no-op passthrough)
      assert(!sql.contains("TEMP TABLE documents ") &&
        !sql.contains("TEMP TABLE embeddings "), name)
    }
  }
}
