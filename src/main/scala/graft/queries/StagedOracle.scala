package graft.queries

/** Rewrites a deep `WITH`-chain oracle into a multi-statement staged form
  * so the driver's DuckDB host can run it under a tight memory budget
  * (VERDICT r9 item 1: 8 similarity-family oracles died to
  * OutOfMemoryException on tiny allocations two rounds running — the
  * engine was right each time, but the deep CTE pipelines forced DuckDB
  * to hold the whole quantize→encode→rank chain in RAM at once).
  *
  * The staged form is:
  * {{{
  *   CREATE OR REPLACE TEMP TABLE <cte1> AS (<body1>);
  *   ...
  *   DROP TABLE IF EXISTS <stages the tail doesn't read>;
  *   <final SELECT, verbatim>;
  * }}}
  * Each stage is its own statement, so DuckDB's peak RAM is ONE stage's
  * pipeline plus the (small) materialized stage outputs — not the whole
  * chain at once — and the DROPs bound what survives a query on the
  * driver's long-lived shared connection. (A `SET temp_directory` spill
  * prefix is deliberately NOT emitted: DuckDB refuses any re-SET after
  * the directory has been used once, which would poison every later
  * staged oracle on the same connection. Instead, every stage in the
  * family is authored to have a small output and a streaming pipeline —
  * the two former window-sort monsters, PQ `enc` and the exact-kNN
  * cross product, are rewritten as order-free aggregates at the source.)
  * DuckDB's Python `con.execute()` runs multi-statement scripts and
  * `fetchdf()` returns the last statement's result, so the driver's
  * compare loop sees exactly the rows the inline form produced.
  *
  * Mechanical guarantees:
  *  - each stage's SELECT is the CTE body verbatim; the final statement
  *    is the tail SELECT verbatim, ORDER BY included;
  *  - bare-name references resolve to the just-created temp tables the
  *    same way they resolved to the CTEs (stage names are asserted
  *    disjoint from the fixture view names, and `CREATE OR REPLACE`
  *    makes reuse across queries on a shared connection safe);
  *  - values are bit-identical to the inline form: per-row expressions
  *    are untouched and every cross-row sum in the family is order-free
  *    (integer / fixed-point) by design.
  *
  * `WITH RECURSIVE` chains keep their tail inline: CTEs before the first
  * self-referencing one (the cheap-to-heavy prefix: shingling, pair
  * generation, similarity) are staged; the recursive fixpoint and
  * everything after it stay a `WITH RECURSIVE` on the final statement.
  */
object StagedOracle {

  /** Fixture view names a stage table must never shadow. */
  private val fixtureTables = Set(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  private final case class Cte(
      name: String, body: String, materialized: Boolean, notMaterialized: Boolean)

  def rewrite(sql: String): String = {
    val s = sql
    var i = skipWs(s, 0)
    if (!wordAt(s, i, "WITH")) return sql // not a WITH chain — leave as-is
    i = skipWs(s, i + 4)
    val recursive = wordAt(s, i, "RECURSIVE")
    if (recursive) i = skipWs(s, i + "RECURSIVE".length)

    val ctes = scala.collection.mutable.ArrayBuffer.empty[Cte]
    var done = false
    while (!done) {
      val (name, afterName) = ident(s, i)
      require(name.nonEmpty, s"oracle parse: expected CTE name at offset $i")
      require(!fixtureTables.contains(name.toLowerCase),
        s"oracle parse: CTE '$name' shadows a fixture table")
      i = skipWs(s, afterName)
      require(wordAt(s, i, "AS"), s"oracle parse: expected AS after '$name'")
      i = skipWs(s, i + 2)
      val not = wordAt(s, i, "NOT")
      if (not) i = skipWs(s, i + 3)
      val mat = wordAt(s, i, "MATERIALIZED")
      if (mat) i = skipWs(s, i + "MATERIALIZED".length)
      require(mat || !not, s"oracle parse: dangling NOT before '$name' body")
      require(i < s.length && s.charAt(i) == '(',
        s"oracle parse: expected ( for '$name' body")
      val close = matchParen(s, i)
      ctes += Cte(name, s.substring(i + 1, close).trim, mat && !not, mat && not)
      i = skipWs(s, close + 1)
      if (i < s.length && s.charAt(i) == ',') i = skipWs(s, i + 1)
      else done = true
    }
    val tail = s.substring(i).trim // the final SELECT, verbatim

    // Keep the chain inline from the first self-referencing CTE onward.
    val selfRef = ctes.indexWhere(c => wordRegex(c.name).findFirstIn(c.body).isDefined)
    val splitAt = if (recursive && selfRef >= 0) selfRef else ctes.length
    val staged = ctes.take(splitAt)
    val inline = ctes.drop(splitAt)

    // TRANSITIVE liveness from the final statement (inline CTE bodies +
    // the tail SELECT) backward through stage bodies: a stage nothing
    // reachable reads is never CREATED at all — a shared-prefix oracle
    // that embeds a chain's unused tail (e.g. ivfTopSql's global `top`
    // ranking under a filtered re-rank) must not pay that stage's
    // window-sort memory just to drop it. Matching is word-boundary on
    // the consumer text — conservative: an alias sharing a stage's name
    // keeps the stage alive, never the reverse. Live stages the final
    // statement itself doesn't read are dropped after creation so the
    // driver's shared connection doesn't accumulate intermediates
    // across 40+ staged oracles.
    val finalText = inline.map(_.body).mkString("\n") + "\n" + tail
    val live = scala.collection.mutable.Set.empty[String]
    def mark(text: String): Unit =
      staged.filter(c => !live.contains(c.name) &&
          wordRegex(c.name).findFirstIn(text).isDefined)
        .foreach { c => live += c.name; mark(c.body) }
    mark(finalText)
    val kept = staged.filter(c => live.contains(c.name))
    val dead = kept.filter(c => wordRegex(c.name).findFirstIn(finalText).isEmpty)

    val sb = new StringBuilder
    kept.foreach { c =>
      sb ++= s"CREATE OR REPLACE TEMP TABLE ${c.name} AS (\n${c.body}\n);\n"
    }
    dead.foreach(c => sb ++= s"DROP TABLE IF EXISTS ${c.name};\n")
    if (inline.nonEmpty) {
      // Inline CTEs keep their MATERIALIZED hints: a staged table is
      // materialized by construction, but an inline CTE referenced more
      // than once would otherwise be re-expanded per reference (DuckDB
      // inlines by default — the "Too many open files" failure mode).
      sb ++= "WITH RECURSIVE "
      sb ++= inline.map { c =>
        val hint =
          if (c.materialized) "MATERIALIZED "
          else if (c.notMaterialized) "NOT MATERIALIZED "
          else ""
        s"${c.name} AS $hint(\n${c.body}\n)"
      }.mkString(",\n")
      sb ++= "\n"
    }
    sb ++= tail
    sb.result()
  }

  /** Skip whitespace AND SQL comments (`-- …\n`, `/* … */`) — a comment
    * between CTE clauses or containing an unbalanced paren/quote must not
    * derail the scanner (ADVICE r10). */
  private def skipWs(s: String, from: Int): Int = {
    var i = from
    var moved = true
    while (moved) {
      moved = false
      while (i < s.length && s.charAt(i).isWhitespace) { i += 1; moved = true }
      if (i + 1 < s.length && s.charAt(i) == '-' && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
        moved = true
      }
      if (i + 1 < s.length && s.charAt(i) == '/' && s.charAt(i + 1) == '*') {
        val end = s.indexOf("*/", i + 2)
        require(end >= 0, "oracle parse: unterminated block comment")
        i = end + 2
        moved = true
      }
    }
    i
  }

  private def wordAt(s: String, i: Int, w: String): Boolean =
    i + w.length <= s.length &&
      s.regionMatches(true, i, w, 0, w.length) &&
      (i + w.length == s.length || !isIdentChar(s.charAt(i + w.length)))

  private def isIdentChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  private def ident(s: String, from: Int): (String, Int) = {
    var i = from
    while (i < s.length && isIdentChar(s.charAt(i))) i += 1
    (s.substring(from, i), i)
  }

  /** Index of the ')' matching the '(' at `open`, skipping quoted strings
    * (single-quote SQL literals with '' escapes and double-quoted idents)
    * and SQL comments — an unbalanced paren or quote inside `-- …` or
    * `/* … */` must not shift the match (ADVICE r10).
    */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case '\'' =>
          i += 1
          while (i < s.length && !(s.charAt(i) == '\'' &&
            (i + 1 >= s.length || s.charAt(i + 1) != '\''))) {
            if (s.charAt(i) == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
            i += 1
          }
        case '"' =>
          i += 1
          while (i < s.length && s.charAt(i) != '"') i += 1
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          while (i < s.length && s.charAt(i) != '\n') i += 1
          i -= 1 // the shared increment below lands on the newline
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '*' =>
          val end = s.indexOf("*/", i + 2)
          require(end >= 0, "oracle parse: unterminated block comment")
          i = end + 1 // the shared increment below lands past the */
        case _ =>
      }
      i += 1
    }
    sys.error("oracle parse: unbalanced parens")
  }

  private def wordRegex(name: String) =
    ("(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(name) + "(?![A-Za-z0-9_])").r
}
