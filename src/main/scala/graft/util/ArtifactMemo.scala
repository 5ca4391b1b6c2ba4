package graft.util

/** One shared per-JVM registry for disk-memoized derived artifacts (the
  * pattern behind the knn-components / dedup / DSIR memos): resolve a
  * (kind, key) to a tmpdir parquet path, building exactly once per JVM.
  *
  * Path = sanitized key + an 8-byte SHA-1 of the raw key, so two
  * distinct keys can never share a path no matter how their characters
  * sanitize (e.g. `/data/sf0-1` vs `/data/sf0_1`).
  *
  * CONTRACT: `build` must not call [[path]] (directly or transitively) —
  * nested `computeIfAbsent` on one ConcurrentHashMap is a documented
  * recursive-update violation that throws when two keys share a bin.
  * Resolve any dependency memo BEFORE entering your build lambda and
  * close over its result.
  */
object ArtifactMemo {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def path(kind: String, key: String)(build: String => Unit): String =
    memo.computeIfAbsent(s"$kind|$key", { full =>
      val digest = java.security.MessageDigest.getInstance("SHA-1")
        .digest(full.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString
      val out = s"${sys.props("java.io.tmpdir")}/graft_${kind}_" +
        key.replaceAll("[^A-Za-z0-9.]+", "_") + "_" + digest
      build(out)
      out
    })
}
