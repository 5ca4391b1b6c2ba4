package graft.util

/** Collision-free key for deriving a per-fixture-dir tmp path. Every
  * `*Sink.materialized` site keys its shared on-disk table by the
  * fixture dir; the previous house pattern, `math.abs(sfDir.hashCode)`,
  * could (a) collide two distinct fixture dirs onto one table — the
  * second build clobbers files a persisted DataFrame for the first may
  * lazily re-read — and (b) return a negative for `Int.MinValue`.
  * MD5-hex of the UTF-8 bytes is injective for all practical purposes
  * and constant-length regardless of path depth.
  */
object DirKeys {
  def key(dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  }

  /** `<java.io.tmpdir>/graft_<family>_<md5(dir)>` — the one spelling of
    * the shared-tmp-table path for all sinks. */
  def tmpPath(family: String, dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${family}_${key(dir)}"
}
