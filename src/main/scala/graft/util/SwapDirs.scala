package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash recovery for the house rename-aside swap (rename live →
  * `__old`, rename `__next`/`__compact` → live, delete `__old`).
  * Between the two renames the LIVE path is briefly absent: a crash in
  * that window leaves the only complete copy at `__old`, and a
  * subsequent maintenance fold or checkpoint replay that reads `path`
  * would otherwise rebuild from an empty table (ADVICE r13). Every
  * swap-site entry point calls [[restoreFromOld]] first, turning that
  * window from "recoverable by hand" into self-healing. */
object SwapDirs {

  /** If `live` is missing but `live__old` exists, rename it back into
    * place. Returns whether a restore happened. No-op (false) when the
    * live dir is present — a leftover `__old` beside a complete live
    * table is a crashed DELETE, cleaned up by the next swap. */
  def restoreFromOld(fs: FileSystem, live: Path): Boolean = {
    val old = new Path(live.toString + "__old")
    if (!fs.exists(live) && fs.exists(old)) {
      require(fs.rename(old, live),
        s"restore: rename $old -> $live failed; data intact at $old")
      true
    } else false
  }
}
