package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-ordered unique id ("timeuuid") generation.
  *
  * The reference generates a v1 (time-ordered) UUID per activity as the
  * sink's clustering key (reference: strategy.py:36,64,93,124;
  * cassandra-init.cql:8,15). Spark has no v1-UUID builtin — `uuid()` is v4
  * and not time-ordered — so we compose one from builtins:
  * 12 lowercase-hex chars of the event's epoch-millis followed by a random
  * v4 UUID. Lexicographic order == chronological order (the only semantics
  * the reference's TIMEUUID clustering key actually relies on); uniqueness
  * comes from the UUID tail. Zero coordination — no global sequence, no
  * shuffle — so it scales to any executor count.
  *
  * Determinism note (SURVEY.md §7.4): oracle-checked queries exclude the
  * generated id from hashed output and sort by (event_timestamp, source pk).
  */
object TimeUuid {

  /** `timeuuid($"__source_ts_ms")` — time-prefixed unique id.
    * `lower(hex(...))` keeps one collation-compatible format: lowercase hex
    * sorts consistently against the lowercase-hex v4 uuid() tail. */
  def timeuuid(tsMillis: Column): Column =
    concat(lower(lpad(hex(tsMillis), 12, "0")), lit("-"), expr("uuid()"))

  /** Alias kept for call-site compatibility. */
  def composed(tsMillis: Column): Column = timeuuid(tsMillis)
}
