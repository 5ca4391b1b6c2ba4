package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Stateful, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Time-ordered unique id ("timeuuid") generation.
  *
  * The reference generates a v1 (time-ordered) UUID per activity as the
  * sink's clustering key (reference: strategy.py:36,64,93,124;
  * cassandra-init.cql:8,15). Spark has no v1-UUID builtin — `uuid()` is v4
  * and not time-ordered. We provide:
  *
  *   1. [[TimeUuidExpr]] — a stateful, nondeterministic Catalyst expression:
  *      `<ts_ms hex, 12 chars>-<partition hex, 6>-<counter hex, 10>`.
  *      Lexicographic order == (event-time, partition, arrival) order, so a
  *      string sort on the id reproduces the reference's TIMEUUID clustering
  *      order. Unique across partitions (partition id is embedded) and within
  *      a partition (counter), with zero coordination — this is what scales
  *      to 1000 executors: no global sequence, no shuffle.
  *
  *   2. [[TimeUuid.composed]] — a builtins-only fallback
  *      (`hex(ts) || uuid()`), usable where a plain Column pipeline is
  *      preferred.
  *
  * Determinism note (SURVEY.md §7.4): oracle-checked queries exclude the
  * generated id from hashed output and sort by (event_timestamp, source pk).
  */
case class TimeUuidExpr(child: Expression)
    extends UnaryExpression with Stateful with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "timeuuid"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"timeuuid expects a LONG epoch-millis child, got ${child.dataType}")
    }
  }

  @transient private[this] var partitionId: Int = _
  @transient private[this] var counter: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    partitionId = partitionIndex
    counter = 0L
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      counter += 1
      UTF8String.fromString(
        f"${v.asInstanceOf[Long]}%012x-$partitionId%06x-$counter%010x")
    }
  }

  override def freshCopy(): TimeUuidExpr = TimeUuidExpr(child)

  override protected def withNewChildInternal(newChild: Expression): TimeUuidExpr =
    copy(child = newChild)
}

object TimeUuid {

  /** Column API for [[TimeUuidExpr]]: `timeuuid($"__source_ts_ms")`. */
  def timeuuid(tsMillis: Column): Column =
    Column(TimeUuidExpr(expression(tsMillis)))

  /** Builtins-only variant: 12 hex chars of the millis timestamp followed by
    * a random v4 UUID. Lexicographic = chronological; uniqueness from the
    * UUID. (SURVEY.md §2.7 X1 option (b)-lite.) */
  def composed(tsMillis: Column): Column =
    concat(lpad(hex(tsMillis), 12, "0"), lit("-"), expr("uuid()"))

  private def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
