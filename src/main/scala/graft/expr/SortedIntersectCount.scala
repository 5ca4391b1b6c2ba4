package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |a ∩ b| for two ASCENDING-SORTED distinct long arrays (the shape
  * [[ShingleHashes]] emits) as a single merge pass — O(|a|+|b|), zero
  * allocation, codegen'd.
  *
  * The built-in pair `size(array_intersect(a, b))` /
  * `size(array_union(a, b))` that the near-dup verify joins previously
  * used builds two hash sets and materializes two result ARRAYS per row
  * just to take their sizes; across hundreds of thousands of candidate
  * pairs that is the dominant verify cost. With this expression the
  * verify needs only the intersect count: Jaccard = |∩| / (|a|+|b|−|∩|)
  * and containment = |∩| / |a| follow from the (already known) input
  * sizes by inclusion–exclusion on DISTINCT sets.
  *
  * Both inputs MUST be sorted ascending and duplicate-free — guaranteed
  * by [[ShingleHashes]]; the result is undefined otherwise (exactly the
  * contract a merge join makes). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<bigint>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.merge(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.SortedIntersectCount.merge($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  def apply(a: Column, b: Column): Column =
    Shim.toColumn(SortedIntersectCount(Shim.toExpression(a), Shim.toExpression(b)))

  /** Static merge kernel, shared by eval and generated code. */
  def merge(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}
