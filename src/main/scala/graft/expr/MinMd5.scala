package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Lexicographic minimum of the element-wise md5 hex digests — the
  * min-shingle fingerprint, in one pass. Replaces
  * `array_min(transform(sh, md5))`, which materializes a full md5-string
  * array per row before reducing it. Hex strings are lowercase (same
  * commons-codec digest Spark's `md5` uses), so results are byte-identical
  * to the composed form and to DuckDB's
  * `list_aggregate(list_transform(sh, s -> md5(s)), 'min')`. */
case class MinMd5(child: Expression) extends UnaryExpression {

  override def prettyName: String = "min_md5"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var min: String = null
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val hex = org.apache.commons.codec.digest.DigestUtils
          .md5Hex(arr.getUTF8String(i).getBytes)
        if (min == null || hex.compareTo(min) < 0) min = hex
      }
      i += 1
    }
    if (min == null) null else UTF8String.fromString(min)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val min = ctx.freshName("min")
      val hex = ctx.freshName("hex")
      s"""
         |int $n = $arr.numElements();
         |java.lang.String $min = null;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    java.lang.String $hex = org.apache.commons.codec.digest.DigestUtils
         |      .md5Hex($arr.getUTF8String($i).getBytes());
         |    if ($min == null || $hex.compareTo($min) < 0) { $min = $hex; }
         |  }
         |}
         |if ($min == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($min);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinMd5 =
    copy(child = newChild)
}

object MinMd5 {
  def apply(strings: Column): Column =
    Shim.toColumn(MinMd5(Shim.toExpression(strings)))
}
