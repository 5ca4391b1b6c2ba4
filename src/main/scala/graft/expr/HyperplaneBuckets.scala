package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** All random-hyperplane LSH bucket ids of a vector in one codegen pass.
  *
  * Input: array<double> vector. Output: array<int> of `numTables` bucket
  * ids, where table t's bucket is the `bitsPerTable`-bit sign sketch of the
  * vector against hyperplanes `t*bitsPerTable .. (t+1)*bitsPerTable-1` of
  * the driver-precomputed `planes` matrix (Charikar, STOC'02 sign-random-
  * projection).
  *
  * Replaces the composed-expression form `sketch(v, t) = Σ_j when(dot(v,
  * plane(j)) > 0, 1<<j)` where `plane(j)` was itself a per-row
  * `transform(sequence(...), xxhash64(...))` — i.e. the hyperplane matrix
  * was re-hashed from strings for EVERY row (48 planes × 64 dims × ~3
  * string ops each ≈ 9k expression evals/row, far outside whole-stage
  * codegen's comfort). Here the matrix is computed once on the driver
  * ([[graft.ext.Similarity.planeMatrix]] — same xxhash64-derived values,
  * so buckets are unchanged) and the row work is `numTables × bitsPerTable
  * × dim` fused multiply-adds in a tight generated loop.
  */
case class HyperplaneBuckets(
    child: Expression,
    planes: Array[Array[Double]],
    bitsPerTable: Int)
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length % bitsPerTable == 0,
    "planes count must be a positive multiple of bitsPerTable")

  private def numTables: Int = planes.length / bitsPerTable

  override def prettyName: String = "hyperplane_buckets"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](numTables)
    // dimension mismatch → every sketch bit 0 (fail-closed): a ragged
    // vector must land in a fixed bucket, not wherever a silently
    // truncated partial dot product happens to point
    if (v.numElements() == planes(0).length) {
      var t = 0
      while (t < numTables) {
        var bucket = 0
        var jj = 0
        while (jj < bitsPerTable) {
          val p = planes(t * bitsPerTable + jj)
          var dot = 0.0
          var i = 0
          while (i < p.length) { dot += v.getDouble(i) * p(i); i += 1 }
          if (dot > 0) bucket |= 1 << jj
          jj += 1
        }
        out(t) = bucket
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val jj = ctx.freshName("jj")
      val p = ctx.freshName("p")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val bucket = ctx.freshName("bucket")
      s"""
         |int[] $out = new int[$numTables];
         |if ($v.numElements() == $planesRef[0].length) {
         |  for (int $t = 0; $t < $numTables; $t++) {
         |    int $bucket = 0;
         |    for (int $jj = 0; $jj < $bitsPerTable; $jj++) {
         |      double[] $p = $planesRef[$t * $bitsPerTable + $jj];
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $p.length; $i++) {
         |        $dot += $v.getDouble($i) * $p[$i];
         |      }
         |      if ($dot > 0) $bucket |= 1 << $jj;
         |    }
         |    $out[$t] = $bucket;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  def apply(v: Column, planes: Array[Array[Double]], bitsPerTable: Int): Column =
    Shim.toColumn(
      HyperplaneBuckets(Shim.toExpression(v), planes, bitsPerTable))
}
