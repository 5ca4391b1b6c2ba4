package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** One-pass product-quantization encoder: for an int8-as-double vector of
  * `m·subDim` dims and a FLAT codebook literal, emit the `m` nearest-
  * codeword ids (one per subspace) as array<long>.
  *
  * Codebook layout (built by [[graft.ext.Pq.codes]] from a bounded ≤
  * m·256-row collect — the codebook is a model artifact, exactly like
  * [[graft.ext.Lm.nanoModel]]'s vocab): per subspace j ascending, per
  * codeword ascending cw_id, 2 + subDim doubles each —
  * `[cw_id, cwdot, cw_0 … cw_{subDim−1}]`. cw_id rides as a double
  * (exact ≤ 2⁵³); C is derived from the literal's length.
  *
  * Argmin contract (must match the DuckDB oracle's
  * `ORDER BY ‖s‖²−2·s·cw+cwdot, cw_id`): ‖s‖² is constant within a
  * (vector, subspace), so ranking by `cwdot − 2·s·cw` is identical; all
  * quantities are sub-2⁵³ integers in doubles → EXACT, and the strict `<`
  * scan over ascending cw_id keeps the lowest id on ties.
  *
  * Replaces an N·m×C join+groupBy (4M wide intermediate rows at bench
  * scale) with one codegen loop per vector — no shuffle, no explode until
  * the final skinny (vec_id, j, code) projection. */
case class PqEncodeAll(
    left: Expression,
    right: Expression,
    m: Int = 8,
    subDim: Int = 8)
    extends BinaryExpression {

  private val rec = 2 + subDim // doubles per codeword record

  override def prettyName: String = "pq_encode_all"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    // fail-closed on ragged vectors (the HyperplaneBuckets rule): a
    // short/corrupt row gets sentinel codes that match NO codeword, so
    // it drops out of ADC joins instead of encoding from garbage reads
    if (v.numElements() != m * subDim)
      return new GenericArrayData(Array.fill(m)(-1L))
    val c = cb.numElements() / (m * rec)
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var best = 0.0
      var bestId = -1L
      var ci = 0
      while (ci < c) {
        val base = (j * c + ci) * rec
        var dot = 0.0
        var d = 0
        while (d < subDim) {
          dot += v.getDouble(j * subDim + d) * cb.getDouble(base + 2 + d)
          d += 1
        }
        val score = cb.getDouble(base + 1) - 2.0 * dot
        if (bestId < 0 || score < best) {
          best = score; bestId = cb.getDouble(base).toLong
        }
        ci += 1
      }
      out(j) = bestId
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val ci = ctx.freshName("ci")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      s"""
         |int $c = $b.numElements() / ${m * rec};
         |long[] $out = new long[$m];
         |if ($a.numElements() != ${m * subDim}) {
         |  java.util.Arrays.fill($out, -1L); // ragged vector: fail closed
         |} else {
         |for (int $j = 0; $j < $m; $j++) {
         |  double $best = 0.0; long $bestId = -1L;
         |  for (int $ci = 0; $ci < $c; $ci++) {
         |    int $base = ($j * $c + $ci) * $rec;
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      $dot += $a.getDouble($j * $subDim + $d) * $b.getDouble($base + 2 + $d);
         |    }
         |    double $score = $b.getDouble($base + 1) - 2.0 * $dot;
         |    if ($bestId < 0L || $score < $best) {
         |      $best = $score; $bestId = (long) $b.getDouble($base);
         |    }
         |  }
         |  $out[$j] = $bestId;
         |}
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeAll =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  def encodeAll(v: Column, codebook: Column, m: Int = 8, subDim: Int = 8): Column =
    Shim.toColumn(
      PqEncodeAll(Shim.toExpression(v), Shim.toExpression(codebook), m, subDim))
}
