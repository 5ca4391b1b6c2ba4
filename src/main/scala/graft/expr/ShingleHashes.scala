package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Distinct xxhash64 values of the word n-gram shingles of a token array,
  * fused into one pass — the set-signature input for MinHash/Jaccard
  * near-dup detection.
  *
  * Semantics: shingle i = tokens[i..i+n-1] joined by a single space
  * (null tokens contribute neither bytes nor separator, matching
  * `concat_ws`); the result is the ascending-sorted distinct xxhash64
  * (seed 42, Spark's convention) of each shingle's UTF-8 bytes. Jaccard
  * similarity over these hash sets equals Jaccard over the string shingle
  * sets except on 64-bit collisions (probability ~s²·2⁻⁶⁴ per pair —
  * immaterial at any realistic corpus size).
  *
  * Why fused: the composed form (`array_distinct(transform(sequence(...),
  * i -> concat_ws(' ', slice(tokens, i, n))))` then `transform(sh,
  * xxhash64)`) materializes every shingle as a UTF8String through three
  * higher-order functions — measured ~13 µs per shingle, the near-dup
  * pipeline's entire bottleneck. Here each shingle's bytes are written
  * into a reusable buffer and hashed in place; nothing survives but the
  * long[] of distinct hashes. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleHashes.distinctHashes(input.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expr.ShingleHashes.distinctHashes($toks, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  def apply(tokens: Column, n: Int): Column =
    Shim.toColumn(ShingleHashes(Shim.toExpression(tokens), n))

  /** Spark's xxhash64 seed. */
  private val SEED = 42L

  /** Ascending-sorted distinct shingle hashes; empty when len < n.
    * Static so generated code calls it directly. */
  def distinctHashes(tokens: ArrayData, n: Int): Array[Long] = {
    val len = tokens.numElements()
    if (len < n) return Array.emptyLongArray
    val raw = new Array[Long](len - n + 1)
    var buf = new Array[Byte](256)
    var i = 0
    while (i <= len - n) {
      var pos = 0
      var j = 0
      var first = true
      while (j < n) {
        if (!tokens.isNullAt(i + j)) {
          val b = tokens.getUTF8String(i + j).getBytes
          val need = pos + b.length + 1
          if (need > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          if (!first) { buf(pos) = ' '; pos += 1 }
          System.arraycopy(b, 0, buf, pos, b.length)
          pos += b.length
          first = false
        }
        j += 1
      }
      raw(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, pos, SEED)
      i += 1
    }
    java.util.Arrays.sort(raw)
    // dedupe in place on the sorted array
    var out = 1
    var k = 1
    while (k < raw.length) {
      if (raw(k) != raw(k - 1)) { raw(out) = raw(k); out += 1 }
      k += 1
    }
    if (out == raw.length) raw else java.util.Arrays.copyOf(raw, out)
  }
}
