package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** [[ShingleHashes]] with the PORTABLE (md5-derived) element hash:
  * distinct values of the first 8 bytes (big-endian long) of
  * `md5(shingle)` over the word n-gram shingles of a token array, fused
  * into one pass.
  *
  * This is bit-identical to [[graft.ext.Dedup.portableTokenHash]]
  * applied to each shingle string (`(hi32 << 32) | lo32` of the first
  * 16 md5 hex chars ≡ the digest's first 8 bytes big-endian), and to
  * DuckDB's `CAST('0x'||substring(md5(g),1,8) AS UBIGINT)*2^32 +
  * CAST('0x'||substring(md5(g),9,8) AS UBIGINT)` — which is what lets
  * the persisted dedup index carry a full cross-engine oracle.
  *
  * Why fused (same rationale as [[ShingleHashes]]): the composed
  * `transform(array_distinct(transform(sequence(...), concat_ws)),
  * md5→conv→shift)` form runs three interpreted higher-order functions
  * and materializes every shingle string plus its hex digest — measured
  * ~18× slower than this single generated call at bench scale. Here
  * each shingle's bytes go into a reusable buffer, one MD5 (thread-local
  * digest instance) runs in place, and only the long[] of distinct
  * hashes survives. */
case class PortableShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def prettyName: String = "portable_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      PortableShingleHashes.distinctHashes(input.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expr.PortableShingleHashes.distinctHashes($toks, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PortableShingleHashes =
    copy(child = newChild)
}

object PortableShingleHashes {

  def apply(tokens: Column, n: Int): Column =
    Shim.toColumn(PortableShingleHashes(Shim.toExpression(tokens), n))

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Ascending-sorted distinct portable shingle hashes; empty when
    * len < n. Static so generated code calls it directly. */
  def distinctHashes(tokens: ArrayData, n: Int): Array[Long] = {
    val len = tokens.numElements()
    if (len < n) return Array.emptyLongArray
    val raw = new Array[Long](len - n + 1)
    val dg = md5.get()
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
      dg.reset()
      dg.update(buf, 0, pos)
      val d = dg.digest()
      // first 8 digest bytes, big-endian — ≡ the md5-hex (hi32<<32)|lo32
      raw(i) =
        ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
          ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
          ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
          ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
      i += 1
    }
    java.util.Arrays.sort(raw)
    var out = 1
    var k = 1
    while (k < raw.length) {
      if (raw(k) != raw(k - 1)) { raw(out) = raw(k); out += 1 }
      k += 1
    }
    if (out == raw.length) raw else java.util.Arrays.copyOf(raw, out)
  }
}
