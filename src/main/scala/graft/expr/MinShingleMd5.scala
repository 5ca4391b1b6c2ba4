package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Lexicographic-min md5 hex digest over the word n-gram shingles of a
  * token array, fused into one pass.
  *
  * Semantics: shingle i = tokens[i..i+n-1] joined by a single space; the
  * result is `min(md5_hex(shingle_i))`, or null when the array has fewer
  * than n tokens — byte-identical to the composed form
  * `MinMd5(shingles(tokens, n))` and to DuckDB's
  * `list_aggregate(list_transform(sh, s -> md5(s)), 'min')` over distinct
  * shingles (the min over duplicates equals the min over the distinct set,
  * so the shingle-dedup step is dropped entirely).
  *
  * Why fused: the composed form materializes the shingle-string array
  * (one concat_ws + slice allocation per shingle), runs an O(s²)-ish
  * `array_distinct` over it, then re-reads it to hash — and
  * `DigestUtils.md5Hex` constructs a fresh MessageDigest (provider lookup
  * included) per shingle. Here the digest instance is reused across the
  * whole partition, shingle bytes are streamed into it without building a
  * Java String, digests are compared as 16 raw bytes (unsigned — hex order
  * equals byte order), and only the final winner is hex-encoded. */
case class MinShingleMd5(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def prettyName: String = "min_shingle_md5"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  @transient private lazy val md: MessageDigest =
    MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val out = MinShingleMd5.minDigest(toks, n, md)
    if (out == null) null else MinShingleMd5.hexUtf8(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdVar = ctx.addMutableState("java.security.MessageDigest", "minShMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, toks => {
      val min = ctx.freshName("minDigest")
      s"""
         |byte[] $min = graft.expr.MinShingleMd5.minDigest($toks, $n, $mdVar);
         |if ($min == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expr.MinShingleMd5.hexUtf8($min);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinShingleMd5 =
    copy(child = newChild)
}

object MinShingleMd5 {

  def apply(tokens: Column, n: Int): Column =
    Shim.toColumn(MinShingleMd5(Shim.toExpression(tokens), n))

  private val SPACE = Array[Byte](' ')

  /** Min (unsigned-lexicographic) md5 digest over all n-gram shingles, or
    * null when there are fewer than n tokens. Static so generated code can
    * call it directly; `md` is reused across rows by the caller. */
  def minDigest(tokens: ArrayData, n: Int, md: MessageDigest): Array[Byte] = {
    val len = tokens.numElements()
    if (len < n) return null
    var min: Array[Byte] = null
    var i = 0
    while (i <= len - n) {
      md.reset()
      // concat_ws semantics: null tokens contribute neither bytes nor separator
      var j = 0
      var first = true
      while (j < n) {
        if (!tokens.isNullAt(i + j)) {
          if (!first) md.update(SPACE)
          md.update(tokens.getUTF8String(i + j).getBytes)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      if (min == null || unsignedLess(d, min)) min = d
      i += 1
    }
    min
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var k = 0
    while (k < a.length && k < b.length) {
      val cmp = (a(k) & 0xff) - (b(k) & 0xff)
      if (cmp != 0) return cmp < 0
      k += 1
    }
    a.length < b.length
  }

  private val HEX = "0123456789abcdef".toCharArray

  def hexUtf8(digest: Array[Byte]): UTF8String = {
    val out = new Array[Byte](digest.length * 2)
    var k = 0
    while (k < digest.length) {
      out(2 * k) = HEX((digest(k) >> 4) & 0xf).toByte
      out(2 * k + 1) = HEX(digest(k) & 0xf).toByte
      k += 1
    }
    UTF8String.fromBytes(out)
  }
}
