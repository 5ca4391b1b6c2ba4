package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string — the kernel of the
  * compression-ratio quality filter (CCNet/RefinedWeb-style): natural
  * text compresses to a characteristic fraction of its raw size, while
  * boilerplate/degenerate repetition compresses far below it and
  * random/encrypted noise barely compresses at all. ratio =
  * deflate_len / raw_len is a cheap, model-free proxy for the
  * perplexity gates production pipelines run.
  *
  * Deterministic: level-6 DEFLATE with the zlib default strategy on the
  * UTF-8 bytes — same output for the same input on any JVM (the format
  * is fully specified by RFC 1951 and the fixed level). DuckDB has no
  * deflate, so queries over this expression are declared-approximate
  * (rows-only) with a ScalaTest contract instead of a SQL oracle. */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def prettyName: String = "deflate_len"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.deflatedLength(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.DeflateLen.deflatedLength($s);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  def apply(text: Column): Column =
    Shim.toColumn(DeflateLen(Shim.toExpression(text)))

  /** Static kernel shared by eval and generated code. A fresh Deflater
    * per call keeps the expression thread-safe under whole-stage codegen;
    * the object is cheap relative to the compression itself. */
  def deflatedLength(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** Unicode NFC normalization — the canonical-composition pass every
  * text pipeline runs before hashing/dedup so that visually-identical
  * strings ("é" precomposed vs "e" + combining acute) fingerprint
  * identically. Spark ships no normalizer builtin; DuckDB's
  * `nfc_normalize` is the oracle twin. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.NfcNormalize.nfc($s);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  def apply(text: Column): Column =
    Shim.toColumn(NfcNormalize(Shim.toExpression(text)))

  /** Static kernel shared by eval and generated code. Fast path: NFC
    * normalization is the identity on ASCII (and `isNormalized` is a
    * cheap scan), so the common case allocates nothing. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
