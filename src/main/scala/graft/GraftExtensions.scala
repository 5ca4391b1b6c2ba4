package graft

import graft.expr.{CosineSim, DeflateLen, DotProduct, MinHashSignature, MinMd5, MinShingleMd5, NfcNormalize, SimHash64, SimHashBits, SortedIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT cosine_sim(a, b)")`
  * works anywhere the extension is installed:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *     // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, clazz: Class[_])(
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder))

    register("cosine_sim", classOf[CosineSim])(c => CosineSim(c(0), c(1)))
    register("dot_product", classOf[DotProduct])(c => DotProduct(c(0), c(1)))
    register("min_md5", classOf[MinMd5])(c => MinMd5(c(0)))
    register("min_shingle_md5", classOf[MinShingleMd5])(c =>
      MinShingleMd5(c(0), litInt(c(1), "min_shingle_md5 shingle size")))
    register("minhash_signature", classOf[MinHashSignature])(c =>
      MinHashSignature(c(0), litInt(c(1), "minhash_signature num hashes")))
    register("simhash_bits", classOf[SimHashBits])(c => SimHashBits(c(0)))
    register("simhash64", classOf[SimHash64])(c => SimHash64(c(0)))
    register("sorted_intersect_count", classOf[SortedIntersectCount])(c =>
      SortedIntersectCount(c(0), c(1)))
    register("deflate_len", classOf[DeflateLen])(c => DeflateLen(c(0)))
    register("nfc_normalize", classOf[NfcNormalize])(c => NfcNormalize(c(0)))

    // tier-(c) plan rewrite: pure interval joins → bucketed equi-joins
    // (Spark's only native plan for an equality-free join is a
    // BroadcastNestedLoopJoin)
    ext.injectOptimizerRule(_ => graft.plans.IntervalJoinRewrite)
  }
}
