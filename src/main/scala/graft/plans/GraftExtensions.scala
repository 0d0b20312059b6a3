package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector: makes the engine's native
  * expressions available to ANY session (including pure-SQL users) via
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * This is the supported extension point — no session-state mutation
  * needed, functions resolve in spark.sql() and DataFrame selectExpr.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float arrays"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k, seed) - k-hash MinHash signature"),
      (es: Seq[Expression]) => {
        def lit(e: Expression): Long = e.eval(null) match {
          case i: Int => i.toLong
          case l: Long => l
          case other => throw new IllegalArgumentException(
            s"minhash_sig k/seed must be integer literals, got $other")
        }
        val k = if (es.length > 1) lit(es(1)).toInt else 32
        val seed = if (es.length > 2) lit(es(2)) else 42L
        MinHashSignature(es.head, k, seed)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_shingle_sig"),
      info("minhash_shingle_sig",
        "minhash_shingle_sig(tokens, n, k, seed) - MinHash signature over " +
          "n-token shingles, fused (no shingle strings materialized)"),
      (es: Seq[Expression]) => {
        def lit(e: Expression): Long = e.eval(null) match {
          case i: Int => i.toLong
          case l: Long => l
          case other => throw new IllegalArgumentException(
            s"minhash_shingle_sig n/k/seed must be integer literals, got $other")
        }
        val n = if (es.length > 1) lit(es(1)).toInt else 3
        val k = if (es.length > 2) lit(es(2)).toInt else 32
        val seed = if (es.length > 3) lit(es(3)) else 42L
        MinHashShingleSignature(es.head, n, k, seed)
      }))
    ext.injectFunction((
      FunctionIdentifier("int_dot_product"),
      info("int_dot_product",
        "int_dot_product(a, b) - exact int64 dot product of two int arrays"),
      (es: Seq[Expression]) => IntDotProduct(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("quantize_vector"),
      info("quantize_vector",
        "quantize_vector(v, scales) - int8 codes per the quantization " +
          "contract; scales must be a foldable double-array literal"),
      (es: Seq[Expression]) => {
        val scales = es(1).eval(null) match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toDoubleArray()
          case other => throw new IllegalArgumentException(
            s"quantize_vector scales must be an array literal, got $other")
        }
        QuantizeVector(es.head, scales)
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(s) - Unicode canonical composition (NFC)"),
      (es: Seq[Expression]) => NfcNormalize(es.head)))
    ext.injectFunction((
      FunctionIdentifier("strip_accents"),
      info("strip_accents",
        "strip_accents(s) - NFD-decompose and drop combining marks"),
      (es: Seq[Expression]) => StripAccents(es.head)))
    ext.injectFunction((
      FunctionIdentifier("range_bucket"),
      info("range_bucket",
        "range_bucket(v, boundaries) - quantile-rank bucket: count of " +
          "boundaries strictly below v; boundaries must be a foldable " +
          "double-array literal"),
      (es: Seq[Expression]) => {
        val bs = es(1).eval(null) match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toDoubleArray()
          case other => throw new IllegalArgumentException(
            s"range_bucket boundaries must be an array literal, got $other")
        }
        RangeBucket(es.head, bs)
      }))
    ext.injectFunction((
      FunctionIdentifier("zorder2"),
      info("zorder2",
        "zorder2(x, y) - 64-bit Morton interleave of two integer keys " +
          "(bit 2i = x bit i, bit 2i+1 = y bit i; inputs mod 2^32)"),
      (es: Seq[Expression]) => ZOrder2(es.head, es(1))))
  }
}
