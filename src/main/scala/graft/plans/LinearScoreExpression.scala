package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.GraftGlue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** ======== LINEAR SCORE CONTRACT ========
  * Frozen hashed-feature linear-classifier inference — the model-based
  * quality-filter stage of an LLM data pipeline (a fastText-style
  * scorer applied at corpus scale). For a token sequence t_0..t_{n-1}
  * the feature stream is every unigram t_i plus every adjacent bigram
  * `t_i ++ "_" ++ t_{i+1}` (with multiplicity), and
  *
  *   score = Σ_f  w[ h(f) ]
  *   h(f)  = first 12 bits of md5(utf8(f)) = (b0 & 0xFF) << 4 | (b1 >>> 4) & 0xF
  *           (equivalently: the first 3 hex digits of the md5 string)
  *   w[j]  = (j * 2654435761) mod 17 - 8        (j in [0, 4096))
  *
  * Every quantity is integer-exact, so an oracle can recompute the
  * score from the md5 HEX STRING via substr/ascii arithmetic — a
  * different route to the same 12 bits than this expression's direct
  * byte-nibble extraction (the md5 implementations must agree, the
  * index derivations are independent).
  *
  * Why an Expression and not array lambdas: transform/zip_with/
  * aggregate evaluate their lambda per element interpreted (no
  * whole-stage codegen), and the bigram+hash+lookup chain would build
  * per-element strings. Here the weight table rides along once as a
  * referenced object (ctx.addReferenceObj — never a 4096-literal
  * tree), the digest is a reused mutable instance, and bigrams are
  * hashed by feeding `token, '_', next token` into the digest without
  * materializing the concatenation. Per-row cost is one tight loop; a
  * plan containing it stays inside WholeStageCodegen.
  *
  * At 100 TB this is the ideal operator shape: a pure projection — no
  * shuffle, no state, the "model" broadcast once inside the task
  * closure. Null semantics match [[SignBuckets]]: a null ELEMENT makes
  * the whole result NULL (one malformed row degrades, never NPEs).
  */
case class LinearScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "linear_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    // ThreadLocal, not an instance field: the same expression instance can
    // be evaluated concurrently (driver-side local eval, interpreted
    // fallback with subexpression reuse), and MessageDigest is stateful —
    // sharing one would silently corrupt scores. The codegen path holds a
    // per-generated-class mutable instance, which is inherently per-task.
    val md = LinearScore.localMd.get()
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val w = LinearScore.weights
    var score = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      val cur = toks.getUTF8String(i).getBytes
      md.reset()
      md.update(cur)
      val h1 = md.digest()
      score += w(LinearScore.idx12(h1))
      if (i + 1 < n) {
        if (toks.isNullAt(i + 1)) return null
        md.reset()
        md.update(cur)
        md.update('_'.toByte)
        md.update(toks.getUTF8String(i + 1).getBytes)
        val h2 = md.digest()
        score += w(LinearScore.idx12(h2))
      }
      i += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("weights", LinearScore.weights, "long[]")
      val digest = ctx.addMutableState("java.security.MessageDigest", "md5",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) {
                |  throw new RuntimeException(e); }""".stripMargin)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val cur = ctx.freshName("cur"); val h = ctx.freshName("h")
      val score = ctx.freshName("score")
      s"""
         |int $n = $a.numElements();
         |long $score = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  byte[] $cur = $a.getUTF8String($i).getBytes();
         |  $digest.reset();
         |  $digest.update($cur);
         |  byte[] $h = $digest.digest();
         |  $score += $w[(($h[0] & 0xFF) << 4) | (($h[1] >> 4) & 0xF)];
         |  if ($i + 1 < $n) {
         |    if ($a.isNullAt($i + 1)) { ${ev.isNull} = true; break; }
         |    $digest.reset();
         |    $digest.update($cur);
         |    $digest.update((byte) '_');
         |    $digest.update($a.getUTF8String($i + 1).getBytes());
         |    $h = $digest.digest();
         |    $score += $w[(($h[0] & 0xFF) << 4) | (($h[1] >> 4) & 0xF)];
         |  }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $score; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LinearScore {
  /** The frozen "model": w[j] = (j * 2654435761) mod 17 - 8. A trained
    * model would load real weights here; everything downstream —
    * table-in-closure shipping, codegen lookup, the oracle's modular
    * re-derivation — is the production plumbing. */
  val weights: Array[Long] =
    Array.tabulate(4096)(j => (j.toLong * 2654435761L) % 17L - 8L)

  /** Per-thread digest for the interpreted path (see nullSafeEval). */
  private[plans] val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 12 bits of an md5 digest (the 3 leading hex digits). */
  private[plans] def idx12(h: Array[Byte]): Int =
    ((h(0) & 0xFF) << 4) | ((h(1) >> 4) & 0xF)

  /** Σ unigram+bigram hashed-feature weights over a token array. */
  def linearScore(tokens: Column): Column =
    GraftGlue.column(LinearScore(GraftGlue.expression(tokens)))
}
