package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftglue.GraftGlue
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's deterministic 52-bit uniform draw, fused:
  *
  *   md5_draw52(s) = the first 13 hex digits of md5(s) as a long
  *                 = conv(substring(md5(s), 1, 13), 16, 10) :: long
  *
  * BIT-IDENTICAL to the built-in chain (the first 13 hex digits are the
  * big-endian nibbles of the digest's first 6½ bytes), which is exactly
  * how every oracle recomputes it — q91's Poisson bootstrap and c14's
  * weighted sampler keep their DuckDB SQL unchanged.
  *
  * Why an Expression (guide §1.2 step 2, per-task work): the built-in
  * chain materializes a 32-char hex UTF8String per row (md5), slices it
  * (substring), and runs a radix-16 string parse plus a decimal-string
  * render (conv) — three codegen'd but allocation-heavy steps that cost
  * ~4.3 s of q91's 5.8 s at sf0.1 (measured: explode-only 0.77 s,
  * +md5 3.31 s, +conv 5.06 s). Here one digest over the raw UTF-8 bytes
  * feeds seven shift-or's; no hex string, no parse. MessageDigest reuse
  * follows the [[LinearScore]] discipline: ThreadLocal on the
  * interpreted path, per-generated-class mutable state under codegen.
  */
case class Md5Draw52(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "md5_draw52"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val md = LinearScore.localMd.get()
    md.reset()
    Md5Draw52.pack52(md.digest(input.asInstanceOf[UTF8String].getBytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val digest = ctx.addMutableState("java.security.MessageDigest", "md5",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) {
                |  throw new RuntimeException(e); }""".stripMargin)
      val h = ctx.freshName("h")
      s"""
         |$digest.reset();
         |byte[] $h = $digest.digest($s.getBytes());
         |${ev.value} = (($h[0] & 0xFFL) << 44) | (($h[1] & 0xFFL) << 36)
         |  | (($h[2] & 0xFFL) << 28) | (($h[3] & 0xFFL) << 20)
         |  | (($h[4] & 0xFFL) << 12) | (($h[5] & 0xFFL) << 4)
         |  | (($h[6] & 0xF0L) >>> 4);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Draw52 {
  /** First 52 bits of a digest, big-endian — the 13 leading hex digits
    * read as one radix-16 number (what `conv(…, 16, 10)` parses). */
  private[plans] def pack52(h: Array[Byte]): Long =
    ((h(0) & 0xFFL) << 44) | ((h(1) & 0xFFL) << 36) |
    ((h(2) & 0xFFL) << 28) | ((h(3) & 0xFFL) << 20) |
    ((h(4) & 0xFFL) << 12) | ((h(5) & 0xFFL) << 4) |
    ((h(6) & 0xF0L) >>> 4)

  def md5Draw52(s: Column): Column =
    GraftGlue.column(Md5Draw52(GraftGlue.expression(s)))
}
