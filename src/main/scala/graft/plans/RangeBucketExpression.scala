package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftglue.GraftGlue
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Quantile-rank bucketization: bucket(v) = #{ boundaries b : b < v } —
  * the upper-bound binary search over a sorted cut array. This is the
  * skew-proof normalization for the Z-order layout
  * ([[graft.sources.Bucketing.zorderWriteQuantile]]): linear (min, max)
  * scaling collapses a heavy-tailed key's mass into a handful of codes
  * (most of the 16-bit range maps to empty value space), while quantile
  * ranks give each code ~equal row mass by construction — the same
  * range-ID normalization Delta's OPTIMIZE ZORDER applies before
  * interleaving.
  *
  * The boundary array rides on the expression via `addReferenceObj`
  * (SignBuckets discipline — never a 255-element `lit()` tree), and the
  * binary search is branch-light primitive code inside whole-stage
  * codegen. Ties: values equal to a boundary land in the LOWER bucket
  * (strict `<` count), the convention both eval paths and the Scaladoc
  * state — deterministic for any input.
  */
case class RangeBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "range_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects double, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RangeBucket.search(boundaries, input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bs = ctx.addReferenceObj("boundaries", boundaries, "double[]")
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0, $hi = $bs.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($bs[$mid] < $v) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = $lo;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RangeBucket {
  /** Interpreted twin of the codegen binary search (upper bound on
    * strict `<`). */
  def search(bs: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = bs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bs(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def rangeBucket(c: Column, boundaries: Array[Double]): Column =
    GraftGlue.column(RangeBucket(GraftGlue.expression(c), boundaries))
}
