package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.GraftGlue
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** |A ∩ B| for two string arrays that are each SORTED ASCENDING (the
  * binary UTF8String order `sort_array` uses) with DISTINCT elements —
  * a two-pointer merge in O(|A|+|B|) comparisons that allocates
  * nothing.
  *
  * Why an Expression (guide §1.2 step 2, per-task work): the verify
  * stage of every prefix-filter Jaccard join computes
  * `size(array_intersect(a, b))` per CANDIDATE pair — `array_intersect`
  * builds a hash set over one side plus the materialized intersection
  * ARRAY per call, which the `size` immediately throws away. On the
  * dedup family the verify stage is the measured local bottleneck
  * (OPTIMIZATION_r15.md), so the constant factor per candidate matters.
  * The arrays are already canonically sorted (the prefix index needs a
  * total order anyway), so the count needs no hashing and no output
  * buffer.
  *
  * Contract: both inputs sorted ascending + distinct, else the count
  * is meaningless (the callers' arrays come from `sort_array` /
  * canonically sorted doc arrays — TextDedupSpec pins equality with
  * `size(array_intersect)` on exactly those shapes). Null ELEMENTS
  * sort first under `sort_array(asc)`; a null element present in both
  * arrays counts once, matching `array_intersect`'s null semantics.
  * A null ARRAY on either side nulls the result.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<string>, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val (nx, ny) = (xs.numElements(), ys.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xn = xs.isNullAt(i); val yn = ys.isNullAt(j)
      if (xn && yn) { c += 1; i += 1; j += 1 }
      else if (xn) i += 1 // null sorts first
      else if (yn) j += 1
      else {
        val cmp = xs.getUTF8String(i).compareTo(ys.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val xn = ctx.freshName("xn"); val yn = ctx.freshName("yn")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  boolean $xn = $a.isNullAt($i);
         |  boolean $yn = $b.isNullAt($j);
         |  if ($xn && $yn) { $c++; $i++; $j++; }
         |  else if ($xn) { $i++; }
         |  else if ($yn) { $j++; }
         |  else {
         |    int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |    if ($cmp == 0) { $c++; $i++; $j++; }
         |    else if ($cmp < 0) { $i++; }
         |    else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectFunctions {
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftGlue.column(SortedIntersectCount(
      GraftGlue.expression(a), GraftGlue.expression(b)))
}
