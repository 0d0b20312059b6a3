package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.GraftGlue
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge applied to a token sequence — the APPLY step of the
  * t29 trainer round ([[graft.SparkEntry]]): greedy LEFT-TO-RIGHT,
  * NON-OVERLAPPING replacement of every adjacent (left, right) pair by
  * its concatenation, the semantics every BPE implementation shares
  * ("a a a" under merge (a,a) → "aa a", never "a aa", and the freshly
  * merged token cannot participate again in the same round).
  *
  * The (left, right) pair changes per trainer round, so it rides the
  * expression as constructor parameters (a fresh expression per round
  * — the round count is a constant ~handful); the scan itself is one
  * primitive loop of UTF8String equality checks inside whole-stage
  * codegen. An `aggregate()` lambda fold would evaluate interpreted
  * per element AND fight the skip-two control flow; this is exactly
  * the "built-ins would interpret per-element lambdas" case the repo
  * convention reserves native expressions for.
  *
  * Null semantics match [[SignBuckets]]: a null ELEMENT nulls the
  * whole result.
  */
case class MergePair(child: Expression, left: String, right: String)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "merge_pair"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)
  @transient private lazy val lr = UTF8String.fromString(left + right)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      val cur = toks.getUTF8String(i)
      if (i + 1 < n && cur.equals(l) && {
            if (toks.isNullAt(i + 1)) return null
            toks.getUTF8String(i + 1).equals(r)
          }) {
        out.add(lr); i += 2
      } else {
        out.add(cur); i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val u8 = classOf[UTF8String].getName
      val lRef = ctx.addReferenceObj("mleft", l, u8)
      val rRef = ctx.addReferenceObj("mright", r, u8)
      val lrRef = ctx.addReferenceObj("mmerged", lr, u8)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val cur = ctx.freshName("cur"); val out = ctx.freshName("out")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $a.numElements();
         |java.util.ArrayList<$u8> $out = new java.util.ArrayList<$u8>($n);
         |int $i = 0;
         |while ($i < $n && !${ev.isNull}) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $u8 $cur = $a.getUTF8String($i);
         |  if ($i + 1 < $n && $cur.equals($lRef)) {
         |    if ($a.isNullAt($i + 1)) { ${ev.isNull} = true; break; }
         |    if ($a.getUTF8String($i + 1).equals($rRef)) {
         |      $out.add($lrRef); $i += 2; continue;
         |    }
         |  }
         |  $out.add($cur); $i += 1;
         |}
         |if (!${ev.isNull}) { ${ev.value} = new $gad($out.toArray()); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MergePairFunctions {
  def mergePair(tokens: Column, left: String, right: String): Column =
    GraftGlue.column(MergePair(GraftGlue.expression(tokens), left, right))
}
