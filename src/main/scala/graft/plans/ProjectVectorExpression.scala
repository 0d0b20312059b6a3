package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.GraftGlue
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Dense random projection of one vector: element i of the result is
  * v · planes[i] — the Johnson–Lindenstrauss map that compresses a
  * d-dim embedding to k dims while approximately preserving angles
  * (public literature: JL lemma; Achlioptas'01 for the seeded
  * sign/Gaussian variants). Same design rules as [[SignBuckets]]: the
  * k×d plane matrix rides along as a referenced object
  * (ctx.addReferenceObj) — never as thousands of float literals in the
  * expression tree — the generated code is a fixed nested loop with no
  * boxing, and a null ELEMENT nulls the whole result (one malformed row
  * degrades, never NPEs). Accumulation in double, emitted as float:
  * both eval paths do exactly the same arithmetic
  * (VectorExpressionsSpec discipline: codegen ≡ interpreted).
  */
case class ProjectVector(child: Expression, planes: Array[Array[Float]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "project_vector"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if planes.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure("planes must be non-empty")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Float](planes.length)
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      val n = math.min(v.numElements(), p.length)
      var dot = 0.0
      var j = 0
      while (j < n) {
        if (v.isNullAt(j)) return null
        dot += v.getFloat(j).toDouble * p(j)
        j += 1
      }
      out(i) = dot.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", planes, "float[][]")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val p = ctx.freshName("p")
      val dot = ctx.freshName("dot"); val n = ctx.freshName("n")
      val gad = classOf[GenericArrayData].getName
      val k = planes.length
      s"""
         |float[] $out = new float[$k];
         |for (int $i = 0; $i < $k && !${ev.isNull}; $i++) {
         |  float[] $p = $pl[$i];
         |  int $n = Math.min($a.numElements(), $p.length);
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    $dot += (double) $a.getFloat($j) * (double) $p[$j];
         |  }
         |  if (!${ev.isNull}) { $out[$i] = (float) $dot; }
         |}
         |if (!${ev.isNull}) { ${ev.value} = new $gad($out); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ProjectVectorFunctions {
  def projectVector(vec: Column, planes: Array[Array[Float]]): Column =
    GraftGlue.column(ProjectVector(GraftGlue.expression(vec), planes))
}
