package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.GraftGlue
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Int8 scalar quantization for embedding columns — the standard
  * compression path for web-scale vector stores: 4× fewer bytes per
  * vector than float32 means 4× less shuffle, 4× more vectors per
  * executor page, and integer dot products in the scoring loop.
  *
  * QUANTIZATION CONTRACT (the s05 oracle re-derives this in SQL):
  *   s_d  = max over the corpus of |v_d|   (per-dimension, exact)
  *   q_d  = 0                               if s_d = 0
  *        = clamp(floor(v_d * 127 / s_d + 0.5), -127, 127)  otherwise
  * All arithmetic in double, `v * 127 / s` evaluated left-to-right —
  * IEEE-deterministic, so the quantized codes (and every integer score
  * built from them) are bit-reproducible across engines; floor(x + 0.5)
  * instead of round() because SQL round() is half-away-from-zero while
  * JVM Math.round is half-up — the one formula both evaluate
  * identically.
  *
  * Codegen for the same reason as [[SignBuckets]]: the scales are
  * constants that ride along as a referenced object, not 64 literals,
  * and the per-row loop stays primitive inside whole-stage codegen.
  * Null semantics match [[VectorBinaryExpression]]: a null ELEMENT
  * nulls the whole result.
  */
case class QuantizeVector(child: Expression, scales: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_vector"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), scales.length)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val s = scales(i)
      out(i) =
        if (s == 0.0) 0
        else {
          val q = math.floor(v.getFloat(i).toDouble * 127.0 / s + 0.5)
          math.max(-127.0, math.min(127.0, q)).toInt
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sc = ctx.addReferenceObj("scales", scales, "double[]")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val q = ctx.freshName("q")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = Math.min($a.numElements(), $sc.length);
         |int[] $out = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $s = $sc[$i];
         |  if ($s != 0.0) {
         |    double $q = Math.floor((double) $a.getFloat($i) * 127.0 / $s + 0.5);
         |    $out[$i] = (int) Math.max(-127.0, Math.min(127.0, $q));
         |  }
         |}
         |if (!${ev.isNull}) { ${ev.value} = new $gad($out); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact integer dot product over two quantized `array<int>` codes —
  * LongType, no floating point anywhere, so ranking ties and oracle
  * hashes are engine-independent by construction. */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_dot_product"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<int> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0L
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getInt(i).toLong * y.getInt(i); i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long $dot = 0L;
         |int $n = Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $dot += (long) $a.getInt($i) * (long) $b.getInt($i);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $dot; }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the quantization expressions. */
object QuantizeFunctions {
  def quantize(vec: Column, scales: Array[Double]): Column =
    GraftGlue.column(QuantizeVector(GraftGlue.expression(vec), scales))

  def intDot(a: Column, b: Column): Column =
    GraftGlue.column(IntDotProduct(
      GraftGlue.expression(a), GraftGlue.expression(b)))
}
