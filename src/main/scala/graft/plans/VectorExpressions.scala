package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.GraftGlue
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for vector math over `array<float>`
  * embedding columns.
  *
  * Why a custom Expression instead of `zip_with`/`aggregate` built-ins:
  * higher-order functions evaluate their lambda per element through the
  * interpreted path (they are codegen fences), which on a 64-dim float
  * array means ~192 boxed lambda invocations per row. These expressions
  * generate a single tight primitive loop inside whole-stage codegen —
  * the difference between an ANN scan being scan-bound and lambda-bound
  * at 100 TB. Preference order per the build rules: built-ins where they
  * express the op cheaply, custom Expression where they don't
  * (SURVEY.md §7.5; spark_guide.md custom-Expression section).
  *
  * Both operands are evaluated with float→double widening BEFORE the
  * multiply, matching DuckDB's DOUBLE[] semantics so oracle compares are
  * ULP-stable (a float×float multiply then widen would differ).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // always nullable: even over non-null array columns the result is NULL
  // when an array ELEMENT is null (containsNull=true schemas are accepted
  // — parquet array fields are containsNull by default — and one
  // malformed row must degrade to NULL, not an executor NPE)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
}

/** cosine(a, b) = a·b / (|a||b|); 0.0 for a zero vector. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |int $n = Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double xi = (double) $a.getFloat($i); double yi = (double) $b.getFloat($i);
         |  $dot += xi * yi; $nx += xi * xi; $ny += yi * yi;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0
         |    : $dot / (Math.sqrt($nx) * Math.sqrt($ny));
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Plain dot product a·b (used for LSH hyperplane projections where the
  * planes are unit-free sign patterns and normalization is wasted work). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0.0
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double $dot = 0.0;
         |int $n = Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $dot; }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API and SQL-registry surface for the vector expressions. */
object VectorFunctions {
  def cosine(a: Column, b: Column): Column =
    GraftGlue.column(CosineSimilarity(
      GraftGlue.expression(a), GraftGlue.expression(b)))

  def dot(a: Column, b: Column): Column =
    GraftGlue.column(DotProduct(
      GraftGlue.expression(a), GraftGlue.expression(b)))

  /** Register `cosine_sim` / `dot_product` for spark.sql use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", es => CosineSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "dot_product", es => DotProduct(es.head, es(1)), "built-in")
  }
}
