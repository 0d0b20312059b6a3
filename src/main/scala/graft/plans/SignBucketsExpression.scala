package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.GraftGlue
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All sign-LSH bucket ids for one vector in ONE pass: element t of the
  * result is table t's bucket, bit i = sign(v · plane[t*planesPerTable+i]).
  *
  * Why not compose this from per-plane DotProduct columns: the planes
  * are CONSTANTS, and a column formulation embeds them as
  * tables × planes × dim float literals in the expression tree (~10k
  * literals for an auto-tuned 29×5×64 run) — the plan itself becomes
  * O(LSH-budget) large, codegen chokes, and every plane re-walks the
  * vector. Here the planes ride along as a referenced object
  * (ctx.addReferenceObj), the generated code is a fixed-size nested
  * loop, and the vector is walked once per plane with no boxing.
  *
  * Null semantics match [[VectorBinaryExpression]]: a null ELEMENT makes
  * the whole result NULL (one malformed row degrades, never NPEs).
  */
case class SignBuckets(child: Expression, planes: Array[Array[Float]],
                       planesPerTable: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sign_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
        if planesPerTable > 0 && planes.length % planesPerTable == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"planes (${planes.length}) must be a positive multiple of " +
        s"planesPerTable ($planesPerTable)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nTables = planes.length / planesPerTable
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var i = 0
      while (i < planesPerTable) {
        val p = planes(t * planesPerTable + i)
        val n = math.min(v.numElements(), p.length)
        var dot = 0.0
        var j = 0
        while (j < n) {
          if (v.isNullAt(j)) return null
          dot += v.getFloat(j).toDouble * p(j)
          j += 1
        }
        if (dot > 0.0) bucket |= (1L << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", planes, "float[][]")
      val out = ctx.freshName("out"); val t = ctx.freshName("t")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val dot = ctx.freshName("dot")
      val n = ctx.freshName("n"); val bucket = ctx.freshName("bucket")
      val gad = classOf[GenericArrayData].getName
      val nTables = planes.length / planesPerTable
      s"""
         |long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables && !${ev.isNull}; $t++) {
         |  long $bucket = 0L;
         |  for (int $i = 0; $i < $planesPerTable; $i++) {
         |    float[] $p = $pl[$t * $planesPerTable + $i];
         |    int $n = Math.min($a.numElements(), $p.length);
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |      $dot += (double) $a.getFloat($j) * (double) $p[$j];
         |    }
         |    if (${ev.isNull}) break;
         |    if ($dot > 0.0) $bucket |= (1L << $i);
         |  }
         |  $out[$t] = $bucket;
         |}
         |if (!${ev.isNull}) { ${ev.value} = new $gad($out); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBucketsFunctions {
  /** `tables` as produced by Similarity.hyperplanes, one entry per table. */
  def signBuckets(vec: Column, tables: Seq[Array[Array[Float]]]): Column = {
    require(tables.nonEmpty && tables.forall(_.length == tables.head.length),
      "all LSH tables must have the same plane count")
    GraftGlue.column(SignBuckets(GraftGlue.expression(vec),
      tables.flatten.toArray, tables.head.length))
  }
}
