package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.GraftGlue
import org.apache.spark.sql.types._

/** Nearest centroid under exact integer squared-L2 — the ASSIGNMENT
  * step of distributed Lloyd k-means ([[graft.operators.KMeansLloyd]])
  * as a pure projection: the k×dim integer centroid matrix rides along
  * as a referenced object (ctx.addReferenceObj — the [[SignBuckets]]
  * discipline: never k·dim literals in the plan tree), each row is one
  * tight primitive loop inside whole-stage codegen, and NO join or
  * shuffle touches the corpus to assign it.
  *
  * dist(q, c_j) = Σ_d (q_d - c_jd)² over the full dimension; a ragged
  * or truncated vector is an ERROR (same loud-failure contract as
  * [[graft.functions.VectorAggregators]]'s SumIntVector in the same
  * k-means loop — a silent min-length truncation would hand a
  * plausible assignment to a corrupt vector). All arithmetic in int64
  * (codes are int8-scale, dims bounded — no overflow);
  * ties break to the SMALLEST centroid id, making the argmin a total
  * function of the inputs (partition- and engine-independent).
  *
  * Returns struct(cid int, dist bigint). Null semantics match
  * [[VectorBinaryExpression]]: a null ELEMENT nulls the whole result.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("dist", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) if centroids.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs at least one centroid")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<int> codes, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    var bestCid = -1
    var bestDist = Long.MaxValue
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      if (q.numElements() != c.length) throw new IllegalArgumentException(
        s"NearestCentroid: mixed dimensions ${q.numElements()} vs ${c.length}")
      val n = c.length
      var dist = 0L
      var d = 0
      while (d < n) {
        if (q.isNullAt(d)) return null
        val diff = q.getInt(d).toLong - c(d)
        dist += diff * diff
        d += 1
      }
      if (dist < bestDist) { bestDist = dist; bestCid = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestCid, bestDist))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cen = ctx.addReferenceObj("centroids", centroids, "long[][]")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val dist = ctx.freshName("dist"); val diff = ctx.freshName("diff")
      val bestCid = ctx.freshName("bestCid")
      val bestDist = ctx.freshName("bestDist")
      val gir = classOf[GenericInternalRow].getName
      s"""
         |int $bestCid = -1;
         |long $bestDist = Long.MAX_VALUE;
         |for (int $j = 0; $j < $cen.length && !${ev.isNull}; $j++) {
         |  long[] $c = $cen[$j];
         |  if ($a.numElements() != $c.length) {
         |    throw new IllegalArgumentException(
         |      "NearestCentroid: mixed dimensions " + $a.numElements()
         |        + " vs " + $c.length);
         |  }
         |  int $n = $c.length;
         |  long $dist = 0L;
         |  for (int $d = 0; $d < $n; $d++) {
         |    if ($a.isNullAt($d)) { ${ev.isNull} = true; break; }
         |    long $diff = (long) $a.getInt($d) - $c[$d];
         |    $dist += $diff * $diff;
         |  }
         |  if (!${ev.isNull} && $dist < $bestDist) {
         |    $bestDist = $dist; $bestCid = $j;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new $gir(new Object[] {
         |    java.lang.Integer.valueOf($bestCid),
         |    java.lang.Long.valueOf($bestDist) });
         |}
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidFunctions {
  def nearestCentroid(codes: Column, centroids: Array[Array[Long]]): Column =
    GraftGlue.column(NearestCentroid(GraftGlue.expression(codes), centroids))
}
