package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftglue.GraftGlue
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point query into a serialized count-min sketch (the binary emitted by
  * Spark's `count_min_sketch` aggregate): estimated frequency of a string
  * item. The aggregate adds strings as their UTF-8 bytes
  * (CountMinSketchAgg's StringType branch), so the probe hashes the SAME
  * byte view — an encoding mismatch here would silently read the wrong
  * cells.
  *
  * Deliberately NOT codegen'd (CodegenFallback): probes run on the few
  * rows of a frequency report (one per heavy hitter), never on the fact
  * path — the sketch BUILD is the hot path and that is Spark's own
  * codegen'd aggregate. The deserialized sketch is memoized per expression
  * instance (reference equality on the binary), so a broadcast sketch
  * column deserializes once per task, not once per row.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary sketch, string item), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  // per-instance memo; plan copies are per-task, so no cross-thread sharing
  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: CountMinSketch = _

  private def sketchOf(bytes: Array[Byte]): CountMinSketch = {
    if (!(bytes eq lastBytes)) {
      lastSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      lastBytes = bytes
    }
    lastSketch
  }

  override def nullSafeEval(sk: Any, item: Any): Any =
    sketchOf(sk.asInstanceOf[Array[Byte]])
      .estimateCount(item.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsFunctions {
  def cmsEstimate(sketch: Column, item: Column): Column =
    GraftGlue.column(CmsEstimate(
      GraftGlue.expression(sketch), GraftGlue.expression(item)))
}
