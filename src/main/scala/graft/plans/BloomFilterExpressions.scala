package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftglue.GraftGlue
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Runtime semi-join pruning predicate: `bloom.mightContainLong(key)`.
  *
  * The pattern this enables is the standard one for a shuffle join whose
  * build side is too big to broadcast as ROWS but whose key set fits in a
  * Bloom filter: aggregate the build side's keys into a few hundred KB of
  * bits, ship those bits to every probe-side task, and drop non-matching
  * probe rows BEFORE they enter the join exchange. False positives only
  * cost a shuffled row that the exact join then discards — output is
  * byte-identical to the unfiltered join, so the oracle for any query
  * using this is the plain join SQL.
  *
  * The filter rides along as a referenced object (ctx.addReferenceObj),
  * exactly like [[SignBuckets]]' plane matrix: embedding it any other way
  * (e.g. a lit() of the serialized bytes re-parsed per row) would leave
  * whole-stage codegen or deserialize in the hot loop. One virtual call
  * per row against task-local bits — no boxing, no allocation.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects bigint, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {
  /** Predicate Column: does `bloom` (built over the join key set of the
    * other side) possibly contain this row's `key`? `key` must be bigint. */
  def mightContain(key: Column, bloom: BloomFilter): Column =
    GraftGlue.column(BloomMightContain(GraftGlue.expression(key), bloom))
}
