package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleave of two integer keys — the multi-dimension
  * clustering key for data LAYOUT at scale.
  *
  * Why this exists (the 100 TB story): a table sorted by one key gives
  * parquet min/max pruning on that key only; a query filtering the other
  * key reads everything. Sorting by the Morton code interleaves the bit
  * planes of both keys, so any contiguous z-range is a small rectangle in
  * (x, y) space — every file's (min, max) footer stats are then tight on
  * BOTH columns and a point/range predicate on EITHER dimension skips all
  * but O(sqrt) of the files. This is the same layout trick Delta/Iceberg
  * expose as `OPTIMIZE ... ZORDER BY`; here it is a plain codegen'd
  * expression usable with `repartitionByRange(zorder2(x, y))` +
  * `sortWithinPartitions` on any parquet write (see
  * [[graft.sources.Bucketing.zorderWrite]]).
  *
  * CONTRACT (the q47 oracle re-derives this in SQL bit arithmetic):
  * inputs are taken modulo 2^32 (lowest 32 bits, i.e. `x & 0xFFFFFFFF`);
  * output bit 2i is bit i of x, output bit 2i+1 is bit i of y. The result
  * is the full signed 64-bit interleave — pure integer bit logic, no
  * floats anywhere, so it is bit-reproducible across engines by
  * construction.
  *
  * Codegen uses the standard mask-shift bit spread (6 integer ops per
  * dimension, branch-free — public-domain "Bit Twiddling Hacks" method)
  * rather than a 32-iteration loop, and stays inside whole-stage codegen.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "zorder2"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two integral arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(toLong(a), toLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // one shared static helper per generated class, not 12 inline ops
      // per call site
      val spread = ctx.addNewFunction("graftSpreadBits",
        s"""
           |private static long graftSpreadBits(long v) {
           |  v &= 0xFFFFFFFFL;
           |  v = (v | (v << 16)) & 0x0000FFFF0000FFFFL;
           |  v = (v | (v << 8))  & 0x00FF00FF00FF00FFL;
           |  v = (v | (v << 4))  & 0x0F0F0F0F0F0F0F0FL;
           |  v = (v | (v << 2))  & 0x3333333333333333L;
           |  v = (v | (v << 1))  & 0x5555555555555555L;
           |  return v;
           |}
           |""".stripMargin)
      s"${ev.value} = $spread((long) $x) | ($spread((long) $y) << 1);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftglue.GraftGlue

  /** DataFrame-side wrapper. */
  def zorder2(x: Column, y: Column): Column =
    GraftGlue.column(ZOrder2(GraftGlue.expression(x), GraftGlue.expression(y)))

  /** Register `zorder2` for spark.sql use on a plain session (the
    * extensions route in [[GraftExtensions]] covers extension-configured
    * sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder2", es => ZOrder2(es.head, es(1)), "built-in")

  /** Interpreted twin of the codegen body (ZOrderSpec pins eval ≡ codegen
    * ≡ the naive per-bit reference). */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }
}
