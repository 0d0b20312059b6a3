package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.GraftGlue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a native codegen'd expression:
  * sig[i] = min over shingles s of xxh64(s, seed + i).
  *
  * The built-in formulation — `transform(sequence(0,k-1), i ->
  * array_min(transform(shingles, s -> xxhash64(i, s))))` — runs k×|s|
  * boxed lambda invocations per row through the interpreted
  * higher-order-function path (HOFs are codegen fences). This expression
  * compiles to one nested primitive loop over the UTF8 bytes via the
  * same XXH64 kernel Spark's own hash expressions use. On the documents
  * corpus it turns MinHash signature computation from the dominant cost
  * into noise (see BENCH history): that ratio is what decides whether
  * corpus-scale dedup is scan-bound or lambda-bound at 100 TB.
  */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      // null shingles are skipped (absent from the set) rather than
      // NPE-ing the task on one malformed row
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        var i = 0
        while (i < k) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes, seed + i)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val nEl = ctx.freshName("nEl")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $nEl = $a.numElements();
         |for (int $j = 0; $j < $nEl; $j++) {
         |  if ($a.isNullAt($j)) continue;
         |  $utf8 $s = $a.getUTF8String($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $h = $xxh.hashUnsafeBytes($s.getBaseObject(),
         |      $s.getBaseOffset(), $s.numBytes(), ${seed}L + $i);
         |    if ($h < $sig[$i]) $sig[$i] = $h;
         |  }
         |}
         |${ev.value} = new $gad($sig);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFunctions {
  def minhashSignature(shingles: Column, k: Int, seed: Long = 42L): Column =
    GraftGlue.column(MinHashSignature(GraftGlue.expression(shingles), k, seed))
}
