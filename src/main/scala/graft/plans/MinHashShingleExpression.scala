package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.GraftGlue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** Shingling fused into the MinHash signature: one kernel walks the
  * token array, concatenates each n-token window into a reused byte
  * buffer and min-folds its k hashes — no shingle STRINGS are ever
  * materialized.
  *
  * The unfused pipeline (`shingles(toks, n)` then [[MinHashSignature]])
  * still pays an interpreted `transform` lambda per window (HOFs are
  * codegen fences) plus one UTF8String allocation per shingle; at
  * corpus scale the signature stage is the scan-bound cost of MinHash
  * dedup, so the window loop belongs in one primitive kernel. Byte-level
  * semantics are identical to `concat_ws(" ", slice(...))` + xxh64
  * (single-space joins, null tokens skipped, whole-array fallback when
  * size < n), asserted by TextDedupSpec's fused==unfused test.
  */
case class MinHashShingleSignature(child: Expression, shingleN: Int,
                                   k: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_shingle_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 && shingleN > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"k ($k) and shingleN ($shingleN) must be positive")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashShingleKernel.compute(
      input.asInstanceOf[ArrayData], shingleN, k, seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val kernel = classOf[MinHashShingleKernel.type].getName.stripSuffix("$")
      val gad = classOf[GenericArrayData].getName
      s"${ev.value} = new $gad($kernel.compute($a, $shingleN, $k, ${seed}L));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static kernel (top-level object → Java-callable static forwarder) so
  * whole-stage codegen invokes it directly with no boxing/virtual
  * dispatch, same pattern as Spark's own hash kernels. */
object MinHashShingleKernel {
  def compute(arr: ArrayData, n: Int, k: Int, seed: Long): Array[Long] = {
    val m = arr.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var buf = new Array[Byte](64)

    // hash tokens [start, end) joined by single spaces (concat_ws: null
    // tokens skipped, no dangling separators)
    def hashWindow(start: Int, end: Int): Unit = {
      var len = 0
      var first = true
      var i = start
      while (i < end) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          val nb = s.numBytes
          if (len + nb + 1 > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + nb + 1))
          if (!first) { buf(len) = ' '.toByte; len += 1 }
          s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + len)
          len += nb
          first = false
        }
        i += 1
      }
      var j = 0
      while (j < k) {
        val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, seed + j)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
    }

    if (m < n) hashWindow(0, m)
    else {
      var i = 0
      while (i <= m - n) { hashWindow(i, i + n); i += 1 }
    }
    sig
  }
}

object MinHashShingleFunctions {
  def minhashShingleSignature(tokens: Column, shingleN: Int, k: Int,
                              seed: Long = 42L): Column =
    GraftGlue.column(MinHashShingleSignature(
      GraftGlue.expression(tokens), shingleN, k, seed))
}
