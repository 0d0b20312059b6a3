package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (the Aggregator path of SURVEY.md §4.2):
  * element-wise mean of an `array<float>` embedding column — class
  * centroids, the building block for IVF training, label prototypes and
  * centroid-based dedup.
  *
  * Why an Aggregator and not explode+avg: exploding a 64-dim corpus
  * multiplies the shuffle by 64 (one row per dimension); the Aggregator
  * keeps one (sums[], count) buffer per group per partition — map-side
  * combined, merge is O(dim). The explode formulation exists as the
  * oracle cross-check (same numbers, 64× the shuffle).
  */
class MeanVector extends Aggregator[Array[Float], MeanVector.Buf, Array[Double]] {
  import MeanVector.Buf

  override def zero: Buf = Buf(Array.emptyDoubleArray, 0L)

  override def reduce(b: Buf, a: Array[Float]): Buf = {
    if (a == null) return b
    val sums = if (b.sums.isEmpty) new Array[Double](a.length) else b.sums
    var i = 0
    val n = math.min(sums.length, a.length)
    while (i < n) { sums(i) += a(i); i += 1 }
    Buf(sums, b.n + 1)
  }

  override def merge(x: Buf, y: Buf): Buf =
    if (x.sums.isEmpty) y
    else if (y.sums.isEmpty) x
    else {
      var i = 0
      val n = math.min(x.sums.length, y.sums.length)
      while (i < n) { x.sums(i) += y.sums(i); i += 1 }
      Buf(x.sums, x.n + y.n)
    }

  override def finish(b: Buf): Array[Double] =
    if (b.n == 0) Array.emptyDoubleArray else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

object MeanVector {
  case class Buf(sums: Array[Double], n: Long)

  /** Column form for DataFrame groupBy().agg(...). */
  def meanVector(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new MeanVector).apply(c)
}
