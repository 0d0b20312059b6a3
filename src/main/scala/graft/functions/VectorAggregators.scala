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
    // null/empty vectors are skipped entirely (not counted into n);
    // a genuine dimension mismatch is an error, not a silent truncation
    // (min-length folding would make the result partition-order
    // dependent on ragged input)
    if (a == null || a.isEmpty) return b
    if (b.sums.isEmpty) {
      val sums = new Array[Double](a.length)
      var i = 0
      while (i < a.length) { sums(i) = a(i); i += 1 }
      Buf(sums, 1L)
    } else {
      require(a.length == b.sums.length,
        s"MeanVector: mixed dimensions ${a.length} vs ${b.sums.length}")
      var i = 0
      while (i < a.length) { b.sums(i) += a(i); i += 1 }
      Buf(b.sums, b.n + 1)
    }
  }

  override def merge(x: Buf, y: Buf): Buf =
    // empty-sums buffers always have n == 0 (empty vectors are skipped)
    if (x.sums.isEmpty) y
    else if (y.sums.isEmpty) x
    else {
      require(x.sums.length == y.sums.length,
        s"MeanVector: mixed dimensions ${x.sums.length} vs ${y.sums.length}")
      var i = 0
      while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
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

/** Same accumulation as [[MeanVector]] but finishes with the raw
  * (sums, n) buffer instead of dividing. This is the oracle-parity form:
  * a rounded mean lands on .xx5 decimals where Spark and a reference
  * engine round differently, while round(sum, k) + n lets the consumer
  * divide — the repo-wide float-aggregate discipline (see q22/q32). */
class VectorStats extends Aggregator[Array[Float], MeanVector.Buf, MeanVector.Buf] {
  private val inner = new MeanVector
  override def zero: MeanVector.Buf = inner.zero
  override def reduce(b: MeanVector.Buf, a: Array[Float]): MeanVector.Buf =
    inner.reduce(b, a)
  override def merge(x: MeanVector.Buf, y: MeanVector.Buf): MeanVector.Buf =
    inner.merge(x, y)
  override def finish(b: MeanVector.Buf): MeanVector.Buf = b
  override def bufferEncoder: Encoder[MeanVector.Buf] = Encoders.product[MeanVector.Buf]
  override def outputEncoder: Encoder[MeanVector.Buf] = Encoders.product[MeanVector.Buf]
}

object VectorStats {
  /** Column form: yields a struct<sums: array<double>, n: bigint>. */
  def vectorStats(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new VectorStats).apply(c)
}

/** Per-dimension max(|v_d|) over an embedding column — the scale
  * vector for int8 quantization ([[graft.plans.QuantizeVector]]).
  * Exact: abs/max involve no arithmetic, so the result (and everything
  * quantized with it) is bit-reproducible regardless of partitioning.
  * Same one-buffer-per-group shape as [[MeanVector]] (explode+max would
  * 64× the shuffle). */
class MaxAbsVector extends Aggregator[Array[Float], Array[Double], Array[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(b: Array[Double], a: Array[Float]): Array[Double] = {
    if (a == null || a.isEmpty) return b
    if (b.isEmpty) {
      val out = new Array[Double](a.length)
      var i = 0
      while (i < a.length) { out(i) = math.abs(a(i).toDouble); i += 1 }
      out
    } else {
      require(a.length == b.length,
        s"MaxAbsVector: mixed dimensions ${a.length} vs ${b.length}")
      var i = 0
      while (i < a.length) {
        val v = math.abs(a(i).toDouble)
        if (v > b(i)) b(i) = v
        i += 1
      }
      b
    }
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      require(x.length == y.length,
        s"MaxAbsVector: mixed dimensions ${x.length} vs ${y.length}")
      var i = 0
      while (i < x.length) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
      x
    }

  override def finish(b: Array[Double]): Array[Double] = b
  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

object MaxAbsVector {
  def maxAbsVector(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new MaxAbsVector).apply(c)
}

/** Element-wise int64 sum + count over an `array<int>` codes column —
  * the UPDATE-step accumulator of distributed Lloyd k-means
  * ([[graft.operators.KMeansLloyd]]): one (sums[], n) buffer per
  * cluster per partition, map-side combined, so the update shuffle
  * carries k × dim longs per partition regardless of corpus size.
  * Integer addition is associative-commutative → the buffer is exact
  * and partition-order independent (the float-mean problem
  * [[MeanVector]] documents does not exist here). Null/empty vectors
  * are skipped (not counted into n); ragged dimensions are an error,
  * matching [[MeanVector]]. */
class SumIntVector extends Aggregator[Array[Int], SumIntVector.Buf, SumIntVector.Buf] {
  import SumIntVector.Buf

  override def zero: Buf = Buf(Array.emptyLongArray, 0L)

  override def reduce(b: Buf, a: Array[Int]): Buf = {
    if (a == null || a.isEmpty) return b
    if (b.sums.isEmpty) {
      val sums = new Array[Long](a.length)
      var i = 0
      while (i < a.length) { sums(i) = a(i).toLong; i += 1 }
      Buf(sums, 1L)
    } else {
      require(a.length == b.sums.length,
        s"SumIntVector: mixed dimensions ${a.length} vs ${b.sums.length}")
      var i = 0
      while (i < a.length) { b.sums(i) += a(i); i += 1 }
      Buf(b.sums, b.n + 1)
    }
  }

  override def merge(x: Buf, y: Buf): Buf =
    if (x.sums.isEmpty) y
    else if (y.sums.isEmpty) x
    else {
      require(x.sums.length == y.sums.length,
        s"SumIntVector: mixed dimensions ${x.sums.length} vs ${y.sums.length}")
      var i = 0
      while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
      Buf(x.sums, x.n + y.n)
    }

  override def finish(b: Buf): Buf = b
  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
}

object SumIntVector {
  case class Buf(sums: Array[Long], n: Long)

  /** Column form: yields a struct<sums: array<bigint>, n: bigint>. */
  def sumIntVector(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new SumIntVector).apply(c)
}
