package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed Aggregator — the
  * frequency sketch next to q17's HLL (distinct count): one bounded
  * k-entry map per partition, map-side combined, merged with the
  * (k+1)-th-largest subtraction of the mergeable-summaries literature
  * (Agarwal et al.). At 100 TB the exact token groupBy shuffles the
  * whole vocabulary; this shuffles k counters per partition.
  *
  * GUARANTEE (holds for ANY partitioning / merge order):
  *   true(t) − N/(k+1)  ≤  est(t)  ≤  true(t)
  * and every t with true(t) > N/(k+1) is present in the output.
  *
  * The estimates themselves are NOT deterministic across partitionings
  * (merge order shifts which ties survive) — consumers must emit the
  * BOUNDS, not the raw estimates, through any oracle gate (t12 does
  * exactly that with integer-exact comparisons).
  */
class FrequentTokens(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    if (tok == null) b
    else b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1L)
      case None if b.size < k => b.updated(tok, 1L)
      // full and unseen: the classic decrement-all step — the incoming
      // token and one unit of every counter annihilate (k+1 stream units
      // per decrement event, which is where the N/(k+1) bound comes from)
      case None => b.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  override def merge(x: Map[String, Long], y: Map[String, Long])
      : Map[String, Long] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val sum = (x.keySet ++ y.keySet).iterator
      .map(t => t -> (x.getOrElse(t, 0L) + y.getOrElse(t, 0L))).toMap
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest weight, keep strictly positive —
      // at most k weights can strictly exceed it, so the bound holds
      val cut = sum.valuesIterator.toArray
        .sorted(Ordering[Long].reverse).apply(k)
      sum.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b
  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object FrequentTokens {
  /** Column form: map<token, estimate> with at most k entries. */
  def frequentTokens(c: Column, k: Int): Column =
    org.apache.spark.sql.functions.udaf(new FrequentTokens(k)).apply(c)
}
