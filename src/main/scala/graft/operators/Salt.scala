package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * A skewed group key (one premise with 10^9 rows) makes one reducer the
  * straggler no matter how many executors exist. Salting splits each
  * group into `factor` subgroups for the first (heavy) aggregation, then
  * merges the per-salt partials in a second (tiny) aggregation:
  *
  *   stage 1: groupBy(keys, salt)  — shuffle spread over factor× reducers
  *   stage 2: groupBy(keys)        — at most factor rows per key
  *
  * Only algebraic aggregates (sum/count/min/max) merge losslessly this
  * way; avg is decomposed into sum+count here. Spark's map-side partial
  * aggregation already absorbs *moderate* skew — salting is for keys so
  * hot that even one partial-per-partition overwhelms a reducer. AQE's
  * skew handling covers the join case; this covers aggregation.
  */
object Salt {

  /** Salt from the row position (monotonically_increasing_id), not the
    * row content: content-hash salting sends IDENTICAL rows of a hot key
    * to the same reducer — and repeated/default records are exactly the
    * common real-world skew shape. Position-based salt spreads
    * duplicates round-robin. Deterministic per task attempt for
    * deterministic sources (id = partition id + row position); the salt
    * value itself never affects the merged result, only the spread. */
  def saltCol(factor: Int): Column =
    pmod(monotonically_increasing_id(), lit(factor.toLong))

  /** Two-stage salted aggregation. `aggs` maps output column name →
    * (input column, op) with op ∈ sum|count|min|max|avg. */
  def saltedAgg(df: DataFrame, keys: Seq[String],
                aggs: Seq[(String, (String, String))],
                factor: Int = 16): DataFrame = {
    require(aggs.nonEmpty, "saltedAgg requires at least one aggregate")
    val salted = df.withColumn("__salt", saltCol(factor))

    val partials = aggs.map { case (out, (in, op)) =>
      op match {
        case "sum"   => sum(col(in)).as(s"__p_$out")
        case "count" => count(col(in)).as(s"__p_$out")
        case "min"   => min(col(in)).as(s"__p_$out")
        case "max"   => max(col(in)).as(s"__p_$out")
        case "avg"   => struct(sum(col(in)).as("s"), count(col(in)).as("c"))
          .as(s"__p_$out")
        case other => throw new IllegalArgumentException(
          s"unsupported salted op: $other")
      }
    }
    val stage1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)

    val merges = aggs.map { case (out, (_, op)) =>
      op match {
        case "sum" | "count" => sum(col(s"__p_$out")).as(out)
        case "min"           => min(col(s"__p_$out")).as(out)
        case "max"           => max(col(s"__p_$out")).as(out)
        case "avg" => (sum(col(s"__p_$out.s")) / sum(col(s"__p_$out.c"))).as(out)
      }
    }
    stage1.groupBy(keys.map(col): _*).agg(merges.head, merges.tail: _*)
  }

  /** Salted shuffle JOIN for a skewed equi-key (the join-side twin of
    * [[saltedAgg]], for when AQE's skew split can't help — e.g. a
    * single key holding >1 task's worth of rows on BOTH inputs' probe
    * side). Each `big` row takes one position-derived salt in
    * [0, factor); `other` is replicated factor× so every (key, salt)
    * bucket can meet its match. The hot key's rows now land on `factor`
    * reducers instead of one; the price is `factor`× the other side's
    * shuffle volume — use for large⋈medium where broadcast is too big
    * and one key dominates. Result ≡ plain inner equi-join (salt never
    * reaches the output). Both inputs must carry `key` under the same
    * name; `other`'s non-key columns survive. */
  def saltedJoin(big: DataFrame, other: DataFrame, key: String,
                 factor: Int = 8): DataFrame = {
    require(factor > 0, "saltedJoin factor must be positive")
    val salted = big.withColumn("__salt", saltCol(factor))
    val repl = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    // shuffle_hash hint: this operator exists for the regime where the
    // other side is NOT broadcastable — on a small fixture Catalyst
    // would broadcast it, making the salt a measured no-op. A broadcast
    // join never needs salting (no shuffle to skew); callers in that
    // regime should just join.
    salted.join(repl.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }
}
