package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized interval (range) join — "all events inside each time
  * window", with NO equi-key between the sides.
  *
  * Spark plans a bare `ev.ts BETWEEN iv.start AND iv.end` join as a
  * BroadcastNestedLoopJoin: fine while the interval side fits in one
  * executor's memory, O(|iv|·|ev|) work and a driver OOM the day it
  * doesn't. The scale form is the classic bucketization: quantize time
  * into fixed buckets, explode each interval onto the buckets it
  * covers, tag each event with its single bucket, equi-join on the
  * bucket id (a plain shuffle join both sides — no broadcast
  * requirement), then apply the exact range predicate. An event's
  * bucket intersects an interval's bucket list at most once, so no
  * post-join dedup is needed.
  *
  * Pick `bucketSeconds` ≈ the typical interval length: each interval
  * then explodes onto ≤ 2 buckets (replication factor 2, vs |ev|
  * replication in the nested loop). A hot bucket (event burst) is
  * ordinary equi-join skew — AQE's skew-join split applies, same as
  * any other key.
  */
object RangeJoin {

  /** Join every event row to every interval containing its timestamp.
    *
    * @param intervals columns (id, start, end) — any names, taken
    *                  positionally; end is EXCLUSIVE; start/end
    *                  TimestampType
    * @param events    first column is the event timestamp
    *                  (TimestampType); remaining columns are payload
    * @param bucketSeconds bucket width; choose ≈ interval length
    * @return one row per (interval ∋ event) match: interval id column +
    *         all event columns. Column names must be disjoint.
    */
  def intervalJoin(intervals: DataFrame, events: DataFrame,
                   bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val Array(idC, stC, enC) = intervals.columns
    val tsC = events.columns(0)
    val overlap = intervals.columns.toSet.intersect(events.columns.toSet)
    require(overlap.isEmpty, s"column collision between sides: $overlap")
    val b = bucketSeconds * 1000000L // micros

    // `div`, not `/`: Spark's `/` on longs is double division, and the
    // bucket id must stay an exact integer. Truncating div is safe
    // here: epoch micros are non-negative for any post-1970 data
    // (pre-1970 timestamps would need a true floordiv)
    val iv = intervals.withColumn("__bucket", explode(sequence(
      expr(s"unix_micros(`$stC`) div ${b}L"),
      expr(s"(unix_micros(`$enC`) - 1) div ${b}L"))))
    val ev = events.withColumn("__bucket",
      expr(s"unix_micros(`$tsC`) div ${b}L"))

    iv.join(ev, iv("__bucket") === ev("__bucket") &&
        col(tsC) >= col(stC) && col(tsC) < col(enC))
      .drop("__bucket")
      .drop(stC, enC)
  }
}
