package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketized interval join: match-set equality with the naive
  * BETWEEN join, boundary semantics, and the plan must NOT be a
  * nested loop. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val intervals = Seq(
    (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
    (2L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:15:00")), // overlaps 1
    (3L, ts("2024-01-02 00:00:00"), ts("2024-01-02 00:10:00"))  // empty
  ).toDF("iid", "s", "e")

  private lazy val events = Seq(
    (ts("2024-01-01 10:00:00"), 100L), // = start of 1: inclusive
    (ts("2024-01-01 10:07:30"), 101L), // inside 1 and 2
    (ts("2024-01-01 10:10:00"), 102L), // = end of 1: exclusive; inside 2
    (ts("2024-01-01 10:14:59"), 103L), // inside 2
    (ts("2024-01-01 23:59:59"), 104L)  // matches nothing
  ).toDF("t", "eid")

  test("matches the naive BETWEEN join exactly, with boundary semantics") {
    val got = RangeJoin.intervalJoin(intervals, events, bucketSeconds = 600)
      .select($"iid", $"eid").as[(Long, Long)].collect().toSet
    val naive = intervals.join(events, $"t" >= $"s" && $"t" < $"e")
      .select($"iid", $"eid").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set((1L, 100L), (1L, 101L), (2L, 101L), (2L, 102L),
      (2L, 103L)))
  }

  test("plans as a bucket equi-join, not a nested loop") {
    val plan = RangeJoin.intervalJoin(intervals, events, bucketSeconds = 600)
      .queryExecution.executedPlan
    val nested = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
    assert(nested.isEmpty, "bucketized range join fell back to a nested loop")
  }

  test("column collisions are rejected") {
    val bad = events.withColumnRenamed("eid", "iid")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(intervals, bad, bucketSeconds = 600)
    }
  }
}
