package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

/** As-of join semantics: backward match, <= inclusivity, no-match drop,
  * per-key isolation. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of picks latest right time <= left time") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), "t1"),
      (1L, ts("2024-01-01 10:05:00"), "t2"),
      (2L, ts("2024-01-01 10:00:00"), "t3"), // key 2: quote only later
      (3L, ts("2024-01-01 09:00:00"), "t4")  // key 3: no quote at all
    ).toDF("k", "t", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:59:00")),
      (1L, ts("2024-01-01 10:00:00")), // equal time: eligible (<=)
      (1L, ts("2024-01-01 10:04:00")),
      (2L, ts("2024-01-01 11:00:00"))  // after key-2 trade
    ).toDF("k", "qt")

    val out = AsOfJoin.asofBackward(trades, quotes, "k", "k", "t", "qt",
      leftCols = Seq("trade_id"), asOfOut = "q")
      .collect().map(r => r.getString(0) -> r.getTimestamp(1).toString).toMap

    assert(out("t1") == "2024-01-01 10:00:00.0") // equal-time quote wins
    assert(out("t2") == "2024-01-01 10:04:00.0") // latest prior
    assert(!out.contains("t3")) // only future quotes → dropped (inner)
    assert(!out.contains("t4")) // no quotes for key → dropped
  }

  test("rightCols carry the matched row's payload; ties pick max tuple") {
    val trades = Seq((1L, ts("2024-01-01 10:00:00"), "t1"))
      .toDF("k", "t", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:59:00"), 100.0, "mk1"),
      // two quotes tied on the matched time: largest (px, src) tuple wins
      (1L, ts("2024-01-01 10:00:00"), 101.5, "mkA"),
      (1L, ts("2024-01-01 10:00:00"), 102.5, "mkB"),
      (1L, ts("2024-01-01 10:01:00"), 999.0, "late")
    ).toDF("k", "qt", "px", "src")

    val row = AsOfJoin.asofBackward(trades, quotes, "k", "k", "t", "qt",
      leftCols = Seq("trade_id"), asOfOut = "q",
      rightCols = Seq("px", "src")).collect().head
    assert(row.getString(0) == "t1")
    assert(row.getTimestamp(1).toString == "2024-01-01 10:00:00.0")
    assert(row.getDouble(2) == 102.5 && row.getString(3) == "mkB")
  }

  test("forward as-of picks earliest right time >= left time") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), "t1"), // equal-time quote eligible
      (1L, ts("2024-01-01 10:01:00"), "t2"), // next quote is 10:04
      (1L, ts("2024-01-01 12:00:00"), "t3")  // nothing after -> dropped
    ).toDF("k", "t", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:59:00")),
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:04:00"))
    ).toDF("k", "qt")
    val out = AsOfJoin.asofForward(trades, quotes, "k", "k", "t", "qt",
      leftCols = Seq("trade_id"), asOfOut = "q")
      .collect().map(r => r.getString(0) -> r.getTimestamp(1).toString).toMap
    assert(out("t1") == "2024-01-01 10:00:00.0")
    assert(out("t2") == "2024-01-01 10:04:00.0")
    assert(!out.contains("t3"))
  }
}
