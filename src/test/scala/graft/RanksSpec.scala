package graft

import org.apache.spark.sql.functions._

import graft.operators.Ranks

/** Two-level global ranking: agreement with a driver-side sort on
  * adversarial frames (heavy count ties, shared prefixes, 1-char
  * tokens), and the no-SinglePartition plan property. */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  private def check(rows: Seq[(String, Long)]): Unit = {
    val want = rows.sortBy { case (t, c) => (-c, t) }
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1L) }.toMap
    val got = Ranks
      .rankByCountDesc(rows.toDF("tok", "c"), "c", "tok", "vid")
      .select(col("tok"), col("vid")).as[(String, Long)]
      .collect().toMap
    assert(got == want)
  }

  test("matches a sequential sort on an adversarial small frame") {
    check(Seq(
      ("a", 5L), ("aa", 5L), ("ab", 5L), ("b", 5L), ("ba", 5L),
      ("z", 9L), ("zz", 1L), ("zy", 1L), ("m", 1L), ("mm", 1L),
      ("q", 3L), ("qq", 3L), ("qr", 2L), ("x", 1L)))
  }

  test("matches a sequential sort on a seeded random frame") {
    val rnd = new scala.util.Random(13)
    val toks = (1 to 400).map(i =>
      (s"${('a' + rnd.nextInt(4)).toChar}${('a' + rnd.nextInt(4)).toChar}$i",
        (rnd.nextInt(7) + 1).toLong))
    check(toks)
  }

  test("plan carries no SinglePartition exchange") {
    val df = Ranks.rankByCountDesc(
      (1 to 50).map(i => (s"t$i", (i % 5 + 1).toLong)).toDF("tok", "c"),
      "c", "tok", "vid")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("SinglePartition"), p)
  }

  test("exclusivePrefixTotals matches a sequential prefix sum") {
    val rows = Seq(("b", 3L), ("a", 1L), ("d", 10L), ("c", 2L))
    val got = Ranks
      .exclusivePrefixTotals(rows.toDF("k", "n"), "k", "n")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 4L, "d" -> 6L))
  }
}
