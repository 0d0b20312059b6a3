package graft

import org.apache.spark.sql.functions._

import graft.functions.FrequentTokens

/** Misra–Gries summary: exact when k covers the vocabulary, the
  * undercount bound and heavy-hitter completeness under forced
  * eviction, local reduce/merge algebra on crafted streams. */
class FrequentTokensSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(toks: Seq[String], k: Int): Map[String, Long] =
    toks.toDF("t")
      .agg(FrequentTokens.frequentTokens($"t", k))
      .head().getMap[String, Long](0).toMap

  test("exact counts when k >= vocabulary size") {
    val stream = Seq.fill(7)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c")
    val got = sketch(scala.util.Random.shuffle(stream), 8)
    assert(got == Map("a" -> 7L, "b" -> 4L, "c" -> 2L))
  }

  test("bound and completeness hold under forced eviction") {
    // 40 'hot', 60 spread over 30 cold tokens; k=4 → N/(k+1) = 20:
    // 'hot' is the only heavy token and must survive with est in
    // [true - N/(k+1), true] for EVERY partitioning
    val stream = Seq.fill(40)("hot") ++
      (1 to 30).flatMap(i => Seq.fill(2)(s"cold$i"))
    val n = stream.length
    val k = 4
    for (parts <- Seq(1, 3, 7)) {
      val got = stream.toDF("t").repartition(parts)
        .agg(FrequentTokens.frequentTokens($"t", k))
        .head().getMap[String, Long](0).toMap
      assert(got.size <= k)
      val est = got.getOrElse("hot", 0L)
      assert(est > 0, s"heavy token evicted at parts=$parts")
      assert(est <= 40 && (40 - est) * (k + 1) <= n,
        s"bound violated at parts=$parts: est=$est")
      // no overcount for ANY token
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong)
      got.foreach { case (t, c) => assert(c <= truth(t)) }
    }
  }

  test("local reduce algebra: decrement-all on overflow, nulls skipped") {
    val agg = new FrequentTokens(2)
    var b = agg.zero
    Seq("a", "a", "b", null, "c").foreach(t => b = agg.reduce(b, t))
    // 'c' arrived with the buffer full: a:2,b:1 → decrement → a:1
    assert(b == Map("a" -> 1L))
    // merge subtracts the (k+1)-th largest and keeps <= k entries
    val merged = agg.merge(Map("a" -> 5L, "b" -> 3L), Map("c" -> 2L))
    assert(merged == Map("a" -> 3L, "b" -> 1L))
  }
}
