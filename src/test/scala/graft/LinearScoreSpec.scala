package graft

import org.apache.spark.sql.functions._

import graft.plans.LinearScore

/** LINEAR SCORE CONTRACT behavior on hand-built token arrays, checked
  * against a from-first-principles reference that derives each feature
  * index from the md5 hex STRING via Integer.parseInt — a third route
  * to the 12 bits, independent of both the expression's byte nibbles
  * and the oracle's substr/ascii arithmetic. */
class LinearScoreSpec extends SparkSpec {
  import spark.implicits._

  /** score via hex-string parse: unigrams + '_'-joined bigrams. */
  private def refScore(toks: Seq[String]): Long = {
    val feats = toks ++ toks.sliding(2).filter(_.length == 2)
      .map(p => p(0) + "_" + p(1))
    feats.map { f =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(f.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val j = Integer.parseInt(hex.take(3), 16)
      (j.toLong * 2654435761L) % 17L - 8L
    }.sum
  }

  test("score matches the hex-string reference on varied token arrays") {
    val cases = Seq(
      Seq("the", "quick", "brown", "fox"),
      Seq("a"),
      Seq("same", "same", "same"),
      Seq("x1", "y2", "z3", "x1", "y2"))
    val got = cases.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("id", "toks")
      .select(col("id"), LinearScore.linearScore(col("toks")).as("s"))
      .as[(Long, Long)].collect().toMap
    cases.zipWithIndex.foreach { case (c, i) =>
      assert(got(i.toLong) == refScore(c), s"case $i: $c")
    }
  }

  test("empty array scores 0; null array and null element go null") {
    val df = Seq((1L, Some(Seq[String]())), (2L, None),
        (3L, Some(Seq("ok", null, "x")))).toDF("id", "toks")
      .select(col("id"), LinearScore.linearScore(col("toks")).as("s"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getLong(1) == 0L)
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1))
  }

  test("codegen == interpreted; weight table bounds") {
    val df = Seq(Seq("alpha", "beta", "gamma", "alpha")).toDF("toks")
      .select(LinearScore.linearScore(col("toks")).as("s"))
    val whole = df.collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp =
      try df.collect()
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(whole.map(_.toString).toSeq == interp.map(_.toString).toSeq)
    assert(LinearScore.weights.length == 4096 &&
      LinearScore.weights.forall(w => w >= -8L && w <= 8L))
    assert(!graft.plans.LinearScore(
      org.apache.spark.sql.catalyst.expressions.Literal(1L))
      .checkInputDataTypes().isSuccess)
  }
}
