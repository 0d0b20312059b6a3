package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** First-principles references for the hash-arithmetic statistics ops
  * (c14 priority sampling, q91 Poisson bootstrap).
  *
  * Both queries share their md5-derivation between the Spark side and
  * the DuckDB oracle — the exact setup where a shared bug (wrong hex
  * slice, typo'd threshold, floor-vs-ceil) would pass the gate
  * silently, because an oracle that copies the engine's formula can
  * only confirm self-consistency, never the formula itself (a shared
  * floor-vs-ceil bug once did exactly that). These tests recompute
  * everything
  * from JAVA primitives (MessageDigest, math.exp) with no SQL engine
  * involved, so the constants and the slicing are pinned to the
  * mathematical claim, not merely to each other. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def draw52(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 13), 16)

  test("q91: hardcoded thresholds ARE floor(F_Poisson(1)(k) * 2^52)") {
    // recomputed from math.exp — a typo'd constant passes the oracle
    // (both sides share it) but fails here
    var p = math.exp(-1.0)
    var cum = 0.0
    val expect = (0 to 5).map { k =>
      cum += p; p /= (k + 1); math.floor(cum * math.pow(2, 52)).toLong
    }
    assert(expect == Seq(1656781714176974L, 3313563428353948L,
      4141954285442435L, 4418084571138597L, 4487117142562638L,
      4500923656847446L))
  }

  test("q91: replicate b=1 matches a from-first-principles recompute") {
    val ts = Seq(1656781714176974L, 3313563428353948L, 4141954285442435L,
      4418084571138597L, 4487117142562638L, 4500923656847446L)
    val rows = spark.read.parquet(s"${sf()}/orders.parquet")
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .as[(Long, Long)].collect()
    def w(key: Long, b: Int): Long = {
      val k = draw52(s"$key:bs$b")
      val i = ts.indexWhere(k < _)
      if (i < 0) 6L else i.toLong
    }
    val expectNEff = rows.map(r => w(r._1, 1)).sum
    val expectSum = rows.map(r => w(r._1, 1) * r._2).sum
    val got = SparkEntry.queries("q91_poisson_bootstrap")(spark, sf())
      .filter(col("b") === 1).as[(Long, Long, Long)].collect().head
    assert(got == ((1L, expectNEff, expectSum)), got.toString)
    // and b=0 is the unweighted point estimate
    val got0 = SparkEntry.queries("q91_poisson_bootstrap")(spark, sf())
      .filter(col("b") === 0).as[(Long, Long, Long)].collect().head
    assert(got0 == ((0L, rows.length.toLong, rows.map(_._2).sum)))
  }

  test("q91: mean replicate weight is ~1 (Poisson(1) mass preserved)") {
    val out = SparkEntry.queries("q91_poisson_bootstrap")(spark, sf())
      .filter(col("b") > 0).select(col("n_eff")).as[Long].collect()
    val n = spark.read.parquet(s"${sf()}/orders.parquet").count()
    val mean = out.sum.toDouble / (out.length * n)
    assert(mean > 0.95 && mean < 1.05, s"mean weight $mean")
  }

  test("c14: the sample matches a from-first-principles recompute") {
    val rows = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .as[(Long, String, Long)].collect()
    val expect = rows.map { case (id, lang, nc) =>
      val u = (draw52(s"$id:ws42") + 1).toDouble
      (id, lang, nc, u / math.max(nc, 1L).toDouble)
    }.sortBy(r => (r._4, r._1)).take(100).toSet
    val got = SparkEntry.queries("c14_weighted_sample")(spark, sf())
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == expect,
      s"diff: ${(got -- expect).take(3)} / ${(expect -- got).take(3)}")
  }

  test("c14: raising a doc's weight never worsens its inclusion") {
    // the defining property of order sampling with priorities u/w:
    // with u fixed, priority strictly decreases in w and other docs
    // are untouched, so boosting a doc's weight can only improve its
    // rank — an included doc stays included, an excluded doc joins
    // once its weight is large enough
    val rows = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)].collect()
    def topK(boost: Map[Long, Long]): Set[Long] = rows.map {
      case (id, nc) =>
        val w = boost.getOrElse(id, 1L) * math.max(nc, 1L)
        (id, (draw52(s"$id:ws42") + 1).toDouble / w.toDouble)
    }.sortBy(r => (r._2, r._1)).take(40).map(_._1).toSet
    val base = topK(Map.empty)
    assert(base.size == 40)
    for (in <- base.take(3))
      assert(topK(Map(in -> 10L)).contains(in), s"boosted $in dropped out")
    for (out <- rows.map(_._1).filterNot(base).take(3))
      assert(topK(Map(out -> 1000000L)).contains(out),
        s"heavily-boosted $out still excluded")
    // doubling EVERY weight rescales all priorities equally — the
    // ranking (hence the sample) is scale-invariant
    val doubled = rows.map(_._1).map(id => id -> 2L).toMap
    assert(topK(doubled) == base, "scale-invariance of the ranking")
  }
}
