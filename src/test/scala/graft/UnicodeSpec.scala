package graft

import org.apache.spark.sql.functions._

import graft.plans.UnicodeFunctions

/** Planted-unicode behavior of the NFC / strip_accents native
  * expressions (the fixture corpus is ASCII, so t17's oracle only pins
  * cross-engine parity — the real semantics live here), plus the
  * codegen≡interpreted guarantee every graft.plans expression keeps. */
class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "café"              // é, single code point
  private val decomposed = "café"           // e + combining acute

  test("NFC composes decomposed text; byte-distinct inputs unify") {
    assert(composed != decomposed, "fixture sanity: different byte forms")
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "s")
      .select(col("id"), UnicodeFunctions.nfcCol(col("s")).as("n"))
    val got = df.as[(Long, String)].collect().toMap
    assert(got(1L) == composed && got(2L) == composed,
      "both forms normalize to the composed code point")
    // the dedup-relevant property: sha2 of NFC output collides for
    // canonically-equal text
    val hashes = Seq((1L, composed), (2L, decomposed)).toDF("id", "s")
      .select(sha2(UnicodeFunctions.nfcCol(col("s")), 256)).distinct().count()
    assert(hashes == 1)
  }

  test("strip_accents folds marks from either input form; ASCII untouched") {
    val df = Seq(composed, decomposed, "über", "plain ascii 42")
      .toDF("s").select(UnicodeFunctions.stripAccentsCol(col("s")).as("f"))
    assert(df.as[String].collect().toSeq ==
      Seq("cafe", "cafe", "uber", "plain ascii 42"))
  }

  test("null and empty propagate; codegen == interpreted") {
    val df = Seq(Some(decomposed), Some(""), None).toDF("s")
    val exprs = df.select(
      UnicodeFunctions.nfcCol(col("s")).as("n"),
      UnicodeFunctions.stripAccentsCol(col("s")).as("f"))
    val whole = exprs.collect()
    // force the interpreted path: filter through a non-codegen barrier
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp =
      try exprs.collect()
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(whole.map(_.toString).toSeq == interp.map(_.toString).toSeq)
    assert(whole(2).isNullAt(0) && whole(2).isNullAt(1))
  }

  test("expression-level eval + type checks (extension builder types)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val n = graft.plans.NfcNormalize(Literal(UTF8String.fromString(decomposed)))
    assert(n.eval(null).toString == composed)
    val f = graft.plans.StripAccents(Literal(UTF8String.fromString(composed)))
    assert(f.eval(null).toString == "cafe")
    assert(!graft.plans.NfcNormalize(Literal(1L)).checkInputDataTypes().isSuccess)
  }
}
