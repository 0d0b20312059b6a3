package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-case behavior of the d08 decontamination query's building
  * blocks: a training doc sharing a 3-token shingle with the eval slice
  * is flagged with the right distinct-shingle count; disjoint text is
  * not; sub-3-token docs produce no shingles (and no sequence() error). */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // same shape as SparkEntry.d08 but over an explicit docs frame and an
  // explicit eval predicate, so the planted cases stay readable
  private def contaminated(docs: DataFrame): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val sh = docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(when(size(col("toks")) >= 3,
          transform(sequence(lit(0), size(col("toks")) - 3),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(3)))))
          .otherwise(array().cast("array<string>"))).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val ev = sh.filter(col("doc_id") % 97 === 0).select("h").distinct()
    sh.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(ev), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("h")).as("n_shared"))
  }

  test("shared trigram flags the training doc; disjoint text does not") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"), // eval (id%97==0)
      (1L, "we saw the quick brown fox yesterday evening"), // shares 2 trigrams
      (2L, "completely unrelated words with zero overlap here"),
      (3L, "tiny doc") // < 3 tokens: no shingles, no error
    ).toDF("doc_id", "text")
    val got = contaminated(docs).as[(Long, Long)].collect().toMap
    // "the quick brown" and "quick brown fox" are the shared trigrams
    assert(got == Map(1L -> 2L))
  }

  test("eval docs are never flagged against themselves") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (97L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    // both ids are ≡ 0 mod 97 → both are eval-side; no training rows
    assert(contaminated(docs).count() == 0)
  }
}
