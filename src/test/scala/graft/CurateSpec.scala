package graft

import org.apache.spark.sql.functions._

import graft.operators.Curate

/** Composed curation pipeline: funnel stages behave, and the MinHash
  * prune (the scale path) keeps the same documents as the exact-pair
  * prune on the real corpus. */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")

  test("funnel: each stage only shrinks; chunks cover kept docs") {
    val r = Curate.stats(docs, "doc_id", "text").collect().head
    val Seq(in, q, u, k, kc, ch) = (0 until 6).map(r.getLong)
    assert(in >= q && q >= u && u >= k && k > 0)
    assert(kc <= k && kc > 0,
      "cluster-canonical keep is a subset of the pairwise keep")
    assert(ch >= k, "every kept doc yields at least one chunk")
  }

  test("clustered keep takes one doc per component, pairwise can take more") {
    // component {1,2,3}: edges only (1,3) and (2,3) — 1 and 2 are both
    // local minima (pairwise keeps both), the cluster keeps only 1.
    // Texts: 1 and 2 share >= 60% shingles with 3 but < 60% with each
    // other; 9 is an unrelated singleton.
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val crafted = Seq(
      (1L, s"$a one two three"),
      (2L, s"$a seven eight nine"),
      (3L, s"$a"),
      (9L, "completely different words about an unrelated subject matter")
    ).toDF("doc_id", "text")
    val pairwise = Curate.kept(crafted, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val clustered = Curate.keptClustered(crafted, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(clustered.subsetOf(pairwise))
    assert(clustered == Set(1L, 9L))
    assert(pairwise == Set(1L, 2L, 9L))
  }

  test("minhash prune path keeps the same set as the exact-pair path") {
    val exact = Curate.kept(docs, "doc_id", "text", exactPairs = true)
      .select("doc_id").as[Long].collect().toSet
    val lsh = Curate.kept(docs, "doc_id", "text", exactPairs = false)
      .select("doc_id").as[Long].collect().toSet
    assert(exact == lsh)
  }

  test("quality gate drops junk; exact dedup keeps min id") {
    val crafted = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "the quick brown fox jumps over the lazy dog today"), // dup of 10
      (12L, "!!! ??? ### $$$ %%%"),                                // punct junk
      (13L, "too short")                                           // < 5 words
    ).toDF("doc_id", "text")
    val kept = Curate.kept(crafted, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L))
  }
}
