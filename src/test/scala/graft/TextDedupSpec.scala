package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextDedup

/** Dedup family over crafted corpora: exact dedup multiplicity, planted
  * near-duplicates found by MinHash and SimHash, Jaccard expression
  * correctness. */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the cat sleeps near the warm fire in the old house"

  private def corpus = Seq(
    (0L, base),
    (1L, base),                                   // exact dup of 0
    (2L, base.replace("warm", "cold")),           // near dup of 0
    (3L, "completely different content about spark catalyst optimizer " +
         "rules and physical plans for distributed execution engines"),
    (4L, "another unrelated text mentioning parquet columnar storage " +
         "row groups page indexes and predicate pushdown at scan time")
  ).toDF("doc_id", "text")

  test("exact dedup: canonical id is min, multiplicity counted") {
    val out = TextDedup.exact(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 2L)        // docs 0 and 1 collapse
    assert(out.size == 4)        // 4 distinct texts
    assert(!out.contains(1L))    // 1 is not canonical
  }

  test("jaccard expression: identical=1, disjoint=0") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq("a", "b", "c"), Seq("b", "c", "d"))
    ).toDF("x", "y").select(TextDedup.jaccard($"x", $"y").as("j"))
    val js = df.as[Double].collect()
    assert(js(0) == 1.0 && js(1) == 0.0 && math.abs(js(2) - 0.5) < 1e-12)
  }

  test("minhash LSH finds exact and near duplicates, skips unrelated") {
    val pairs = TextDedup.minhashPairs(corpus, "doc_id", "text",
      threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs distance 0; near dups closer than unrelated") {
    val pairs = TextDedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number](2).longValue).toMap
    assert(pairs((0L, 1L)) == 0L)
    // one changed token in a ~20-token set flips several majority bits, so
    // (0,2) need not be within 3; but it must be closer than unrelated docs
    val sigs = TextDedup.simhash(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(0L, 2L) < ham(0L, 3L))
    assert(ham(0L, 2L) < ham(0L, 4L))
  }

  test("shingles produce n-grams; short docs fall back to one shingle") {
    val df = Seq(Seq("a", "b", "c", "d"), Seq("x"))
      .toDF("toks").select(TextFunctions.shingles($"toks", 3).as("s"))
    val out = df.as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("x"))
  }

  test("fingerprint is case/punctuation/whitespace invariant") {
    val df = Seq("Hello,   World!", "hello world", "hello  world.")
      .toDF("t").select(TextFunctions.fingerprint($"t").as("f"))
    assert(df.distinct().count() == 1)
  }
}
