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

  test("fused shingle+minhash kernel == unfused shingles->minhash pipeline") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val toks = TextFunctions.tokenSet($"text")
    val unfused = TextDedup.minhashSignature(TextFunctions.shingles(toks, 3), 32)
    val fused = graft.plans.MinHashShingleFunctions
      .minhashShingleSignature(toks, 3, 32)
    val diff = docs.select($"doc_id", unfused.as("a"), fused.as("b"))
      .filter(!($"a" <=> $"b"))
    assert(diff.count() == 0)
    // degenerate shapes: short doc (< n tokens), empty doc
    val edge = Seq((1L, "just two"), (2L, "")).toDF("doc_id", "text")
    val e = edge.select(
      TextDedup.minhashSignature(
        TextFunctions.shingles(TextFunctions.tokenSet($"text"), 3), 8).as("a"),
      graft.plans.MinHashShingleFunctions
        .minhashShingleSignature(TextFunctions.tokenSet($"text"), 3, 8).as("b"))
      .filter(!($"a" <=> $"b"))
    assert(e.count() == 0)
  }

  test("shingleJaccardPairs ground truth: dup and near-dup, not unrelated") {
    val pairs = TextDedup.shingleJaccardPairs(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))             // exact dup: shingleJ = 1
    assert(!pairs.exists(p => p._1 >= 3L || p._2 >= 3L))
    // minhash recall contract on this corpus: every truth pair found
    val found = TextDedup.minhashPairs(corpus, "doc_id", "text",
      threshold = 0.5).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(found))
  }

  test("df cap drops ubiquitous tokens: capped Jaccard diverges as designed") {
    // 'common...' tokens appear in all 4 docs of the block (df ratio 1.0);
    // the distinguishing tail tokens are rare
    val docs = Seq(
      (0L, "common alpha beta gamma delta epsilon one two"),
      (1L, "alpha common beta gamma delta epsilon one two"),
      (2L, "common alpha beta gamma delta epsilon nine ten"),
      (3L, "common alpha beta gamma delta epsilon eleven twelve")
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val exact = TextDedup.tokenJaccardPairs(docs, "doc_id", "text",
      "source", threshold = 0.5).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val capped = TextDedup.tokenJaccardPairs(docs, "doc_id", "text",
      "source", threshold = 0.5, maxDfRatio = 0.8).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    // uncapped: the 6 ubiquitous tokens dominate — every pair is 6/10 or
    // 8/8, all >= 0.5: near-dup detection is meaningless
    assert(exact == Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)))
    // capped universe = the 2 rare tokens per doc (df 1/4 or 2/4 <= 0.8;
    // the common six at 4/4 are dropped): only (0,1) remain near-dups
    assert(capped == Set((0L, 1L)))
  }

  test("tokenJaccardAgainst == brute-force delta x corpus, never within-side") {
    val index = Seq(
      (0L, base, "s1"),
      (1L, base.replace("fox", "wolf"), "s1"),
      (2L, base, "s2"),
      (3L, "entirely disjoint vocabulary concerning columnar execution " +
           "vectorized readers and adaptive query planning", "s1")
    ).toDF("doc_id", "text", "src")
    val probe = Seq(
      (10L, base, "s1"),                          // near-dup of 0 and 1
      (11L, base, "s2"),                          // near-dup of 2 (block!)
      (12L, base, "s3"),                          // right text, wrong block
      (13L, "nothing here overlaps with anything else at all truly", "s1"),
      (14L, base.replace("warm", "cold"), "s1")   // near-dup of 0/1
    ).toDF("doc_id", "text", "src")

    val got = TextDedup.tokenJaccardAgainst(probe, index,
      "doc_id", "text", "src", threshold = 0.5)
      .select("probe_id", "index_id").as[(Long, Long)].collect().toSet

    // brute force over the full cross product, same-block only
    val pv = probe.select(col("doc_id").as("probe_id"), col("src"),
      TextFunctions.tokenSet(col("text")).as("ta"))
    val iv = index.select(col("doc_id").as("index_id"),
      col("src").as("isrc"), TextFunctions.tokenSet(col("text")).as("tb"))
    val brute = pv.crossJoin(iv)
      .filter(col("src") === col("isrc") &&
        TextDedup.jaccard(col("ta"), col("tb")) >= 0.5)
      .select("probe_id", "index_id").as[(Long, Long)].collect().toSet

    assert(got == brute, s"prefix-filtered $got != brute $brute")
    assert(brute.contains((10L, 0L)) && brute.contains((11L, 2L)) &&
      brute.contains((14L, 0L)))
    // wrong-block and disjoint-vocabulary probes pair with nothing;
    // within-probe / within-index pairs cannot form by construction
    assert(!got.exists(p => p._1 == 12L || p._1 == 13L))
    assert(got.forall(p => p._1 >= 10L && p._2 < 10L))

    // the pre-tokenized (stored-index) form must produce the IDENTICAL
    // pair set and jaccards — it is the per-ingest probe's fast path
    // (probe-side-only prefix, index-side full rows, exact verify)
    def prep(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("src").as("blk"),
        sort_array(TextFunctions.tokenSet(col("text"))).as("stoks"))
    val gotIdx = TextDedup.tokenJaccardAgainstIndexed(
        prep(probe), prep(index), threshold = 0.5)
      .select("probe_id", "index_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val gotFull = TextDedup.tokenJaccardAgainst(probe, index,
        "doc_id", "text", "src", threshold = 0.5)
      .select("probe_id", "index_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(gotIdx == gotFull, s"indexed $gotIdx != full $gotFull")
  }

  test("tokenJaccardAgainstIndexed == tokenJaccardAgainst on the " +
      "sf0.01 fixture (the adversarial dense-prefix corpus)") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val probe = docs.filter($"doc_id" % 100 >= 80)
      .withColumn("doc_id", $"doc_id" + 5000000L)
    val index = docs.filter($"doc_id" % 100 < 80)
    def prep(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("source").as("blk"),
        sort_array(TextFunctions.tokenSet(col("text"))).as("stoks"))
    val gotIdx = TextDedup.tokenJaccardAgainstIndexed(
        prep(probe), prep(index), threshold = 0.5)
      .select("probe_id", "index_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val gotFull = TextDedup.tokenJaccardAgainst(probe, index,
        "doc_id", "text", "source", threshold = 0.5)
      .select("probe_id", "index_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(gotIdx == gotFull,
      s"indexed lost ${(gotFull -- gotIdx).size} / " +
        s"invented ${(gotIdx -- gotFull).size} pairs")
    assert(gotFull.nonEmpty) // the fixture must actually exercise it
  }

  test("containment is directional and survives a huge asymmetric sup") {
    import spark.implicits._
    val big = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"w1 w2 w3 w4 w5", "s"),        // fully contained in 2
      (2L, big, "s"),                       // the containing doc
      (3L, "w1 w2 w3 w4 zz", "s"),         // 4/5 = 0.8 < 0.9 → out
      (4L, "w1 w2 w3 w4 w5", "other"),     // right tokens, wrong block
      (9L, "qq rr ss tt uu", "s")          // disjoint vocabulary
    ).toDF("doc_id", "text", "source")
    val got = graft.operators.TextDedup
      .tokenContainmentPairs(docs, "doc_id", "text", "source", 0.9)
      .select("id_sub", "id_sup").as[(Long, Long)].collect().toSet
    // Jaccard(1,2) = 5/60 ≈ 0.08 — symmetric dedup never finds this pair
    assert(got == Set((1L, 2L)),
      s"expected only the (quote → source) direction, got $got")
  }

  test("PPJoin length+positional candidate filters are lossless: " +
      "filtered operators == brute force over the sf0.01 fixture") {
    // the fixture corpus is the adversarial case (31-token vocabulary,
    // near-identical token sets → dense prefixes): if the r15 filters
    // over-pruned anywhere, it would show here before the oracle gate
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val tv = docs.select($"doc_id", $"source",
      TextFunctions.tokenSet($"text").as("t"))

    val bruteTok = tv.as("a").join(tv.as("b"),
        $"a.source" === $"b.source" && $"a.doc_id" < $"b.doc_id")
      .filter(TextDedup.jaccard($"a.t", $"b.t") >= 0.5)
      .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSet
    val gotTok = TextDedup.tokenJaccardPairs(docs, "doc_id", "text",
        "source", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(gotTok == bruteTok,
      s"token filter lost ${(bruteTok -- gotTok).size} / " +
        s"invented ${(gotTok -- bruteTok).size} pairs")

    // shingle variant: one global block, BOTH shingle- and token-Jaccard
    // >= 0.6 plus a shared token (the registered d06 semantics)
    val sv = docs.select($"doc_id",
      TextFunctions.tokenSet($"text").as("t"),
      TextFunctions.shingles(TextFunctions.tokenSet($"text"), 3).as("sh"))
    val bruteSh = sv.as("a").join(sv.as("b"), $"a.doc_id" < $"b.doc_id")
      .filter(size(array_intersect($"a.t", $"b.t")) > 0 &&
        TextDedup.jaccard($"a.sh", $"b.sh") >= 0.6 &&
        TextDedup.jaccard($"a.t", $"b.t") >= 0.6)
      .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSet
    val gotSh = TextDedup.shingleJaccardPairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(gotSh == bruteSh,
      s"shingle filter lost ${(bruteSh -- gotSh).size} / " +
        s"invented ${(gotSh -- bruteSh).size} pairs")

    // containment variant (asymmetric filters), block by source at 0.9
    val bruteCt = tv.as("a").join(tv.as("b"),
        $"a.source" === $"b.source" && $"a.doc_id" =!= $"b.doc_id")
      .filter(size(array_intersect($"a.t", $"b.t")).cast("double") /
        size($"a.t").cast("double") >= 0.9)
      .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSet
    val gotCt = TextDedup.tokenContainmentPairs(docs, "doc_id", "text",
        "source", 0.9)
      .select("id_sub", "id_sup").as[(Long, Long)].collect().toSet
    assert(gotCt == bruteCt,
      s"containment filter lost ${(bruteCt -- gotCt).size} / " +
        s"invented ${(gotCt -- bruteCt).size} pairs")
  }

  test("minhash estimator: identical docs estimate exactly 1.0; " +
      "planted partial overlap lands within the bound") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"))
      .toDF("doc_id", "text")
    // bound 0.0: only an exact estimate can set est_ok
    val out = TextDedup.minhashEstimateCheck(docs, "doc_id", "text",
      bound = 0.0, emitEst = true).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getBoolean(3), r.getDouble(4))).toMap
    // identical docs: every signature component agrees — est exactly 1
    val (j12, ok12, e12) = out((1L, 2L))
    assert(j12 == 1.0 && e12 == 1.0 && ok12)
    // 8-token docs differing in the last token: 5 shared of 7 distinct
    // shingles → J = 5/7; the k=64 estimate must land within 0.25
    val (j13, _, e13) = out((1L, 3L))
    assert(math.abs(j13 - 5.0 / 7.0) < 1e-3)
    assert(math.abs(e13 - j13) <= 0.25,
      s"estimator off by ${math.abs(e13 - j13)}")
  }
}
