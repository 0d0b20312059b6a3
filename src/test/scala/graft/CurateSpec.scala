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

  test("incremental: exact/near/kept flags against a fixed corpus") {
    val base = "the quick brown fox jumps over the lazy dog while " +
      "the cat sleeps near the warm fire in the old house"
    val corpus = Seq(
      (0L, base, "s"),
      (1L, "unrelated corpus text about catalyst rules physical plans " +
           "and whole stage code generation for joins", "s")
    ).toDF("doc_id", "text", "source")
    val delta = Seq(
      (10L, base, "s"),                          // repost: exact AND near
      (11L, base.replace("warm", "cold"), "s"),  // near only
      (12L, "fresh document with entirely disjoint vocabulary covering " +
            "bloom filters prefix indexes and sketches", "s"),
      (13L, base, "t")                           // exact text, other block:
    ).toDF("doc_id", "text", "source")           // exact yes, near no

    val out = Curate.incremental(delta, corpus, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out(10L) == ((true, true, false)))
    assert(out(11L) == ((false, true, false)))
    assert(out(12L) == ((false, false, true)))
    assert(out(13L) == ((true, false, false)),
      "near-dup is block-scoped; exact dup is corpus-global")
    assert(out.size == 4)
  }

  /** Sequential reference waterfill: greedily fund ascending strata,
    * then split what remains uniformly with the modulo going to the
    * first capped strata in order — the definitionally-obvious O(S)
    * loop the closed-form must agree with. */
  private def refWaterfill(ns: Seq[(String, Long)], num: Long, den: Long)
      : Map[String, Long] = {
    val sorted = ns.sortBy { case (k, n) => (n, k) }
    val total = ns.map(_._2).sum
    var t = total * num / den
    val out = scala.collection.mutable.Map.empty[String, Long]
    var remaining = sorted
    while (remaining.nonEmpty) {
      val share = t / remaining.size
      val (k, n) = remaining.head
      if (n <= share) { out(k) = n; t -= n; remaining = remaining.tail }
      else {
        // all remaining are capped: floor share + modulo to the first
        val r = (t % remaining.size).toInt
        remaining.zipWithIndex.foreach { case ((key, _), i) =>
          out(key) = share + (if (i < r) 1L else 0L)
        }
        remaining = Nil
      }
    }
    out.toMap
  }

  test("unimaxAlloc matches the sequential waterfill on random strata") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 25) {
      val s = 1 + rnd.nextInt(8)
      val ns = (0 until s).map(i => (f"s$i%02d", 1L + rnd.nextInt(1000)))
      val (num, den) = Seq((1L, 2L), (3L, 4L), (9L, 10L), (1L, 10L))(
        rnd.nextInt(4))
      val counts = ns.toDF("lang", "n")
      val got = Curate.unimaxAlloc(counts, "lang", num, den)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = refWaterfill(ns, num, den)
      assert(got == want, s"trial $trial: ns=$ns budget=$num/$den")
      // invariants: alloc <= n, sum == min(T, N)
      val total = ns.map(_._2).sum
      ns.foreach { case (k, n) => assert(got(k) <= n) }
      assert(got.values.sum == math.min(total * num / den, total))
    }
  }

  test("temperatureAlloc matches a sequential Hamilton reference") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 25) {
      val s = 1 + rnd.nextInt(8)
      val ns = (0 until s).map(i => (f"s$i%02d", 1L + rnd.nextInt(5000)))
      val counts = ns.toDF("lang", "n")
      val got = Curate.temperatureAlloc(counts, "lang")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // sequential largest-remainder reference over BigInt arithmetic
      val t = BigInt(ns.map(_._2).sum) / 4
      val ws = ns.map { case (k, n) =>
        k -> BigInt(math.floor(math.sqrt(n.toDouble) * 1e6).toLong) }
      val bw = ws.map(_._2).sum
      val base = ws.map { case (k, w) => k -> (t * w / bw) }.toMap
      val rem = ws.map { case (k, w) => k -> (t * w % bw) }
      val leftover = (t - base.values.sum).toInt
      val extra = rem.sortBy { case (k, r) => (-r, k) }
        .take(leftover).map(_._1).toSet
      val want = ns.map { case (k, _) =>
        k -> (base(k) + (if (extra(k)) 1 else 0)).toLong }.toMap
      assert(got == want, s"trial $trial: ns=$ns")
      // the defining Hamilton invariant: allocations sum to T exactly
      assert(got.values.sum == t.toLong, s"trial $trial sum != T")
    }
  }
}
