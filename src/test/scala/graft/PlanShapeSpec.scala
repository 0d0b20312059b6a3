package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression tests: the 100 TB story lives in the PHYSICAL
  * plan, not the row counts — these assertions pin the plan properties
  * the design rules promise (pushdown, broadcast dims, partial top-1,
  * top-k without a global sort, no accidental cartesian products) so a
  * refactor that silently degrades a plan fails CI, not the cluster. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q06: filter AND projection reach the parquet scan") {
    val p = plan("q06_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // pruned ReadSchema: only the 3 referenced columns are read
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(Seq("l_orderkey", "l_extendedprice", "l_quantity", "l_shipdate")
      .count(read.contains) == read.split(",").length, read)
    assert(!read.contains("l_comment") && !read.contains("l_partkey"), read)
  }

  test("q02: dedup-latest plans a partial top-1 before the exchange") {
    val p = plan("q02_dedup_latest")
    assert(p.contains("WindowGroupLimit"), p)
    // partial mode runs map-side, final after one hash exchange
    assert(p.contains("Partial") || p.split("WindowGroupLimit").length > 2, p)
  }

  test("q03: dimensions broadcast; the fact side is never re-partitioned") {
    val p = plan("q03_enrich_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q07: global top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q07_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
    // no full Sort node outside the take-ordered operator
    assert(!p.linesIterator.exists(l => l.trim.startsWith("Sort ")), p)
  }

  test("q01: cleaning projections stay inside whole-stage codegen") {
    // formatted mode marks codegen'd operators with a '*' prefix
    val p = plan("q01_clean_project")
    assert(p.contains("* Project"), p)
  }

  test("s05: queries broadcast, corpus never shuffled before scoring") {
    val p = plan("s05_ann_quantized")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("l06: the dim join prunes the lake scan at RUNTIME (DPP)") {
    // the month list is only known after filtering the dim, so the
    // prune must be a dynamicpruning expression in PartitionFilters —
    // a post-scan row filter here means a decade-deep lake is read
    val p = plan("l06_dpp_prune")
    assert(p.contains("dynamicpruningexpression"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q37: range join is a bucket equi-join, not a nested loop") {
    val p = plan("q37_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q38: bloom prune sits under a shuffle join, not a broadcast") {
    val p = plan("q38_bloom_join")
    // the whole point: fact rows are dropped by the Bloom predicate
    // BEFORE the join exchange, in the non-broadcastable-dim regime
    assert(p.contains("bloom_might_contain"), p)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("q41: the array battery is one codegen projection — no exchange") {
    val p = plan("q41_array_battery")
    assert(p.contains("* Project"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("t14: top-20 is TakeOrderedAndProject; df/stats sides broadcast") {
    val p = plan("t14_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d08: the eval shingle set broadcasts; training text never shuffles") {
    val p = plan("d08_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q42: salted join shuffles on (key, salt), never broadcasts") {
    val p = plan("q42_salted_join")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.contains("__salt"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("q47: zorder key is one codegen projection over the scan") {
    val p = plan("q47_zorder_key")
    assert(p.contains("* Project"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("q48: every window stage shares ONE custkey exchange") {
    val p = plan("q48_scd2_history")
    // lag, running version sum, per-customer total, and the run-start
    // lead lookups are all partitioned by o_custkey — the all-window
    // formulation must plan exactly one hash exchange. Count detail-
    // section nodes ("(n) Exchange") — the tree section would double-
    // count every node
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1, p)
  }

  test("q49: base basket joins broadcast; fact agg is partial+final") {
    val p = plan("q49_price_index")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t19: df table broadcast onto the postings agg") {
    val p = plan("t19_inverted_index")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q51: the changeset joins broadcast; snapshot never re-shuffles") {
    val p = plan("q51_cdc_apply")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q55: rank filter pushes into WindowGroupLimit partial top-N") {
    val p = plan("q55_topn_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q65/q68/q72: the time-series family plans ONE suppkey exchange") {
    // EWMA (8 lags), TWAP (lead + agg on the window key), and the
    // moving median are all single-window-pass designs — a second
    // Exchange would mean the agg or a lag re-partitioned
    for (q <- Seq("q65_ewma", "q68_twap", "q72_moving_median")) {
      val p = plan(q)
      assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1, s"$q:\n$p")
    }
  }

  test("q69: both OHLC window passes and the bar agg share ONE exchange") {
    val p = plan("q69_ohlc_bars")
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1, p)
  }

  test("q66: fences and the part dim broadcast; the fact never SMJs") {
    val p = plan("q66_outlier_fences")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q73: the Pareto ranking runs over the per-part REDUCTION") {
    // the window's input must be the aggregated (partkey, rev) rows —
    // HashAggregate below the Window node, never the raw fact
    val p = plan("q73_abc_pareto")
    val wIdx = p.indexOf("Window")
    val aggIdx = p.indexOf("HashAggregate")
    assert(wIdx >= 0 && aggIdx >= 0 && aggIdx < wIdx, p)
  }

  test("t18: per-doc running sum is hash-partitioned (two-level packing)") {
    val p = plan("t18_seq_pack")
    // the window over per-doc rows must shuffle on the md5-prefix bucket,
    // never into one partition
    assert(p.contains("hashpartitioning(bucket"), p)
    // the only single-partition step allowed is the ≤256-row bucket-total
    // exclusive prefix; bases then broadcast back onto the doc rows
    assert("SinglePartition".r.findAllIn(p).size <= 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("c06: per-stratum rank windows are hash-partitioned two-level") {
    val p = plan("c06_unimax_mix")
    // the doc-level rank window shuffles on (lang, md5-prefix bucket) —
    // never one partition per stratum; SinglePartition exchanges exist
    // only on the per-stratum COUNT branches (S rows each)
    assert(p.contains("hashpartitioning(lang"), p)
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning(lang") && l.contains("bucket")), p)
  }

  test("t24: offset windows hash-partitioned; NO single-partition step") {
    val p = plan("t24_pack_materialize")
    // per-doc offset windows ride the md5-prefix buckets
    assert(p.contains("hashpartitioning(bucket"), p)
    // round-8: the vocab rank went two-level (Ranks.rankByCountDesc)
    // and the bucket-total prefix became a broadcast self-join, so the
    // whole plan carries ZERO SinglePartition exchanges — a 10⁸-token
    // vocabulary never funnels into one window partition
    assert(!p.contains("SinglePartition"), p)
    // every rank window is partitioned: (count, prefix) for the vocab
    // tie-break, (count) for its bases
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning(c#") || l.contains("hashpartitioning(c,")), p)
  }

  test("t32: both batching ranks hash-partitioned; doc rows never " +
      "coalesce") {
    val p = plan("t32_padding_waste")
    // arrival rank: md5RankByStratum windows ride (stratum, md5-prefix
    // bucket); sorted rank: the doc-level window rides the LENGTH
    // partition with its prefix bases arriving by broadcast join
    assert(p.contains("hashpartitioning(all"), p)
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning(len")), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // bounded single-partition steps only: the ≤256-row bucket-total
    // prefix window on each side of the union (counter-sized)
    assert("SinglePartition".r.findAllIn(p).size <= 2, p)
  }

  test("c04: doc-scoring rank window is hash-partitioned two-level") {
    val p = plan("c04_ccnet_buckets")
    // the per-doc rank window shuffles on the range bucket of the
    // (monotone) score — never every document into one partition
    assert(p.contains("hashpartitioning(rb"), p)
    // bounded single-partition steps only: t13's 1-row corpus totals
    // (one per branch before runtime ReuseExchange dedups them), the
    // ≤O(score-range) bucket prefix-sum window, and the 1-row n_total —
    // the doc rows themselves never coalesce (the rank Window rides the
    // rb exchange asserted above)
    assert("SinglePartition".r.findAllIn(p).size <= 5, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q40: order statistics located two-level, no global row ranking") {
    val p = plan("q40_approx_quantiles")
    // the row-level rank window shuffles on the value-range bucket and
    // ranks only the ≤8 target buckets (left_semi against the broadcast
    // target set) — the full orders table contributes map-side-combined
    // counts, never rows, to the single-partition steps
    assert(p.contains("hashpartitioning(rb"), p)
    assert(p.contains("LeftSemi"), p)
    // bounded single-partition steps: the 1-row approx_percentile agg
    // and the ≤O(value-range) bucket prefix-sum window, each printed
    // twice (tb feeds two joins; runtime ReuseExchange dedups them)
    assert("SinglePartition".r.findAllIn(p).size <= 4, p)
  }

  test("t27: pair top-50 is TakeOrderedAndProject over vocab-bounded rows") {
    val p = plan("t27_bpe_pairs")
    // top-50 under the total order is per-partition heaps + merge,
    // never a global sort or a rank window; the corpus contributes one
    // map-side-combined word count and the pair expansion runs on the
    // distinct-word frame
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("WindowExec") && !p.contains("Window ("), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("d14 probe: band collisions are equi-joins; no nested-loop path") {
    // the operator form (benchOverrides) — delta bands against the
    // persisted index must plan as hash/sort-merge equi-joins on
    // (table, bucket) and id; any nested-loop join means the candidate
    // generation degenerated to all-pairs — the exact failure mode the
    // banded index exists to prevent
    val df = SparkEntry.benchOverrides("d14_incremental_lsh")(
      spark, sf("sf0.001"))
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s20 encode: centroids and codebook broadcast; the delta is " +
      "never sort-merge joined") {
    // the ingest path's 100 TB shape: a micro-batch crossJoins the
    // BROADCAST centroid frame (argmin as a partial min-struct agg)
    // and equi-joins the BROADCAST codebook — the delta itself only
    // ever shuffles for its own aggregations, never for a join
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
    val idx = Similarity.buildIvfAdcIndex(emb, m = 16)
    val p = Similarity.encodeIvfAdc(emb.limit(50), idx)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("graftlake join planning: the V1Scan adapter hides static size " +
      "stats (SMJ planned), AQE's runtime sizes convert the small dim " +
      "to a broadcast — the l34 honest edge, measured") {
    import org.apache.spark.sql.functions._
    import graft.sources.VersionedLake
    import spark.implicits._
    val lake = java.nio.file.Files.createTempDirectory("lake_aqe").toString
    VersionedLake.reset(spark, lake)
    VersionedLake.commitOverwrite(
      Seq(("1997-01", 10.0), ("1997-02", 20.0), ("1997-03", 30.0))
        .toDF("month", "w"),
      "month", lake)
    val dim = spark.read.format("graftlake")
      .option("partitionColumn", "month").load(lake)
    // the fact must exceed the static broadcast threshold itself
    // (range sizes ARE statically known), else Catalyst broadcasts
    // the known-small FACT over the unknown-size lake side
    val fact = spark.range(2000000).select(
      concat(lit("1997-0"), (col("id") % 3 + 1).cast("string"))
        .as("month"),
      col("id").cast("double").as("v"))
    val joined = fact.join(dim, "month")
      .agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("s"))
    // static planning: the wrapper reports no size for the dim, so no
    // static broadcast happens (this is the documented boundary)
    val staticPlan = joined.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(staticPlan.contains("SortMergeJoin") ||
      staticPlan.contains("ShuffledHashJoin"), staticPlan)
    assert(joined.collect().head.getLong(0) == 2000000L)
    // ...and the MEASURED claim: AQE's actual shuffle sizes re-plan
    // the 3-row dim to a broadcast at runtime, so the broadcast
    // decision does not depend on static stats through the adapter
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan)
  }

  test("no CartesianProduct exec anywhere in the registry") {
    // crossJoin appears only with broadcast-tiny sides (1-row aggregates,
    // query/centroid frames) and must plan as BroadcastNestedLoopJoin —
    // a CartesianProduct means both sides were large: a scale bug
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
    }
  }
}
