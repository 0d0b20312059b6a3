package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions
import graft.operators.{Cleaning, Dedup, Quality, Similarity, TextDedup}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here as a
  * (SparkSession, sfDir) => DataFrame, with a DuckDB-equivalent ANSI SQL
  * oracle where the semantics are SQL-expressible. Column names are
  * aligned between the Spark result and the oracle (the driver's compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    PriceCatcher.run(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Core parity queries (SURVEY.md §2). Names sort in inventory order.
  // ---------------------------------------------------------------------

  /** q01 — P1/P2/P3 cleaning projections as one codegen'd select. */
  private def q01(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      Cleaning.dateToString(col("l_shipdate")).as("ship_date"),
      col("l_suppkey").cast("long").as("premise_code"),
      col("l_partkey").cast("long").as("item_code"),
      col("l_extendedprice").cast("double").as("price"),
      Cleaning.cleanString(col("l_returnflag")).as("flag"))

  /** q02 — A1 dedup-latest with deterministic tie-break (window form).
    * The order key ends in l_extendedprice because lineitem plants
    * duplicate (orderkey, linenumber) rows with differing prices (the
    * q22 lesson): the order must be TOTAL over every emitted column or
    * rank 1 of a group becomes engine-order-dependent. */
  private def q02(s: SparkSession, d: String): DataFrame =
    Dedup.latestPerGroup(
      Tables.lineitem(s, d),
      keys = Seq("l_suppkey", "l_partkey"),
      order = Seq(col("l_shipdate").desc, col("l_orderkey").asc,
                  col("l_linenumber").asc, col("l_extendedprice").asc))
      .select(
        col("l_suppkey").as("premise_code"),
        col("l_partkey").as("item_code"),
        Cleaning.dateToString(col("l_shipdate")).as("ship_date"),
        col("l_extendedprice").as("price"))

  /** q02b — A1 in the aggregate (max_by) formulation: enables map-side
    * partial aggregation so the shuffle carries one candidate per
    * group-per-partition instead of every row — the better plan when
    * groups are large/skewed. Checked against the SAME oracle as q02:
    * the two formulations must be indistinguishable. */
  private def q02b(s: SparkSession, d: String): DataFrame =
    Dedup.latestPerGroupAgg(
      Tables.lineitem(s, d),
      keys = Seq("l_suppkey", "l_partkey"),
      orderKey = struct(col("l_shipdate"), -col("l_orderkey"),
        -col("l_linenumber"), -col("l_extendedprice")),
      payload = Seq("l_shipdate", "l_extendedprice"))
      .select(
        col("l_suppkey").as("premise_code"),
        col("l_partkey").as("item_code"),
        Cleaning.dateToString(col("l_shipdate")).as("ship_date"),
        col("l_extendedprice").as("price"))

  /** q03 — the implied consumer join: latest price ⋈ items ⋈ premises
    * (both broadcast; fact-side partitioning untouched). */
  private def q03(s: SparkSession, d: String): DataFrame =
    graft.operators.Enrich.enrich(
      q02(s, d),
      Tables.part(s, d).select(col("p_partkey").as("item_code"),
        col("p_name").as("item"), col("p_brand").as("brand")),
      Tables.supplier(s, d).select(col("s_suppkey").as("premise_code"),
        col("s_name").as("premise")))
      .select("premise_code", "item_code", "ship_date", "price",
              "item", "brand", "premise")

  /** q04 — A2 uniqueness assertion as a data result: per-table duplicate
    * key counts over both dimension keys (0 ⇒ constraint holds). */
  private def q04(s: SparkSession, d: String): DataFrame = {
    val dupP = Quality.duplicateKeys(Tables.part(s, d), "p_partkey")
      .agg(count(lit(1)).as("dup_keys")).withColumn("tbl", lit("part"))
    val dupS = Quality.duplicateKeys(Tables.supplier(s, d), "s_suppkey")
      .agg(count(lit(1)).as("dup_keys")).withColumn("tbl", lit("supplier"))
    dupP.unionByName(dupS).select("tbl", "dup_keys")
  }

  /** q05 — pricing summary aggregation (TPC-H Q1 shape): map-side partial
    * agg + single shuffle on the two low-cardinality group keys. */
  private def q05(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // float aggregates rounded to 4dp: Spark's partial-agg summation
        // order differs from the oracle's, so raw doubles differ in ULPs.
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        // never a rounded avg: sum-of-cents/count lands on .xx5 decimals
        // where Spark HALF_UP and DuckDB binary rounding disagree — the
        // caller divides sum_disc/count_order (same discipline as q22/q32)
        round(sum(col("l_discount")), 4).as("sum_disc"),
        count(lit(1)).as("count_order"))

  /** q06 — filtered projection; both predicate and column set reach the
    * parquet scan (PushedFilters + 3-column ReadSchema at explain time). */
  private def q06(s: SparkSession, d: String): DataFrame =
    // to_timestamp parses in the SESSION timezone (pinned UTC);
    // java.sql.Timestamp.valueOf would parse in the JVM default zone
    // and shift the cutoff instant on non-UTC machines
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01 00:00:00"))
        && col("l_quantity") < 10)
      .select(col("l_orderkey"), col("l_extendedprice"))

  /** q07 — top-k: global top 100 orders by value. Spark plans this as
    * TakeOrderedAndProject — per-partition heaps + a k-row driver merge,
    * no global sort; the only plan that survives 100 TB. Unique
    * tie-break keeps the result set deterministic. */
  private def q07(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(col("o_orderkey"), col("o_totalprice"))

  /** q08 — set operations: symmetric difference of two customer cohorts
    * via UNION / INTERSECT / EXCEPT (all distinct semantics). */
  private def q08(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val a = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val b = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    a.union(b).except(a.intersect(b))
  }

  /** q09 — window analytics per customer: rank, lag, running sum. One
    * shuffle on o_custkey serves all three window functions (same
    * partition spec → single Window exec). */
  private def q09(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rnk", rank().over(Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .withColumn("prev_date",
        Cleaning.dateToString(lag(col("o_orderdate"), 1).over(w)))
      .withColumn("run_total",
        round(sum(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
      .select(col("o_custkey"), col("o_orderkey"), col("rnk"),
              col("prev_date"), col("run_total"))
  }

  /** q10 — scalar-function battery (SURVEY.md §2.8): trim/substr/case
    * conversions/round/concat/regexp/split/length/mod, all codegen'd
    * built-ins, zero UDFs. */
  private def q10(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      lower(col("p_type")).as("type_l"),
      substring(col("p_name"), 1, 5).as("name5"),
      length(col("p_name")).cast("long").as("name_len"),
      round(col("p_retailprice"), 1).as("price_r"),
      concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
      regexp_replace(col("p_name"), " ", "_").as("name_us"),
      size(split(col("p_name"), " ")).cast("long").as("n_words"),
      (col("p_partkey") % 7).as("key_mod"),
      when(col("p_size") > 25, lit("big")).otherwise(lit("small")).as("size_class"))

  /** q11 — semi/anti joins: customers with vs without orders. Both sides
    * aggregate to key-sets before the join at scale (semi/anti join
    * shuffles only distinct keys under AQE). */
  private def q11(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
    val withO = c.join(o, Seq("c_custkey"), "left_semi")
      .agg(count(lit(1)).as("cnt")).withColumn("cohort", lit("with_orders"))
    val noO = c.join(o, Seq("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("cnt")).withColumn("cohort", lit("without_orders"))
    withO.unionByName(noO).select("cohort", "cnt")
  }

  /** q12 — hierarchical rollup aggregate (nation × market segment).
    * Rollup nulls are disambiguated to 'ALL' (dims contain no real
    * nulls) so the oracle compare is unambiguous. */
  private def q12(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 4).as("sum_bal"))
      .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
              coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
              col("n_cust"), col("sum_bal"))
  }

  /** q13 — exact distinct counts (single + composite key). */
  private def q13(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(
      countDistinct(col("l_partkey")).as("d_parts"),
      countDistinct(col("l_suppkey")).as("d_supps"),
      countDistinct(col("l_partkey"), col("l_suppkey")).as("d_pairs"))

  /** q14 — join + aggregate: revenue per nation. orders⋈customer is the
    * real shuffle (both large at scale, equi-join on custkey); nation is
    * broadcast. AQE coalesces the post-shuffle partitions. */
  private def q14(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("o_totalprice")), 4).as("revenue"),
           count(lit(1)).as("n_orders"))
  }

  /** q15 — tumbling-window aggregation over the events table (batch form
    * of the Structured Streaming windowed agg; epoch-aligned 5-minute
    * buckets identical to DuckDB's time_bucket). */
  private def q15(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** q39 — stream-static dim enrichment, batch twin: runs the EXACT
    * same code path as the st05 streaming drive
    * ([[graft.streaming.EventStreams.enrichedTumblingAgg]] — its
    * withWatermark is a documented no-op on a batch frame), so the
    * oracle gate on this query covers the streaming operator's
    * semantics for on-time data. Dim is broadcast; the stream/fact side
    * is never re-partitioned by the join, and the only shuffle is the
    * (window, segment) aggregation. */
  private def q39(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventStreams.enrichedTumblingAgg(
      Tables.events(s, d), Tables.customer(s, d))

  /** q16 — sessionization in batch: a new session starts after a >30 min
    * gap per user. lag + running-sum over one user-partitioned window —
    * a single shuffle on user_id; the streaming twin lives in
    * graft.streaming (flatMapGroupsWithState). */
  private def q16(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("new_sess",
        when(col("ts").cast("double") - lag(col("ts").cast("double"), 1).over(w) > 1800.0, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"))
  }

  /** q17 — approximate distinct (HLL sketch): the 100 TB path for q13.
    * Sketch internals differ between engines, so the oracle checks the
    * sketch's CONTRACT instead of its value: Spark emits the exact
    * counts (DuckDB recomputes them independently) plus booleans
    * asserting the rsd=2% sketch landed within 5% of exact — the row
    * hash-matches iff the sketch honors its error bound. HLL is
    * deterministic for fixed data, so the booleans are stable. */
  private def q17(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(
      approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("ao"),
      countDistinct(col("l_partkey")).as("d_parts"),
      countDistinct(col("l_orderkey")).as("d_orders"))
      .select(col("d_parts"), col("d_orders"),
        (abs(col("ap") - col("d_parts")).cast("double") / col("d_parts") <= 0.05)
          .as("parts_within_5pct"),
        (abs(col("ao") - col("d_orders")).cast("double") / col("d_orders") <= 0.05)
          .as("orders_within_5pct"))

  /** q18 — backward as-of join (orders pick up the latest lineitem
    * shipment at/before their order date for a shared key) via the
    * single-shuffle union+carry-forward plan in [[graft.operators.AsOfJoin]]. */
  private def q18(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
      .withColumn("k", col("o_custkey") % 10)
    val ships = Tables.lineitem(s, d)
      .select(col("l_suppkey").as("k"), col("l_shipdate"))
    graft.operators.AsOfJoin.asofBackward(
      orders, ships, "k", "k", "o_orderdate", "l_shipdate",
      leftCols = Seq("o_orderkey", "o_orderdate"), asOfOut = "asof_ship")
      .select(col("o_orderkey"),
        Cleaning.dateToString(col("o_orderdate")).as("order_date"),
        Cleaning.dateToString(col("asof_ship")).as("asof_date"))
  }

  /** q18b — payload-carrying as-of join: like q18 but fetching the
    * matched shipment's price alongside its date. The right side is
    * pre-deduped to one row per (key, time) with a deterministic rule
    * (max price) because DuckDB's ASOF leaves the surviving row at tied
    * times unspecified — both engines then see an unambiguous match. */
  private def q18b(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
      .withColumn("k", col("o_custkey") % 10)
    val ships = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey").as("k"), col("l_shipdate"))
      .agg(max(col("l_extendedprice")).as("ship_price"))
    graft.operators.AsOfJoin.asofBackward(
      orders, ships, "k", "k", "o_orderdate", "l_shipdate",
      leftCols = Seq("o_orderkey", "o_orderdate"), asOfOut = "asof_ship",
      rightCols = Seq("ship_price"))
      .select(col("o_orderkey"),
        Cleaning.dateToString(col("o_orderdate")).as("order_date"),
        Cleaning.dateToString(col("asof_ship")).as("asof_date"),
        col("ship_price"))
  }

  /** q18c — FORWARD as-of join: each order picks up the earliest
    * shipment at/after its date (mirror of q18, same single-shuffle
    * union+carry plan walked in descending time). */
  private def q18c(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
      .withColumn("k", col("o_custkey") % 10)
    val ships = Tables.lineitem(s, d)
      .select(col("l_suppkey").as("k"), col("l_shipdate"))
    graft.operators.AsOfJoin.asofForward(
      orders, ships, "k", "k", "o_orderdate", "l_shipdate",
      leftCols = Seq("o_orderkey", "o_orderdate"), asOfOut = "asof_ship")
      .select(col("o_orderkey"),
        Cleaning.dateToString(col("o_orderdate")).as("order_date"),
        Cleaning.dateToString(col("asof_ship")).as("asof_date"))
  }

  /** q19 — pivot: revenue matrix nation × market segment (fixed pivot
    * values keep the schema static — mandatory at scale, a dynamic pivot
    * needs a driver-side distinct pass first). */
  private def q19(s: SparkSession, d: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("c_mktsegment", segs)
      .agg(round(sum(col("o_totalprice")), 4))
  }

  /** q20 — statistical aggregates: correlation, stddev, variance,
    * covariance (all single-pass, partial-aggregable moments). */
  private def q20(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).agg(
      round(corr(col("o_totalprice"), col("o_custkey")), 6).as("corr_tc"),
      round(stddev_samp(col("o_totalprice")), 4).as("sd_total"),
      round(var_samp(col("o_totalprice")), 4).as("var_total"),
      round(covar_samp(col("o_totalprice"), col("o_custkey")), 4).as("cov_tc"))

  /** q21 — ordered string aggregation per group (deterministic:
    * array_sort before join). */
  private def q21(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .groupBy(col("n_regionkey"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))

  /** q22 — moving average (last 4 rows) per supplier over ship time;
    * same single-shuffle window shape as the dedup. */
  private def q22(s: SparkSession, d: String): DataFrame = {
    // l_extendedprice as the final sort key: (orderkey, linenumber) is
    // NOT unique in this data (planted dup rows — the reason q02
    // exists), and at sf0.1 one such tie has differing prices, so
    // engines disagree on running sums unless the order is total over
    // every sum-relevant column (remaining ties are then value-identical
    // rows, making the windowed sums order-invariant)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
        col("l_linenumber").asc, col("l_extendedprice").asc)
      .rowsBetween(-3, Window.currentRow)
    // windowed SUM of 2-dp prices is an exact 2-dp decimal, so
    // round(.,2) is ULP-immune; a rounded windowed AVG diverges between
    // engines at sf0.1 (same .xx5 trap as q32) — emit sum + count, the
    // caller divides
    Tables.lineitem(s, d).select(
      col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      round(sum(col("l_extendedprice")).over(w), 2).as("ma4_sum"),
      count(lit(1)).over(w).as("ma4_n"))
  }

  /** q23 — full outer join with presence classification. */
  private def q23(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_custkey"))
    val o = Tables.orders(s, d).select(col("o_custkey")).distinct()
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .select(
        when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "both")
          .when(col("c_custkey").isNotNull, "customer_only")
          .otherwise("orders_only").as("presence"))
      .groupBy(col("presence")).agg(count(lit(1)).as("cnt"))
  }

  /** q24 — cube over (nation, segment): all four grouping combinations. */
  private def q24(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .cube(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"))
      .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
              coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
              col("n_cust"))
  }

  /** q25 — exact interpolated percentiles (Spark `percentile` ==
    * DuckDB `quantile_cont` semantics). One percentile(array(...)) call:
    * four separate aggregates each build their own value-count map over
    * the full column — the array form shares a single buffer. */
  private def q25(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .agg(expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.99D))")
        .as("ps"))
      .select(
        round(element_at(col("ps"), 1), 4).as("p25"),
        round(element_at(col("ps"), 2), 4).as("p50"),
        round(element_at(col("ps"), 3), 4).as("p75"),
        round(element_at(col("ps"), 4), 4).as("p99"))

  /** q40 — approximate quantiles via the mergeable GK sketch
    * (approx_percentile, accuracy 1000 ⇒ rank error ≤ n/1000), checked
    * as a rank-bound CONTRACT: the oracle recomputes the exact values
    * at ranks (q ± 0.01)·n — 10× the sketch's guarantee, so the
    * boolean carries a wide deterministic margin (raw rank errors:
    * `graft.RecallProbe`) — and asserts each approx value lands
    * between them. lo/hi are raw column values (no arithmetic), so
    * they hash bit-exactly. Even the verification side avoids a global
    * sort: the 8 needed order statistics are located two-level — a
    * map-side-combined count per value-range bucket, broadcast prefix
    * sums to find which bucket holds each target rank, then a
    * hash-partitioned row_number over ONLY those ≤8 buckets' rows
    * (ties share the value, so the statistic is deterministic). Bench
    * still measures the sketch agg alone (benchOverrides). At 100 TB
    * the sketch is the only form that exists — exact percentiles (q25)
    * need a global sort, GK partials merge map-side like any agg. */
  private def q40(s: SparkSession, d: String): DataFrame = {
    val slack = 0.01
    val o = Tables.orders(s, d).select(col("o_totalprice").as("val"))
    val approx = o.agg(
      expr("approx_percentile(val, array(0.25D, 0.5D, 0.75D, 0.99D), 1000)")
        .as("ap"),
      count(lit(1)).as("n"))
    rankBoundCheck(o, quantileBounds(approx, slack))
  }

  /** (quantile, av, klo, khi) frame from a 1-row (ap array, n) approx
    * result: target ranks at (q ± slack)·n, clamped to [1, n]. */
  private def quantileBounds(approx: DataFrame, slack: Double): DataFrame =
    approx
      .select(col("ap"), col("n"),
        posexplode(array(Seq(0.25, 0.5, 0.75, 0.99).map(lit): _*)))
      .select(element_at(col("ap"), col("pos") + 1).as("av"),
        col("col").as("quantile"),
        greatest(lit(1L), floor((col("col") - slack) * col("n"))
          .cast("long")).as("klo"),
        least(col("n"), ceil((col("col") + slack) * col("n"))
          .cast("long")).as("khi"))

  /** Shared rank-bound verifier (q40/q78): locate the exact order
    * statistics at each target rank two-level — map-side-combined
    * counts per value-range bucket, broadcast prefix sums to find the
    * bucket holding each rank, then a hash-partitioned row_number over
    * ONLY the ≤8 target buckets' rows — and assert each approx value
    * lands between its lo/hi exact values. The full table contributes
    * counters, never rows, to any single-partition step. */
  private def rankBoundCheck(o: DataFrame, k: DataFrame): DataFrame = {
    // bucket counts: the only full-table pass, and it shuffles counters
    // (map-side partial agg), never rows
    val bucketed = o.withColumn("rb", floor(col("val") / 1024d).cast("long"))
    val bcounts = bucketed.groupBy(col("rb")).agg(count(lit(1)).as("bc"))
    val baseW = Window.orderBy(col("rb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = bcounts.select(col("rb").as("trb"), col("bc"),
      coalesce(sum(col("bc")).over(baseW), lit(0L)).as("base"))
    // 8 target ranks → the bucket containing each (base < rank ≤ base+bc)
    val tb = k.select(col("quantile"), col("av"), explode(array(
        struct(lit("lo").as("side"), col("klo").as("tr")),
        struct(lit("hi").as("side"), col("khi").as("tr")))).as("t"))
      .select(col("quantile"), col("av"), col("t.side").as("side"),
        col("t.tr").as("tr"))
      .join(broadcast(bases),
        col("tr") > col("base") && col("tr") <= col("base") + col("bc"))
      .select(col("quantile"), col("av"), col("side"), col("tr"),
        col("base"), col("trb"))
    // rank only rows inside a target bucket (≤8 buckets survive the semi)
    val localW = Window.partitionBy(col("rb")).orderBy(col("val").asc)
    val hit = bucketed
      .join(broadcast(tb.select(col("trb")).distinct()),
        col("rb") === col("trb"), "left_semi")
      .withColumn("lr", row_number().over(localW).cast("long"))
    hit.join(broadcast(tb),
        col("rb") === col("trb") && col("lr") === col("tr") - col("base"))
      .groupBy(col("quantile"), col("av")).agg(
        max(when(col("side") === "lo", col("val"))).as("lo"),
        max(when(col("side") === "hi", col("val"))).as("hi"))
      .select(col("quantile"), col("lo"), col("hi"),
        (col("av") >= col("lo") && col("av") <= col("hi"))
          .as("within_bounds"))
  }

  /** q78 — KLL quantile-sketch LIFECYCLE (per-year sketch_agg →
    * merge_agg → get_quantile): the mergeable-quantile story next to
    * q40's one-shot GK — per-slice partial sketches persist and a new
    * year's data never re-reads history, exactly q52's incremental
    * composition for the quantile family. Checked with the SAME
    * two-level rank-bound harness as q40 ([[rankBoundCheck]]): each
    * merged-sketch quantile must land between the exact values at
    * ranks (q ± 0.03)·n — beyond KLL k=200's ~1.33% two-sided
    * normalized rank-error guarantee, so the boolean carries real
    * margin. */
  private def q78(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_totalprice").as("val"),
      year(col("o_orderdate")).as("yr"))
    val perYr = o.groupBy(col("yr"))
      .agg(expr("kll_sketch_agg_double(val, 200)").as("sk"))
    val approx = perYr.agg(expr("kll_merge_agg_double(sk)").as("msk"))
      .select(expr("kll_sketch_get_quantile_double(msk, " +
          "array(0.25D, 0.5D, 0.75D, 0.99D))").as("ap"),
        expr("kll_sketch_get_n_double(msk)").as("n"))
    rankBoundCheck(o.select(col("val")), quantileBounds(approx, 0.03))
  }

  /** q79 — theta-sketch SET OPERATIONS: distinct-user estimates for
    * pairwise event-type INTERSECTIONS — the question HLL cannot
    * answer (HLL unions only; theta sketches keep a hash sample, so
    * A∩B and A\B estimate directly). Per-type sketches build in one
    * partial-combined pass; the |types|² pairing is vocabulary-sized.
    * Contract oracle: DuckDB recomputes every exact intersection; the
    * boolean asserts the estimate within 10% (at fixture scale the
    * sketches run in exact mode — every user hash retained below
    * lgK=12 capacity — so the margin is the full band). */
  private def q79(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("user_id")).distinct()
    val sks = ev.groupBy(col("event_type"))
      .agg(expr("theta_sketch_agg(user_id)").as("sk"))
    val est = sks.select(col("event_type").as("ta"), col("sk").as("ska"))
      .join(sks.select(col("event_type").as("tb"), col("sk").as("skb")),
        col("ta") < col("tb"))
      .select(col("ta"), col("tb"),
        expr("theta_sketch_estimate(theta_intersection(ska, skb))")
          .as("est"))
    val exact = ev.select(col("event_type").as("ta"), col("user_id"))
      .join(ev.select(col("event_type").as("tb"), col("user_id")),
        "user_id")
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    est.join(exact, Seq("ta", "tb"))
      .select(col("ta"), col("tb"), col("n_exact"),
        (abs(col("est") - col("n_exact")).cast("double")
          <= col("n_exact").cast("double") * 0.10).as("within_10pct"))
  }

  /** l01 — JSONL export/reimport parity: writes the documents table as
    * newline-delimited JSON (the interchange format training-data
    * pipelines speak), reads it back through the same schema, and
    * asserts exact content parity via an order-insensitive
    * bit_xor(xxhash64) signature (ANSI-safe; sum would throw on
    * overflow). Real sink+source plumbing — splittable line files,
    * full unicode/escape round-trip — with the weaker aggregate-parity
    * oracle (count + contract boolean): the CONTENT equality is the
    * Spark-side signature comparison. */
  private def l01(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val out = s"/tmp/graft_jsonl_${Integer.toHexString(d.hashCode)}"
    docs.write.mode("overwrite").json(out)
    val back = s.read.schema(docs.schema).json(out)
    def sig(df: DataFrame, n: String, g: String) = df.agg(
      count(lit(1)).as(n),
      expr("bit_xor(xxhash64(doc_id, text, lang, source, n_chars))").as(g))
    sig(docs, "n_docs", "sig_a").crossJoin(sig(back, "n_back", "sig_b"))
      .select(col("n_docs"),
        (col("n_docs") === col("n_back") && col("sig_a") === col("sig_b"))
          .as("roundtrip_ok"))
  }

  /** l03 — ORC interchange roundtrip: the columnar format a
    * mixed-engine lake speaks alongside parquet (Hive/Trino/Presto
    * lineage) — completes the format battery next to l01's JSONL and
    * the parquet scans. Writes documents as zlib ORC, reads back, and
    * asserts exact content parity via the l01 order-insensitive
    * bit_xor(xxhash64) signature; the per-lang aggregate is computed
    * FROM THE ORC COPY (vectorized ORC reader + pushdown, same scan
    * discipline as parquet) so the oracle's parquet-derived numbers
    * gate the whole write→read→aggregate path. */
  private def l03(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val out = s"/tmp/graft_orc_${Integer.toHexString(d.hashCode)}"
    docs.write.mode("overwrite").option("compression", "zlib").orc(out)
    val back = s.read.schema(docs.schema).orc(out)
    def sig(df: DataFrame, n: String, g: String) = df.agg(
      count(lit(1)).as(n),
      expr("bit_xor(xxhash64(doc_id, text, lang, source, n_chars))").as(g))
    val langAgg = back.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_lang"), sum(col("n_chars")).as("sum_chars"))
    langAgg.crossJoin(
        sig(docs, "n_docs", "sig_a").crossJoin(sig(back, "n_back", "sig_b"))
          .select((col("n_docs") === col("n_back") &&
            col("sig_a") === col("sig_b")).as("roundtrip_ok")))
  }

  /** l05 — Avro interchange roundtrip, completing the format battery
    * (parquet scans, l01 JSONL, l02 dirty CSV, l03 ORC): the
    * row-oriented container format an ingest/Kafka tier speaks. Writes
    * documents as deflate Avro object-container files via
    * [[graft.sources.AvroLake]] (the public Avro library directly —
    * the spark-avro connector jar is absent here; see AvroLake's
    * scaladoc), reads them back, and gates the whole
    * write→read→aggregate path exactly like l03: per-lang aggregate
    * computed FROM THE AVRO COPY against parquet-derived oracle
    * numbers, plus the l01 order-insensitive bit_xor(xxhash64) content
    * signature as a roundtrip_ok boolean. */
  private def l05(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val out = s"/tmp/graft_avro_${Integer.toHexString(d.hashCode)}"
    graft.sources.AvroLake.write(docs, out)
    val back = graft.sources.AvroLake.read(s, out).toDF()
    def sig(df: DataFrame, n: String, g: String) = df.agg(
      count(lit(1)).as(n),
      expr("bit_xor(xxhash64(doc_id, text, lang, source, n_chars))").as(g))
    val langAgg = back.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_lang"), sum(col("n_chars")).as("sum_chars"))
    langAgg.crossJoin(
        sig(docs, "n_docs", "sig_a").crossJoin(sig(back, "n_back", "sig_b"))
          .select((col("n_docs") === col("n_back") &&
            col("sig_a") === col("sig_b")).as("roundtrip_ok")))
  }

  /** l06 — DYNAMIC PARTITION PRUNING over the month-partitioned lake:
    * the reason [[graft.sources.PartitionedLake]] partitions by month
    * at all. The filter that decides WHICH months matter lives on a
    * dimension (here: the order-calendar dim, filtered on year+quarter
    * — columns the fact's partition key only determines indirectly, so
    * no static prune is possible); Spark's DPP rule turns the joined
    * dim into a runtime IN-subquery on the fact scan's PartitionFilters
    * (pinned in PlanShapeSpec), so a 100 TB decade-deep lake opens
    * exactly the 3 matching months' files instead of scanning
    * everything into the join. The dim broadcasts; DPP reuses that
    * same broadcast exchange as the pruning subquery — the prune is
    * free. Oracle: recomputes the whole join+aggregate from the
    * original parquet, gating the write→prune→join→agg path. */
  private def l06(s: SparkSession, d: String): DataFrame = {
    val lake = s"/tmp/graft_dpp_${Integer.toHexString(d.hashCode)}"
    graft.sources.PartitionedLake.writeByMonth(
      Tables.lineitem(s, d).select("l_orderkey", "l_quantity", "l_shipdate"),
      "l_shipdate", lake)
    val dim = Tables.orders(s, d)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"))
      .filter(col("yr") === 1997 && col("qtr") === 1)
      .select("month").distinct()
    s.read.parquet(lake).join(dim, Seq("month"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
  }

  /** l07 — small-file COMPACTION maintenance
    * ([[graft.sources.PartitionedLake.compactAll]]): streaming ingest
    * (st09/st11's upsert-per-batch discipline) leaves each partition
    * holding one file per micro-batch; every later scan pays a task +
    * a parquet footer per file, which at 100 TB is the difference
    * between a manifest read and a namenode meltdown. The fixture
    * stages the documents lake pre-fragmented by FOUR sequential
    * single-task writes (one per doc_id % 4 residue) — each write
    * lands exactly one file in every lang it touches, so the
    * FS-MEASURED files_before per lang EQUALS the data-derivable
    * count(DISTINCT doc_id % 4), which the oracle recomputes from the
    * table at any SF (the r9-advice fix: the old 8-hash-bucket staging
    * asserted files_before >= 4, a threshold the fixture's hash
    * residues happened to satisfy, not a property of the data) —
    * compacts to one file per lang, and emits the per-lang aggregate
    * FROM THE COMPACTED LAKE, gating that re-layout moved no rows.
    * The coalesce(1) staging writes are the FRAGMENTER (simulating
    * many tiny ingests), not the operator under test. */
  private def l07(s: SparkSession, d: String): DataFrame = {
    import graft.sources.PartitionedLake
    val lake = s"/tmp/graft_compact_${Integer.toHexString(d.hashCode)}"
    val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
    (0 to 3).foreach { r =>
      docs.filter(pmod(col("doc_id"), lit(4)) === r).coalesce(1)
        .write.mode(if (r == 0) "overwrite" else "append")
        .partitionBy("lang").parquet(lake)
    }
    val before = PartitionedLake.partitionFileCounts(s, lake, "lang")
    PartitionedLake.compactAll(s, lake, "lang")
    val after = PartitionedLake.partitionFileCounts(s, lake, "lang")
    val sp = s
    import sp.implicits._
    val counts = before.keys.toSeq.sorted
      .map(l => (l, before(l), after.getOrElse(l, 0)))
      .toDF("lang", "files_before", "files_after")
    s.read.parquet(lake)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .join(broadcast(counts), Seq("lang"))
      .select(col("lang"), col("n_docs"), col("sum_chars"),
        col("files_before").cast("long").as("files_before"),
        (col("files_after") === 1).as("compacted_ok"))
  }

  /** l08 — file-level ZONE-MAP skipping over a PERSISTED manifest
    * table ([[graft.sources.ZoneMapLake]]): the lake is written
    * range-clustered on the key with its per-file (lo, hi, n_rows)
    * manifest persisted ONCE at write time as a parquet table in the
    * lake (`_zonemap/` — the Iceberg manifest / Delta file-stats
    * shape; r9 verdict item 3: no per-query manifest rebuild, no
    * whole-manifest driver array). The registered query is the
    * RETRIEVAL path a production reader runs: global bounds come from
    * ONE aggregate row over the manifest table, the key-range
    * predicate filters the manifest table, and only the MATCHED file
    * paths — planning metadata, match-sized — reach the driver for
    * the pruned scan; unmatched files are never opened. The query's
    * bounds derive from the manifest's own global min/max (integer
    * arithmetic the oracle re-derives from the table), the aggregate
    * is computed from the PRUNED read, and `skip_effective` asserts
    * the manifest actually dropped at least half the files — a
    * pruning regression fails the gate, a row-loss regression fails
    * the oracle numbers. Staged once per JVM: write+manifest-build is
    * the l06-pair discipline, the measured row is the query. */
  private val zoneMapLakeCache = scala.collection.concurrent.TrieMap
    .empty[String, String]
  private def l08(s: SparkSession, d: String): DataFrame = {
    import graft.sources.ZoneMapLake
    val lake = zoneMapLakeCache.getOrElseUpdate(d, {
      val p = s"/tmp/graft_zonemap_${Integer.toHexString(d.hashCode)}"
      ZoneMapLake.write(
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_extendedprice"),
        "l_orderkey", p, nFiles = 16)
      p
    })
    val b = ZoneMapLake.manifest(s, lake)
      .agg(min(col("lo")).as("gmin"), max(col("hi")).as("gmax")).head()
    val (gmin, gmax) = (b.getLong(0), b.getLong(1))
    val lo = gmin + (gmax - gmin) / 2
    val hi = gmin + (gmax - gmin) * 5 / 8
    val (pruned, nMatched, nTotal) = ZoneMapLake.prunedRead(s, lake, lo, hi)
    pruned
      .filter(col("l_orderkey").between(lo, hi))
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_quantity"), 0).cast("long")).as("qty"),
        sum(round(col("l_extendedprice") * 100, 0).cast("long"))
          .as("price_cents"))
      .withColumn("skip_effective", lit(nMatched * 2 <= nTotal))
  }

  /** The versioned-lake family's shared staging frame: 1997 Q1
    * lineitem slimmed to (key, payload, month). `dedupKeys` collapses
    * the fixture's planted duplicate (orderkey, linenumber) rows to
    * one per key — required wherever keyed semantics (MERGE l11, CDF
    * l13) make "the matched row" ill-posed under duplicates. */
  private def ttSlimLineitem(s: SparkSession, d: String,
                             dedupKeys: Boolean = false): DataFrame = {
    val base = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .filter(col("month").between("1997-01", "1997-03"))
    if (!dedupKeys) base
    else base.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(min(col("l_quantity")).as("l_quantity"),
        min(col("month")).as("month"))
  }

  /** The insert-key offset for the tt-fixtures' synthetic rows: the
    * next 10M multiple ABOVE the table's own max key, derived (one
    * 1-row planning aggregate) rather than hardcoded — a fixed
    * +10000000 silently collides with real orderkeys once the SF grows
    * them past it (~SF 1.7; r10 advice). The oracle derives the same
    * bound in SQL — the derivation IS the fixture's construction spec,
    * not an engine formula. At the fixture SFs this lands on exactly
    * 10000000, so historical hashes are unchanged. */
  private def ttKeyOffset(li: DataFrame): Long = {
    val mx = li.agg(max(col("l_orderkey"))).head().getLong(0)
    (mx / 10000000L + 1L) * 10000000L
  }

  /** The oracle-side twin of [[ttKeyOffset]] over a CTE named `li`. */
  private val ttKeyOffsetSql: String =
    "(SELECT (max(l_orderkey) // 10000000 + 1) * 10000000 FROM li)"

  /** One (n_rows, sum_qty, key_sig, version) summary row per frame. */
  private def ttVersionSummary(df: DataFrame, v: Int): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        sum(col("l_orderkey") * 7 + col("l_linenumber")).as("key_sig"))
      .withColumn("version", lit(v))

  /** l09/l11's shared output shape: both versions' summaries plus the
    * q56-style full-outer diff counts between them on the v2 row. */
  private def ttSummariesWithDiff(v1: DataFrame,
                                  v2: DataFrame): DataFrame = {
    val key = Seq("l_orderkey", "l_linenumber")
    val diff = v1.select((key.map(col) :+ col("l_quantity").as("q1")): _*)
      .join(v2.select((key.map(col) :+ col("l_quantity").as("q2")): _*),
        key, "full_outer")
      .agg(
        sum(when(col("q1").isNotNull && col("q2").isNotNull
          && col("q1") =!= col("q2"), 1L).otherwise(0L))
          .as("n_changed_vs_prev"),
        sum(when(col("q2").isNull, 1L).otherwise(0L))
          .as("n_removed_vs_prev"),
        sum(when(col("q1").isNull, 1L).otherwise(0L))
          .as("n_added_vs_prev"))
    ttVersionSummary(v1, 1)
      .withColumn("n_changed_vs_prev", lit(0L))
      .withColumn("n_removed_vs_prev", lit(0L))
      .withColumn("n_added_vs_prev", lit(0L))
      .unionByName(ttVersionSummary(v2, 2).crossJoin(diff))
  }

  /** l09 — snapshot VERSIONING / TIME TRAVEL
    * ([[graft.sources.VersionedLake]]): the capstone of the l06–l08
    * lake family (r9 verdict item 2). The in-place dynamic-overwrite
    * lake loses history the moment an upsert lands; a versioned lake
    * (immutable data files + per-version manifests, the Delta/Iceberg
    * commit-log shape) keeps every snapshot readable — restatements
    * become auditable instead of destructive. The fixture drives the
    * canonical restatement story on ONE lake: version 1 commits
    * 1997 Q1, version 2 upserts a February correction (lines ≤ 4
    * kept, quantity + 1 — January/March carry forward BY POINTER,
    * never rewritten), then both versions are time-travel read from
    * the same lake and q56's snapshot-diff discipline runs BETWEEN
    * them (one full-outer join on the key, counts ∝ churn). The
    * oracle re-derives both snapshots and the diff from the original
    * parquet — a row lost or duplicated by the manifest machinery
    * fails n_rows/key_sig; a stale-version read fails the v1 row;
    * diff-count drift fails the v2 row. LakeSpec additionally pins
    * the concurrent-reader-sees-old-version guarantee. */
  private def l09(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_ttlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake) // deterministic two-commit history
    val li = ttSlimLineitem(s, d)
    VersionedLake.commitOverwrite(li, "month", lake)
    val feb = li.filter(col("month") === "1997-02")
      .filter(col("l_linenumber") <= 4)
      .withColumn("l_quantity", col("l_quantity") + 1)
    VersionedLake.commitUpsert(feb, "month", lake)
    ttSummariesWithDiff(VersionedLake.readVersion(s, lake, 1),
      VersionedLake.readLatest(s, lake))
  }

  /** l10 — retention VACUUM on the versioned lake
    * ([[graft.sources.VersionedLake.vacuum]]): l09's append-only
    * commit log completes the lifecycle here — without vacuum a
    * versioned lake only ever grows. Three commits land on one lake
    * (Q1 snapshot; a February restatement; a March restatement), then
    * vacuum retains the newest TWO versions: version 1's manifest is
    * dropped and the only data files no retained manifest references —
    * commit 1's replaced February files; its January files are STILL
    * LIVE through the carried-forward pointers in v2/v3 — are
    * physically deleted. The emitted rows are the two retained
    * versions' full summaries read AFTER the vacuum (deleting a live
    * file fails these numbers), plus computed booleans: v1 both
    * dropped from the log and unreadable, zero unreferenced files
    * left, and at least one file physically deleted (the exact count
    * is layout-dependent — task-count-sized — so the gate pins the
    * boolean, not the number). Oracle re-derives both retained
    * snapshots from the original parquet. */
  private def l10(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_vaclake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d)
    VersionedLake.commitOverwrite(li, "month", lake)
    VersionedLake.commitUpsert(
      li.filter(col("month") === "1997-02")
        .filter(col("l_linenumber") <= 4)
        .withColumn("l_quantity", col("l_quantity") + 1),
      "month", lake)
    VersionedLake.commitUpsert(
      li.filter(col("month") === "1997-03")
        .filter(col("l_linenumber") <= 3)
        .withColumn("l_quantity", col("l_quantity") + 2),
      "month", lake)
    val (nDropped, nDeleted) = VersionedLake.vacuum(s, lake, retain = 2)
    val v1Gone =
      try { VersionedLake.readVersion(s, lake, 1); false }
      catch { case _: IllegalArgumentException => true }
    val noOrphans = VersionedLake.unreferencedDataFiles(s, lake).isEmpty
    def summary(v: Int): DataFrame =
      ttVersionSummary(VersionedLake.readVersion(s, lake, v), v)
    summary(2).unionByName(summary(3))
      .withColumn("v1_vacuumed", lit(nDropped == 1 && v1Gone))
      .withColumn("no_orphans", lit(noOrphans))
      .withColumn("files_deleted", lit(nDeleted > 0))
  }

  /** l11 — keyed MERGE INTO the versioned lake
    * ([[graft.sources.VersionedLake.commitMerge]]): the Delta/Iceberg
    * MERGE on l09's commit log — q86/q81's changeset discipline
    * applied AT the table layer instead of above it. The delta mixes
    * UPDATES (February lines ≤ 2 restated, quantity + 5 — full new
    * payload for existing keys) and INSERTS (new +10000000-offset
    * keys derived from February's line 7), and the merge is
    * partition-pruned: only February is read (through the manifest,
    * never a month it doesn't touch), ONE anti-join drops the matched
    * keys' old rows, and the commit replaces February while
    * January/March carry forward by pointer — cost ∝ touched
    * partitions + delta. Both versions then time-travel read from the
    * one lake with the l09 diff between them; the oracle re-derives
    * the merged snapshot and the changed/added counts from the
    * original parquet (a dropped unmatched row, a surviving matched
    * row, or a lost carried-forward month each fail a different
    * number). The staged frame is one-row-per-key (a min-aggregate
    * over the fixture's duplicate (orderkey, linenumber) plantings):
    * MERGE is keyed semantics, so the fixture must provide an actual
    * key — with duplicates, "update the matched row" is ill-posed
    * (Delta errors on multiple source matches for the same reason). */
  private def l11(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_mergelake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d, dedupKeys = true)
    VersionedLake.commitOverwrite(li, "month", lake)
    val feb = li.filter(col("month") === "1997-02")
    val off = ttKeyOffset(li)
    val delta = feb.filter(col("l_linenumber") <= 2)
      .withColumn("l_quantity", col("l_quantity") + 5)
      .unionByName(feb.filter(col("l_linenumber") === 7)
        .withColumn("l_orderkey", col("l_orderkey") + off)
        .withColumn("l_quantity", col("l_quantity") + 3))
    VersionedLake.commitMerge(delta,
      Seq("l_orderkey", "l_linenumber"), "month", lake)
    ttSummariesWithDiff(VersionedLake.readVersion(s, lake, 1),
      VersionedLake.readLatest(s, lake))
  }

  /** l15 — MERGE WHEN MATCHED DELETE on the versioned lake
    * ([[graft.sources.VersionedLake.commitMerge]] `deleteCol`): l11's
    * three-verb MERGE completed with the tombstone verb — the delta
    * mixes UPDATES (February lines ≤ 2, quantity + 5), INSERTS
    * (offset-key copies of line 7, quantity + 3) and DELETES (lines
    * 5–6 flagged through the tombstone column), applied in ONE
    * partition-pruned commit: matched keys leave through the same
    * anti-join the updates ride, tombstoned keys are simply never
    * re-inserted, and a delete that empties a partition drops the
    * partition from the manifest (the forceReplaced path — LakeSpec).
    * January/March carry forward by pointer. Both versions then
    * time-travel read from the one lake with the l09 diff between
    * them — the n_removed_vs_prev count is the delete verb's witness;
    * the oracle re-derives everything from the original parquet by
    * the construction. */
  private def l15(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_mdlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d, dedupKeys = true)
    VersionedLake.commitOverwrite(li, "month", lake)
    val feb = li.filter(col("month") === "1997-02")
    val off = ttKeyOffset(li)
    val delta = feb.filter(col("l_linenumber") <= 2)
        .withColumn("l_quantity", col("l_quantity") + 5)
        .withColumn("is_delete", lit(false))
      .unionByName(feb.filter(col("l_linenumber") === 7)
        .withColumn("l_orderkey", col("l_orderkey") + off)
        .withColumn("l_quantity", col("l_quantity") + 3)
        .withColumn("is_delete", lit(false)))
      .unionByName(feb.filter(col("l_linenumber").between(5, 6))
        .withColumn("is_delete", lit(true)))
    VersionedLake.commitMerge(delta,
      Seq("l_orderkey", "l_linenumber"), "month", lake,
      deleteCol = Some("is_delete"))
    ttSummariesWithDiff(VersionedLake.readVersion(s, lake, 1),
      VersionedLake.readLatest(s, lake))
  }

  /** l16 — SCHEMA EVOLUTION at the table layer: every manifest records
    * its commit's schema, so the lake — not the reader — knows what
    * each version looked like (l04's mergeSchema semantics promoted
    * from a reader option to commit-log metadata, the Delta/Iceberg
    * schema-tracking shape). Version 2 upserts a February restatement
    * CARRYING A NEW COLUMN (`src`): the mixed file list (pre-evolution
    * January/March pointers + post-evolution February files) reads
    * under the RECORDED schema — old files surface `src` as NULL, and
    * [[graft.sources.VersionedLake.readVersionEvolved]] gives version
    * 1 the same one-schema view (all-NULL src). A plain
    * footer-derived read would silently DROP the evolved column for
    * exactly this file mix (LakeSpec pins the mechanism; this gates
    * the numbers). n_src counts non-NULL src per version: 0 for v1,
    * exactly the restated-row count for v2 — the oracle re-derives
    * both from the original parquet. */
  private def l16(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_evlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d)
    VersionedLake.commitOverwrite(li, "month", lake)
    VersionedLake.commitUpsert(
      li.filter(col("month") === "1997-02")
        .filter(col("l_linenumber") <= 4)
        .withColumn("l_quantity", col("l_quantity") + 1)
        .withColumn("src", lit("restated")),
      "month", lake)
    def summ(df: DataFrame, v: Int): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          sum(col("l_orderkey") * 7 + col("l_linenumber")).as("key_sig"),
          count(col("src")).as("n_src"))
        .withColumn("version", lit(v))
    summ(VersionedLake.readVersionEvolved(s, lake, 1), 1)
      .unionByName(summ(VersionedLake.readLatest(s, lake), 2))
  }

  /** l17 — OPTIMIZE ZORDER BY as a commit
    * ([[graft.sources.VersionedLake.commitOptimize]] `zorderBy` +
    * [[graft.plans.ZOrder2]]): the Delta `OPTIMIZE ... ZORDER BY`
    * verb on the l09 log. The staging builds the WORST layout for
    * range pruning — February fragmented into 4 interleaved appends
    * (rows by l_orderkey mod 4), so every fragment's zone spans the
    * whole key domain and a narrow range read must open every file
    * (all_files_hit pins that) — then OPTIMIZE re-clusters each
    * fragmented partition on the Morton-interleaved
    * (l_orderkey, l_linenumber) key into 4 range files, re-recording
    * zone stats in the new manifest. The SAME range read against the
    * post-optimize version skips most files (zorder_skips), while the
    * row-filtered aggregates — the oracle's numbers — are identical
    * either side: pure re-layout. Bounds derive from the manifest's
    * own global stats (l12's integer arithmetic); file counts stay
    * out of the hashed numbers (booleans only — layout is
    * parallelism-dependent, the l10 discipline). */
  private def l17(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_zolake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d)
    VersionedLake.commitOverwrite(
      li.filter(col("month") =!= "1997-02").coalesce(1), "month", lake,
      statsCol = Some("l_orderkey"))
    (0 to 3).foreach { r =>
      VersionedLake.commitAppend(
        li.filter(col("month") === "1997-02")
          .filter(pmod(col("l_orderkey"), lit(4)) === r).coalesce(1),
        "month", lake, statsCol = Some("l_orderkey"))
    }
    val pre = VersionedLake.latestVersion(s, lake)
    val stats = VersionedLake.manifestFiles(s, lake, pre)
    val gmin = stats.flatMap(_.lo).min
    val gmax = stats.flatMap(_.hi).max
    val lo = gmin + (gmax - gmin) * 3 / 8
    val hi = gmin + (gmax - gmin) / 2
    val (preDf, mPre, tPre) =
      VersionedLake.readVersionRange(s, lake, pre, lo, hi)
    val post = VersionedLake.commitOptimize(s, lake, "month",
      statsCol = Some("l_orderkey"),
      zorderBy = Seq("l_orderkey", "l_linenumber"),
      targetFilesPerPart = 4)
    val (postDf, mPost, _) =
      VersionedLake.readVersionRange(s, lake, post, lo, hi)
    def summ(df: DataFrame, phase: String): DataFrame =
      df.filter(col("l_orderkey").between(lo, hi))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          sum(col("l_orderkey") * 7 + col("l_linenumber")).as("key_sig"))
        .withColumn("phase", lit(phase))
    summ(preDf, "pre")
      .withColumn("layout_ok", lit(mPre == tPre))
      .unionByName(summ(postDf, "post")
        .withColumn("layout_ok", lit(mPost < mPre)))
  }

  /** l18 — TIMESTAMP AS-OF time travel
    * ([[graft.sources.VersionedLake.readAsOf]]): Delta's `TIMESTAMP AS
    * OF`, resolved from the `ts=` commit stamp each manifest header
    * records (caller-passed clock — the fixture stamps 100/200/300 —
    * never a wall-clock read inside the library, so the determinism
    * contracts hold). Three stamped commits (Q1 snapshot; February
    * restated +1 for lines ≤ 4; March restated +2 for lines ≤ 3),
    * then three as-of reads exercise the resolution cases: BETWEEN
    * commits (ts 250 → version 2), EXACT hit (ts 300 → version 3),
    * AFTER the last (ts 9999 → version 3); before_first_fails pins
    * the loud before-first-commit case (no table existed — the one
    * case with no zero-rows answer). The oracle re-derives each
    * resolved snapshot from the original parquet. */
  private def l18(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_aslake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d)
    VersionedLake.commitOverwrite(li, "month", lake,
      commitTs = Some(100L))
    VersionedLake.commitUpsert(
      li.filter(col("month") === "1997-02")
        .filter(col("l_linenumber") <= 4)
        .withColumn("l_quantity", col("l_quantity") + 1),
      "month", lake, commitTs = Some(200L))
    VersionedLake.commitUpsert(
      li.filter(col("month") === "1997-03")
        .filter(col("l_linenumber") <= 3)
        .withColumn("l_quantity", col("l_quantity") + 2),
      "month", lake, commitTs = Some(300L))
    val beforeFirstFails =
      try { VersionedLake.versionAsOf(s, lake, 50L); false }
      catch { case _: IllegalArgumentException => true }
    def summAt(ts: Long): DataFrame =
      ttVersionSummary(VersionedLake.readAsOf(s, lake, ts),
          VersionedLake.versionAsOf(s, lake, ts))
        .withColumn("asof_ts", lit(ts))
    summAt(250L).unionByName(summAt(300L)).unionByName(summAt(9999L))
      .withColumn("before_first_fails", lit(beforeFirstFails))
  }

  /** l19 — CHANGE-FEED-DRIVEN incremental view maintenance: q88's
    * counting-IVM algebra fed by the TABLE LAYER's change feed
    * ([[graft.sources.VersionedLake.changesBetween]]) instead of a
    * hand-built CDC delta — the composition l13 exists for. The
    * maintained view (per-month row count + integer quantity cents)
    * is computed ONCE from version 1, then each commit's change feed
    * applies algebraically: added → (+1, +after), removed →
    * (−1, −before), changed → (0, after − before), one re-combine
    * groupBy per batch, HAVING n > 0 — cost ∝ churn + view size, the
    * base is never re-read. Two restatement commits drive all three
    * change kinds; the EMITTED rows are the maintained view itself,
    * which the oracle recomputes FULLY from the original parquet by
    * the restatements' construction — maintenance is correct iff
    * indistinguishable from rebuilding (the q86/q88 discipline);
    * ivm_eq_rebuild additionally pins view == direct recompute of the
    * latest version in-engine. Integer-exact throughout (cents).
    * `rebuildCheck = false` is the bench operator form (r11 verdict):
    * the maintenance fold alone, without the O(base) rebuild-equality
    * harness the oracle gate keeps. */
  private def l19(s: SparkSession, d: String): DataFrame =
    l19Impl(s, d, rebuildCheck = true)

  private def l19Impl(s: SparkSession, d: String,
                      rebuildCheck: Boolean): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_ivmlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d, dedupKeys = true)
      .select(col("l_orderkey"), col("l_linenumber"), col("month"),
        round(col("l_quantity") * 100, 0).cast("long").as("qty_c"))
    VersionedLake.commitOverwrite(li, "month", lake)
    val off = ttKeyOffset(li)
    val feb = li.filter(col("month") === "1997-02")
    VersionedLake.commitUpsert( // v2: updates, inserts, implicit removes
      feb.filter(col("l_linenumber") <= 4)
        .withColumn("qty_c", col("qty_c") + 100L)
        .unionByName(feb.filter(col("l_linenumber") === 7)
          .withColumn("l_orderkey", col("l_orderkey") + off)
          .withColumn("qty_c", col("qty_c") + 300L)),
      "month", lake)
    val mar = li.filter(col("month") === "1997-03")
    VersionedLake.commitUpsert( // v3: March restated, lines > 3 removed
      mar.filter(col("l_linenumber") <= 3)
        .withColumn("qty_c", col("qty_c") + 200L),
      "month", lake)
    def viewOf(df: DataFrame): DataFrame =
      df.groupBy(col("month"))
        .agg(count(lit(1)).as("n_rows"), sum(col("qty_c")).as("qty_cents"))
    // v1 full compute, then each version's change feed applied
    // algebraically — month rides in the key so the view's grouping
    // key survives the feed
    val keys = Seq("l_orderkey", "l_linenumber", "month")
    val view = (2 to VersionedLake.latestVersion(s, lake))
      .foldLeft(viewOf(VersionedLake.readVersion(s, lake, 1))) {
        (acc, v) =>
          val cf = VersionedLake.changesBetween(s, lake, v - 1, v,
            keys, "qty_c")
          val deltaAgg = cf.groupBy(col("month")).agg(
            sum(when(col("change_kind") === "added", 1L)
              .when(col("change_kind") === "removed", -1L)
              .otherwise(0L)).as("n_rows"),
            sum(when(col("change_kind") === "added", col("qty_c_after"))
              .when(col("change_kind") === "removed", -col("qty_c_before"))
              .otherwise(col("qty_c_after") - col("qty_c_before")))
              .as("qty_cents"))
          acc.unionByName(deltaAgg).groupBy(col("month"))
            .agg(sum(col("n_rows")).as("n_rows"),
              sum(col("qty_cents")).as("qty_cents"))
            .filter(col("n_rows") > 0)
      }
    if (!rebuildCheck) view
    else {
      // maintained == rebuilt, proven in-engine on top of the oracle
      val rebuilt = viewOf(VersionedLake.readLatest(s, lake))
      val eq = view.withColumnRenamed("n_rows", "n1")
        .withColumnRenamed("qty_cents", "q1")
        .join(rebuilt, Seq("month"), "full_outer")
        .agg(count(when(col("n1").isNull || col("n_rows").isNull ||
          col("n1") =!= col("n_rows") || col("q1") =!= col("qty_cents"),
          1)).as("n_bad"))
        .select((col("n_bad") === 0L).as("ivm_eq_rebuild"))
      view.crossJoin(broadcast(eq))
    }
  }

  /** l20 — SHALLOW / DEEP CLONE
    * ([[graft.sources.VersionedLake.shallowClone]]): Delta's CLONE
    * verb — version 2 of the source materializes as version 1 of TWO
    * new lakes: a shallow clone (manifest POINTERS at the source's
    * files, zero bytes copied — the zero-cost experimentation branch)
    * and a deep clone (file copies, full independence). The branch
    * then takes its OWN commit (March restated — the source never
    * sees it), both clones are vacuumed-around: clone-local vacuum
    * must not touch borrowed source files, and a source vacuum down
    * to the cloned version keeps both clones readable (the shallow
    * one borrows files still live in the source's retained manifest;
    * the deep one owns copies). Every snapshot is read AFTER the
    * vacuums — a wrongly-deleted borrowed file fails its numbers.
    * Oracle re-derives all three snapshots from the original parquet
    * by construction. */
  private def l20(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val h = Integer.toHexString(d.hashCode)
    val src = s"/tmp/graft_clsrc_$h"
    val sh = s"/tmp/graft_clsh_$h"
    val dp = s"/tmp/graft_cldp_$h"
    Seq(src, sh, dp).foreach(VersionedLake.reset(s, _))
    val li = ttSlimLineitem(s, d)
    VersionedLake.commitOverwrite(li, "month", src)
    VersionedLake.commitUpsert(
      li.filter(col("month") === "1997-02")
        .filter(col("l_linenumber") <= 4)
        .withColumn("l_quantity", col("l_quantity") + 1),
      "month", src)
    VersionedLake.shallowClone(s, src, sh, v = 2)
    VersionedLake.shallowClone(s, src, dp, v = 2, deep = true)
    VersionedLake.commitUpsert( // the branch's own commit
      li.filter(col("month") === "1997-03")
        .filter(col("l_linenumber") <= 3)
        .withColumn("l_quantity", col("l_quantity") + 2),
      "month", sh)
    VersionedLake.vacuum(s, sh, retain = 1)
    VersionedLake.vacuum(s, src, retain = 1)
    def snap(path: String, label: String): DataFrame =
      VersionedLake.readLatest(s, path)
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          sum(col("l_orderkey") * 7 + col("l_linenumber")).as("key_sig"))
        .withColumn("snapshot", lit(label))
    snap(src, "src").unionByName(snap(sh, "branch"))
      .unionByName(snap(dp, "deep"))
  }

  /** l21 — RESTORE TO VERSION
    * ([[graft.sources.VersionedLake.commitRestore]]): Delta's RESTORE
    * verb — the auditable undo: a bad February restatement (version
    * 2) is rolled back by committing version 1's FILE LIST forward as
    * version 3 (pointers — zero data moves, zero_copy pins it), so
    * content reverts while history only grows (history_forward pins
    * versions == 1,2,3 and the bad version stays readable for the
    * audit). Oracle re-derives both the bad snapshot and the restored
    * one — which must equal version 1 exactly — from the original
    * parquet. */
  private def l21(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_rstlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d)
    VersionedLake.commitOverwrite(li, "month", lake)
    VersionedLake.commitUpsert( // the bad commit
      li.filter(col("month") === "1997-02")
        .filter(col("l_linenumber") <= 2)
        .withColumn("l_quantity", col("l_quantity") + 9),
      "month", lake)
    val v3 = VersionedLake.commitRestore(s, lake, 1)
    val historyForward =
      v3 == 3 && VersionedLake.versions(s, lake) == Seq(1, 2, 3)
    val zeroCopy =
      VersionedLake.manifestFiles(s, lake, 3).map(_.rel).toSet ==
        VersionedLake.manifestFiles(s, lake, 1).map(_.rel).toSet
    ttVersionSummary(VersionedLake.readVersion(s, lake, 2), 2)
      .unionByName(ttVersionSummary(VersionedLake.readLatest(s, lake), 3))
      .withColumn("history_forward", lit(historyForward))
      .withColumn("zero_copy", lit(zeroCopy))
  }

  /** l22 — the versioned lake as a STREAMING SOURCE
    * ([[graft.sources.VersionedLake.appendsBetween]]): the Delta
    * streaming-source shape — a reader holds a version CURSOR and each
    * poll reads ONLY the files added since (never a join, never the
    * base; cost ∝ the appended delta). Three month-sliced APPEND
    * commits, then the (1, 3] feed must be exactly commits 2–3's rows
    * (February + March by construction — the oracle's aggregate); a
    * subsequent UPSERT rewrites files, and the append-only reader must
    * REFUSE across it (rewrite_refused — Delta's ignoreChanges-unset
    * behavior: fail loudly rather than silently misread a rewrite;
    * changesBetween is the API for that case). st23 drives the same
    * cursor loop against a live streaming ingest. */
  private def l22(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_applake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d)
    Seq("1997-01", "1997-02", "1997-03").foreach { m =>
      VersionedLake.commitAppend(
        li.filter(col("month") === m), "month", lake)
    }
    val feed = VersionedLake.appendsBetween(s, lake, 1, 3)
      .localCheckpoint(true) // pin the feed before the rewrite below
    VersionedLake.commitUpsert(
      li.filter(col("month") === "1997-02")
        .filter(col("l_linenumber") <= 2)
        .withColumn("l_quantity", col("l_quantity") + 1),
      "month", lake)
    val rewriteRefused =
      try { VersionedLake.appendsBetween(s, lake, 3, 4); false }
      catch { case _: IllegalArgumentException => true }
    feed.agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        sum(col("l_orderkey") * 7 + col("l_linenumber")).as("key_sig"))
      .withColumn("rewrite_refused", lit(rewriteRefused))
  }

  /** l23 — DELETION VECTORS
    * ([[graft.sources.VersionedLake.commitDelete]]): the Delta DV /
    * Iceberg positional-delete shape closing l15's scale gap — l15's
    * MERGE-DELETE rewrites every touched partition's bytes, so at
    * 100 TB a 0.01% takedown pays a 100% write bill; a DV commit
    * records the doomed rows' (file, row-index) positions in small
    * sidecar parquet files and only ADDS them to the manifest.
    * Version 2 deletes February lines 5–6 (l15's slice) as DVs:
    * no_data_rewrite pins — from the manifests — that v2's data-file
    * set is BYTE-IDENTICAL to v1's (pointers, zero rows rewritten;
    * the witness l15 cannot produce), dv_sidecars_v2 that the delete
    * physically landed as sidecars. Readers anti-fold the positions
    * ([[graft.sources.VersionedLake.foldDeletes]], broadcast-sized
    * here); a reader pinned to v1 still sees the rows (LakeSpec).
    * Version 3 is OPTIMIZE materializing the fold and RETIRING the
    * sidecars (dv_retired_v3) — content provably unchanged: the v3
    * row's diff counts vs v2 are COMPUTED by the same full-outer
    * q56 diff, and the oracle re-derives all three snapshots from the
    * original parquet. */
  private def l23(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_dvlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d, dedupKeys = true)
    VersionedLake.commitOverwrite(li, "month", lake)
    VersionedLake.commitDelete(
      li.filter(col("month") === "1997-02")
        .filter(col("l_linenumber").between(5, 6))
        .select(col("l_orderkey"), col("l_linenumber"), col("month")),
      Seq("l_orderkey", "l_linenumber"), "month", lake)
    val vOpt = VersionedLake.commitOptimize(s, lake, "month")
    // manifest-metadata witnesses (booleans, the l10 discipline —
    // never file counts: layout is parallelism-dependent)
    def rels(v: Int, kind: String) = VersionedLake
      .manifestFiles(s, lake, v).filter(_.kind == kind).map(_.rel).toSet
    val noDataRewrite = rels(2, "data") == rels(1, "data")
    val dvSidecars = rels(2, "dv").nonEmpty
    val dvRetired = rels(vOpt, "dv").isEmpty
    val v2 = VersionedLake.readVersion(s, lake, 2)
    val v3row = ttSummariesWithDiff(v2,
        VersionedLake.readVersion(s, lake, vOpt))
      .filter(col("version") === 2).withColumn("version", lit(3))
    ttSummariesWithDiff(VersionedLake.readVersion(s, lake, 1), v2)
      .unionByName(v3row)
      .withColumn("no_data_rewrite", lit(noDataRewrite))
      .withColumn("dv_sidecars_v2", lit(dvSidecars))
      .withColumn("dv_retired_v3", lit(dvRetired))
  }

  /** l24 — COLUMN-MAPPING schema evolution
    * ([[graft.sources.VersionedLake.commitRenameColumn]] /
    * [[graft.sources.VersionedLake.commitDropColumn]]): l16 handles
    * ADD; rename/drop need id-based resolution (Delta columnMapping /
    * Iceberg field ids) or a re-added name silently resurrects
    * dropped bytes. Every commit's recorded schema carries stable
    * column ids plus an era map (id → physical name at write time);
    * reads resolve by id across eras. The fixture drives the full
    * story on one lake: v2 RENAMES l_quantity→qty as a metadata-only
    * commit (rename_zero_copy pins the file set is byte-identical);
    * v3 restates February under the NEW name — the v3_renamed probe
    * reads a MIXED-ERA file list (January/March physically named
    * l_quantity, February qty) resolved by id; v4 DROPS qty and v5
    * re-adds the name with different values — the v5_readd probe's
    * n_qty counts ONLY the re-added rows (January/March read NULL:
    * fresh id, old bytes dead — THE l24 pin), and the v1_evolved
    * probe (version 1 under the latest schema, aligned by id) reads
    * qty as all-NULL for the same reason. The oracle re-derives every
    * probe from the original parquet by construction. */
  private def l24(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_cmlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d, dedupKeys = true)
    VersionedLake.commitOverwrite(li, "month", lake)
    VersionedLake.commitRenameColumn(s, lake, "l_quantity", "qty")
    def rels(v: Int) =
      VersionedLake.manifestFiles(s, lake, v).map(_.rel).toSet
    val renameZeroCopy = rels(2) == rels(1)
    val feb = li.filter(col("month") === "1997-02")
    VersionedLake.commitUpsert( // v3: February restated under NEW name
      feb.filter(col("l_linenumber") <= 4)
        .withColumn("qty", col("l_quantity") + 1).drop("l_quantity"),
      "month", lake)
    VersionedLake.commitDropColumn(s, lake, "qty") // v4
    VersionedLake.commitUpsert( // v5: the NAME re-added, fresh column
      feb.filter(col("l_linenumber") <= 2)
        .select(col("l_orderkey"), col("l_linenumber"), col("month"),
          col("l_linenumber").cast("double").as("qty")),
      "month", lake)
    def probe(name: String, df: DataFrame, qcol: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          coalesce(round(sum(col(qcol)), 2), lit(0.0)).as("sum_qty"),
          sum(col("l_orderkey") * 7 + col("l_linenumber")).as("key_sig"),
          count(col(qcol)).as("n_qty"))
        .withColumn("probe", lit(name))
    probe("v1", VersionedLake.readVersion(s, lake, 1), "l_quantity")
      .unionByName(probe("v3_renamed",
        VersionedLake.readVersion(s, lake, 3), "qty"))
      .unionByName(probe("v5_readd",
        VersionedLake.readLatest(s, lake), "qty"))
      .unionByName(probe("v1_evolved",
        VersionedLake.readVersionEvolved(s, lake, 1), "qty"))
      .withColumn("rename_zero_copy", lit(renameZeroCopy))
  }

  /** l25 — SEGMENTED MANIFESTS
    * ([[graft.sources.VersionedLake.enableSegmentedManifests]]): the
    * metadata half of the carry-forward discipline. A flat manifest
    * re-serializes the FULL file list every commit — at 10^6 files
    * that is ~10^8 bytes of driver metadata per commit even when one
    * partition changed, and every reader parses all of it. Segmented
    * manifests (the Iceberg snapshot → manifest-list → manifest
    * tree reduced to one content-hash reuse rule) store each
    * partition's entry lines in an immutable `_log/seg-*.seg` file
    * and keep one pointer line per partition: an untouched
    * partition's segment carries forward BY POINTER, so commit
    * metadata cost is O(touched partitions + partition count), and
    * [[graft.sources.VersionedLake.readVersion]]'s parts filter
    * prunes AT THE POINTER — un-probed partitions' file lists are
    * never even opened. The fixture drives l09's restatement story on
    * a segmented lake: v1 commits Q1 (3 partitions → 3 segments), v2
    * restates February — segs_reused_v2 = 2 and segs_fresh_v2 = 1 are
    * DETERMINISTIC (segments are per-partition, never per-file, so
    * parallelism cannot move them; the l10 file-count caveat doesn't
    * apply). The version=3 row is the February-only POINTER-PRUNED
    * read of v2. The oracle re-derives all three snapshots and the
    * diff from the original parquet — an entry line lost, duplicated,
    * or mis-expanded by segmentation fails n_rows/key_sig; a wrongly
    * reused segment fails the v2 row; a mis-pruned read fails the
    * version=3 row. LakeSpec pins the flat↔segmented interleave
    * (mid-life enable), vacuum's reuse-aware segment reclaim, and the
    * DV/column-mapping composition. */
  private def l25(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_seglake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    VersionedLake.enableSegmentedManifests(s, lake)
    val li = ttSlimLineitem(s, d, dedupKeys = true)
    VersionedLake.commitOverwrite(li, "month", lake)
    VersionedLake.commitUpsert(
      li.filter(col("month") === "1997-02")
        .filter(col("l_linenumber") <= 4)
        .withColumn("l_quantity", col("l_quantity") + 1),
      "month", lake)
    val p1 = VersionedLake.segmentPointers(s, lake, 1)
    val p2 = VersionedLake.segmentPointers(s, lake, 2)
    val reused = p2.count { case (part, ptr) => p1.get(part).contains(ptr) }
    val prunedFeb = ttVersionSummary(
        VersionedLake.readVersion(s, lake, 2, Seq("1997-02")), 3)
      .withColumn("n_changed_vs_prev", lit(0L))
      .withColumn("n_removed_vs_prev", lit(0L))
      .withColumn("n_added_vs_prev", lit(0L))
    ttSummariesWithDiff(VersionedLake.readVersion(s, lake, 1),
        VersionedLake.readVersion(s, lake, 2))
      .unionByName(prunedFeb)
      .withColumn("segs_total", lit(p2.size))
      .withColumn("segs_reused_v2", lit(reused))
      .withColumn("segs_fresh_v2", lit(p2.size - reused))
  }

  /** l26 — TABLE CONSTRAINTS
    * ([[graft.sources.VersionedLake.commitAddConstraint]]): Delta's
    * `ALTER TABLE ADD CONSTRAINT ... CHECK` enforced at the COMMIT
    * layer — the Deequ-style quality gate moved from a separate
    * validation job into the table format itself, where it cannot be
    * skipped. A constraint is a boolean SQL expression recorded in
    * every manifest and carried forward like the schema; every
    * data-writing commit validates its DELTA in one aggregate pass
    * (cost ∝ delta — at 100 TB the alternative full-table re-check
    * per ingest is the thing that doesn't scale), aborting loudly
    * with per-constraint counts BEFORE a version is claimed. SQL
    * CHECK semantics: only FALSE violates, so NOT NULL is spelled
    * `x IS NOT NULL`. The fixture: v2/v3 add bounds + not-null
    * constraints (each validating the full snapshot once at add
    * time); a qty=-5 restatement ABORTS minting no version
    * (no_version_minted); the corrected restatement lands validated;
    * adding a constraint the existing data violates is REFUSED
    * (oracle re-derives the refusal condition as max(qty) > 10);
    * dropping a column a CHECK references is refused
    * (drop_column_refused) — never a dangling constraint. The final
    * snapshot and the violating-delta row count re-derive from the
    * original parquet. */
  private def l26(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_cklake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d, dedupKeys = true)
    VersionedLake.commitOverwrite(li, "month", lake)
    VersionedLake.commitAddConstraint(s, lake, "qty_bounds",
      "l_quantity > 0 AND l_quantity <= 200")
    VersionedLake.commitAddConstraint(s, lake, "month_not_null",
      "month IS NOT NULL")
    val badDelta = li.filter(col("month") === "1997-02")
      .filter(col("l_linenumber") <= 2)
      .withColumn("l_quantity", lit(-5.0))
    val violRows = badDelta.count() // delta-sized planning aggregate
    val aborted =
      try { VersionedLake.commitUpsert(badDelta, "month", lake); false }
      catch { case _: IllegalStateException => true }
    val noVersionMinted = VersionedLake.latestVersion(s, lake) == 3
    VersionedLake.commitUpsert( // the corrected restatement, validated
      li.filter(col("month") === "1997-02")
        .filter(col("l_linenumber") <= 4)
        .withColumn("l_quantity", col("l_quantity") + 1),
      "month", lake)
    val addRefused =
      try {
        VersionedLake.commitAddConstraint(s, lake, "qty_tight",
          "l_quantity <= 10")
        VersionedLake.commitDropConstraint(s, lake, "qty_tight")
        false
      } catch { case _: IllegalStateException => true }
    val dropColRefused =
      try { VersionedLake.commitDropColumn(s, lake, "l_quantity"); false }
      catch { case _: IllegalArgumentException => true }
    val carried = VersionedLake.readConstraints(s, lake,
      VersionedLake.latestVersion(s, lake)).map(_._1).toSet ==
      Set("qty_bounds", "month_not_null")
    VersionedLake.readLatest(s, lake)
      .agg(count(lit(1)).as("n_rows_v4"),
        round(sum(col("l_quantity")), 2).as("sum_qty_v4"),
        sum(col("l_orderkey") * 7 + col("l_linenumber")).as("key_sig_v4"))
      .withColumn("viol_rows", lit(violRows))
      .withColumn("violating_commit_aborted", lit(aborted))
      .withColumn("no_version_minted", lit(noVersionMinted))
      .withColumn("add_over_violating_refused", lit(addRefused))
      .withColumn("drop_column_refused", lit(dropColRefused))
      .withColumn("constraint_carried", lit(carried))
  }

  /** l27 — HIDDEN PARTITIONING
    * ([[graft.sources.HiddenPartitioning]]): Iceberg's partition
    * transforms. Every prior lake query hands the engine a
    * pre-derived partition column — the caller must know the layout,
    * and a query filtering on the SOURCE column (`l_shipdate`) while
    * the table partitions on a derived string silently full-scans:
    * THE partition-layout failure mode at 100 TB. Here the table
    * declares `month(l_shipdate)` / `bucket(8, l_orderkey)` as
    * immutable metadata; writers derive the partition value through
    * the recorded transform and readers never mention it — a range
    * predicate on the source column projects through the monotonic
    * transform to a partition interval (Iceberg's inclusive
    * projection), and point lookups compute their keys' partitions
    * through the ENGINE's own transform expression (bucket hashing
    * can never drift between write and probe). Pruning lands in
    * [[graft.sources.VersionedLake.readVersion]]'s parts filter, so
    * with l25 it skips un-probed partitions at the segment POINTER.
    * Witnesses: the February range scans 1 of 3 month partitions
    * (per-partition counters — deterministic); the 5-key bucket
    * lookup touches fewer partitions than live (bucket_pruned); the
    * internal `__p` column never surfaces (hidden_col_absent). The
    * oracle re-derives both probe results from the original parquet
    * with plain source-column predicates — a wrongly-pruned
    * partition loses rows and fails the counts. */
  private def l27(s: SparkSession, d: String): DataFrame = {
    import graft.sources.{HiddenPartitioning => HP, VersionedLake}
    val hex = Integer.toHexString(d.hashCode)
    val lakeA = s"/tmp/graft_hplake_a_$hex"
    val lakeB = s"/tmp/graft_hplake_b_$hex"
    VersionedLake.reset(s, lakeA)
    VersionedLake.reset(s, lakeB)
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        to_date(col("l_shipdate")).as("l_shipdate"))
      .filter(col("l_shipdate").between("1997-01-01", "1997-03-31"))
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(min(col("l_quantity")).as("l_quantity"),
        min(col("l_shipdate")).as("l_shipdate"))
    HP.define(s, lakeA, HP.Spec("l_shipdate", HP.Month))
    HP.commitOverwrite(li, lakeA)
    HP.define(s, lakeB, HP.Spec("l_orderkey", HP.Bucket(8)))
    HP.commitOverwrite(li, lakeB)
    val (lo, hi) = ("1997-02-03", "1997-02-20")
    val rangeDf = HP.readBetween(s, lakeA, lo, hi)
    val keys = li
      .filter(date_format(col("l_shipdate"), "yyyy-MM") === "1997-02")
      .select(col("l_orderkey")).distinct()
      .orderBy(col("l_orderkey")).limit(5)
    val matchDf = HP.readMatching(s, lakeB, keys)
    val partsTotalA = VersionedLake.manifestFiles(s, lakeA, 1)
      .map(_.part).distinct.size
    val partsRange = HP.partsBetween(s, lakeA, 1, lo, hi).size
    val partsTotalB = VersionedLake.manifestFiles(s, lakeB, 1)
      .map(_.part).distinct.size
    val partsMatch = HP.partsMatching(s, lakeB, 1, keys).size
    val hiddenAbsent = !rangeDf.columns.contains("__p") &&
      !matchDf.columns.contains("__p")
    def probe(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          sum(col("l_orderkey") * 7 + col("l_linenumber")).as("key_sig"))
        .withColumn("probe", lit(name))
    probe("range_month", rangeDf)
      .unionByName(probe("match_bucket", matchDf))
      .withColumn("parts_total_month", lit(partsTotalA))
      .withColumn("parts_scanned_range", lit(partsRange))
      .withColumn("bucket_pruned", lit(partsMatch < partsTotalB))
      .withColumn("hidden_col_absent", lit(hiddenAbsent))
  }

  /** l31 — PARTITION-SPEC EVOLUTION
    * ([[graft.sources.HiddenPartitioning.evolve]]): l27's hidden
    * partitioning completed with Iceberg's spec evolution — the
    * migration story a 100 TB table actually hits. Q1 1997 commits
    * under `month(l_shipdate)`; the spec then EVOLVES to
    * `day(l_shipdate)` and April appends under the new granularity —
    * no history rewritten, no second lake. A range read spanning both
    * eras projects its bounds through EACH era's transform (inclusive
    * projection) and unions the pruned partition sets: month-era
    * partitions prune at month granularity, day-era at day. A point
    * lookup computes each era's partition values through that era's
    * ENGINE expression. Results stay transform-invisible — the oracle
    * is the plain source-column predicate over the original parquet
    * (l27's result-invisibility discipline) — while the scanned-
    * partition counters (parallelism-INDEPENDENT, the l25 rule)
    * re-derive from the data: months with data in the projected month
    * window, days with data in the day window. LakeSpec pins the
    * pre/post-evolution pruning, the bucket-era conservative union
    * and the evolution refusals. */
  private def l31(s: SparkSession, d: String): DataFrame = {
    import graft.sources.{HiddenPartitioning => HP, VersionedLake}
    val lake = s"/tmp/graft_spevlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        to_date(col("l_shipdate")).as("l_shipdate"))
      .filter(col("l_shipdate").between("1997-01-01", "1997-04-30"))
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(min(col("l_quantity")).as("l_quantity"),
        min(col("l_shipdate")).as("l_shipdate"))
    HP.define(s, lake, HP.Spec("l_shipdate", HP.Month))
    HP.commitOverwrite(li.filter(col("l_shipdate") < "1997-04-01"), lake)
    HP.evolve(s, lake, HP.Spec("l_shipdate", HP.Day))
    HP.commitAppend(li.filter(col("l_shipdate") >= "1997-04-01"), lake)
    val (lo, hi) = ("1997-02-10", "1997-04-05")
    val rangeDf = HP.readBetween(s, lake, lo, hi)
    val parts = HP.partsBetween(s, lake, 2, lo, hi)
    val keys = li.filter(
        col("l_shipdate").isin("1997-02-14", "1997-04-03"))
      .select(col("l_shipdate")).distinct()
    val matchDf = HP.readMatching(s, lake, keys)
    val total = VersionedLake.manifestFiles(s, lake, 2)
      .filter(_.kind == "data").map(_.part).distinct.size
    def probe(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          sum(col("l_orderkey") * 7 + col("l_linenumber")).as("key_sig"))
        .withColumn("probe", lit(name))
    probe("range_mixed", rangeDf)
      .unionByName(probe("match_mixed", matchDf))
      // month values are 7 chars, day values 10: the era split of the
      // pruned set is visible in the partition strings themselves
      .withColumn("parts_month_era_scanned", lit(parts.count(_.length == 7)))
      .withColumn("parts_day_era_scanned", lit(parts.count(_.length == 10)))
      .withColumn("pruned", lit(parts.size < total))
  }

  /** l34 — the versioned lake through DATASOURCE V2
    * ([[graft.sources.GraftLakeSource]], format `graftlake`): the
    * consumption shape every real table-format user expects — no
    * library calls, `CREATE TEMPORARY VIEW ... USING graftlake
    * OPTIONS (path, versionAsOf, partitionColumn)` and plain SQL.
    * The l09 fixture lake (v1 = Q1 1997; v2 = February restated to
    * lines ≤ 4, quantity + 1) is read through TWO SQL views — one
    * pinned `versionAsOf 1`, one latest — each filtered to February:
    * the pushed month filter prunes AT THE MANIFEST (un-probed
    * partitions' segment pointers never open; the V1Scan adapter then
    * runs the library read underneath), witnessed by the
    * parts_live/parts_read counters (partition counts —
    * parallelism-independent, the l25 rule). The oracle re-derives
    * both versions' February aggregates from the original parquet —
    * time travel through the format, result-invisible. The spec
    * additionally pins timestampAsOf, prune-to-empty, column pruning
    * and the DV/widening composition. */
  private def l34(s: SparkSession, d: String): DataFrame = {
    import graft.sources.{GraftLakeSource, VersionedLake}
    val lake = s"/tmp/graft_dsv2lake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d)
    VersionedLake.commitOverwrite(li, "month", lake)
    VersionedLake.commitUpsert(
      li.filter(col("month") === "1997-02")
        .filter(col("l_linenumber") <= 4)
        .withColumn("l_quantity", col("l_quantity") + 1),
      "month", lake)
    s.sql(s"""CREATE OR REPLACE TEMPORARY VIEW graft_dsv2_v1
      USING graftlake
      OPTIONS (path '$lake', versionAsOf '1', partitionColumn 'month')""")
    s.sql(s"""CREATE OR REPLACE TEMPORARY VIEW graft_dsv2_v2
      USING graftlake
      OPTIONS (path '$lake', partitionColumn 'month')""")
    def probe(view: String): (Long, Double, Long, Int, Int) = {
      GraftLakeSource.lastScanParts.set(None)
      val r = s.sql(
        s"""SELECT count(*), round(sum(l_quantity), 2),
           |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
           |FROM $view WHERE month = '1997-02'""".stripMargin)
        .collect().head // 1-row result; the collect drives the scan
      val (live, read) =
        GraftLakeSource.lastScanParts.get().getOrElse((-1, -1))
      (r.getLong(0), r.getDouble(1), r.getLong(2), live, read)
    }
    val p1 = probe("graft_dsv2_v1")
    val p2 = probe("graft_dsv2_v2")
    import s.implicits._
    Seq(("v1_feb", p1._1, p1._2, p1._3, p1._4, p1._5),
        ("v2_feb", p2._1, p2._2, p2._3, p2._4, p2._5))
      .toDF("probe", "n_rows", "sum_qty", "key_sig",
        "parts_live", "parts_read")
  }

  /** l35 — the graftlake WRITE path (r13 verdict #2): the two writes
    * that reduce to `df.write` modes go through the format. Q1 1997
    * seeds the lake (the library verb — a fresh lake has no recorded
    * schema for the format to infer); April lands as a PLAIN format
    * append (`df.write.format("graftlake").mode("append")` →
    * [[graft.sources.VersionedLake.commitAppend]] under the hood);
    * May lands as a `txn`-optioned append
    * ([[graft.sources.VersionedLake.commitBatchAppend]] — the
    * exactly-once foreachBatch sink THROUGH the format) and is then
    * REPLAYED byte-identically: the replay must mint nothing
    * (`replay_noop`). A write through a time-travel option refuses
    * loudly (`tt_write_refused`). The oracle restates the
    * library-append equality: both probes re-derive from the original
    * parquet — if the format writes had landed differently from
    * library appends (dropped rows, doubled May, a forked version),
    * the aggregates or the booleans would miss.
    * GraftLakeSourceSpec pins the OCC composition (format append vs
    * concurrent library upsert) and the overwrite mode; LakeSqlDemo
    * drives the SQL-user shape. */
  private def l35(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_dsv2wlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .filter(col("month").between("1997-01", "1997-05"))
    VersionedLake.commitOverwrite(
      li.filter(col("month") <= "1997-03"), "month", lake)
    li.filter(col("month") === "1997-04")
      .write.format("graftlake").option("partitionColumn", "month")
      .mode("append").save(lake)
    def mayWrite(): Unit =
      li.filter(col("month") === "1997-05")
        .write.format("graftlake").option("partitionColumn", "month")
        .option("txn", "1").mode("append").save(lake)
    mayWrite()
    val vAfter = VersionedLake.latestVersion(s, lake)
    mayWrite() // checkpoint-replay twin: must be a no-op commit
    val replayNoop =
      vAfter == 3 && VersionedLake.latestVersion(s, lake) == vAfter
    val ttRefused =
      try {
        li.limit(1).write.format("graftlake")
          .option("partitionColumn", "month")
          .option("versionAsOf", "1").mode("append").save(lake)
        false
      } catch { case _: IllegalArgumentException => true }
    def rd(opts: (String, String)*) = {
      val r = s.read.format("graftlake").option("partitionColumn", "month")
      opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load(lake)
    }
    def probe(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          sum(col("l_orderkey") * 7 + col("l_linenumber")).as("key_sig"))
        .withColumn("probe", lit(name))
    probe("fmt_appended", rd())
      .unionByName(probe("pre_append", rd("versionAsOf" -> "1")))
      .withColumn("replay_noop", lit(replayNoop))
      .withColumn("tt_write_refused", lit(ttRefused))
  }

  /** l32 — TYPE WIDENING under column mapping (Delta's type-widening
    * feature on l24's id-mapped log): version 1 commits Q1 with
    * NARROW physical types (`l_orderkey` int, `l_quantity` float);
    * version 2 appends April under the WIDENED logical schema
    * (long / double) in the same commit that records the new types.
    * No byte is rewritten: each era's `coltype` manifest lines record
    * the physical type its files were written with, old files read
    * under (old name, old type) and CAST UP — never a reader-side
    * promotion assumption — while the logical schema is the widened
    * one. A later NARROWING commit refuses loudly and mints nothing
    * (the engine-refusal probe discipline). Quantities are integral
    * in this fixture, so the float→double sums are bit-exact on both
    * engines; the oracle re-derives both versions' aggregates from
    * the original parquet through the same narrow-then-widen casts.
    * LakeSpec pins the schema types, the exact cast-up, time travel
    * to the narrow era and the rename composition. */
  private def l32(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_twlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .filter(col("month").between("1997-01", "1997-04"))
    VersionedLake.commitOverwrite(
      li.filter(col("month") < "1997-04")
        .select(col("l_orderkey").cast("int").as("l_orderkey"),
          col("l_linenumber").cast("int").as("l_linenumber"),
          col("l_quantity").cast("float").as("l_quantity"),
          col("month")),
      "month", lake)
    val v2 = VersionedLake.commitAppend(
      li.filter(col("month") === "1997-04")
        .select(col("l_orderkey").cast("long").as("l_orderkey"),
          col("l_linenumber").cast("int").as("l_linenumber"),
          col("l_quantity").cast("double").as("l_quantity"),
          col("month")),
      "month", lake)
    val narrowRefused =
      try {
        VersionedLake.commitAppend(
          li.limit(1)
            .select(col("l_orderkey").cast("int").as("l_orderkey"),
              col("l_linenumber").cast("int").as("l_linenumber"),
              col("l_quantity").cast("float").as("l_quantity"),
              col("month")),
          "month", lake)
        false
      } catch { case _: IllegalArgumentException => true }
    val mintedNothing = VersionedLake.latestVersion(s, lake) == v2
    val lat = VersionedLake.readLatest(s, lake)
    val widened =
      lat.schema("l_orderkey").dataType ==
        org.apache.spark.sql.types.LongType &&
      lat.schema("l_quantity").dataType ==
        org.apache.spark.sql.types.DoubleType
    def probe(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity").cast("double")), 2).as("sum_qty"),
          sum(col("l_orderkey").cast("long") * 7 +
            col("l_linenumber")).as("key_sig"))
        .withColumn("probe", lit(name))
    probe(VersionedLake.readVersion(s, lake, 1), "v1_narrow")
      .unionByName(probe(lat, "v2_mixed"))
      .withColumn("narrow_refused", lit(narrowRefused))
      .withColumn("minted_nothing", lit(mintedNothing))
      .withColumn("types_widened", lit(widened))
  }

  /** l28 — BLOOM-FILTER file-skipping index
    * ([[graft.sources.BloomIndex]]): Delta's `CREATE BLOOMFILTER
    * INDEX`. The lake's zone maps (l08/l12) prune RANGE reads on the
    * clustered key; a point lookup on an UNCORRELATED column
    * (`l_partkey IN (...)` against a month-partitioned,
    * orderkey-clustered table) matches every file's (lo, hi) span and
    * opens all of them — at 100 TB that full-scan IS the query cost.
    * A per-file Bloom filter (sidecar parquet under `_log/`, KBs per
    * file) answers membership in metadata: the lookup reads only
    * matching files plus any not-yet-indexed ones (never a false
    * negative; a false positive dies in the exact semi-join). Filters
    * attach to immutable FILES, so indexing is INCREMENTAL — after an
    * append, [[graft.sources.BloomIndex.ensure]] indexes only the new
    * files (incremental_fresh_only), carried files reuse their rows.
    * The layout is the l12 deterministic range-fragmenter (8 ranges ×
    * 3 months), so the skip margins hold at every parallelism; skip
    * witnesses stay BOOLEANS (the l10 rule). The oracle re-derives
    * both lookups from the original parquet with plain IN predicates
    * — a wrongly skipped file loses rows and fails the counts. */
  private def l28(s: SparkSession, d: String): DataFrame = {
    import graft.sources.{BloomIndex, VersionedLake}
    val lake = s"/tmp/graft_bflake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_partkey"),
        date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .filter(col("month").between("1997-01", "1997-03"))
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(min(col("l_quantity")).as("l_quantity"),
        min(col("l_partkey")).as("l_partkey"),
        min(col("month")).as("month"))
    VersionedLake.commitOverwrite(
      li.repartitionByRange(8, col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey")),
      "month", lake)
    BloomIndex.define(s, lake, BloomIndex.Cfg("l_partkey"))
    val indexed1 = BloomIndex.ensure(s, lake, 1)
    val keys = li.select(col("l_partkey")).distinct()
      .orderBy(col("l_partkey")).limit(5)
    val (toRead1, nIdx1, nSkip1) = BloomIndex.prunedRels(s, lake, 1, keys)
    val probe1 = BloomIndex.lookup(s, lake, keys, Some(1))
    // incremental half: an append whose rows all carry the smallest
    // probed partkey (fresh files must join the lookup's result)
    val off = ttKeyOffset(li)
    val kmin = keys.agg(min(col("l_partkey"))).head().getLong(0) // 1-row
    VersionedLake.commitAppend(
      li.filter(col("month") === "1997-02")
        .filter(col("l_linenumber") <= 2)
        .withColumn("l_orderkey", col("l_orderkey") + off)
        .withColumn("l_partkey", lit(kmin)),
      "month", lake)
    val indexed2 = BloomIndex.ensure(s, lake, 2)
    val freshOnly = indexed2.nonEmpty &&
      indexed2.toSet.intersect(indexed1.toSet).isEmpty
    val (_, _, nSkip2) = BloomIndex.prunedRels(s, lake, 2, keys)
    val probe2 = BloomIndex.lookup(s, lake, keys)
    def summarize(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          sum(col("l_orderkey") * 7 + col("l_linenumber")).as("key_sig"))
        .withColumn("probe", lit(name))
    summarize(probe1, "v1_lookup")
      .unionByName(summarize(probe2, "v2_lookup"))
      .withColumn("bloom_skips_v1",
        lit(nSkip1 > 0 && toRead1.size < nIdx1))
      .withColumn("bloom_skips_v2", lit(nSkip2 > 0))
      .withColumn("incremental_fresh_only", lit(freshOnly))
  }

  /** l29 — commit HISTORY as a metadata table
    * ([[graft.sources.VersionedLake.history]]): Delta's `DESCRIBE
    * HISTORY` / Iceberg's `snapshots` metadata table — the audit
    * surface every governed deployment queries before it queries the
    * data ("who restated February, when, under which txn?"). One row
    * per live version: op verb, txn presence (exactly-once ingest
    * provenance), commit stamp presence, touched-partition count,
    * DV presence, active-constraint count — driver-side manifest
    * metadata only, version-count-sized, row data never read for the
    * history itself. The fixture drives FIVE verbs on one lake
    * (overwrite, batch-txn upsert, DV delete, stamped restore, add
    * constraint) and joins each history row with its snapshot's row
    * count; the oracle re-derives every field from the construction —
    * an op mislabeled, a txn dropped, a constraint miscounted, or a
    * version resolving to the wrong snapshot all fail the row. */
  private def l29(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_histlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d, dedupKeys = true)
    VersionedLake.commitOverwrite(li, "month", lake)
    VersionedLake.commitBatchUpsert( // txn-carrying (exactly-once form)
      li.filter(col("month") === "1997-02")
        .filter(col("l_linenumber") <= 4)
        .withColumn("l_quantity", col("l_quantity") + 1),
      "month", lake, txn = 7L)
    VersionedLake.commitDelete(
      li.filter(col("month") === "1997-02")
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("month")),
      Seq("l_orderkey", "l_linenumber"), "month", lake)
    VersionedLake.commitRestore(s, lake, 1, commitTs = Some(4000L))
    VersionedLake.commitAddConstraint(s, lake, "qty_pos",
      "l_quantity > 0")
    val h = VersionedLake.history(s, lake).collect() // 5-row planning
    val rows = h.map { r =>
      val v = r.getInt(0)
      (v, r.getString(1), !r.isNullAt(2), !r.isNullAt(3), r.getInt(4),
        r.getBoolean(5), r.getInt(6),
        VersionedLake.readVersion(s, lake, v).count())
    }.toSeq
    import s.implicits._
    rows.toDF("version", "op", "has_txn", "has_ts", "n_parts",
      "has_dvs", "n_constraints", "n_rows")
  }

  /** l30 — MERGE with SCHEMA EVOLUTION
    * ([[graft.sources.VersionedLake.commitMerge]] `evolveSchema`):
    * Delta's `schema.autoMerge`. l11's MERGE requires the delta to
    * match the table schema and l16 evolves schema through a plain
    * upsert; real ingest pipelines hit both at once — a restatement
    * feed that grew a provenance column mid-stream must MERGE AND
    * evolve in one atomic commit, or the pipeline needs a separate
    * schema-change step with a window where neither schema is right.
    * The fixture: one evolving merge updates February lines ≤ 2
    * (qty + 1) and inserts offset-keyed copies of line 1, all
    * carrying a NEW `src` column; kept rows surface src as NULL
    * (n_src counts exactly the delta), version 1 read EVOLVED
    * surfaces src all-NULL, and the SAME merge WITHOUT the flag is
    * REFUSED loudly minting nothing (strict_refused +
    * strict_minted_nothing) — never a silent column drop. The oracle
    * re-derives the merged snapshot, per-probe counts, and the
    * key/src signatures from the original parquet. */
  private def l30(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_melake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d, dedupKeys = true)
    VersionedLake.commitOverwrite(li, "month", lake)
    val off = ttKeyOffset(li)
    val feb = li.filter(col("month") === "1997-02")
    val delta = feb.filter(col("l_linenumber") <= 2)
        .withColumn("l_quantity", col("l_quantity") + 1)
      .unionByName(feb.filter(col("l_linenumber") === 1)
        .withColumn("l_orderkey", col("l_orderkey") + off))
      .withColumn("src", lit("merge"))
    val strictRefused =
      try {
        VersionedLake.commitMerge(delta,
          Seq("l_orderkey", "l_linenumber"), "month", lake)
        false
      } catch {
        case _: org.apache.spark.sql.AnalysisException => true
      }
    val strictMintedNothing = VersionedLake.latestVersion(s, lake) == 1
    VersionedLake.commitMerge(delta,
      Seq("l_orderkey", "l_linenumber"), "month", lake,
      evolveSchema = true)
    val v2 = VersionedLake.readLatest(s, lake)
    val v1e = VersionedLake.readVersionEvolved(s, lake, 1)
    def probe(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          sum(col("l_orderkey") * 7 + col("l_linenumber")).as("key_sig"),
          count(col("src")).as("n_src"))
        .withColumn("probe", lit(name))
    probe(v2, "v2_merged").unionByName(probe(v1e, "v1_evolved"))
      .withColumn("strict_refused", lit(strictRefused))
      .withColumn("strict_minted_nothing", lit(strictMintedNothing))
  }

  /** l33 — MERGE THROUGH DELETION VECTORS
    * ([[graft.sources.VersionedLake.commitMergeDv]]): l15's exact
    * three-verb merge (updates Feb lines ≤ 2 qty+5, inserts offset
    * copies of line 7, tombstones lines 5–6) executed the Delta
    * DV-MERGE way — ONE commit marks matched stored rows dead with
    * l23 positional DV sidecars and APPENDS the delta's upserts;
    * every base data file carries forward by pointer. Write cost is
    * ∝ changed rows (the point of the verb at 100 TB: a rewrite
    * merge pays touched-PARTITION bytes, this pays DV + delta
    * bytes). The read must be INDISTINGUISHABLE from the rewrite
    * form, so the oracle is l15's rebuild restatement verbatim; the
    * extra columns witness the economics — base_files_carried (no v1
    * data file left the manifest), dv_rows (one DV row per matched
    * stored row — the oracle re-derives the matched count from the
    * construction) and fresh_rows (the upsert rows, all the data
    * bytes this commit wrote). Row counts are parallelism-
    * INDEPENDENT (file counts are not — the l10 discipline).
    * LakeSpec pins the pointer carry-forward, OPTIMIZE
    * materialization and the OCC races. */
  private def l33(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_mdvlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d, dedupKeys = true)
    VersionedLake.commitOverwrite(li, "month", lake)
    val feb = li.filter(col("month") === "1997-02")
    val off = ttKeyOffset(li)
    val delta = feb.filter(col("l_linenumber") <= 2)
        .withColumn("l_quantity", col("l_quantity") + 5)
        .withColumn("is_delete", lit(false))
      .unionByName(feb.filter(col("l_linenumber") === 7)
        .withColumn("l_orderkey", col("l_orderkey") + off)
        .withColumn("l_quantity", col("l_quantity") + 3)
        .withColumn("is_delete", lit(false)))
      .unionByName(feb.filter(col("l_linenumber").between(5, 6))
        .withColumn("is_delete", lit(true)))
    val v2 = VersionedLake.commitMergeDv(delta,
      Seq("l_orderkey", "l_linenumber"), "month", lake,
      deleteCol = Some("is_delete"))
    def rels(v: Int, kind: String) = VersionedLake
      .manifestFiles(s, lake, v).filter(_.kind == kind).map(_.rel).toSet
    val (d1, d2) = (rels(1, "data"), rels(v2, "data"))
    val dvRows = s.read.parquet(
      rels(v2, "dv").toSeq.map(r => s"$lake/$r"): _*).count()
    val freshRows = VersionedLake.readFiles(s, lake, v2, d2 -- d1).count()
    ttSummariesWithDiff(VersionedLake.readVersion(s, lake, 1),
      VersionedLake.readLatest(s, lake))
      .withColumn("base_files_carried", lit(d1.subsetOf(d2)))
      .withColumn("dv_rows", lit(dvRows))
      .withColumn("fresh_rows", lit(freshRows))
  }

  /** l12 — zone-map-pruned TIME-TRAVEL range query: l08's per-file
    * (lo, hi) skipping stats carried IN l09's version manifests
    * ([[graft.sources.VersionedLake.FileEntry]] — the Iceberg
    * manifest-row shape, where the commit log IS the skipping index),
    * so a range query against an OLD snapshot prunes files exactly
    * like one against the latest. Two commits land range-clustered on
    * the key with statsCol recorded (version 2 restates February;
    * January/March carry forward by pointer WITH their stats), then
    * the same key window is read from BOTH versions via
    * [[graft.sources.VersionedLake.readVersionRange]] — only
    * stats-intersecting files reach either reader. Bounds derive from
    * version 1's own manifest stats (driver-side planning metadata,
    * integer arithmetic the oracle re-derives from the table's
    * min/max); aggregates come from the pruned reads with the
    * row-level predicate applied (zones prune files, rows still
    * filter), so a wrongly-skipped file fails the numbers;
    * skip_effective asserts >= half the files never opened. */
  private def l12(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_zvlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d)
    def clustered(df: DataFrame, n: Int): DataFrame =
      df.repartitionByRange(n, col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey"))
    VersionedLake.commitOverwrite(clustered(li, 8), "month", lake,
      statsCol = Some("l_orderkey"))
    VersionedLake.commitUpsert(
      clustered(li.filter(col("month") === "1997-02")
        .filter(col("l_linenumber") <= 4)
        .withColumn("l_quantity", col("l_quantity") + 1), 4),
      "month", lake, statsCol = Some("l_orderkey"))
    val stats = VersionedLake.manifestFiles(s, lake, 1)
    val gmin = stats.flatMap(_.lo).min
    val gmax = stats.flatMap(_.hi).max
    val lo = gmin + (gmax - gmin) * 3 / 8
    val hi = gmin + (gmax - gmin) / 2
    def rangeSummary(v: Int): DataFrame = {
      val (pruned, nMatch, nTotal) =
        VersionedLake.readVersionRange(s, lake, v, lo, hi)
      ttVersionSummary(
          pruned.filter(col("l_orderkey").between(lo, hi)), v)
        .withColumn("skip_effective", lit(nMatch * 2 <= nTotal))
    }
    rangeSummary(1).unionByName(rangeSummary(2))
  }

  /** l14 — OPTIMIZE as a commit ([[graft.sources.VersionedLake
    * .commitOptimize]]): l07/st19's small-file compaction lifted onto
    * the commit log — the last table-format verb, closing the
    * versioned lifecycle (ingest → optimize → vacuum). Three
    * single-file streaming appends fragment February to exactly 3
    * files (January/March stay at 1 — the deterministic staging
    * counts the oracle re-derives as a CASE); OPTIMIZE then compacts
    * every >1-file partition into one file AS A NEW VERSION — pure
    * re-layout, content computed-equal through the oracle's
    * count/sum/signature over the post-optimize read; already-compact
    * partitions carry forward by pointer, untouched. Unlike the
    * in-place compactAll (durable sibling-copy swap, l07), the
    * versioned form needs no staging copy and never yanks fragments
    * from a pinned reader — vacuum reclaims them later, on the
    * retention window. */
  private def l14(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_optlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d)
    VersionedLake.commitOverwrite(
      li.filter(col("month") =!= "1997-02").coalesce(1), "month", lake)
    (0 to 2).foreach { r =>
      VersionedLake.commitBatchAppend(
        li.filter(col("month") === "1997-02")
          .filter(pmod(col("l_linenumber"), lit(3)) === r).coalesce(1),
        "month", lake, txn = r.toLong)
    }
    val pre = VersionedLake.latestVersion(s, lake)
    val before = VersionedLake.manifestFiles(s, lake, pre)
      .groupBy(_.part).map { case (p, es) => p -> es.size }
    val post = VersionedLake.commitOptimize(s, lake, "month")
    val after = VersionedLake.manifestFiles(s, lake, post)
      .groupBy(_.part).map { case (p, es) => p -> es.size }
    val sp = s
    import sp.implicits._
    val counts = before.keys.toSeq.sorted
      .map(m => (m, before(m), after.getOrElse(m, 0)))
      .toDF("month", "files_before", "files_after")
    VersionedLake.readLatest(s, lake)
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        sum(col("l_orderkey") * 7 + col("l_linenumber")).as("key_sig"))
      .join(broadcast(counts), Seq("month"))
      .select(col("month"), col("n_rows"), col("sum_qty"), col("key_sig"),
        col("files_before").cast("long").as("files_before"),
        (col("files_after") === 1).as("compacted_ok"))
  }

  /** l13 — CHANGE-DATA-FEED read between versions
    * ([[graft.sources.VersionedLake.changesBetween]]): Delta's
    * `table_changes`, computed from the commit log — the manifest
    * diff names the churned partitions (identical file pointers ⇒
    * provably identical content, NEVER read), a full-outer join on
    * the key over just those partitions classifies each row, and the
    * feed drives downstream incrementals without re-diffing the
    * table (q56's audit executed AT the table layer, cost ∝ churn).
    * The fixture restates February against a deduped-key Q1 snapshot
    * with all three kinds present: lines ≤ 4 updated (quantity + 1),
    * lines > 4 dropped, +10000000-offset keys inserted (quantity
    * + 3). Output is the per-kind count and payload sums — the oracle
    * re-derives every number from the original parquet by the
    * restatement's construction. */
  private def l13(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val lake = s"/tmp/graft_cdflake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val li = ttSlimLineitem(s, d, dedupKeys = true)
    VersionedLake.commitOverwrite(li, "month", lake)
    val feb = li.filter(col("month") === "1997-02")
    val off = ttKeyOffset(li)
    VersionedLake.commitUpsert(
      feb.filter(col("l_linenumber") <= 4)
        .withColumn("l_quantity", col("l_quantity") + 1)
        .unionByName(feb.filter(col("l_linenumber") === 7)
          .withColumn("l_orderkey", col("l_orderkey") + off)
          .withColumn("l_quantity", col("l_quantity") + 3)),
      "month", lake)
    VersionedLake.changesBetween(s, lake, 1, 2,
        Seq("l_orderkey", "l_linenumber"), "l_quantity")
      .groupBy(col("change_kind"))
      .agg(count(lit(1)).as("n"),
        round(coalesce(sum(col("l_quantity_before")), lit(0.0)), 2)
          .as("sum_before"),
        round(coalesce(sum(col("l_quantity_after")), lit(0.0)), 2)
          .as("sum_after"))
  }

  /** l02 — dirty CSV ingest with quarantine: the lake-level form of the
    * reference's P4 tolerance asymmetry. The reference either skips a
    * dirty dimension row or fails the whole fact load; a 100 TB ingest
    * can do neither silently — PERMISSIVE parsing keeps every row,
    * routes each malformed LINE into a declared corrupt-record column
    * (the raw text, so nothing is lost), and the aggregate over the
    * clean rows proceeds in the same pass. The fixture CSV is derived
    * from documents with every 97th row planted malformed ("N/A" where
    * the bigint belongs — the same id-rule the oracle re-derives from
    * parquet, so the planted corruption is independently checkable).
    * Splittable line files: at 100 TB each executor parses its own
    * byte range; the quarantine column shuffles nowhere (it aggregates
    * to one count). */
  private def l02(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
    val out = s"/tmp/graft_csv_${Integer.toHexString(d.hashCode)}"
    docs.select(concat(
        col("doc_id").cast("string"), lit(","), col("lang"), lit(","),
        when(col("doc_id") % 97 === 0, lit("N/A"))
          .otherwise(col("n_chars").cast("string"))).as("value"))
      .write.mode("overwrite").text(out)
    val back = s.read
      .schema("doc_id LONG, lang STRING, n_chars LONG, _bad STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(out)
    back.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("_bad").isNotNull, 1L).otherwise(0L)).as("n_bad"),
      sum(when(col("_bad").isNull, col("n_chars"))).as("sum_chars_good"))
  }

  /** l04 — SCHEMA EVOLUTION ingest: a lake's files never share one
    * schema for long — old batches lack columns later batches carry.
    * Batch A lands (doc_id, lang, n_chars), batch B adds a `quality`
    * column; the union read uses parquet `mergeSchema` so old rows
    * surface the new column as NULL (no rewrite of historical files —
    * at 100 TB, rewriting history for a column-add is the thing this
    * exists to avoid), and the aggregate handles the NULL era
    * explicitly. Footer-merge cost only; the scan stays vectorized +
    * pruned. Oracle: predicts every number from the documents table
    * and the batch-split rule, never touching the staged files. */
  private def l04(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val out = s"/tmp/graft_evo_${Integer.toHexString(d.hashCode)}"
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/batch=a")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (col("n_chars") % 100).as("quality"))
      .write.mode("overwrite").parquet(s"$out/batch=b")
    s.read.option("mergeSchema", "true").parquet(out)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        count(col("quality")).as("n_with_quality"),
        coalesce(sum(col("quality")), lit(0L)).as("sum_quality"),
        sum(col("n_chars")).as("sum_chars"))
  }

  /** q30 — semi-structured JSON column: extract + filter + aggregate on
    * a JSON field inside the events.props string column. */
  private def q30(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"))
      // sum_k not avg_k: k is integral so the sum is exact in both
      // engines; a rounded avg is the .xx5 cross-engine trap
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
           max(col("k")).as("max_k"))

  /** q76 — Spark 4 native VARIANT battery: parse the JSON props column
    * into the binary-encoded VARIANT type once and extract typed
    * fields with variant_get — at scale this replaces per-access
    * string re-parsing (q30's get_json_object path) with a single
    * parse + O(1) binary field reads. Pins the TRY semantics the scan
    * path needs: try_parse_json turns malformed input into NULL
    * instead of failing the job, and a missing path extracts NULL.
    * to_json(variant) canonicalizes (minified) — the oracle derives
    * the same string from the known value-space (integer values: no
    * spaces inside tokens). */
  private def q76(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        expr("try_parse_json(props)").as("v"),
        // leading '}' is malformed to every parser (Spark tolerates
        // TRAILING garbage after a complete value)
        expr("try_parse_json(concat('}', props))").as("bad"))
      .select(col("event_id"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("variant_get(v, '$.missing', 'bigint')").as("missing_k"),
        col("bad").isNull.as("malformed_null"),
        expr("to_json(v)").as("roundtrip"))

  /** q31 — datetime function battery: extract/trunc/add/diff/format. */
  private def q31(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("y"),
      month(col("o_orderdate")).cast("long").as("m"),
      dayofweek(col("o_orderdate")).cast("long").as("dow"),
      Cleaning.dateToString(date_trunc("month", col("o_orderdate"))).as("month_start"),
      Cleaning.dateToString(date_add(col("o_orderdate").cast("date"), 30)).as("due_date"),
      datediff(to_date(lit("2002-01-01")),
        col("o_orderdate").cast("date")).cast("long").as("age_days"))

  /** q32 — correlated scalar subquery: orders above their customer's
    * average order value (decorrelated by Catalyst into a join+agg). */
  private def q32(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val avgPer = o.groupBy(col("o_custkey").as("ck"))
      .agg(avg(col("o_totalprice")).as("avg_price"),
           sum(col("o_totalprice")).as("cust_sum"),
           count(lit(1)).as("cust_n"))
    // cross-engine float discipline: averages land on .xx5 decimals
    // (sum of cents / count) where Spark's BigDecimal HALF_UP and
    // DuckDB's binary rounding disagree by a full cent — so the output
    // carries sum (exactly a 2-dp decimal; round(.,2) erases summation
    // ULP) and count instead of the avg; the avg drives only the filter,
    // where a ULP gap can flip nothing but exact-equality rows (only
    // single-order customers, excluded identically by both engines).
    o.join(avgPer, o("o_custkey") === avgPer("ck"))
      .filter(col("o_totalprice") > col("avg_price"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        round(col("cust_sum"), 2).as("cust_sum"), col("cust_n"))
  }

  /** q33 — bag (multiset) set operations: EXCEPT ALL / INTERSECT ALL
    * preserve multiplicities, unlike the distinct variants of q08. */
  private def q33(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val a = li.select(col("l_partkey"))
    val b = li.filter(col("l_quantity") > 25).select(col("l_partkey"))
    a.exceptAll(b).groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_kept"))
  }

  /** q34 — window navigation: ntile, first/last/nth value over full
    * frames (one shuffle on the partition key serves all four). */
  private def q34(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      ntile(4).over(w).cast("long").as("quartile"),
      first(col("o_orderkey")).over(full).as("first_order"),
      last(col("o_orderkey")).over(full).as("last_order"),
      nth_value(col("o_orderkey"), 2).over(full).as("second_order"))
  }

  /** q35 — string battery 2: pad/translate/reverse/repeat/position. */
  private def q35(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d).select(
      col("n_nationkey"),
      lpad(col("n_name"), 12, "_").as("padded"),
      translate(col("n_name"), "AEIOU", "aeiou").as("lowered_vowels"),
      reverse(col("n_name")).as("reversed"),
      repeat(substring(col("n_name"), 1, 2), 3).as("repeated"),
      instr(col("n_name"), "_").cast("long").as("underscore_at"))

  /** q36 — explicit GROUPING SETS through the spark.sql entry path
    * (Tables.registerAll + SQL text): exercises the engine's SQL-first
    * surface, not just the DataFrame API. */
  private def q36(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT COALESCE(n_name, 'ALL') AS nation,
        |COALESCE(c_mktsegment, 'ALL') AS segment,
        |count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())""".stripMargin)
  }

  /** q37 — bucketized range join (no equi-key): high-value purchases
    * open 10-minute attribution windows; count/aggregate ALL events
    * falling inside each window. RangeJoin.scaladoc has the scale
    * argument (bucket equi-join vs BroadcastNestedLoop). The oracle
    * runs the naive BETWEEN join — identical output set by
    * construction iff the bucketization is lossless. */
  private def q37(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val iv = ev
      .filter(col("event_type") === "purchase" && col("value") > 95)
      .select(col("event_id").as("interval_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
    graft.operators.RangeJoin.intervalJoin(
        iv, ev.select(col("ts").as("e_ts"), col("event_id").as("e_id"),
          col("user_id"), col("value")), bucketSeconds = 600)
      .groupBy(col("interval_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  /** q38 — Bloom-pruned shuffle join: the dim side's key set is
    * aggregated into a Bloom filter ([[graft.plans.BloomMightContain]],
    * codegen'd) that drops non-matching fact rows BEFORE the join
    * exchange — the runtime-filter pattern for a build side too big to
    * broadcast as rows but whose keys fit in a few hundred KB of bits.
    * At 100 TB this is the difference between shuffling the whole fact
    * table and shuffling only the ~matching fraction. Bloom false
    * positives are discarded by the exact join that follows, so the
    * result is byte-identical to the unfiltered join and the oracle is
    * the plain join SQL. The join is hinted shuffle_hash: a broadcast
    * join would make the Bloom redundant (this query DEMONSTRATES the
    * non-broadcastable-dim regime on fixture-sized data). */
  private def q38(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.supplier(s, d)
      .filter(col("s_acctbal") > 5000.0)
      .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"))
    // one small job over the dim side; capacity is generous so the
    // measured fpp stays near the nominal 1% even at 10x the fixture
    val bloom = dim.stat.bloomFilter("s_suppkey", 1000000L, 0.01)
    Tables.lineitem(s, d)
      .filter(graft.plans.BloomFunctions.mightContain(
        col("l_suppkey").cast("long"), bloom))
      .join(dim.hint("shuffle_hash"),
        col("l_suppkey").cast("long") === col("s_suppkey"))
      .groupBy(col("s_suppkey").as("suppkey"), col("s_name"))
      .agg(round(sum(col("l_extendedprice")), 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** q26 — salted two-stage aggregation (skew path): must be value-equal
    * to the plain GROUP BY the oracle runs. */
  private def q26(s: SparkSession, d: String): DataFrame =
    graft.operators.Salt.saltedAgg(
      Tables.lineitem(s, d), Seq("l_returnflag"),
      Seq("total" -> ("l_extendedprice", "sum"),
          "n" -> ("l_extendedprice", "count"),
          "mn" -> ("l_quantity", "min"),
          "mx" -> ("l_quantity", "max")), factor = 8)
      // 2dp, not 4: the salted two-stage sum reassociates one level more
      // than DuckDB's single agg, and at sf0.1 the extra ULP drift showed
      // through a 4dp rounding (1e-9-relative diffs on ~5e9 sums)
      .select(col("l_returnflag"), round(col("total"), 2).as("total"),
        col("n"), col("mn"), col("mx"))

  /** q27 — TPC-H Q3 shape (shipping priority): 3-way join with
    * selective filters on both fact paths, top-10 by revenue. */
  private def q27(s: SparkSession, d: String): DataFrame = {
    val cut = to_timestamp(lit("1998-06-30 00:00:00"))
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < cut)
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
      .select(col("l_orderkey"),
        Cleaning.dateToString(col("o_orderdate")).as("order_date"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** q28 — TPC-H Q5 shape (local supplier volume): 6-table snowflake
    * join, region-filtered, revenue per nation. */
  private def q28(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    val su = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(su, l("l_suppkey") === su("s_suppkey")
        && c("c_nationkey") === su("s_nationkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"))
  }

  /** q29 — histogram: fixed-width bucketing by portable floor
    * arithmetic (DuckDB 1.0 lacks width_bucket). */
  private def q29(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(least(floor(col("o_totalprice") / 50000).cast("long"), lit(11L))
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  // ---------------------------------------------------------------------
  // Training-data pipeline operators (SURVEY.md §7.5): dedup family,
  // similarity search, text analysis.
  // ---------------------------------------------------------------------

  /** c01 — THE composed training-data pipeline: quality gate → exact
    * fingerprint dedup → near-dup prune → chunking, as a one-row funnel
    * summary the oracle re-derives stage by stage (the prune uses the
    * SQL-expressible exact pair truth; the MinHash route is the
    * library's scale path, spec-checked to recover the same set). */
  private def c01(s: SparkSession, d: String): DataFrame =
    graft.operators.Curate.stats(Tables.documents(s, d), "doc_id", "text")

  /** c02 — incremental curation: admit a delta batch against an
    * existing corpus without re-deduping the corpus — exact dup via
    * hash semi-join, near dup via the CROSS-SET prefix-filter Jaccard
    * join whose cost scales with the delta. The delta view models a
    * real ingest: a fresh slice (doc_id%100 >= 80) plus REPOSTS of
    * corpus docs under new ids (doc_id%100 < 10, id+1000000 — the
    * yesterday's-crawl-reappears case that makes the exact probe
    * load-bearing; the raw fixture plants zero identical-text pairs).
    * The oracle derives both probes independently: exact on raw text
    * equality (the engine's sha2-256 grouping is a shuffle-size
    * optimization it must be indistinguishable from) and near-dup from
    * the naive inverted-index Jaccard restricted to delta×corpus. */
  private def c02(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text", "source")
    val delta = docs.filter(col("doc_id") % 100 >= 80)
      .unionByName(docs.filter(col("doc_id") % 100 < 10)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    val corpus = docs.filter(col("doc_id") % 100 < 80)
    graft.operators.Curate.incremental(delta, corpus,
      "doc_id", "text", "source", threshold = 0.5)
  }

  /** t05 — document chunking: overlapping 30-token windows, stride 20 —
    * the one-to-many generator shape of a training-data chunker, all
    * built-ins (posexplode over a transform). */
  private def t05(s: SparkSession, d: String): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val len = 30; val stride = 20
    // ceil, not floor: a floor window count drops up to stride-1 trailing
    // tokens per document (silent training-data loss the oracle could
    // not catch if it replicated the same arithmetic)
    val nChunks = ceil(greatest(size(toks) - len, lit(0)) / lit(stride.toDouble))
      .cast("int") + 1
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(toks, i * stride + 1, lit(len))))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
        col("col").as("chunk"))
  }

  /** d01 — exact dedup: canonical doc + multiplicity per distinct text. */
  private def d01(s: SparkSession, d: String): DataFrame =
    TextDedup.exact(Tables.documents(s, d), "doc_id", "text")

  /** d02 — MinHash+LSH near-dup pairs, checked as a recall contract:
    * hash-family internals aren't SQL-expressible, but the ground truth
    * IS — pairs whose shingle-set AND token-set Jaccard clear 0.6
    * ([[TextDedup.shingleJaccardPairs]]). Spark emits the exact truth
    * count (DuckDB recomputes it independently) plus a boolean that the
    * banded-LSH pipeline recovered >= 90% of the truth set (measured:
    * 25/25 at sf0.01, 256/256 at sf0.1 — RecallProbe). Fixed hash
    * seeds make the boolean deterministic. */
  private def d02(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val truth = TextDedup.shingleJaccardPairs(docs, "doc_id", "text")
    val found = TextDedup.minhashPairs(docs, "doc_id", "text")
      .select("id_a", "id_b")
    val nTrue = truth.agg(count(lit(1)).as("n_true"))
    val nHit = truth.join(found, Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    nTrue.crossJoin(nHit).select(col("n_true"),
      (col("n_hit") >= col("n_true") * lit(0.9)).as("recall_ok"))
  }

  /** d12 — MinHash Jaccard ESTIMATOR accuracy
    * ([[TextDedup.minhashEstimateCheck]], Broder's estimator): per
    * truth pair, the k=64 signature-agreement fraction must land
    * within 0.25 of the exact shingle Jaccard — the bound a pipeline
    * relies on when it thresholds on signatures alone and skips exact
    * verification at scale. d02 gates the LSH pipeline's recall; this
    * gates the estimate itself. Pair set + exact Jaccard are
    * DuckDB-recomputable (the d02 truth CTEs, per-pair form); the
    * boolean's measured max error is 0.0764 at sf0.01 / 0.0966 at
    * sf0.1 (RecallProbe, mae ≈ 0.022) — 2.5× margin under 0.25
    * (stderr √(J(1−J)/64) ≤ 0.0625; the bound is 4σ). */
  private def d12(s: SparkSession, d: String): DataFrame =
    TextDedup.minhashEstimateCheck(Tables.documents(s, d), "doc_id", "text")

  /** d03 — SimHash near-dup pairs. The chunk blocking is pigeonhole-
    * EXACT (any pair at Hamming <= 3 shares one of the four 16-bit
    * chunks), so the check cross-validates the blocked operator against
    * an in-Spark brute-force all-signature-pairs scan: both directions
    * of the symmetric difference must be empty. The oracle asserts the
    * contract (constant TRUE row) — the signature itself has no SQL
    * equivalent. */
  private def d03(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val sigs = TextDedup.simhash(docs, "doc_id", "text")
    val blocked = TextDedup.simhashPairs(docs, "doc_id", "text")
      .select("id_a", "id_b")
    val brute = sigs.alias("a")
      .join(sigs.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 3)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val missed = brute.join(blocked, Seq("id_a", "id_b"), "left_anti")
      .agg(count(lit(1)).as("nm"))
    val extra = blocked.join(brute, Seq("id_a", "id_b"), "left_anti")
      .agg(count(lit(1)).as("nx"))
    brute.agg(count(lit(1)).as("nb")).crossJoin(missed).crossJoin(extra)
      .select((col("nm") === 0 && col("nx") === 0).as("blocking_exact"),
        (col("nb") > 0).as("pairs_nonzero"))
  }

  /** d04 — exact token-set Jaccard pairs within a source block, via the
    * inverted-index join (pure SQL semantics — fully oracle-checked). */
  private def d04(s: SparkSession, d: String): DataFrame =
    TextDedup.tokenJaccardPairs(Tables.documents(s, d), "doc_id", "text",
      blockCol = "source", threshold = 0.5)

  /** d04b — the df-capped variant (maxDfRatio = 0.8): Jaccard over the
    * discriminative-token universe, dropping tokens present in > 80% of
    * their block. This is the 100 TB form of d04 — the uncapped
    * inverted index costs Σ df² per block, quadratic in block size on
    * stopword-like tokens. Same oracle discipline as d04 with the cap
    * mirrored (independently derived) in the SQL. */
  private def d04b(s: SparkSession, d: String): DataFrame =
    TextDedup.tokenJaccardPairs(Tables.documents(s, d), "doc_id", "text",
      blockCol = "source", threshold = 0.5, maxDfRatio = 0.8)

  /** d07 — duplicate clusters: token-Jaccard near-dup pairs (the d04
    * edge set) unioned into connected components via alternating
    * large-star/small-star (Graph.scaladoc — O(log²n) rounds regardless
    * of chain length), every document labeled with its component's
    * minimum doc_id, singletons included. The oracle re-derives the
    * components INDEPENDENTLY of the star algorithm: a recursive-CTE
    * min-label transitive closure over the same pair SQL. */
  private def d07(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = TextDedup.tokenJaccardPairs(docs, "doc_id", "text",
      blockCol = "source", threshold = 0.5)
    graft.operators.Graph.dupClusters(
        docs.select(col("doc_id")), pairs.select(col("id_a"), col("id_b")))
      .select(col("node").as("doc_id"), col("component"), col("cluster_size"))
  }

  /** c11 — soft dedup: duplicate-aware LOSS WEIGHTS instead of hard
    * removal (the SoftDeDup idea — down-weight duplicated content in
    * the training objective rather than dropping it): every document
    * keeps w = 1/|its near-dup cluster| so each distinct content unit
    * contributes total weight ~1 regardless of how many copies
    * crawled. Composes d07's clusters; emitted as the exact integer
    * micro-weight 10⁶ div n (float division never crosses the gate)
    * plus the cluster size. Scale shape = d07's (the weight is one
    * broadcast-sized arithmetic column on top of the CC labels). */
  private def c11(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = TextDedup.tokenJaccardPairs(docs, "doc_id", "text",
      blockCol = "source", threshold = 0.5)
    graft.operators.Graph.dupClusters(
        docs.select(col("doc_id")), pairs.select(col("id_a"), col("id_b")))
      .select(col("node").as("doc_id"), col("cluster_size"),
        expr("1000000L div cluster_size").as("w_micro"))
  }

  /** c12 — deterministic stratified train/val/test SPLIT (98/1/1 per
    * language): the holdout-carving step every training pipeline runs
    * before packing. Assignment by PER-STRATUM md5 RANK, not hash
    * bucketing — rank boundaries make the proportions EXACT per
    * stratum (a hash-modulo split is only approximate, and its skew
    * grows on small strata), the salt (':split') decorrelates the
    * order from every other md5-ranked stage (c03/c06/c07 sampling —
    * a doc's sample rank never predicts its split), and membership is
    * integer arithmetic (rn·100 vs n·98/99 — no float shares). Ranks
    * via the shared two-level [[Curate.md5RankByStratum]]: no stratum
    * ranks on a single partition at any corpus size. Content-level
    * eval leakage across the split is d08's decontamination job,
    * composable downstream. */
  private def c12(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    val ranked = graft.operators.Curate
      .md5RankByStratum(docs, "doc_id", "lang", "split")
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    ranked.join(broadcast(counts), "lang")
      .select(col("doc_id"), col("lang"), col("rn"),
        when(col("rn") * 100 <= col("n") * 98, "train")
          .when(col("rn") * 100 <= col("n") * 99, "val")
          .otherwise("test").as("split"))
  }

  /** c13 — SPLIT HYGIENE audit (c12 ∘ d08 composition): after the
    * stratified train/test split, how much n-gram leakage crosses the
    * boundary, and does decontamination actually clear it? Emits the
    * one-row audit a pipeline records per release: split sizes, train
    * docs sharing any 3-shingle with test, docs PRUNED by the policy,
    * and distinct shared shingles BEFORE and AFTER the prune. The prune
    * rule (drop docs sharing >= 2 DISTINCT test shingles) is
    * deliberately DIFFERENT from the leak probe (any shared shingle):
    * single-shingle docs survive, so shared_after is a genuinely
    * measured residual — a broken decontamination step moves it, where
    * a drop-everything-the-probe-found rule would make the AFTER zero
    * by construction and the audit could never fail. Scale shape:
    * the test side of every probe is a ~1% shingle-hash set
    * (broadcast); train text never shuffles; output is one row of
    * counters. Integer-exact. */
  private def c13(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"))
    val ranked = graft.operators.Curate
      .md5RankByStratum(docs, "doc_id", "lang", "split")
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val split = ranked.join(broadcast(counts), "lang")
      .select(col("doc_id"), col("text"),
        when(col("rn") * 100 <= col("n") * 98, "train")
          .when(col("rn") * 100 <= col("n") * 99, "val")
          .otherwise("test").as("split"))
      .filter(col("split") =!= "val")
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val sh = split
      .select(col("doc_id"), col("split"), toks.as("toks"))
      .select(col("doc_id"), col("split"),
        explode(when(size(col("toks")) >= 3,
          transform(sequence(lit(0), size(col("toks")) - 3),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(3)))))
          .otherwise(array().cast("array<string>"))).as("sg"))
      .select(col("doc_id"), col("split"), xxhash64(col("sg")).as("h"))
    val testH = sh.filter(col("split") === "test").select("h").distinct()
    val trainSh = sh.filter(col("split") === "train")
      .select("doc_id", "h").localCheckpoint(true)
    val leakCounts = trainSh.join(broadcast(testH), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("h")).as("n_shared")).localCheckpoint(true)
    val pruned = leakCounts.filter(col("n_shared") >= 2).select("doc_id")
    val kept = trainSh.join(pruned, Seq("doc_id"), "left_anti")
    val sizes = split.groupBy()
      .agg(count(when(col("split") === "train", 1)).as("n_train"),
        count(when(col("split") === "test", 1)).as("n_test"))
    sizes
      .crossJoin(broadcast(leakCounts
        .agg(count(lit(1)).as("n_leaky_train"))))
      .crossJoin(broadcast(pruned
        .agg(count(lit(1)).as("n_pruned_train"))))
      .crossJoin(broadcast(trainSh.join(broadcast(testH), Seq("h"))
        .agg(countDistinct(col("h")).as("shared_before"))))
      .crossJoin(broadcast(kept.join(broadcast(testH), Seq("h"))
        .agg(countDistinct(col("h")).as("shared_after"))))
  }

  /** c14 — deterministic WEIGHTED sampling without replacement (order
    * sampling with priorities: Ohlsson's sequential Poisson sampling /
    * Duffield–Lund–Thorup priority sampling, public literature): each
    * doc draws a reproducible uniform from md5(doc_id:salt) (52-bit
    * hex prefix — the t12/c06 md5-arithmetic discipline) and the k
    * docs with the SMALLEST priority u/w form the sample, so a doc's
    * inclusion odds scale with its weight (w = n_chars: char-budget-
    * proportional corpus draws). The draw is a pure function of corpus
    * content — re-running the pipeline reproduces the SAME sample (the
    * training-data lineage requirement rand() can never meet), and
    * membership depends on nothing but the k-th priority. Scale shape:
    * one scan computes priorities, the global smallest-k is
    * TakeOrderedAndProject (per-partition top-k, k·P-row driver merge
    * — never a global sort), weights never shuffle. Oracle: identical
    * integer-hash arithmetic — u is exact in both engines and u/w is
    * one correctly-rounded IEEE division, so even the emitted double
    * priority is bit-identical. */
  private def c14(s: SparkSession, d: String): DataFrame = {
    val u = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":ws42"))), 1, 13), 16, 10).cast("long") + lit(1L)
    val w = greatest(col("n_chars"), lit(1L))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (u.cast("double") / w.cast("double")).as("priority"))
      .orderBy(col("priority").asc, col("doc_id").asc)
      .limit(100)
  }

  /** d06 — exact n-gram (3-shingle) Jaccard dedup pairs: the
    * order-sensitive cousin of d04's token-set Jaccard (a doc pair must
    * share word SEQUENCES, not just vocabulary). Same operator that
    * serves as d02's deterministic truth set, registered first-class;
    * pairs need both shingle-set and token-set Jaccard >= 0.6. */
  private def d06(s: SparkSession, d: String): DataFrame =
    TextDedup.shingleJaccardPairs(Tables.documents(s, d), "doc_id", "text")

  /** d05 — embedding near-duplicates via sign-LSH + cosine verify,
    * checked as a recall contract against the exact all-pairs truth:
    * DuckDB recomputes n_true independently (list_cosine_similarity),
    * and the boolean asserts the auto-tuned LSH recovered >= 80% of it
    * (measured: 0.915 at sf0.01, 0.970 at sf0.1 — RecallProbe).
    * Found pairs are exact-verified >= threshold, so found ⊆ truth and
    * recall is just n_hit/n_true. Seeded hyperplanes → deterministic. */
  private def d05(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val truth = Similarity.bruteForcePairs(emb, threshold = 0.4)
    val found = Similarity.nearDupPairs(emb, threshold = 0.4)
      .select("id_a", "id_b")
    val nTrue = truth.agg(count(lit(1)).as("n_true"))
    val nHit = truth.join(found, Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    nTrue.crossJoin(nHit).select(col("n_true"),
      (col("n_hit") >= col("n_true") * lit(0.8)).as("recall_ok"))
  }

  /** d09 — SemDeDup-style semantic dedup contract: cluster-scoped
    * near-dup pruning ([[Similarity.semDedup]], nAssign=3 multi-assign)
    * vs the exact all-pairs ideal drop set. n_ideal is recomputable
    * (DuckDB re-runs the all-pairs cosine — d05's machinery);
    * recall_ok asserts the cluster-scoped pass catches ≥ 70% of the
    * ideal drops (measured 0.96 sf0.01 / 0.88 sf0.1 — RecallProbe);
    * drops_justified asserts every drop has a lower-id global near-dup
    * (a theorem of the construction — any within-cluster pair IS a
    * global pair — computed, not assumed). */
  private def d09(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val ideal = Similarity.bruteForcePairs(emb, 0.4)
      .select(col("id_b").as("vec_id")).distinct()
    val dropped = Similarity.semDedup(emb, 0.4)
      .filter(col("dropped")).select("vec_id")
    val nIdeal = ideal.agg(count(lit(1)).as("n_ideal"))
    val nHit = ideal.join(dropped, Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    val nUnjust = dropped.join(ideal, Seq("vec_id"), "left_anti")
      .agg(count(lit(1)).as("n_unjust"))
    nIdeal.crossJoin(nHit).crossJoin(nUnjust).select(
      col("n_ideal"),
      (col("n_hit") >= col("n_ideal") * lit(0.7)).as("recall_ok"),
      (col("n_unjust") === 0).as("drops_justified"))
  }

  /** d14 — PERSISTED-LSH incremental embedding dedup: the per-ingest
    * form of d05 (the c02/st11 cost-∝-delta discipline lifted to the
    * embedding modality). The base corpus's sign-LSH band table is
    * written to the lake ONCE ([[Similarity.bandTable]] → parquet);
    * the delta batch (vec_id % 4 == 3, ~25%) probes only the stored
    * bands plus itself and exact-verifies candidates
    * ([[Similarity.probeNearDupDelta]]). Contract: (1) the
    * incremental pairs EQUAL a full nearDupPairs rebuild restricted to
    * delta-touching pairs — a theorem of seeded tables, COMPUTED here
    * (set equality via counts + union cardinality), never assumed;
    * (2) d05's recall bound vs the exact delta-touching truth that
    * DuckDB recomputes (measured: 0.909 at sf0.01 [20/22 hits, bound
    * needs 18], 0.965 at sf0.1 [390/404, needs 324] — RecallProbe d14
    * row; bound 0.8 keeps >=2 hits of margin at both SFs).
    * st18 is the streaming form ([[graft.streaming.EmbedStreams]]). */
  private def d14(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val (n, dim) = Similarity.corpusStats(emb)
    val tables = Similarity.nearDupTables(n, dim, 0.4)
    val base = emb.filter(col("vec_id") % 4 =!= 3)
    val delta = emb.filter(col("vec_id") % 4 === 3)
    val idx = s"/tmp/graft_lshidx_${Integer.toHexString(d.hashCode)}"
    Similarity.bandTable(base, tables).write.mode("overwrite").parquet(idx)
    val inc = Similarity
      .probeNearDupDelta(delta, s.read.parquet(idx), base, 0.4, tables)
      .select("id_a", "id_b").localCheckpoint(true)
    val rebuild = Similarity.nearDupPairs(emb, 0.4,
        nTables = tables.size, planesPerTable = tables.head.length)
      .filter(col("id_a") % 4 === 3 || col("id_b") % 4 === 3)
      .select("id_a", "id_b").localCheckpoint(true)
    val truth = Similarity.bruteForcePairs(emb, 0.4)
      .filter(col("id_a") % 4 === 3 || col("id_b") % 4 === 3)
      .select("id_a", "id_b").localCheckpoint(true)
    val nTrue = truth.agg(count(lit(1)).as("n_true"))
    val nHit = truth.join(inc, Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    val nInc = inc.agg(count(lit(1)).as("n_inc"))
    val nReb = rebuild.agg(count(lit(1)).as("n_rebuild"))
    val nUnion = inc.unionByName(rebuild).distinct()
      .agg(count(lit(1)).as("n_union"))
    nTrue.crossJoin(nHit).crossJoin(nInc).crossJoin(nReb).crossJoin(nUnion)
      .select(col("n_true"),
        (col("n_hit") >= col("n_true") * lit(0.8)).as("recall_ok"),
        (col("n_inc") === col("n_rebuild") &&
          col("n_union") === col("n_inc")).as("inc_eq_rebuild"))
  }

  /** d15 — index TAKEDOWN (right-to-be-forgotten / licensing
    * retraction on d14's persisted LSH index): withdrawn ids' vectors,
    * band rows, and every near-dup pair referencing them physically
    * leave the lake, rewriting ONLY the ingest_batch partitions they
    * landed in ([[graft.streaming.EmbedStreams.retractIds]]). The
    * audit row a pipeline records per takedown: exact before/after/
    * takedown counts (DuckDB-recomputable), `purge_complete` (no
    * retracted id survives in ANY store — computed by re-scanning all
    * three), and `stores_eq_rebuild` (every store byte-equals an index
    * built from scratch without the retracted ids, same batch split —
    * order-insensitive bit_xor(xxhash64) signatures per store). The
    * rebuild + re-scan harness is the audit; the OPERATOR a pipeline
    * executes per takedown is one `retractIds` call — Bench measures
    * that form against a prebuilt index (benchOverrides rule). */
  private def d15(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, Path, Paths}
    def wipe(p: Path): Unit =
      if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => { Files.deleteIfExists(f); () })
    val emb = Tables.embeddings(s, d)
    val (n, dim) = Similarity.corpusStats(emb)
    val tables = Similarity.nearDupTables(n, dim, 0.4)
    val hex = Integer.toHexString(d.hashCode)
    val idxA = s"/tmp/graft_takedown_a_$hex"
    val idxB = s"/tmp/graft_takedown_b_$hex"
    wipe(Paths.get(idxA)); wipe(Paths.get(idxB))
    val b0 = emb.filter(col("vec_id") % 4 =!= 3)
    val b1 = emb.filter(col("vec_id") % 4 === 3)
    graft.streaming.EmbedStreams.ingestBatch(b0, 0L, idxA, tables, 0.4)
    graft.streaming.EmbedStreams.ingestBatch(b1, 1L, idxA, tables, 0.4)
    val takedown = emb.filter(col("vec_id") % 10 === 7).select("vec_id")
    graft.streaming.EmbedStreams.retractIds(takedown, idxA)
    graft.streaming.EmbedStreams.ingestBatch(
      b0.join(takedown, Seq("vec_id"), "left_anti"), 0L, idxB, tables, 0.4)
    graft.streaming.EmbedStreams.ingestBatch(
      b1.join(takedown, Seq("vec_id"), "left_anti"), 1L, idxB, tables, 0.4)
    def sig(idx: String, store: String, cols: Seq[String]): DataFrame =
      s.read.parquet(s"$idx/$store")
        .select(xxhash64((col("ingest_batch").cast("long").cast("string") +:
          cols.map(c => col(c).cast("string"))): _*).as("h"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("g"))
    val stores = Seq(
      ("bands", Seq("id", "table", "bucket")),
      ("vecs", Seq("vec_id", "embedding")),
      ("pairs", Seq("id_a", "id_b", "sim")))
    val eq = stores.map { case (st, cols) =>
      sig(idxA, st, cols).crossJoin(
          sig(idxB, st, cols).withColumnRenamed("n", "n2")
            .withColumnRenamed("g", "g2"))
        .select((col("n") === col("n2") && col("g") === col("g2"))
          .as(s"eq_$st"))
    }.reduce(_.crossJoin(_))
      .select((col("eq_bands") && col("eq_vecs") && col("eq_pairs"))
        .as("stores_eq_rebuild"))
    val leftover = stores.map { case (st, cols) =>
      val keys = if (st == "pairs") Seq("id_a", "id_b")
        else Seq(cols.head)
      val df = s.read.parquet(s"$idxA/$st")
      keys.map(k => df.join(takedown,
          df(k) === takedown("vec_id"), "left_semi")
        .agg(count(lit(1)).as("c"))).reduce(_.unionByName(_))
    }.reduce(_.unionByName(_)).agg(sum(col("c")).as("n_leftover"))
    emb.agg(count(lit(1)).as("n_vecs_before"))
      .crossJoin(broadcast(s.read.parquet(s"$idxA/vecs")
        .agg(count(lit(1)).as("n_vecs_after"))))
      .crossJoin(broadcast(takedown.agg(count(lit(1)).as("n_takedown"))))
      .crossJoin(broadcast(leftover
        .select((col("n_leftover") === 0).as("purge_complete"))))
      .crossJoin(broadcast(eq))
  }

  /** s01 — brute-force exact cosine top-10 for query vectors vec_id<10
    * (codegen'd CosineSimilarity kernel, broadcast queries). */
  private def s01(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 10)
  }

  /** s09 — MMR diversity re-rank of the cosine top-20 pool, k=10 per
    * query ([[Similarity.mmrRerank]]); full deterministic oracle — the
    * DuckDB side replays the greedy with a recursive CTE carrying the
    * selected set, and λ=1/2 keeps every score bit-identical. */
  private def s09(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.mmrRerank(emb, emb.filter(col("vec_id") < 10))
  }

  /** s05 — int8-quantized brute-force top-10: integer scores are exact
    * both engines (QUANTIZATION CONTRACT, QuantizeExpressions.scaladoc),
    * so unlike s02/s03 this approximate-SEARCH-QUALITY operator still
    * gets a full deterministic oracle — the SQL recomputes scale
    * vector, codes and int64 scores and must hash-match bit-for-bit. */
  private def s05(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 10), k = 10)
  }

  /** Shared shape of the ANN recall checks (s02/s03): recall@10 of an
    * approximate top-k against the exact brute-force top-k (s01's path),
    * per query. Both sides are deterministic (seeded LSH / seeded
    * KMeans, unique-tie-break rankings), so `n_hit >= minHits` is a
    * stable boolean the oracle asserts per query id. */
  private def annRecallCheck(approx: DataFrame, exact: DataFrame,
                             minHits: Int): DataFrame = {
    val truthPairs = exact.select(col("query_id"), col("cand_id"))
    val hits = truthPairs
      .join(approx.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    truthPairs.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("n_hit"), lit(0L)) >= minHits).as("recall_ok"))
  }

  /** s02 — LSH-bucketed approximate top-10 with exact re-rank, checked
    * as recall@10 >= 0.6 per query vs the brute-force truth (measured
    * min hits = 8 at sf0.01 AND sf0.1 — see graft.RecallProbe; the
    * fixture embeddings are near-random, 10th neighbors at cosine ~0.25,
    * so the auto-tuned table/plane budget from
    * [[graft.operators.Similarity.tuneSignLsh]] is what carries this). */
  private def s02(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 10)
    annRecallCheck(
      Similarity.lshTopK(emb, q, k = 10),
      Similarity.bruteForceTopK(emb, q, k = 10), minHits = 6)
  }

  /** s03 — IVF approximate top-10 (hash-ranked deterministic k-means
    * training sample + nProbe probing + exact rerank), checked as
    * recall@10 >= 0.4 per query vs the brute-force truth. nProbe/nLists
    * = 7/16 of the corpus is scanned; measured min hits = 5 at both SFs
    * with the partition-independent training sample (RecallProbe), so 4
    * is the contract with one hit of margin — honest for near-random
    * embeddings where cell residency barely correlates with top-10
    * membership. */
  private def s03(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 10)
    annRecallCheck(
      Similarity.ivfTopK(emb, q, k = 10, nProbe = 7),
      Similarity.bruteForceTopK(emb, q, k = 10), minHits = 4)
  }

  /** s10 — product-quantization ANN ([[Similarity.pqTopK]]: per-
    * subspace sub-quantizer codebooks + ADC lookup-table scoring +
    * exact re-rank of the top-250 shortlist), checked as recall@10 >=
    * 0.5 per query vs the brute-force truth. Measured min hits = 6 at
    * sf0.1 and 10 at sf0.01 (RecallProbe), so 5 is the contract with
    * one hit of margin — the fixture's near-random 64-dim embeddings
    * are PQ's hardest case (no cluster structure for codebooks to
    * exploit), which is exactly why the wide-shortlist dial is the
    * honest production shape. */
  private def s10(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 10)
    annRecallCheck(
      Similarity.pqTopK(emb, q, k = 10),
      Similarity.bruteForceTopK(emb, q, k = 10), minHits = 5)
  }

  /** s11 — hard-negative mining ([[Similarity.hardNegatives]]): per
    * anchor (vec_id < 10), the 5 most similar vectors with a DIFFERENT
    * label — the contrastive-training batch-builder. Full
    * deterministic oracle: both engines rank the identical
    * 9dp-rounded cosine + cand_id total order. */
  private def s11(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10), k = 5)
  }

  /** s12 — FILTERED vector search ([[Similarity.ivfTopKFiltered]]):
    * IVF ANN under a metadata predicate (candidates must share the
    * query's label — every production vector store's "metadata
    * filtering" problem). The ~10%-selective label filter is the
    * known-hard regime: it thins every probed cell, so the operator
    * widens nProbe to 10 (vs s03's 7) and the contract measures what
    * that buys — recall@10 >= 0.5 per query vs the exact label-
    * filtered brute-force truth. Measured min hits = 6 at BOTH sf0.01
    * and sf0.1 (RecallProbe, mean 8.0/7.8), so 5 is the contract with
    * one hit of margin. */
  private def s12(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 10)
    annRecallCheck(
      Similarity.ivfTopKFiltered(emb, q, k = 10, nProbe = 10),
      Similarity.bruteForceTopKFiltered(emb, q, k = 10), minHits = 5)
  }

  /** s15 — ANN search over the PERSISTED LSH index: s02's lshTopK
    * without re-bucketing the corpus per query batch — the search-side
    * use of d14's lake-resident band table
    * ([[Similarity.lshTopKOverIndex]]). A production vector store
    * builds the index once per corpus version and every retrieval
    * batch probes it; rebuilding per run is the thing this exists to
    * stop. Contract: (1) s02's recall bound vs the brute-force truth
    * (identical seeded tables ⇒ the candidates — hence recall — are
    * s02's: measured min hits 8 at both SFs vs bound 6, RecallProbe
    * s02 row); (2) result EQUALS the rebuild form lshTopK — computed
    * set equality, the d14 discipline. */
  private def s15(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val (n, dim) = Similarity.corpusStats(emb)
    // the SAME tuning lshTopK auto-derives (simFloor .25, recall .9)
    val tables = Similarity.nearDupTables(n, dim, 0.25, targetRecall = 0.9)
    val idx = s"/tmp/graft_lshsearch_${Integer.toHexString(d.hashCode)}"
    Similarity.bandTable(emb, tables).write.mode("overwrite").parquet(idx)
    val q = emb.filter(col("vec_id") < 10)
    val approx = Similarity
      .lshTopKOverIndex(emb, s.read.parquet(idx), q, k = 10, tables)
      .localCheckpoint(true)
    val direct = Similarity.lshTopK(emb, q, k = 10)
    val eq = approx.unionByName(direct).distinct()
      .agg(count(lit(1)).as("n_u"))
      .crossJoin(approx.agg(count(lit(1)).as("n_a")))
      .crossJoin(direct.agg(count(lit(1)).as("n_d")))
      .select((col("n_u") === col("n_a") && col("n_a") === col("n_d"))
        .as("idx_eq_rebuild"))
    annRecallCheck(approx, Similarity.bruteForceTopK(emb, q, k = 10),
        minHits = 6)
      .crossJoin(broadcast(eq))
  }

  /** s16 — IVFADC, the composed production ANN index
    * ([[Similarity.ivfAdcTopK]]: IVF coarse cells + product-quantized
    * RESIDUALS + per-(query, cell) ADC lookup tables + exact rerank —
    * Jégou, Douze & Schmid 2011 §IV, the faiss IndexIVFPQ shape),
    * checked as recall@10 >= 0.4 per query vs the brute-force truth.
    * Measured min hits = 5 at BOTH SFs with m=16 subspaces and the
    * 500-wide ADC shortlist (RecallProbe) — exactly the coarse
    * quantizer's cell-residency ceiling (s03's measured min), i.e.
    * the residual-PQ stage recovers every true neighbor the cell
    * routing kept; 4 is the contract with one hit of margin. The
    * composite is the 100 TB memory story: a scanned candidate costs
    * m one-byte codes + its cell id, not the float vector, and only
    * nProbe/nLists of the corpus is scanned at all. */
  private def s16(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 10)
    annRecallCheck(
      Similarity.ivfAdcTopK(emb, q, k = 10, m = 16, rerank = 500),
      Similarity.bruteForceTopK(emb, q, k = 10), minHits = 4)
  }

  /** s18 — ANN search over the PERSISTED IVFADC index: s16's two
    * halves with the index written to — and re-read from — the lake in
    * between ([[Similarity.buildIvfAdcIndex]] → parquet →
    * [[Similarity.ivfAdcSearch]]): the s15 discipline on the IVFADC
    * modality. A production vector store trains the quantizers and
    * encodes the corpus once per version; every retrieval batch loads
    * three metadata-to-codes-sized tables and probes them — retraining
    * k-means + codebooks per query batch is the thing this exists to
    * stop. Contract: (1) s16's recall bound vs the brute-force truth
    * (same build, hence same measured min hits 5 at both SFs, bound
    * 4); (2) the persisted-index results EQUAL the in-memory rebuild
    * form — computed set equality over the full (query, rnk, cand,
    * sim) rows, the d14/s15 discipline, which also proves the parquet
    * roundtrip of centroids/codebook/codes is bit-faithful. */
  private def s18(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 10)
    val root = s"/tmp/graft_ivfadc_${Integer.toHexString(d.hashCode)}"
    val built = Similarity.buildIvfAdcIndex(emb, m = 16)
    built.centroids.write.mode("overwrite").parquet(s"$root/centroids")
    built.codebook.write.mode("overwrite").parquet(s"$root/codebook")
    built.codes.write.mode("overwrite").parquet(s"$root/codes")
    val persisted = Similarity.IvfAdcIndex(
      s.read.parquet(s"$root/centroids"),
      s.read.parquet(s"$root/codebook"),
      s.read.parquet(s"$root/codes"))
    val approx = Similarity
      .ivfAdcSearch(emb, persisted, q, k = 10, m = 16, rerank = 500)
      .localCheckpoint(true)
    val direct = Similarity.ivfAdcTopK(emb, q, k = 10, m = 16,
      rerank = 500)
    val eq = approx.unionByName(direct).distinct()
      .agg(count(lit(1)).as("n_u"))
      .crossJoin(approx.agg(count(lit(1)).as("n_a")))
      .crossJoin(direct.agg(count(lit(1)).as("n_d")))
      .select((col("n_u") === col("n_a") && col("n_a") === col("n_d"))
        .as("idx_eq_rebuild"))
    annRecallCheck(approx, Similarity.bruteForceTopK(emb, q, k = 10),
        minHits = 4)
      .crossJoin(broadcast(eq))
  }

  /** Deterministic TEXT-side query vectors for the cross-modal search
    * (s19): a paired-encoder (CLIP-style) training setup puts both
    * modalities in ONE space, with a caption's vector NEAR — never
    * equal to — its image's. The container has no encoder models (the
    * m-family decode discipline), so the text encoder is a
    * deterministic fake: each image embedding for vec_id < 10 gets a
    * per-coordinate hash-derived perturbation (±0.20, xxhash64 of
    * (vec_id, coordinate) — reproducible on any partitioning) and a
    * +100000 id offset so the two modalities' key spaces never
    * collide. The Spark-side plumbing — id spaces, shared-space
    * probing, index reuse — is the real thing; only the encoder is
    * faked, exactly like the multimodal codec stubs. */
  private[graft] def crossModalQueries(s: SparkSession,
                                       d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + (pmod(xxhash64(col("vec_id"), i), lit(41L)) - lit(20L))
            .cast("double") / lit(100.0)).cast("float")).as("embedding"))

  /** s19 — CROSS-MODAL retrieval (text → image) through the PERSISTED
    * image-side IVFADC index: the composition the s18 index exists
    * for — the image corpus is indexed ONCE (coarse cells + residual
    * PQ codes in the lake, [[cachedIvfAdcIndex]]), and query batches
    * from the OTHER modality probe it; nothing about IVFADC is
    * image-specific because both encoders target the same space, so
    * the probe is [[Similarity.ivfAdcSearch]] unchanged — no rebuild,
    * no modality-specific index. Contract: recall@10 per text query
    * vs the exact cross-modal brute force (text query × image corpus
    * cosine), at nProbe = 9 — a cross-modal query sits BETWEEN cells
    * (its perturbation moves it off the image's centroid), so it
    * buys two more probes than the same-modality s16/s18 dial; the
    * honest cross-encoder trade, scan 9/16 of the cells instead of
    * 7/16. Measured min hits 6 at BOTH SFs (RecallProbe: nProbe 7
    * gives min 4, 9 gives 6, 11 gives 8); bound 5 keeps 1 unit of
    * margin at both SFs (RecallMarginSpec). */
  private def s19(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val tq = crossModalQueries(s, d)
    val approx = Similarity.ivfAdcSearch(emb, cachedIvfAdcIndex(s, d),
      tq, k = 10, nProbe = 9, rerank = 500)
    annRecallCheck(approx, Similarity.bruteForceTopK(emb, tq, k = 10),
      minHits = 5)
  }

  /** s20 — INCREMENTAL IVFADC maintenance against the FROZEN index
    * ([[Similarity.encodeIvfAdc]] + [[graft.sources.VersionedLake]]):
    * the ingest half of the s18 lifecycle — new vectors are only
    * ASSIGNED and ENCODED (coarse centroids + PQ codebook trained once
    * per index version, never per batch; cost ∝ delta), their code
    * rows landing as four exactly-once txn-deduped APPEND commits on a
    * cell-partitioned versioned codes table (the faiss
    * `IndexIVFPQ.add` shape; st21 runs the same path under a real
    * stream). Contract, the q86/q88 rebuild discipline on this
    * modality: (1) the batch-accumulated codes table is computed-EQUAL
    * to a one-shot encode of the whole delta (per-row-independent
    * encode ⇒ batching cannot matter — set equality over the exact
    * integer (cand_id, cell, j, code) rows, which also proves the
    * lake roundtrip); (2) a SEARCH over base ∪ streamed codes equals
    * the search over base ∪ rebuilt codes — the consumer-visible form
    * of the same equality; (3) one version per batch and a replayed
    * txn is a no-op. n_new_vecs/n_codes are DuckDB-recomputable from
    * the delta's construction (m = 16 codes per vector). */
  private def s20(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val emb = Tables.embeddings(s, d)
    val idx = cachedIvfAdcIndex(s, d)
    val lake = s"/tmp/graft_codeslake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val delta = emb.filter(col("vec_id") % 10 < 4)
      .withColumn("vec_id", col("vec_id") + 200000L)
    (0 to 3).foreach { r =>
      VersionedLake.commitBatchAppend(
        Similarity.encodeIvfAdc(
          delta.filter(pmod(col("vec_id"), lit(4)) === r), idx),
        "cell", lake, txn = r.toLong)
    }
    val oneVersionPerBatch =
      VersionedLake.versions(s, lake) == Seq(1, 2, 3, 4)
    val replayNoop = VersionedLake.commitBatchAppend(
      Similarity.encodeIvfAdc(delta.limit(3), idx), "cell", lake,
      txn = 3L) == 4
    val streamed = VersionedLake.readLatest(s, lake)
      .select(col("cand_id"), col("cell"), col("j"), col("code"))
      .localCheckpoint(true)
    val rebuilt = Similarity.encodeIvfAdc(delta, idx)
    def setEq(a: DataFrame, b: DataFrame, name: String): DataFrame =
      a.unionByName(b).distinct().agg(count(lit(1)).as("n_u"))
        .crossJoin(a.agg(count(lit(1)).as("n_a")))
        .crossJoin(b.agg(count(lit(1)).as("n_b")))
        .select((col("n_u") === col("n_a") && col("n_a") === col("n_b"))
          .as(name))
    val codesEq = setEq(streamed, rebuilt, "codes_eq_rebuild")
    // the consumer-visible equality: search base ∪ delta through each
    // codes table
    val corpus = emb.unionByName(delta)
    val q = emb.filter(col("vec_id") < 10)
    def searchWith(codes: DataFrame): DataFrame = Similarity
      .ivfAdcSearch(corpus,
        Similarity.IvfAdcIndex(idx.centroids, idx.codebook,
          idx.codes.unionByName(codes)),
        q, k = 10, rerank = 500)
      .localCheckpoint(true)
    val searchEq = setEq(searchWith(streamed), searchWith(rebuilt),
      "search_eq_rebuild")
    streamed.agg(countDistinct(col("cand_id")).as("n_new_vecs"),
        count(lit(1)).as("n_codes"))
      .withColumn("one_version_per_batch",
        lit(oneVersionPerBatch && replayNoop))
      .crossJoin(broadcast(codesEq))
      .crossJoin(broadcast(searchEq))
  }

  /** s21 — IVFADC index TAKEDOWN (right-to-be-forgotten on the
    * persisted-codes modality — d15's discipline applied to the s20
    * codes lake): retracted vector ids' code rows must physically
    * leave the index, executed as ONE keyed MERGE-delete commit
    * ([[graft.sources.VersionedLake.commitMerge]] tombstones) — the
    * takedown list left-semi-joins the slim codes table to derive its
    * tombstone rows (each vector's m code rows share its ONE cell, so
    * the merge rewrites only the retracted vectors' cells; untouched
    * cells carry forward by pointer, and a fully-emptied cell leaves
    * the manifest via forceReplaced). Contract, the d15 equivalence:
    * the post-takedown codes table is SET-EQUAL to an index that
    * NEVER ingested the retracted vectors (encodeIvfAdc over the
    * surviving delta — frozen codebooks make that a pure per-row
    * function), purge_complete re-scans for any surviving retracted
    * id, and the pre/post counts are DuckDB-recomputable from the
    * delta's construction (m = 16 rows per vector). The takedown
    * history itself stays auditable: the pre-takedown version remains
    * readable until vacuum — data deletion is completed by the l10
    * retention path, exactly Delta's delete-then-vacuum story. */
  private def s21(s: SparkSession, d: String): DataFrame = {
    import graft.sources.VersionedLake
    val emb = Tables.embeddings(s, d)
    val idx = cachedIvfAdcIndex(s, d)
    val lake = s"/tmp/graft_cdtdlake_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val delta = emb.filter(col("vec_id") % 10 < 4)
      .withColumn("vec_id", col("vec_id") + 200000L)
    (0 to 1).foreach { r =>
      VersionedLake.commitBatchAppend(
        Similarity.encodeIvfAdc(
          delta.filter(pmod(col("vec_id"), lit(2)) === r), idx),
        "cell", lake, txn = r.toLong)
    }
    val retract = delta.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("cand_id"))
    val before = VersionedLake.readLatest(s, lake).localCheckpoint(true)
    val tomb = before.join(broadcast(retract), Seq("cand_id"), "left_semi")
      .withColumn("is_delete", lit(true))
    VersionedLake.commitMerge(tomb, Seq("cand_id", "j"), "cell", lake,
      deleteCol = Some("is_delete"))
    val after = VersionedLake.readLatest(s, lake).localCheckpoint(true)
    val purge = after.join(broadcast(retract), Seq("cand_id"), "left_semi")
      .agg(count(lit(1)).as("n_left"))
      .select((col("n_left") === 0L).as("purge_complete"))
    // the d15 equivalence: indistinguishable from never-ingested
    val never = Similarity.encodeIvfAdc(
      delta.join(retract.withColumnRenamed("cand_id", "vec_id"),
        Seq("vec_id"), "left_anti"), idx)
    val sel = Seq("cand_id", "cell", "j", "code").map(col)
    val eq = after.select(sel: _*).unionByName(never.select(sel: _*))
      .distinct().agg(count(lit(1)).as("n_u"))
      .crossJoin(after.agg(count(lit(1)).as("n_a")))
      .crossJoin(never.agg(count(lit(1)).as("n_n")))
      .select((col("n_u") === col("n_a") && col("n_a") === col("n_n"))
        .as("equiv_never_ingested"))
    before.agg(count(lit(1)).as("n_codes_before"))
      .crossJoin(after.agg(count(lit(1)).as("n_codes_after")))
      .crossJoin(broadcast(purge))
      .crossJoin(broadcast(eq))
  }

  /** s13 — distributed Lloyd k-means refinement (LLOYD K-MEANS
    * CONTRACT, KMeansLloyd.scaladoc): k=8, 2 full-corpus iterations on
    * the int8-quantized embeddings — hash-ranked deterministic seeds,
    * assignment as a closure-broadcast codegen projection, update as
    * ONE map-side-combined (sums[], n) aggregation per round, floor-div
    * integer centroids. Integer-exact end to end, so the oracle
    * replays both unrolled iterations in SQL and every (cid, dist,
    * cluster_n) cell must hash-match — a FULL oracle where the
    * sampling-based IVF fit (s03) can only contract recall. */
  private def s13(s: SparkSession, d: String): DataFrame =
    graft.operators.KMeansLloyd.fitPredict(
      Tables.embeddings(s, d), k = 8, iters = 2)

  /** s14 — embedding DRIFT monitor: the train/serve-skew check a
    * production retrieval/curation pipeline runs between two corpus
    * snapshots (here the deterministic vec_id-parity halves standing
    * in for "last month" vs "this month"): per label — snapshot sizes,
    * per-side squared-norm masses, and the max per-dimension centroid
    * displacement. Everything INTEGER: embeddings quantize to 1e-4
    * grid scalars AFTER posexplode (scalar codegen arithmetic — no
    * per-element lambda), and the centroid difference clears its
    * denominators as d_i = n_cand·Σref_i − n_ref·Σcand_i, so no float
    * division ever happens and the gate hash-matches exactly. Scale
    * shape: two map-side-combined counter aggregations (per (label,
    * dim) and per label), label-count-sized output; the vector frame
    * never self-joins. */
  private def s14(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        (col("vec_id") % 2 === 1).as("cand"), col("embedding"))
    val ex = base
      .select(col("label"), col("cand"), posexplode(col("embedding")))
      .select(col("label"), col("cand"), col("pos"),
        floor(col("col").cast("double") * 10000 + 0.5).cast("long").as("q"))
    val byDim = ex.groupBy(col("label"), col("pos"))
      .agg(coalesce(sum(when(!col("cand"), col("q"))), lit(0L)).as("sr"),
        coalesce(sum(when(col("cand"), col("q"))), lit(0L)).as("sc"))
    // snapshot sizes from the UN-exploded frame — a zero-length embedding
    // has no pos=0 row post-explode but the oracle's per-row lab CTE (and
    // any sane "how many vectors" semantics) still counts it
    val counts = base.groupBy(col("label"))
      .agg(count(when(!col("cand"), 1)).as("n_ref"),
        count(when(col("cand"), 1)).as("n_cand"))
    val byLabel = ex.groupBy(col("label"))
      .agg(
        coalesce(sum(when(!col("cand"), col("q") * col("q"))), lit(0L))
          .as("norm2_ref"),
        coalesce(sum(when(col("cand"), col("q") * col("q"))), lit(0L))
          .as("norm2_cand"))
      .join(counts, "label")
    byDim.join(byLabel, "label")
      .groupBy(col("label"), col("n_ref"), col("n_cand"),
        col("norm2_ref"), col("norm2_cand"))
      .agg(max(abs(col("n_cand") * col("sr") - col("n_ref") * col("sc")))
        .as("shift_max"))
  }

  /** t06 — stopword filtering: token counts before/after removing the
    * English stopword set (a standard cleaning stage ahead of
    * shingling/dedup). */
  private def t06(s: SparkSession, d: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
    val toks = TextFunctions.tokenSet(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_except(toks, array(stop.map(lit): _*))).cast("long")
        .as("n_content_tokens"))
  }

  /** s04 — label centroids via the typed [[graft.functions.VectorStats]]
    * Aggregator (one (sums, n) buffer per group vs the 64× shuffle of
    * explode+avg), exploded to (label, dim, sum, n) for the oracle.
    * Emits round(sum,4) + n, never a rounded mean — the consumer divides
    * (same .xx5 cross-engine discipline as q22/q32). */
  private def s04(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .groupBy(col("label"))
      .agg(graft.functions.VectorStats.vectorStats(col("embedding")).as("st"))
      .select(col("label"), col("st.n").as("n"), posexplode(col("st.sums")))
      .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
        round(col("col"), 4).as("s"), col("n"))

  /** t01 — stopword-heuristic language ID with per-language scores and
    * deterministic argmax (tie → first in de<en<es<fr<zh order). */
  private def t01(s: SparkSession, d: String): DataFrame = {
    val txt = col("text")
    val scores = TextFunctions.langMarkers.map { case (lang, _) =>
      lang -> TextFunctions.langScore(txt, lang)
    }
    Tables.documents(s, d).select(
      col("doc_id") +:
        scores.map { case (lang, c) => c.as(s"s_$lang") } :+
        TextFunctions.langPredict(scores).as("predicted"): _*)
  }

  /** t02 — quality scoring: length / word / punctuation / stopword
    * signals combined into one [0,1] score. */
  private def t02(s: SparkSession, d: String): DataFrame = {
    val t = col("text")
    val nChars = length(t).cast("double")
    val nWords = regexp_count(t, lit("\\S+")).cast("double")
    val nPunct = regexp_count(t, lit("[^A-Za-z0-9\\s]")).cast("double")
    val nStop = regexp_count(lower(t),
      lit(TextFunctions.langMarkers.toMap.apply("en"))).cast("double")
    // nullif guards: an empty/whitespace-only doc has nChars/nWords = 0,
    // where unguarded Spark (non-ANSI) emits NULL but DuckDB emits
    // inf/nan — both engines must agree on NULL for the hash to match
    val punctRatio = nPunct / nullif(nChars, lit(0.0))
    val stopRatio = nStop / nullif(nWords, lit(0.0))
    Tables.documents(s, d).select(
      col("doc_id"),
      nChars.cast("long").as("n_chars_m"),
      nWords.cast("long").as("n_words"),
      round(punctRatio, 4).as("punct_ratio"),
      round(stopRatio, 4).as("stop_ratio"),
      round(nChars / nullif(nWords, lit(0.0)), 4).as("chars_per_word"),
      round(least(lit(1.0), nWords / 50.0) * (lit(1.0) - punctRatio)
        * least(lit(1.0), lit(0.5) + stopRatio), 4).as("quality"))
  }

  /** t03 — token counting: whitespace tokens + BPE-ish pre-tokenizer
    * count (letter runs / digits / marks). */
  private def t03(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextFunctions.wsTokenCount(col("text")).as("ws_tokens"),
      TextFunctions.bpeishTokenCount(col("text")).as("bpe_tokens"),
      round(length(col("text")).cast("double") /
        TextFunctions.bpeishTokenCount(col("text")).cast("double"), 4)
        .as("chars_per_token"))

  /** t04 — document fingerprint: md5 over normalized text (case/punct/
    * whitespace-invariant exact-dup key). */
  private def t04(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp"))

  /** t07 — vocabulary builder: token frequency + document frequency,
    * top 50 by tf with a total tie-break. The classic first pass of
    * tokenizer training / stopword discovery; one explode + one hash
    * aggregation, partial-combined map-side. */
  private def t07(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("tok").asc)
      .limit(50)

  /** t08 — deterministic hash-ranked stratified sampling: per source,
    * the 5 docs with the smallest md5(doc_id) — the reproducible
    * sampling primitive a training pipeline needs (no RNG state: stable
    * across retries, engines and partitionings, mirrorable in SQL).
    * row_number + rank filter plans as WindowGroupLimit, so only ~5
    * candidates per stratum survive each partial. */
  private def t08(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("doc_id"), col("source"), col("rn").cast("long").as("rn"))
  }

  /** t09 — PII-style redaction: emails / IPv4s / phone-like digit runs
    * scrubbed to typed tags, with per-doc match counts. Behavior on
    * planted PII lives in TextFunctionsSpec; the oracle pins
    * cross-engine regex parity on the real corpus. */
  private def t09(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextFunctions.redact(col("text")).as("redacted"),
      regexp_count(col("text"), lit(TextFunctions.emailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(TextFunctions.ipRe)).cast("long").as("n_ips"),
      regexp_count(col("text"), lit(TextFunctions.phoneRe)).cast("long").as("n_phones"))

  /** t10 — TF-IDF keywords: top-3 tokens per document. The RANKING key
    * is integer-only (tf desc, df asc, tok) — ordering by the float
    * tfidf would let a last-ulp ln() difference between engines swap
    * near-ties across the top-3 cutoff; the tfidf VALUE itself is
    * emitted (4 dp) where a boundary landing is measure-zero. */
  private def t10(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")),
        lit("[a-z0-9]+"), lit(0))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("tok").asc)
    tf.join(dfTab, "tok").crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") *
        log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("tok"), col("tf"), col("df"),
        col("tfidf"))
  }

  /** t11 — repetition signals (Gopher-style quality filters): word
    * counts, distinct ratio, and the share of the doc taken by its most
    * frequent token. Integer ratios only — no transcendental functions
    * in anything the oracle hashes order-sensitively. */
  private def t11(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")),
        lit("[a-z0-9]+"), lit(0))).as("tok"))
    val perTok = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val agg = perTok.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_words"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("top_tf"))
    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).cast("long").as("n_words"),
        coalesce(col("n_distinct"), lit(0L)).cast("long").as("n_distinct"),
        coalesce(col("top_tf"), lit(0L)).cast("long").as("top_tf"),
        round(col("top_tf").cast("double") /
          nullif(col("n_words"), lit(0L)), 4).as("rep_ratio"),
        round(col("n_distinct").cast("double") /
          nullif(col("n_words"), lit(0L)), 4).as("distinct_ratio"))
  }

  /** t12 — Misra–Gries heavy hitters over a deterministic Zipfian token
    * stream. The stream is md5 arithmetic BOTH engines reproduce
    * (rank = floor(1e6/(m+1)), m = first-6-hex(md5("id:slot")) % 1e6 —
    * rank r lands with probability ~1/r², so a genuine heavy head
    * exists and the 20000-rank vocabulary forces real MG evictions).
    * MG estimates are merge-order-dependent, so the emitted rows are
    * the DETERMINISTIC exact heavy hitters (true·(k+1) > N, integer
    * arithmetic) with booleans asserting the sketch's guarantees:
    * every heavy token is present, and its estimate sits within
    * [true − N/(k+1), true] — checked as (true−est)·(k+1) ≤ N, exact. */
  /** The deterministic Zipfian token stream shared by t12 and q67:
    * 30 slots per doc, rank = floor(1e6/(m+1)) with m = first-6-hex of
    * md5("id:slot") % 1e6 — md5 arithmetic both engines reproduce, and
    * rank r lands with probability ~1/r² so a genuine heavy head exists. */
  private[graft] def zipfTokens: Column =
    transform(sequence(lit(1), lit(30)), i => {
      val h = md5(concat(col("doc_id").cast("string"), lit(":"),
        i.cast("string")))
      val m = pmod(conv(substring(h, 1, 6), 16, 10).cast("long"),
        lit(1000000L))
      concat(lit("zipf"), least(
        floor(lit(1000000.0) / (m + 1).cast("double")), lit(20000.0))
        .cast("long").cast("string"))
    })

  private def t12(s: SparkSession, d: String): DataFrame = {
    val k = 16
    val toks = Tables.documents(s, d).select(explode(zipfTokens).as("token"))
    val totals = toks.agg(count(lit(1)).as("n_stream"))
    val sketch = toks.agg(graft.functions.FrequentTokens
      .frequentTokens(col("token"), k).as("sk"))
    val est = coalesce(element_at(col("sk"), col("token")), lit(0L))
    toks.groupBy("token").agg(count(lit(1)).as("n_true"))
      .crossJoin(totals).crossJoin(sketch)
      .filter(col("n_true") * (k + 1) > col("n_stream"))
      .select(col("token"), col("n_true"),
        element_at(col("sk"), col("token")).isNotNull.as("in_sketch"),
        (est <= col("n_true") &&
          (col("n_true") - est) * (k + 1) <= col("n_stream")).as("est_ok"))
  }

  /** t26 — built-in approx_top_k heavy hitters (Spark 4's DataSketches
    * frequent-items aggregate) over t12's deterministic Zipfian
    * stream — the NATIVE-sketch twin of t12's hand-built Misra–Gries,
    * registered so both the custom and the built-in paths stay gated.
    * Sketch estimates are merge-order-dependent, so the emitted rows
    * are the exact truth counts for the frequent head (n_true·17 >
    * n_stream, t12's criterion) plus contract booleans: membership in
    * the sketch and the estimate inside the documented ±3.5·N/M
    * frequent-items band (M = 64 tracked items; measured estimates
    * are EXACT at both SFs — head items never evict — so the margin
    * is the whole band). */
  private def t26(s: SparkSession, d: String): DataFrame = {
    val k = 16
    val toks = Tables.documents(s, d).select(explode(zipfTokens).as("token"))
    val totals = toks.agg(count(lit(1)).as("n_stream"))
    val sketch = toks.agg(
      expr(s"map_from_entries(approx_top_k(token, $k, 64))").as("sk"))
    val est = coalesce(element_at(col("sk"), col("token")), lit(0L))
    toks.groupBy("token").agg(count(lit(1)).as("n_true"))
      .crossJoin(totals).crossJoin(sketch)
      .filter(col("n_true") * (k + 1) > col("n_stream"))
      .select(col("token"), col("n_true"),
        element_at(col("sk"), col("token")).isNotNull.as("in_sketch"),
        (est >= col("n_true") - expr("(7 * n_stream) div 128") &&
          est <= col("n_true") + expr("(7 * n_stream) div 128"))
          .as("est_ok"))
  }

  /** t27 — BPE merge statistics, VOCABULARY-WEIGHTED form: the same
    * pair-frequency statistic as t20, re-planned the way real BPE
    * trainers run it — on the DISTINCT-WORD frame weighted by word
    * frequency, never on the raw occurrence stream. t20's pair
    * expansion costs Σ word lengths over the CORPUS (every occurrence
    * re-derives its pairs before the map-side combine); here the
    * corpus contributes ONE word-count aggregate and pair expansion
    * runs over Σ word lengths of the VOCABULARY — the form that
    * survives when the corpus is 10⁶× its vocabulary (the gated
    * alternate-plan pair discipline of q02/q02b). Top-50 under the
    * (count desc, pair asc) total order is a TakeOrderedAndProject —
    * no window anywhere. Integer exact. */
  private def t27(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z0-9]+"), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    words.filter(length(col("w")) >= 2)
      .select(col("wc"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("c"))
      .orderBy(col("c").desc, col("pair").asc)
      .limit(50)
  }

  /** t28 — frozen quality-classifier inference (LINEAR SCORE CONTRACT,
    * LinearScoreExpression.scaladoc): the model-based quality-filter
    * stage of an LLM data pipeline — a hashed-feature (unigram +
    * adjacent-bigram) linear scorer applied per document, keep
    * decision at score >= 0. The 4096-weight "model" ships inside the
    * codegen expression (addReferenceObj — never a literal tree, never
    * a join), so the whole query is a shuffle-free projection: the
    * shape that scans 100 TB at IO speed. n_feat = 2n-1 features for
    * n >= 1 tokens (unigrams + bigrams, with multiplicity). The oracle
    * re-derives every index from the md5 HEX STRING via substr/ascii
    * arithmetic — an independent route to the same 12 bits as the
    * expression's byte-nibble extraction. Integer-exact end to end. */
  private def t28(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
          .as("toks"))
      .select(col("doc_id"),
        greatest(size(col("toks")) * 2 - 1, lit(0)).cast("long")
          .as("n_feat"),
        graft.plans.LinearScore.linearScore(col("toks")).as("score"))
      .withColumn("keep", col("score") >= 0)

  /** t31 — classifier CALIBRATION for t28's frozen quality scorer: the
    * threshold sweep a pipeline runs before picking the keep cutoff —
    * confusion counts (tp/fp/fn/tn) plus exact integer precision/recall
    * (×10⁴) at 5 candidate thresholds, against a rule-derived reference
    * label (n_toks ∈ [25, 60] — the kind of heuristic label quality
    * classifiers are bootstrapped from, cf. CCNet/Gopher rules). Scale
    * shape: one corpus scan scores every doc (shuffle-free projection,
    * t28's plan), the explode is 5 counter rows per doc consumed by a
    * map-side-combined agg — output is 5 rows however big the corpus.
    * Integer-exact (the score itself is integer by the LINEAR SCORE
    * CONTRACT); zero-able denominators nullif'd BOTH sides. */
  private def t31(s: SparkSession, d: String): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .select(size(col("toks")).cast("long").as("n_toks"),
        graft.plans.LinearScore.linearScore(col("toks")).as("score"))
      .withColumn("truth", col("n_toks") >= 25 && col("n_toks") <= 60)
    scored.select(col("score"), col("truth"),
        explode(array(Seq(-40L, -20L, 0L, 20L, 40L).map(lit): _*)).as("thr"))
      .groupBy(col("thr"))
      .agg(
        count(when(col("score") >= col("thr") && col("truth"), 1)).as("tp"),
        count(when(col("score") >= col("thr") && !col("truth"), 1)).as("fp"),
        count(when(col("score") < col("thr") && col("truth"), 1)).as("fn"),
        count(when(col("score") < col("thr") && !col("truth"), 1)).as("tn"))
      .select(col("thr"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("tp * 10000 div nullif(tp + fp, 0)").as("prec_x10k"),
        expr("tp * 10000 div nullif(tp + fn, 0)").as("rec_x10k"))
  }

  /** t32 — padding-waste profiler: the batching-efficiency question a
    * training/inference scheduler asks — how many pad tokens does a
    * fixed batch-of-32 layout burn under ARRIVAL order (docs batched
    * by salted md5 — i.i.d. shuffle) vs LENGTH-SORTED order (the
    * bucketed-batching fix)? Per batch: padding = max_len·n_docs −
    * Σ len. Both global orders rank WITHOUT an unpartitioned window:
    * arrival via the shared two-level `Curate.md5RankByStratum`
    * (constant stratum), sorted via per-LENGTH partitioned row_number
    * + broadcast `Ranks.exclusivePrefixTotals` over the (bounded-
    * domain) length histogram — the same decomposition, bucketed by
    * the value itself. Integer-exact. */
  private def t32(s: SparkSession, d: String): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), size(toks).cast("long").as("len"))
    // arrival order: salted-md5 rank (two-level inside)
    val arrival = graft.operators.Curate.md5RankByStratum(
        docs.withColumn("all", lit("all")), "doc_id", "all", "pad")
      .select(col("doc_id"), col("len"), col("rn"))
    // sorted order: rank under (len, md5, doc_id) = broadcast prefix
    // counts over the length histogram + a len-partitioned local rank
    val lenCounts = docs.groupBy(col("len")).agg(count(lit(1)).as("c"))
    val bases = graft.operators.Ranks.exclusivePrefixTotals(
      lenCounts, "len", "c")
    val wLen = Window.partitionBy(col("len")).orderBy(
      md5(concat(col("doc_id").cast("string"), lit(":pads"))).asc,
      col("doc_id").asc)
    val sorted = docs
      .withColumn("lrn", row_number().over(wLen).cast("long"))
      .join(broadcast(bases), "len")
      .select(col("doc_id"), col("len"), (col("base") + col("lrn")).as("rn"))
    def batches(ranked: DataFrame, strategy: String): DataFrame =
      ranked.groupBy(expr("(rn - 1) div 32").as("batch_id"))
        .agg(count(lit(1)).as("n_docs"), max(col("len")).as("max_len"),
          sum(col("len")).as("tok_sum"))
        .select(lit(strategy).as("strategy"), col("batch_id"),
          col("n_docs"), col("max_len"), col("tok_sum"),
          (col("max_len") * col("n_docs") - col("tok_sum")).as("padding"))
    batches(arrival, "arrival").unionAll(batches(sorted, "sorted"))
  }

  /** t29 — the BPE TRAINER LOOP itself: 3 full merge rounds, each =
    * count pairs → pick argmax → APPLY the merge to every word —
    * where t20/t27 measure one round's statistics, this runs the
    * actual iteration a tokenizer trainer runs. Per round: pair
    * counting on the distinct-word frame weighted by word frequency
    * (t27's vocabulary-bounded re-plan — the corpus contributes ONE
    * word-count aggregate, ever), argmax as a 1-row
    * TakeOrderedAndProject under the (count desc, l, r) total order,
    * and the merge applied by [[graft.plans.MergePair]] (greedy
    * left-to-right non-overlapping — codegen, no lambda fold). The
    * driver holds exactly one (l, r) pair per round — the same O(1)
    * trainer state every production BPE implementation keeps; rounds
    * are sequential by nature. Output: (round, l, r, c). The oracle
    * replays all 3 rounds on a DIFFERENT representation — words as
    * double-space-joined token strings, merges as string replace()
    * (the separator doubling is what makes replace()'s non-overlapping
    * scan equal the token-wise greedy scan on chained pairs like
    * "a a a"). Integer-exact. */
  private def t29(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    bpeTrain(s, d, rounds = 3)._1.toDF("round", "l", "r", "c")
  }

  /** Shared BPE trainer loop (t29 documents the algorithm): returns
    * the merge table AND the final (w, toks, wc) word frame — the
    * trained segmentation t30 applies corpus-wide. Driver state is the
    * O(1) merge list, the word frame stays distributed. */
  private def bpeTrain(s: SparkSession, d: String, rounds: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var cur = Tables.documents(s, d)
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z0-9]+"), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(col("w"), split(col("w"), "").as("toks"), col("wc"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (round <- 1 to rounds) {
      val win = cur.filter(size(col("toks")) >= 2)
        .select(col("wc"), explode(transform(
          sequence(lit(1), size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("l"),
            element_at(col("toks"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wc")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      require(win.nonEmpty, "corpus exhausted before merge rounds done")
      val (l, r, c) =
        (win(0).getString(0), win(0).getString(1), win(0).getLong(2))
      merges += ((round, l, r, c))
      cur = cur.withColumn("toks",
          graft.plans.MergePairFunctions.mergePair(col("toks"), l, r))
        .localCheckpoint(true)
    }
    (merges.toSeq, cur)
  }

  /** t30 — BPE ENCODE: apply the t29-trained merges corpus-wide and
    * measure per-document compression — the tokenizer-application
    * step between training (t29) and packing (t18/t24). The encode
    * rides the trainer's final word frame: segmentation is a function
    * of the WORD, so the corpus-sized doc frame joins the vocabulary-
    * sized (w -> n_units) map instead of re-running merges per
    * occurrence — at 100 TB the merge loop touches the distinct-word
    * frame only, and the per-doc reduction is one broadcast-joined
    * aggregation. Docs with zero [a-z0-9]+ tokens stay in the output
    * with zero counts (left join + coalesce, matching t03's universe).
    * Integer-exact. Oracle: the full t29 replay on the double-space
    * string representation, extended one step — the final per-word
    * string's split length IS n_units — then the same per-doc join. */
  private def t30(s: SparkSession, d: String): DataFrame = {
    val (_, words) = bpeTrain(s, d, rounds = 3)
    val wn = words.select(col("w"),
      length(col("w")).cast("long").as("n_chars"),
      size(col("toks")).cast("long").as("n_units"))
    val dw = Tables.documents(s, d).select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")),
        lit("[a-z0-9]+"), lit(0))).as("w"))
    val agg = dw.join(wn, "w").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_chars")).as("n_char_units"),
        sum(col("n_units")).as("n_bpe_units"))
    Tables.documents(s, d).select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_char_units"), lit(0L)).as("n_char_units"),
        coalesce(col("n_bpe_units"), lit(0L)).as("n_bpe_units"))
  }

  /** q77 — approx_top_k sketch LIFECYCLE (accumulate → combine →
    * estimate): per-source partial sketches merged into one corpus
    * estimate — the incremental composition q52 proves for HLL, here
    * for the frequent-items family: a new source's data never
    * re-reads history, per-source states persist and union in KBs.
    * Same contract shape as t26 (exact head truth + membership +
    * band booleans). */
  private def q77(s: SparkSession, d: String): DataFrame = {
    val k = 16
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(zipfTokens).as("token"))
    val perSrc = toks.groupBy(col("source"))
      .agg(expr("approx_top_k_accumulate(token, 64)").as("st"))
    val combined = perSrc.agg(expr(
      s"map_from_entries(approx_top_k_estimate(" +
        s"approx_top_k_combine(st, 64), $k))").as("sk"))
    val totals = toks.agg(count(lit(1)).as("n_stream"))
    val est = coalesce(element_at(col("sk"), col("token")), lit(0L))
    toks.groupBy("token").agg(count(lit(1)).as("n_true"))
      .crossJoin(totals).crossJoin(broadcast(combined))
      .filter(col("n_true") * (k + 1) > col("n_stream"))
      .select(col("token"), col("n_true"),
        element_at(col("sk"), col("token")).isNotNull.as("in_estimate"),
        (est >= col("n_true") - expr("(7 * n_stream) div 128") &&
          est <= col("n_true") + expr("(7 * n_stream) div 128"))
          .as("est_ok"))
  }

  /** t13 — unigram language-model score (the CCNet-style quality
    * signal): fit a unigram LM on the corpus (token → count, one
    * vocabulary-sized aggregate), then score each document by its
    * negative log-likelihood −Σ ln(c_tok/total) over its tokens WITH
    * multiplicity. High nll/token ⇒ rare-vocabulary text (gibberish,
    * boilerplate-free); low ⇒ stopword-heavy. Emits round(sum,4) +
    * token count — never a rounded average (CLAUDE.md float rule); the
    * consumer divides. The logprob table is vocabulary-sized, so AQE
    * broadcasts its join against the token stream; docs with zero
    * tokens carry no LM evidence and drop (inner-join semantics, same
    * both sides). Σ of ~10²–10³ ln terms rounds stably at 4dp (per-term
    * cross-engine ULP drift ~1e-16 relative, t10 precedent). */
  private def t13(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d).select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"),
        lit(0))).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).cast("double").as("n_total"))
    toks.join(counts, Seq("tok"))
      .crossJoin(total)
      .groupBy(col("doc_id"))
      .agg(round(sum(log(col("n_total")) - log(col("c").cast("double"))), 4)
        .as("nll"),
        count(lit(1)).as("n_toks"))
  }

  /** c04 — CCNet-style perplexity bucketing: score every doc with the
    * t13 unigram LM, order by nll-per-token, split into head/middle/
    * tail terciles (ntile(3)) — the classic language-model quality
    * gate keeps middle (head = boilerplate/stopword-heavy, tail =
    * gibberish). Ordering uses the 4dp-ROUNDED nll (the value the t13
    * gate already proves bit-equal cross-engine) ÷ exact token count,
    * with doc_id tie-break — so the tercile assignment is deterministic
    * on both engines.
    *
    * NO global single-partition window: a bare ntile(3) over every doc
    * funnels the whole corpus through one task. Instead the exact
    * global rank is computed two-level (t18/t24's pattern): range-
    * bucket on floor(score*16) — monotone in the sort key, so buckets
    * ARE contiguous rank ranges — rank locally per bucket under a
    * hash-partitioned window, broadcast the tiny per-bucket prefix
    * sums, and derive the tercile arithmetically from the standard
    * ntile identity tile(r) = (r-1)*k div N + 1 (first N mod k tiles
    * get the extra row — SQL ntile semantics, both engines). */
  private def c04(s: SparkSession, d: String): DataFrame = {
    val scored = t13(s, d)
      .withColumn("score", col("nll") / col("n_toks"))
      .withColumn("rb", floor(col("score") * 16).cast("long"))
    val localW = Window.partitionBy(col("rb"))
      .orderBy(col("score").asc, col("doc_id").asc)
    val local = scored
      .withColumn("lr", row_number().over(localW).cast("long"))
    // bucket counts derive from the RANKED rows, not from scored: the
    // groupBy(rb) is already distributed by rb, so it rides the window
    // exchange (reused) instead of re-scoring the corpus per branch
    val bcounts = local.groupBy(col("rb")).agg(count(lit(1)).as("bc"))
    val baseW = Window.orderBy(col("rb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = bcounts.select(col("rb"),
      coalesce(sum(col("bc")).over(baseW), lit(0L)).as("base"))
    val total = bcounts.agg(sum(col("bc")).as("n_total"))
    local.join(broadcast(bases), "rb")
      .crossJoin(broadcast(total))
      .withColumn("r", col("base") + col("lr"))
      .withColumn("bucket",
        (expr("((r - 1) * 3) div n_total") + 1).cast("long"))
      .select(col("doc_id"), col("nll"), col("n_toks"), col("bucket"))
  }

  /** m01 — multimodal feature extraction: real BMP/WAV/GVF container
    * payloads → per-asset parsed dimensions + features via the
    * mapPartitions batch decode. The engine PARSES width/height/
    * sample_rate from the payload header bytes; the oracle predicts them
    * independently from the documented ASSET CONTRACT (Multimodal.scala
    * scaladoc) — encoder and decoder share only the public format spec,
    * so a byte-offset/endianness bug on either side fails this gate.
    * Checksum/feature VALUES (body hash internals) stay covered by
    * MultimodalSpec. */
  private def m01(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    graft.multimodal.Multimodal.extractFeatures(
      graft.multimodal.Multimodal.assetsFromDocuments(s, d))
      .toDF().select(col("asset_id"), col("kind"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("sample_rate").cast("long").as("sample_rate"),
        size(col("features")).cast("long").as("dim"))
  }

  /** m05 — image perceptual fingerprint + exact-dup groups: dHash per
    * decoded image (DHASH CONTRACT, Multimodal.scaladoc — integer-only
    * 9×8 gradient bits over the parsed pixel array) and the count of
    * images sharing each hash (d01's exact-dedup shape lifted to the
    * image modality). The oracle recomputes every hash independently
    * from the asset contract's text-as-pixel-array derivation — a
    * stride, offset, or bit-packing bug on either side fails the
    * gate. */
  private def m05(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    val hashes = graft.multimodal.Multimodal.imageDHash(
      graft.multimodal.Multimodal.assetsFromDocuments(s, d)).toDF()
    val groups = hashes.groupBy(col("dhash"))
      .agg(count(lit(1)).as("n_same_hash"))
    hashes.join(groups, "dhash")
      .select(col("asset_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("dhash"), col("n_same_hash"))
  }

  /** m06 — audio energy fingerprint + exact-dup groups: 7 gradient
    * bits over the 8-window |PCM16| energy envelope (AUDIO FINGERPRINT
    * CONTRACT, Multimodal.scaladoc) — the audio-modality dedup
    * primitive next to m05's image dHash. Integer-only, so the oracle
    * recomputes every fingerprint from the asset contract's
    * text-as-PCM16 derivation. */
  private def m06(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    val fps = graft.multimodal.Multimodal.audioFingerprint(
      graft.multimodal.Multimodal.assetsFromDocuments(s, d)).toDF()
    val groups = fps.groupBy(col("afp"))
      .agg(count(lit(1)).as("n_same_fp"))
    fps.join(groups, "afp")
      .select(col("asset_id"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_samples"), col("afp"), col("n_same_fp"))
  }

  /** m07 — video perceptual fingerprint + exact-dup groups (VIDEO
    * FINGERPRINT CONTRACT, Multimodal.scaladoc): 7 energy-gradient
    * bits over the first 8 sampled frames — the video-modality dedup
    * primitive completing m05 (image) / m06 (audio). width/height come
    * from the PARSED GVF header while the oracle predicts them from
    * the asset contract, so a header-offset bug fails the gate.
    * Integer-only throughout. */
  private def m07(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    val fps = graft.multimodal.Multimodal.videoFingerprint(
      graft.multimodal.Multimodal.assetsFromDocuments(s, d)).toDF()
    val groups = fps.groupBy(col("vfp"))
      .agg(count(lit(1)).as("n_same_fp"))
    fps.join(groups, "vfp")
      .select(col("asset_id"), col("width"), col("height"),
        col("n_frames"), col("vfp"), col("n_same_fp"))
  }

  /** m08 — perceptual image NEAR-dup pairs: m05's dHashes through the
    * shared banded Hamming index ([[graft.operators.TextDedup
    * .hammingPairs]] — the d03 SimHash machinery applied to the image
    * modality), Hamming <= 2. Candidate generation is pigeonhole-
    * LOSSLESS at this cutoff (<= 2 flipped bits can touch at most 2 of
    * the four 16-bit chunks), so the banded plan's output is exactly
    * the O(N²) scan's — the oracle recomputes every dHash from the
    * asset contract and runs the quadratic join directly. On this
    * fixture text-byte "images" cluster tightly (most pairs land
    * within Hamming 6 — same density artifact as d06's 31-word vocab),
    * so the cutoff 2 keeps the verified set meaningful; on real images
    * the same index prunes candidates to near-linear. */
  private def m08(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    val hashes = graft.multimodal.Multimodal.imageDHash(
      graft.multimodal.Multimodal.assetsFromDocuments(s, d)).toDF()
    graft.operators.TextDedup
      .hammingPairs(hashes, "asset_id", "dhash", maxHamming = 2)
      .select(col("id_a").as("asset_a"), col("id_b").as("asset_b"),
        col("hamming").cast("long").as("hamming"))
  }

  /** m09 — CROSS-MODAL dedup audit ("same image, different caption"):
    * m08's perceptual image near-dup pairs joined against the TEXT
    * modality's token-Jaccard — a pair whose images collide (Hamming
    * <= 2) but whose captions disagree (J < 0.5) is the
    * `caption_conflict` a multimodal training pipeline must surface
    * before deduplicating: dropping one side silently discards a
    * distinct caption for a shared image (the alt-text diversity that
    * image-text training needs), while keeping both without the flag
    * double-weights the image. Composes m05/m08 (image fingerprints,
    * banded Hamming index) with d04's token-set convention
    * ([[graft.functions.TextFunctions.tokenSet]]). Scale shape: the
    * pair frame is candidate-bounded by the banded index; token sets
    * join only the pair-touching docs (two hash joins), intersect/
    * union are per-pair array kernels — the corpus is never
    * all-paired on text. Integer-exact oracle: dHashes, Hamming, and
    * the token set sizes are all re-derived in SQL. */
  private def m09(s: SparkSession, d: String): DataFrame = {
    val pairs = m08(s, d)
    val toks = Tables.documents(s, d).filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenSet(col("text")).as("toks"))
    pairs
      .join(toks.select(col("doc_id").as("asset_a"), col("toks").as("ta")),
        Seq("asset_a"))
      .join(toks.select(col("doc_id").as("asset_b"), col("toks").as("tb")),
        Seq("asset_b"))
      .select(col("asset_a"), col("asset_b"), col("hamming"),
        size(array_intersect(col("ta"), col("tb"))).cast("long")
          .as("n_inter"),
        size(array_union(col("ta"), col("tb"))).cast("long")
          .as("n_union"))
      .withColumn("caption_conflict", col("n_inter") * 2 < col("n_union"))
  }

  /** m02 — video frame sampling: one row per 64-byte frame window.
    * Frame counts are pure arithmetic over payload sizes → oracle-able. */
  private def m02(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    graft.multimodal.Multimodal.sampleFrames(
      graft.multimodal.Multimodal.assetsFromDocuments(s, d), stride = 64)
      .groupBy(col("asset_id")).agg(count(lit(1)).as("n_frames"))
  }

  /** m03 — image resize: real nearest-neighbor BMP downscale to fit
    * 64×64 (RESIZE CONTRACT in Multimodal.scaladoc). out_* dims/bytes
    * are integer arithmetic the oracle re-derives in SQL from the asset
    * contract; roundtrip_ok is the in-Spark contract check (output BMP
    * re-decoded + pixels compared via arithmetic-inverted indexing). */
  private def m03(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    graft.multimodal.Multimodal.resizeImages(
      graft.multimodal.Multimodal.assetsFromDocuments(s, d), maxDim = 64)
      .toDF().select(col("asset_id"),
        col("in_width").cast("long").as("in_width"),
        col("in_height").cast("long").as("in_height"),
        col("out_width").cast("long").as("out_width"),
        col("out_height").cast("long").as("out_height"),
        col("out_bytes"), col("roundtrip_ok"))
  }

  /** m04 — audio stats over real WAV payloads: header facts + exact
    * integer arithmetic the oracle re-derives from the asset contract;
    * amp_ok is the dual-route PCM16 parse check (Multimodal.scaladoc). */
  private def m04(s: SparkSession, d: String): DataFrame = {
    implicit val sp: SparkSession = s
    graft.multimodal.Multimodal.audioStats(
      graft.multimodal.Multimodal.assetsFromDocuments(s, d)).toDF()
  }

  /** t14 — BM25 retrieval: score every document holding any of a fixed
    * query-term set, return the top 20. One explode → two small aggs
    * (per-doc length, per-(doc,term) tf); df and the corpus stats are
    * vocabulary-/constant-sized and broadcast, so the only full-data
    * shuffle is the tf groupBy. Top-k plans as TakeOrderedAndProject
    * (no global sort); rank is computed over the surviving 20 rows.
    * Scoring is log-bearing (idf), so the oracle mirrors the formula
    * term-for-term and both sides round the 1–3-term sum at 4dp (t13
    * precedent); ranking uses the ROUNDED score with doc_id tie-break
    * so rank is deterministic across engines. */
  private def t14(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("vector", "stream", "window")
    val toks = Tables.documents(s, d).select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"),
        lit(0))).as("tok"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = toks.filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // k1 = 1.2, b = 0.75; idf = ln(1 + (N - df + 0.5)/(df + 0.5)) — the
    // non-negative Robertson form. Written with the SAME association as
    // the oracle so both engines produce bit-identical doubles.
    val scored = tf.join(broadcast(dfT), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("contrib",
        log(lit(1.0) + (col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl"))))
    val agg = scored.groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 4).as("bm25"),
        count(lit(1)).as("n_terms"))
    agg.orderBy(col("bm25").desc, col("doc_id").asc).limit(20)
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("bm25").desc, col("doc_id").asc))
        .cast("long"))
      .select(col("rnk"), col("doc_id"), col("bm25"), col("n_terms"))
  }

  /** q41 — higher-order array-function battery over the token list:
    * transform / aggregate / filter / zip_with / sort / slice / reverse
    * / distinct, all on INTEGER payloads (token lengths) so every value
    * the oracle hashes is exact — no float folds over engine-ordered
    * lists. Everything runs inside one codegen'd projection; no
    * explode, no shuffle. */
  private def q41(s: SparkSession, d: String): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        transform(col("toks"), x => length(x).cast("long")).as("lens"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        array_contains(col("toks"), "vector").as("has_vector"),
        aggregate(col("lens"), lit(0L), (a, x) => a + x).as("sum_len"),
        array_max(col("lens")).as("max_len"),
        array_min(col("lens")).as("min_len"),
        size(filter(col("lens"), x => x > 4)).cast("long").as("n_long"),
        concat_ws(",", slice(reverse(array_sort(col("lens"))), 1, 3)
          .cast("array<string>")).as("top3_lens"),
        aggregate(zip_with(col("lens"), reverse(col("lens")),
          (a, b) => a * b), lit(0L), (a, x) => a + x).as("dot_rev"))
  }

  /** q42 — salted shuffle join ([[graft.operators.Salt.saltedJoin]]):
    * the skew-safe join form — hot l_orderkey rows spread over `factor`
    * reducers, orders replicated factor×. Semantically a plain inner
    * join, which is exactly what the oracle runs; the post-join agg is
    * the usual single-level two-phase sum (4dp, q27 precedent). */
  private def q42(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.operators.Salt.saltedJoin(li, ord, "l_orderkey", factor = 4)
      .groupBy(col("o_orderpriority"))
      // 2dp, not 4: the salt reassociates the sum one extra level (the
      // q26 convention) — 4dp was bit-exact at sf0.01 but drifted ULPs
      // at sf0.1
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** d08 — benchmark decontamination: drop/flag training docs sharing
    * any 3-token shingle with a held-out eval set (here the synthetic
    * doc_id % 97 == 0 slice — eval sets are externally supplied in a
    * real pipeline). The Spark side joins on xxhash64(shingle) so the
    * shuffle/broadcast key is 8 bytes, not the shingle string — at
    * 100 TB the eval side stays a few MB of hashes and broadcasts; the
    * training side never shuffles its text. The oracle joins the
    * shingle STRINGS — hash-join and string-join agree unless xxhash64
    * collides (~2⁻⁶⁴ per pair, and a collision would fail the gate
    * deterministically, not flake). */
  private def d08(s: SparkSession, d: String): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val sh = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(when(size(col("toks")) >= 3,
          transform(sequence(lit(0), size(col("toks")) - 3),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(3)))))
          .otherwise(array().cast("array<string>"))).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
    val evalSet = sh.filter(col("doc_id") % 97 === 0).select("h").distinct()
    sh.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalSet), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("h")).as("n_shared"))
  }

  /** c03 — deterministic corpus mixing: sample each language stratum at
    * a per-stratum rate (en 80%, others 50% — the up/down-weighting
    * step of a training-data mix) by md5-rank within the stratum.
    * Membership is integer arithmetic (10·rn ≤ w10·n) — no float
    * fraction to drift — and the md5 rank makes the sample stable
    * across retries, partitionings, and engines (t08 precedent). Emits
    * the kept rows themselves, not just counts, so the gate pins the
    * exact sample. One shuffle (the per-lang window). */
  private def c03(s: SparkSession, d: String): DataFrame = {
    val byLang = Window.partitionBy(col("lang"))
    val w = byLang.orderBy(
      md5(concat(col("doc_id").cast("string"), lit(":mix"))).asc,
      col("doc_id").asc)
    val w10 = when(col("lang") === "en", lit(8L)).otherwise(lit(5L))
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_lang", count(lit(1)).over(byLang))
      .filter(col("rn") * 10 <= w10 * col("n_lang"))
      .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
  }

  /** q43 — time-based RANGE window frame: per-customer trailing-30-day
    * order count + revenue. RANGE frames are tie-SAFE by construction
    * (membership is value-based — all orders on the same date are
    * peers), unlike ROWS frames which need a total order (q22 lesson);
    * only the float sum's association varies, handled by the usual 4dp
    * round. Both engines order by integer days-since-epoch with a
    * -30..0 frame so the frame arithmetic is identical. One hash
    * shuffle on o_custkey. */
  private def q43(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("days"))
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"),
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
          .cast("long").as("days"))
      .select(col("o_custkey"), col("o_orderdate"),
        count(lit(1)).over(w).as("n_orders_30d"),
        round(sum(col("o_totalprice")).over(w), 4).as("rev_30d"))
  }

  /** t16 — containment (quote/excerpt) detection:
    * [[TextDedup.tokenContainmentPairs]] blocked by source at 0.9.
    * Directional — the near-subset doc is id_sub; symmetric Jaccard
    * (d04) misses a paragraph quoted inside a much larger doc. (Pair
    * counts on THIS fixture are dense — the ~100-word synthetic
    * vocabulary makes short docs near-subsets of everything, the same
    * artifact documented at d04's Zipf note; real-corpus containment
    * hits are rare.) */
  private def t16(s: SparkSession, d: String): DataFrame =
    TextDedup.tokenContainmentPairs(Tables.documents(s, d),
      "doc_id", "text", "source", threshold = 0.9)

  /** t17 — Unicode normalization (NFC composition + accent folding) via
    * the native codegen expressions ([[graft.plans.UnicodeFunctions]]).
    * The fixture corpus is ASCII, where both transforms are the
    * identity — so the oracle pins CROSS-ENGINE PARITY of the
    * normalization semantics on real data (nfc_normalize/strip_accents
    * are DuckDB built-ins), and the planted-unicode behavior (é
    * composed≡decomposed, folding, codegen≡interpreted) lives in
    * UnicodeSpec. Same split as t09's regex-parity oracle. */
  private def t17(s: SparkSession, d: String): DataFrame = {
    import graft.plans.UnicodeFunctions
    Tables.documents(s, d).select(
      col("doc_id"),
      UnicodeFunctions.nfcCol(col("text")).as("nfc_text"),
      UnicodeFunctions.stripAccentsCol(col("text")).as("folded_text"),
      (length(UnicodeFunctions.nfcCol(col("text"))) === length(col("text")))
        .as("nfc_ascii_identity"))
  }

  /** t18 — sequence packing: lay documents head-to-tail in a
    * deterministic (md5-rank) order and cut fixed 2048-token training
    * bins from the running offset — the standard pre-training packing
    * step (bin = floor(offset/2048); a doc straddles bins when its span
    * crosses a boundary, counted in n_bins). The global running sum is
    * computed TWO-LEVEL so no single-partition window ever holds the
    * per-doc rows: the md5 sort key's own 2-hex-char prefix is an
    * order-preserving, deterministic bucketing (global order by (sk,
    * doc_id) ≡ order by (bucket, sk, doc_id) because the bucket is a
    * prefix of sk, and md5 uniformity balances the 256 buckets), so
    * (1) a hash-partitioned window per bucket computes local running
    * sums in parallel, (2) a 256-row per-bucket total → exclusive
    * prefix forms the bucket base offsets (the only tiny single-
    * partition step), (3) a broadcast join adds base + local. Scales to
    * any doc count — the old global `Window.orderBy` bottleneck is
    * gone; output is byte-identical to the one-window form. Integer
    * arithmetic only — exact oracle. */
  private def t18(s: SparkSession, d: String): DataFrame = {
    val binSize = 2048L
    val toks = Tables.documents(s, d).select(col("doc_id"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
        .cast("long").as("n_tok"))
      .withColumn("sk",
        md5(concat(col("doc_id").cast("string"), lit(":pack"))))
      .withColumn("bucket", substring(col("sk"), 1, 2))
    val localW = Window.partitionBy(col("bucket"))
      .orderBy(col("sk").asc, col("doc_id").asc)
    val local = toks.withColumn("local_off", sum(col("n_tok")).over(localW))
    // 256 rows max: the only unpartitioned window, over bucket totals
    val baseW = Window.orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = toks.groupBy(col("bucket"))
      .agg(sum(col("n_tok")).as("p_tot"))
      .select(col("bucket"),
        coalesce(sum(col("p_tot")).over(baseW), lit(0L)).as("base"))
    local.join(broadcast(bases), "bucket")
      .withColumn("end_off", col("base") + col("local_off"))
      .select(col("doc_id"), col("n_tok"),
        floor((col("end_off") - col("n_tok")) / lit(2048.0))
          .cast("long").as("bin"),
        ((col("end_off") - col("n_tok")) % binSize).as("bin_off"),
        (floor((col("end_off") - 1) / lit(2048.0)) -
          floor((col("end_off") - col("n_tok")) / lit(2048.0)) + 1)
          .cast("long").as("n_bins"))
  }

  /** t24 — materialized sequence packing: the step AFTER t18's bin
    * arithmetic — emit the actual fixed-2048-token training batches as
    * id arrays. Tokens get global vocab ids (rank by count desc, token
    * asc — t07's canonical order; computed fully two-level by
    * [[graft.operators.Ranks.rankByCountDesc]] — a 10⁸-token web-corpus
    * vocabulary never funnels into one window partition, and the plan
    * carries ZERO SinglePartition exchanges, pinned in PlanShapeSpec),
    * every token gets its global offset =
    * doc start offset (t18's two-level prefix sum via
    * [[graft.operators.Curate.md5RankByStratum]]-style buckets) + its
    * in-doc position, and bins collect ids under the total (off) order
    * — a doc straddling a bin boundary is genuinely split, exactly as
    * a training loader would. One explode + one shuffle by bin; arrays
    * bounded at 2048 ids. Integer-exact end to end. */
  private def t24(s: SparkSession, d: String): DataFrame = {
    val binSize = 2048L
    val docs = Tables.documents(s, d).select(col("doc_id"),
      regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
        .as("toks"))
    val tf = docs.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val vocab = graft.operators.Ranks
      .rankByCountDesc(tf, "c", "tok", "vid")
      .select(col("tok"), col("vid"))
    // doc start offsets: t18's two-level md5-bucket prefix sum
    val sized = docs
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("sk",
        md5(concat(col("doc_id").cast("string"), lit(":pack"))))
      .withColumn("bucket", substring(col("sk"), 1, 2))
    val localW = Window.partitionBy(col("bucket"))
      .orderBy(col("sk").asc, col("doc_id").asc)
    val local = sized.withColumn("local_off", sum(col("n_tok")).over(localW))
    // ≤256-row bucket totals → exclusive prefix via broadcast self-join
    // (no unpartitioned window anywhere in t24's plan)
    val bases = graft.operators.Ranks.exclusivePrefixTotals(
      sized.groupBy(col("bucket")).agg(sum(col("n_tok")).as("p_tot")),
      "bucket", "p_tot")
    val offs = local.join(broadcast(bases), "bucket")
      .withColumn("start_off",
        col("base") + col("local_off") - col("n_tok"))
      .select(col("doc_id"), col("toks"), col("start_off"))
    offs.select(col("doc_id"), col("start_off"),
        posexplode(col("toks")))
      .join(vocab, col("col") === col("tok"))
      .withColumn("off", col("start_off") + col("pos"))
      .withColumn("bin", expr(s"off div $binSize"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_tok"),
        // emitted as a space-joined string, not array<bigint>: the
        // oracle harness sorts/hashes output columns and arrays are
        // unhashable there — the canonical string is gate-stable
        array_join(transform(
          sort_array(collect_list(struct(col("off"), col("vid")))),
          x => x.getField("vid").cast("string")), " ").as("ids"))
  }

  /** t25 — vocabulary coverage under truncation: per-doc token counts
    * inside/outside the top-64 corpus vocabulary (count desc, token
    * asc — t07's canonical order). THE sizing metric for tokenizer
    * vocab truncation: OOV mass by doc. The vocab is a TakeOrdered
    * top-64 that broadcasts; tokens never shuffle for the membership
    * test — only the per-doc rollup exchanges. Integer exact. */
  private def t25(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d).select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")),
        lit("[a-z0-9]+"), lit(0))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(64)
      .select(col("tok"), lit(true).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_vocab"), 1L).otherwise(0L)).as("n_in_vocab"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  /** q46 — null-safe equality join (`<=>` / IS NOT DISTINCT FROM):
    * NULL keys MATCH each other, unlike plain equi-join where they
    * match nothing. Exercised on a derived nullable key both sides.
    * Plans as a regular hash join on the null-safe comparator. */
  private def q46(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      when(col("l_linenumber") > 4, col("l_linenumber").cast("long"))
        .as("k"),
      col("l_quantity"))
    val dim = Tables.lineitem(s, d)
      .select(when(col("l_linenumber") > 4, col("l_linenumber").cast("long"))
        .as("k"))
      .distinct()
      .withColumn("tag", coalesce(col("k").cast("string"), lit("null-key")))
    li.alias("a").join(dim.alias("b"), col("a.k") <=> col("b.k"))
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 4).as("sum_qty"))
  }

  /** q44 — date-spine gap fill (time-series resample): materialize a
    * contiguous daily spine per customer (sequence+explode — generated,
    * not shuffled), left-join the sparse daily order revenue onto it,
    * and forward-fill gaps with `last(_, ignoreNulls)` over an
    * unbounded-preceding ROWS frame. The spine join is an equi-join on
    * (custkey, day) and the fill is one window pass — no as-of join
    * machinery needed when the grid is regular. Spine bounded to a
    * fixed 61-day window × 100 customers so row count is constant per
    * SF. Leading days before a customer's first order stay NULL (same
    * both engines). */
  private def q44(s: SparkSession, d: String): DataFrame = {
    val lo = lit("1995-01-01").cast("date")
    val hi = lit("1995-03-02").cast("date")
    val spine = Tables.customer(s, d)
      .filter(col("c_custkey") < 100)
      .select(col("c_custkey"),
        explode(sequence(lo, hi, expr("interval 1 day"))).as("day"))
    val daily = Tables.orders(s, d)
      .filter(col("o_orderdate").between(lo, hi) && col("o_custkey") < 100)
      .groupBy(col("o_custkey").as("c_custkey"),
        col("o_orderdate").as("day"))
      .agg(round(sum(col("o_totalprice")), 4).as("rev"))
    val w = Window.partitionBy(col("c_custkey")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("c_custkey", "day"), "left")
      .select(col("c_custkey"), col("day"), col("rev"),
        last(col("rev"), ignoreNulls = true).over(w).as("rev_filled"))
  }

  /** q45 — ordered funnel analysis (view → click → purchase per user):
    * each stage is min(ts) of its event type STRICTLY AFTER the prior
    * stage's time — three conditional-min aggregations, each one hash
    * shuffle on user_id with the prior stage's (user-unique) timestamp
    * riding in the grouping key; no window, no collect_list of event
    * sequences (a hot user's history never materializes as one row).
    * min over event-time is deterministic under ts ties (same min);
    * raw timestamps compare exactly cross-engine (q16 precedent). */
  private def q45(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id"), col("t_view"))
      .agg(min(col("ts")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id"), col("t_view"), col("t_click"))
      .agg(min(col("ts")).as("t_purchase"))
    v.join(c.select("user_id", "t_click"), Seq("user_id"), "left")
      .join(p.select("user_id", "t_purchase"), Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"),
        col("t_purchase"),
        (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
          + when(col("t_purchase").isNotNull, 1).otherwise(0))
          .cast("long").as("stage"))
  }

  /** t15 — bigram LM score (the conditional-probability upgrade of
    * t13's unigram): fit c(w1 w2) and context totals c(w1·) on the
    * corpus, score each doc by Σ ln(c_ctx) − ln(c_bigram) over its
    * bigram OCCURRENCES. Bigrams come straight off the token array in
    * the projection (no lag window — no extra shuffle); the count
    * tables are vocabulary²-bounded and the probability join runs
    * broadcast at this corpus, hash at 100 TB where AQE decides.
    * Docs with <2 tokens carry no bigram evidence and drop (inner-join
    * semantics, same both sides). Σ-of-lns rounds at 4dp (t13). */
  private def t15(s: SparkSession, d: String): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val bigrams = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(when(size(col("toks")) >= 2,
          transform(sequence(lit(0), size(col("toks")) - 2),
            i => concat_ws(" ", col("toks")(i), col("toks")(i + 1))))
          .otherwise(array().cast("array<string>"))).as("bg"))
    val cBg = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("c_bg"))
      .withColumn("ctx", split(col("bg"), " ").getItem(0))
    val cCtx = cBg.groupBy(col("ctx")).agg(sum(col("c_bg")).as("c_ctx"))
    bigrams.join(cBg, Seq("bg")).join(cCtx, Seq("ctx"))
      .groupBy(col("doc_id"))
      .agg(round(sum(log(col("c_ctx").cast("double")) -
        log(col("c_bg").cast("double"))), 4).as("nll"),
        count(lit(1)).as("n_bigrams"))
  }

  /** q47 — Z-order clustering key (graft.plans.ZOrder2): the layout
    * primitive behind [[graft.sources.Bucketing.zorderWrite]], emitted
    * per-row so the oracle can re-derive the full bit contract in SQL
    * (DuckDB recomputes the interleave with shift/mask arithmetic over
    * generate_series — no shared code, independent semantics). Pure
    * integer bit logic: bit-reproducible across engines, and the
    * expression stays inside whole-stage codegen (PlanShapeSpec). */
  private def q47(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      graft.plans.ZOrder2.zorder2(col("l_suppkey"), col("l_partkey"))
        .as("zkey"))

  /** q48 — SCD Type-2 history build: collapse each customer's order
    * stream into status runs with validity ranges — the standard
    * warehouse "snapshot stream → dimension history" derivation. Change
    * points via lag, version ids via running sum over a TOTAL order
    * ((o_orderdate, o_orderkey) — orderkey is unique, so ties in date
    * can't reorder; q22 lesson), run boundaries via groupBy + lead.
    * One window shuffle on o_custkey, reused by both window passes and
    * the final aggregation (same partitioning key — Catalyst plans one
    * Exchange). valid_to is NULL on the open (current) run. */
  private def q48(s: SparkSession, d: String): DataFrame =
    scd2Build(Tables.orders(s, d))

  /** q48's SCD2 derivation over an arbitrary orders frame (q86 reuses
    * it on the history/delta partitions). All-window formulation:
    * change rows ARE the runs. Every window below partitions by
    * o_custkey, so the whole derivation — lag change detection,
    * running version, per-customer total, and the lead lookups among
    * run starts — shares ONE hash exchange (PlanShapeSpec pins exactly
    * one); a groupBy(custkey, version) would re-shuffle on the widened
    * key for nothing. */
  private def scd2Build(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val marked = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderstatus"))
      .withColumn("chg",
        when(lag(col("o_orderstatus"), 1).over(w).isNull ||
          lag(col("o_orderstatus"), 1).over(w) =!= col("o_orderstatus"), 1)
          .otherwise(0))
      .withColumn("version",
        sum(col("chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_total", count(lit(1)).over(
        Window.partitionBy(col("o_custkey"))))
    val ws = Window.partitionBy(col("o_custkey"))
      .orderBy(col("rn"))
    marked.filter(col("chg") === 1)
      .select(col("o_custkey").as("custkey"), col("version"),
        col("o_orderstatus").as("status"),
        Cleaning.dateToString(col("o_orderdate")).as("valid_from"),
        Cleaning.dateToString(lead(col("o_orderdate"), 1).over(ws))
          .as("valid_to"),
        (coalesce(lead(col("rn"), 1).over(ws), col("n_total") + 1)
          - col("rn")).cast("long").as("n_orders"))
  }

  /** q86 — INCREMENTAL SCD2 merge (the warehouse MERGE-INTO for
    * type-2 dimensions): history rows built once (orders ≤ 1996-12-31
    * — ~70% of the fixture), then the delta batch merged WITHOUT
    * rebuilding — closed history rows are untouched (at scale: their
    * files never rewrite, the q51/st12 bucket discipline), each
    * customer's OPEN row either absorbs the delta's first run (same
    * status at the boundary: run extends, n_orders grows, valid_to
    * moves) or closes at it (status changed: valid_to = first delta
    * run's start), and the remaining delta runs append with shifted
    * versions. Cost ∝ delta + open rows, never history. The boundary
    * is clean because the split predicate is a prefix of the run
    * window's (o_orderdate, o_orderkey) order.
    *
    * Oracle: the FULL REBUILD over all orders (q48's independent
    * min/groupBy-runs SQL, verbatim) — the merge is correct iff it is
    * indistinguishable from rebuilding from scratch, which is the
    * strongest available statement of MERGE semantics and shares no
    * structure with the incremental plan. */
  private def q86(s: SparkSession, d: String): DataFrame = {
    val cut = "1996-12-31"
    val all = Tables.orders(s, d)
    val hist = scd2Build(all.filter(col("o_orderdate") <= lit(cut)))
    val delta = scd2Build(all.filter(col("o_orderdate") > lit(cut)))
    val closed = hist.filter(col("valid_to").isNotNull)
    val open = hist.filter(col("valid_to").isNull)
    val firstD = delta.filter(col("version") === 1)
      .select(col("custkey"), col("status").as("d_status"),
        col("valid_from").as("d_from"), col("valid_to").as("d_to"),
        col("n_orders").as("d_n"))
    // open rows: absorb (same status) / close (changed) / keep (no delta)
    val openMerged = open.join(firstD, Seq("custkey"), "left")
      .select(col("custkey"), col("version"), col("status"),
        col("valid_from"),
        when(col("d_status").isNull, lit(null).cast("string"))
          .when(col("status") === col("d_status"), col("d_to"))
          .otherwise(col("d_from")).as("valid_to"),
        (col("n_orders") + when(col("status") === col("d_status"),
          coalesce(col("d_n"), lit(0L))).otherwise(lit(0L)))
          .as("n_orders"))
    // delta runs: drop the absorbed first run, shift versions past the
    // open row's; customers with no history keep their numbering
    val bridge = open
      .select(col("custkey"), col("version").as("base_v"),
        col("status").as("open_status"))
      .join(firstD.select(col("custkey"), col("d_status")), "custkey")
      .select(col("custkey"), col("base_v"),
        (col("open_status") === col("d_status")).as("same"))
    val deltaKept = delta.join(bridge, Seq("custkey"), "left")
      .filter(col("base_v").isNull || !col("same") || col("version") >= 2)
      .select(col("custkey"),
        when(col("base_v").isNull, col("version"))
          .when(col("same"), col("base_v") + col("version") - 1)
          .otherwise(col("base_v") + col("version")).as("version"),
        col("status"), col("valid_from"), col("valid_to"),
        col("n_orders"))
    closed.unionAll(openMerged).unionAll(deltaKept)
  }

  /** q87 — self-join size profiler: the CANDIDATE-EXPLOSION estimator
    * a pipeline consults before running any key-blocked self-join
    * (d04's prefix filter, d02's bands, m08's chunks — all of them
    * blow up as Σ c_k² over block-key counts). One map-side-combined
    * per-key count, then three scalar aggregates: the predicted
    * self-join row count Σ c², the row count, and the hottest key —
    * plus amp_x100 = Σc²·100 div n_rows, the read-amplification the
    * blocking key implies (100 ⇔ each row meets one partner on
    * average). Everything the q83 salt advisor is to the shuffle, this
    * is to the blocked join. Integer-exact; counters only — the fact
    * table never shuffles rows. */
  private def q87(s: SparkSession, d: String): DataFrame = {
    val cnts = Tables.lineitem(s, d).groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("c"))
    cnts.agg(
        count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        sum(col("c") * col("c")).as("self_join_rows"),
        max(struct(col("c"), col("l_partkey"))).as("top"))
      .select(col("n_keys"), col("n_rows"), col("self_join_rows"),
        col("top.l_partkey").as("top_key"), col("top.c").as("top_c"),
        expr("self_join_rows * 100 div n_rows").as("amp_x100"))
  }

  /** q88 — incremental view maintenance for an aggregate (the
    * materialized-view twin of q86's row-level SCD2 merge): the view is
    * SUM/COUNT per (returnflag, linestatus, ship month), its stored
    * state the (n, qty, price_cents) partials. A CDC delta arrives as
    * inserts (shipdate > cut) and retractions (a deterministic
    * suppkey%13 slice of the base, standing in for a delete feed), and
    * the view is maintained ALGEBRAICALLY: delta partials aggregate
    * map-side, unionAll with the stored state frame, one re-combine
    * groupBy, HAVING n > 0 so fully-retracted keys vanish — the
    * classic counting/Z-relation IVM subtlety. Cost ∝ delta + view
    * size; the base facts are never re-read (at 100 TB the state frame
    * is key-count-sized and the only thing that moves). Integer-exact
    * (cents, unit quantities).
    *
    * Oracle: the FULL RECOMPUTE over (base ∖ deletes) ∪ inserts —
    * maintenance is correct iff indistinguishable from rebuilding,
    * sharing no structure with the incremental plan. */
  private def q88(s: SparkSession, d: String): DataFrame = {
    val cut = "1995-12-31"
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag").as("flag"), col("l_linestatus").as("status"),
      date_format(col("l_shipdate"), "yyyy-MM").as("month"),
      col("l_shipdate"), col("l_suppkey"),
      round(col("l_quantity"), 0).cast("long").as("qty1"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("cents1"))
    def partials(df: DataFrame, w: Int): DataFrame =
      df.groupBy(col("flag"), col("status"), col("month"))
        .agg((count(lit(1)) * w).as("n"), (sum(col("qty1")) * w).as("qty"),
          (sum(col("cents1")) * w).as("price_cents"))
    val base = li.filter(col("l_shipdate") <= lit(cut))
    val state = partials(base, 1)                  // the stored view
    val ins = partials(li.filter(col("l_shipdate") > lit(cut)), 1)
    val del = partials(base.filter(col("l_suppkey") % 13 === 0), -1)
    state.unionAll(ins).unionAll(del)
      .groupBy(col("flag"), col("status"), col("month"))
      .agg(sum(col("n")).as("n"), sum(col("qty")).as("qty"),
        sum(col("price_cents")).as("price_cents"))
      .filter(col("n") > 0)
  }

  /** q89 — one-pass pipeline health metrics via `Dataset.observe`
    * (the Observation API): rows-in / rows-kept / null-prop /
    * filtered-revenue counters ride the SAME scan as accumulator-style
    * observed metrics — no second pass over the facts, the way a 100 TB
    * ingest audits itself without doubling its read. The scan is driven
    * once by a noop-format write; the output IS the metrics row
    * (driver-side O(1), like the PQ codebook fit). Integer-exact. */
  private def q89(s: SparkSession, d: String): DataFrame = {
    val obs = new org.apache.spark.sql.Observation("q89")
    val kept = col("l_quantity") >= 25
    Tables.lineitem(s, d)
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .observe(obs,
        count(lit(1)).as("rows_in"),
        count(when(kept, 1)).as("rows_kept"),
        count(when(col("l_discount") === 0, 1)).as("zero_discount"),
        sum(when(kept, round(col("l_extendedprice") * 100, 0).cast("long"))
          .otherwise(0L)).as("kept_cents"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    val s2 = s
    import s2.implicits._
    Seq((m("rows_in").asInstanceOf[Long], m("rows_kept").asInstanceOf[Long],
      m("zero_discount").asInstanceOf[Long], m("kept_cents").asInstanceOf[Long]))
      .toDF("rows_in", "rows_kept", "zero_discount", "kept_cents")
  }

  /** q90 — data-quality ASSERTION SUITE (the Deequ-style constraint
    * battery, public literature: Schelter et al. 2018, "Automating
    * Large-Scale Data Quality Verification"): one report row per
    * declared constraint — row-count floor, completeness, key
    * uniqueness, value range, accepted value set, referential
    * integrity — each with its measured metric and a pass boolean.
    * This is the gate a 100 TB ingest runs BEFORE publishing a
    * snapshot: assertions over aggregates, never row-by-row rules.
    * Scale shape: the five single-table constraints ride ONE
    * aggregation pass over orders (conditional counts fuse into the
    * same partial agg); referential integrity is one left-anti count
    * against the customer dim (broadcast — dim-sized by star-schema
    * construction). The report is 6 fixed rows; nothing data-sized
    * reaches the driver. Integer-exact end to end. */
  private def q90(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val base = o.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
        .as("n_null_cust"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_dup_key"),
      sum(when(col("o_totalprice").isNull || col("o_totalprice") <= 0, 1L)
        .otherwise(0L)).as("n_bad_price"),
      sum(when(col("o_orderstatus").isNull ||
          !col("o_orderstatus").isin("O", "F", "P"), 1L)
        .otherwise(0L)).as("n_bad_status"))
    val orphans = o.join(
        Tables.customer(s, d).select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphan"))
    base.crossJoin(orphans).select(expr(
      """stack(6,
        |  'row_count_min',          n_rows,       n_rows >= 1000,
        |  'complete_o_custkey',     n_null_cust,  n_null_cust = 0,
        |  'unique_o_orderkey',      n_dup_key,    n_dup_key = 0,
        |  'range_o_totalprice_pos', n_bad_price,  n_bad_price = 0,
        |  'values_o_orderstatus',   n_bad_status, n_bad_status = 0,
        |  'ref_orders_customer',    n_orphan,     n_orphan = 0
        |) AS (check_name, metric, pass)""".stripMargin))
  }

  /** q91 — deterministic POISSON BOOTSTRAP (the distributed bootstrap
    * for massive data — Chamandy, Muralidharan, Najmi & Naidu 2012,
    * "Estimating Uncertainty for Massive Data Streams", public
    * literature): error bars for a pipeline metric without resampling
    * passes. The classic bootstrap draws n-of-n with replacement —
    * impossible distributed (a row can't know the other draws); the
    * Poisson approximation gives every (row, replicate) an independent
    * Poisson(1) weight, so 32 resample aggregates ride ONE scan as 32
    * weighted counters. Weights here are a pure function of content:
    * u = 52-bit md5(o_orderkey:bs<b>) prefix, inverse-CDF'd through
    * PRE-COMPUTED INTEGER thresholds floor(F_Poisson(1)(k)·2^52) — no
    * float CDF arithmetic anywhere, so both engines draw bit-identical
    * weights and the whole query is integer-exact. Replicate b=0 is
    * the unweighted point estimate. Output: 33 (b, n_eff, sum_cents)
    * rows — the replicate spread IS the uncertainty; downstream
    * derives CI bounds from these integer sums. Scale shape: a 33×
    * row-explode into map-side-combined counters; 33 rows out at any
    * corpus size, nothing data-sized at the driver. */
  private def q91(s: SparkSession, d: String): DataFrame = {
    // floor(F_Poisson(1)(k) * 2^52) for k = 0..5; weight 6 past the tail
    val ts = Seq(1656781714176974L, 3313563428353948L, 4141954285442435L,
      4418084571138597L, 4487117142562638L, 4500923656847446L)
    // the 52-bit draw lands in its OWN projection: referenced by all
    // six CDF branches, and conditional branches don't share
    // subexpressions in codegen — inlined, the md5 would run up to 6×
    // per row (measured 9.5 s vs 3.0 s at sf0.1)
    val k = conv(substring(md5(concat(col("o_orderkey").cast("string"),
      lit(":bs"), col("b").cast("string"))), 1, 13), 16, 10).cast("long")
    val w = when(col("b") === 0, lit(1L)).otherwise(
      ts.zipWithIndex.foldRight(lit(6L): Column) { case ((t, i), rest) =>
        when(col("k") < t, i.toLong).otherwise(rest)
      })
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .withColumn("b", explode(sequence(lit(0), lit(32))))
      .select(col("b").cast("long").as("b"), col("cents"), k.as("k"))
      .select(col("b"), w.as("w"), col("cents"))
      .groupBy(col("b"))
      .agg(sum(col("w")).as("n_eff"),
        sum(col("w") * col("cents")).as("sum_cents"))
  }

  /** q49 — matched-model Laspeyres price index over lineitem: per
    * (month, item) representative price = min observed (min, not avg —
    * deterministic under duplicates and engine-order-independent), base
    * basket = items priced in the earliest month, index(month) =
    * Σ p_month / Σ p_base over items present in BOTH (matched-model so
    * numerator and denominator cover the same basket). This is the
    * reference domain's own headline analytic (OpenDOSM pricecatcher is
    * a CPI input). Shape at scale: one (month, item) partial agg over
    * the fact, a broadcast of the base basket (items dimension — small
    * by star-schema construction), one final agg by month. The ratio
    * divides two 4dp-rounded sums (identical doubles both engines), so
    * 6dp on the quotient is safe (never a rounded avg). */
  private def q49(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint: mp feeds THREE subtrees (base-month probe, base
    // basket, the index agg) whose differing column pruning defeats
    // exchange reuse — without it the plan scans the FACT table three
    // times (measured: 3 parquet scans in explain). The checkpoint
    // materializes the (month × item)-sized aggregate once — exactly
    // the "reuse the partial" move that matters when the fact is 100 TB
    // and the aggregate is MBs (c02 precedent).
    val mp = Tables.lineitem(s, d)
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        col("l_partkey"), col("l_extendedprice"))
      .groupBy(col("month"), col("l_partkey"))
      .agg(min(col("l_extendedprice")).as("p"))
      .localCheckpoint()
    val baseMonth = mp.agg(min(col("month")).as("base_month"))
    val base = mp.join(broadcast(baseMonth),
        col("month") === col("base_month"))
      .select(col("l_partkey"), col("p").as("p_base"))
    mp.join(broadcast(base), Seq("l_partkey"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("p")), 4).as("sum_cur"),
        round(sum(col("p_base")), 4).as("sum_base"))
      .select(col("month"), col("n_items"), col("sum_cur"), col("sum_base"),
        round(col("sum_cur") / nullif(col("sum_base"), lit(0.0)), 6)
          .as("price_index"))
  }

  /** q50 — cohort retention over events (day granularity — the fixture
    * spans one month): cohort = a user's first active day, then distinct
    * active users per (cohort, day offset). Two hash shuffles (user_id,
    * then (cohort, offset)); the per-user first-day table re-joins the
    * distinct activity pairs on user_id — both sides already reduced to
    * one/few rows per user, so the join input is the DISTINCT pairs, not
    * the raw event stream. */
  private def q50(s: SparkSession, d: String): DataFrame = {
    val act = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val firstDay = act.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort"))
    act.join(firstDay, Seq("user_id"))
      .groupBy(Cleaning.dateToString(col("cohort")).as("cohort"),
        datediff(col("day"), col("cohort")).as("offset_days"))
      .agg(count(lit(1)).as("users"))
  }

  /** t19 — positional inverted index (the retrieval-side structure BM25
    * t14 scores against): per (token, doc) posting with term frequency
    * and 0-based positions — phrase-query-capable. DOC-partitioned
    * postings (one row per token×doc, positions bounded by one doc's
    * length), NOT one global concatenated list per token: the global
    * form is a collect-the-corpus anti-pattern at 100 TB while this
    * shape partitions on (token, doc) and builds each posting from one
    * doc's rows. df rides in from a token-level count-distinct agg
    * (broadcast — vocabulary-bounded). */
  private def t19(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
        .as(Seq("pos", "token")))
    val dfTab = toks.groupBy(col("token"))
      .agg(count_distinct(col("doc_id")).as("df"))
    toks.groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        array_join(array_sort(collect_list(col("pos")))
          .cast("array<string>"), ",").as("positions"))
      .join(broadcast(dfTab), Seq("token"))
      .select(col("token"), col("df"), col("doc_id"), col("tf"),
        col("positions"))
  }

  /** q51 — CDC changeset apply ([[graft.operators.Cdc]]): a
    * deterministic changeset derived from each customer's latest order
    * (op from its status: F→update acctbal, O→insert a new +1,000,000
    * key, others→delete) applied to the customer snapshot. The
    * changeset build reuses the A1 dedup-latest operator (total order
    * (o_orderdate, o_orderkey)); the apply is ONE broadcast join on
    * c_custkey + a partition-wise union of inserts. The new balance is
    * the RAW o_totalprice double (no re-rounding of a raw value — both
    * engines read the identical parquet bits). */
  private def q51(s: SparkSession, d: String): DataFrame = {
    val latest = Dedup.latestPerGroupAgg(
      Tables.orders(s, d),
      keys = Seq("o_custkey"),
      orderKey = struct(col("o_orderdate"), col("o_orderkey")),
      payload = Seq("o_orderstatus", "o_totalprice"))
    val changes = latest.select(
      col("o_custkey").as("c_custkey"),
      when(col("o_orderstatus") === "F", "U")
        .when(col("o_orderstatus") === "O", "I")
        .otherwise("D").as("op"),
      col("o_totalprice").as("new_bal"))
    graft.operators.Cdc.applyChanges(
      Tables.customer(s, d), changes, "c_custkey", "op",
      updates = Map("c_acctbal" -> col("new_bal")),
      insertSelect = ins => ins.select(
        (col("c_custkey") + 1000000L).as("c_custkey"),
        lit("NEW").as("c_name"),
        lit(0).cast("int").as("c_nationkey"),
        col("new_bal").as("c_acctbal"),
        lit("NEW").as("c_mktsegment")))
  }

  /** q52 — mergeable HLL sketch lifecycle (build → store → union →
    * estimate): per-day user sketches over events, then ONE union-merge
    * for the month total — the only distinct-count shape that composes
    * incrementally at 100 TB (per-partition sketches persist; a new
    * day's data never re-reads history, unlike count_distinct which
    * re-shuffles everything). Contract oracle (q17 discipline): exact
    * counts are DuckDB-recomputable; the booleans assert the Datasketches
    * HLL estimate (lgConfigK=12, rel err ~1.6%) landed within 5%
    * (RecallMarginSpec holds the measured margins; Bench measures the
    * sketch path alone via benchOverrides). */
  private def q52(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(Cleaning.dateToString(col("ts")).as("day"), col("user_id"))
    val perDay = days.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
        countDistinct(col("user_id")).as("n_exact"))
    val total = perDay.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .crossJoin(broadcast(
        days.agg(countDistinct(col("user_id")).as("n_exact"))))
      .select(lit("TOTAL").as("day"), col("n_exact"),
        (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.05)
          .as("within_5pct"))
    perDay.select(col("day"), col("n_exact"),
        (abs(hll_sketch_estimate(col("sk")) - col("n_exact"))
          <= col("n_exact") * 0.05).as("within_5pct"))
      .unionByName(total)
  }

  /** q53 — event-transition matrix (first-order Markov counts): per
    * user, adjacent event-type pairs under the TOTAL order (ts,
    * event_id) — event_id breaks timestamp ties so lag is
    * engine-order-independent (q22 lesson) — counted into a (from, to)
    * matrix with each row's share of its from-state total. One window
    * shuffle on user_id, one count shuffle on the (from, to) pairs
    * (|event types|² rows at most). share = ratio of exact counts at
    * 6dp: both engines divide identical integers. */
  private def q53(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy(col("from_type"))
    trans.select(col("from_type"), col("to_type"), col("n"),
      round(col("n").cast("double") / sum(col("n")).over(wf), 6)
        .as("share"))
  }

  /** q54 — dataset profiling (the lake-ops "describe" every ingest
    * runs): one pass over customer computes per-column null counts,
    * exact distincts, and numeric min/max, then unpivots to one row per
    * column via stack. ONE aggregation job for the whole profile —
    * never a per-column scan loop (the 100 TB difference between
    * profiling and re-reading the table N_cols times); min/max/count
    * only — no avg, no float sums (CLAUDE.md float discipline moot by
    * construction). */
  private def q54(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val agg = c.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("c_name").isNull, 1).otherwise(0)).as("nn_name"),
      countDistinct(col("c_name")).as("nd_name"),
      sum(when(col("c_mktsegment").isNull, 1).otherwise(0)).as("nn_seg"),
      countDistinct(col("c_mktsegment")).as("nd_seg"),
      sum(when(col("c_acctbal").isNull, 1).otherwise(0)).as("nn_bal"),
      countDistinct(col("c_acctbal")).as("nd_bal"),
      min(col("c_acctbal")).as("min_bal"), max(col("c_acctbal")).as("max_bal"),
      sum(when(col("c_nationkey").isNull, 1).otherwise(0)).as("nn_nat"),
      countDistinct(col("c_nationkey")).as("nd_nat"),
      min(col("c_nationkey").cast("double")).as("min_nat"),
      max(col("c_nationkey").cast("double")).as("max_nat"))
    agg.select(col("n_rows"), expr(
      """stack(4,
        |  'c_name', nn_name, nd_name, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  'c_mktsegment', nn_seg, nd_seg, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  'c_acctbal', nn_bal, nd_bal, min_bal, max_bal,
        |  'c_nationkey', nn_nat, nd_nat, min_nat, max_nat)
        |  AS (col_name, n_null, n_distinct, min_val, max_val)""".stripMargin))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  /** d10 — exact repeated-span detection (the substring-dedup shape of
    * Lee et al.'s "Deduplicating Training Data", public literature):
    * every 20-token window of every document, grouped across the
    * corpus; spans occurring in ≥2 distinct documents are boilerplate /
    * template / contamination candidates. Top 100 by occurrence count
    * with a total (n_occ, n_docs, span) tie-break. The span STRING is
    * the grouping key here because the oracle must re-derive it
    * engine-independently; at 100 TB the shuffle key would be
    * xxhash64(span) with the string re-attached for the survivors only
    * (same id-only-shuffle discipline as the pair ops) — the window
    * explode itself is linear in corpus tokens either way, and the
    * top-k is TakeOrderedAndProject after a partial-combined count. */
  private def d10(s: SparkSession, d: String): DataFrame = {
    val span = 20
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= span)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("toks")) - span),
          i => array_join(slice(col("toks"), i + 1, lit(span)), " ")))
          .as("span"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_occ"),
        count_distinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_occ").desc, col("n_docs").desc, col("span"))
      .limit(100)
  }

  /** q55 — per-group top-N (each customer's 3 most expensive orders):
    * THE retrieval plan shape whose scalability lives or dies on rank-
    * limit pushdown — row_number ≤ N must plan as WindowGroupLimit
    * (per-partition partial top-N before the shuffle, so ~N·groups rows
    * move, not the fact table; PlanShapeSpec pins it). Total order
    * (o_totalprice desc, o_orderkey) — orderkey breaks price ties. */
  private def q55(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
  }

  /** q56 — snapshot diff / reconciliation: classify every key across
    * two snapshot versions as added / removed / changed, emitting both
    * payloads. The inverse of [[graft.operators.Cdc.applyChanges]] —
    * diffing q51's applied snapshot against the original recovers
    * exactly the effective changeset (asserted in CdcSpec), which is
    * how a lake audits what an ingest actually did. ONE full-outer
    * hash join on the key; unchanged rows are dropped BEFORE any
    * further processing, so downstream cost ∝ churn, not table size.
    * Payload equality on doubles is exact bit equality — both engines
    * compare the same parquet-read values, no arithmetic. */
  private def q56(s: SparkSession, d: String): DataFrame = {
    val before = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal").as("bal_before"))
    val after = q51(s, d)
      .select(col("c_custkey"), col("c_acctbal").as("bal_after"))
    before.join(after, Seq("c_custkey"), "full_outer")
      .withColumn("change_kind",
        when(col("bal_before").isNull, "added")
          .when(col("bal_after").isNull, "removed")
          .when(col("bal_before") =!= col("bal_after"), "changed")
          .otherwise("unchanged"))
      .filter(col("change_kind") =!= "unchanged")
      .select(col("c_custkey"), col("change_kind"),
        col("bal_before"), col("bal_after"))
  }

  /** q57 — blocked fuzzy string join (approximate entity matching):
    * customer-name pairs at Levenshtein distance ≤ 1, candidates
    * generated by a 16-char-prefix equi-join block — NEVER an all-pairs
    * cross product. The block is the standard record-linkage trade:
    * pairs whose single edit falls INSIDE the block key land in
    * different blocks and are missed by design (recall loss for
    * Σ block² candidate cost, block sizes bounded by key choice —
    * d04's discipline). The oracle blocks identically, so the gate
    * checks the blocked operator, not an all-pairs ideal. The standard
    * recall remedy — multi-pass blocking under complementary keys whose
    * union covers every edit position — needs keys that are each
    * selective alone; this fixture's zero-padded id space makes any
    * leading-digit key one giant block, so the single-pass form is the
    * honest shippable here. */
  private def q57(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        substring(col("c_name"), 1, 16).as("blk"))
    c.alias("a").join(c.alias("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      // THRESHOLDED edit distance (Spark 3.5+): the banded DP verifies
      // dist <= 1 in O(len) per pair instead of the full O(len²) matrix
      // — the verify stage is the whole cost of a blocked fuzzy join,
      // so the bound is the lever (returns -1 past the threshold;
      // kept-row values are identical to the unbounded form)
      .withColumn("dist", levenshtein(col("a.name"), col("b.name"), 1))
      .filter(col("dist") >= 0 && col("dist") <= 1)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("dist").cast("int").as("dist"))
  }

  /** q80 — entity resolution END TO END (record linkage composed from
    * this engine's own operators): q57's blocked fuzzy-match pairs
    * (prefix block + Levenshtein ≤ 1 verify, never all-pairs) unioned
    * into entities via [[graft.operators.Graph.dupClusters]]'s
    * alternating-star connected components — every customer labeled
    * with its entity's minimum id and the entity size, singletons
    * included. The d07 story lifted from near-dup documents to master
    * data. Oracle re-derives the closure INDEPENDENTLY of the star
    * algorithm: recursive-CTE min-label propagation over the same
    * pair SQL. */
  private def q80(s: SparkSession, d: String): DataFrame = {
    val ids = Tables.customer(s, d).select(col("c_custkey").as("id"))
    graft.operators.Graph.dupClusters(
        ids, q57(s, d).select(col("id_a"), col("id_b")))
      .select(col("node").as("id"), col("component").as("entity_id"),
        col("cluster_size").as("entity_size"))
  }

  /** g04 — triangle counting over the co-purchase graph
    * ([[graft.operators.Graph.triangleCount]]): parts bought together
    * in an order are edges (one deterministic part family, l_partkey %
    * 4 = 0, keeps the fixture graph bounded — the operator itself is
    * general); triangles measure clustering/community structure, the
    * classic graph-shape signal. The scale story is the DEGREE-ORDERED
    * orientation: the wedge join is capped at O(m^1.5) regardless of
    * hub degree (Graph.triangleCount scaladoc). The oracle counts the
    * same triangles via the id-ordered 3-way self-join — a completely
    * different formulation whose count must agree exactly. */
  private def g04(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .filter(col("l_partkey") % 4 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val edges = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
    graft.operators.Graph.triangleCount(edges)
  }

  /** g05 — k-core peeling over the sparse co-purchase graph
    * ([[graft.operators.Graph.kCore]]): the graph-density filter (who
    * survives when every member must have >= 5 surviving neighbors) —
    * community cores / bot-ring detection. The l_partkey % 16 family
    * keeps the fixture graph sparse enough to ACTUALLY peel (measured
    * depth 7 at sf0.01, 6 at sf0.1 — the % 4 graph of g04 is already a
    * 3-core); rounds = 9 carries two rounds of margin and the emitted
    * `converged` flag proves the budget reached the fixpoint (both
    * engines replay the same 9 rounds either way, so the gate is exact
    * regardless). Oracle: the identical peeling unrolled as generated
    * SQL CTE rounds; the from-first-principles while-loop reference
    * lives in GraphSpec. */
  private def g05(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .filter(col("l_partkey") % 16 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val edges = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
    graft.operators.Graph.kCore(edges, k = 5, rounds = 9)
  }

  /** g06 — deterministic label-propagation community detection over
    * the co-purchase graph ([[graft.operators.Graph.labelPropagation]]):
    * 4 synchronous rounds of "adopt the most frequent neighbor label"
    * under the (count desc, label asc) total order, with a `converged`
    * flag honest about the fixed budget. The % 8 graph sits between
    * g04's dense % 4 and g05's sparse % 16. Oracle: the identical 4
    * rounds unrolled as generated CTE SQL, argmax INDEPENDENTLY
    * formulated as a row_number window (vs the engine's
    * min(struct(-c, lab)) aggregate); the from-first-principles
    * sequential reference lives in GraphSpec. */
  private def g06(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .filter(col("l_partkey") % 8 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val edges = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
    graft.operators.Graph.labelPropagation(edges, rounds = 4)
  }

  /** g07 — two-hop reach per node over the sparse co-purchase graph:
    * deg (direct neighbors) and n_reach2 (distinct nodes within 2
    * hops, self excluded) — the local-density / influence-radius
    * metric next to g04's triangles. One self-join of the symmetric
    * adjacency frame on the middle node, union with the 1-hop frame,
    * distinct, count. The wedge join is the Σ deg² step; at a 100 TB
    * graph the exact distinct swaps for a per-node HLL
    * (approx_count_distinct over the same wedge frame — mergeable,
    * counter-sized shuffle) — the exact form is registered because it
    * is oracle-able and the fixture graph is wedge-bounded by g05's
    * % 16 sparsity. Integer-exact. */
  private def g07(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .filter(col("l_partkey") % 16 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val e = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
    val nbr = e.select(col("u").as("node"), col("v").as("nb"))
      .unionAll(e.select(col("v").as("node"), col("u").as("nb")))
    val two = nbr.as("x").join(
        nbr.select(col("node").as("nb"), col("nb").as("nb2")).as("y"), "nb")
      .select(col("node"), col("nb2"))
      .filter(col("node") =!= col("nb2"))
    val reach = nbr.select(col("node"), col("nb").as("r"))
      .unionAll(two.select(col("node"), col("nb2").as("r")))
      .distinct()
      .groupBy(col("node")).agg(count(lit(1)).as("n_reach2"))
    nbr.groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .join(reach, "node")
  }

  /** g08 — multi-source BFS hop distances over the co-purchase graph
    * ([[graft.operators.Graph.bfsDistances]]): distance from the
    * nearest seed (nodes ≡ 0 mod 64), 4 hop budget — the
    * proximity-to-trusted-set metric in its exact-hop form (g03's
    * personalized PageRank is the same question as a mass diffusion).
    * Frontier-only propagation against the pre-partitioned adjacency
    * frame; integer-exact.
    *
    * Oracle: structurally DIFFERENT formulation — re-propagates the
    * FULL distance frame every round (d_r = min(d_{r-1}, nbr+1))
    * instead of the frontier delta, so the classic BFS frontier
    * invariant itself is what the gate cross-checks. */
  private def g08(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .filter(col("l_partkey") % 16 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val e = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
    val nodes = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node"))).distinct()
    graft.operators.Graph.bfsDistances(
      e, nodes.filter(col("node") % 64 === 0), rounds = 4)
  }

  /** d13 — cross-source contamination matrix: for every source pair,
    * the number of distinct 3-token shingles they share plus an exact
    * integer Jaccard (×10⁴) — d08's train-vs-eval decontamination
    * generalized to ALL corpus-source pairs, the "which crawl slice
    * copies which" audit that decides source-level dedup priorities.
    * Scale shape: the self-join key is the 8-byte xxhash64 shingle
    * (d08's discipline — text never shuffles) over the DISTINCT
    * (source, shingle) frame, so per-shingle fanout is bounded by the
    * source count, output by source-pairs — counters end to end. The
    * oracle joins shingle STRINGS (hash-collision divergence would
    * fail deterministically). */
  private def d13(s: SparkSession, d: String): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val sh = Tables.documents(s, d)
      .select(col("source"), toks.as("toks"))
      .select(col("source"),
        explode(when(size(col("toks")) >= 3,
          transform(sequence(lit(0), size(col("toks")) - 3),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(3)))))
          .otherwise(array().cast("array<string>"))).as("sh"))
      .select(col("source"), xxhash64(col("sh")).as("h"))
      .distinct()
      // consumed three times (both join sides + the per-source counts):
      // materialize once so the corpus scan+shingle explode runs once
      .localCheckpoint(true)
    val counts = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(counts.select(col("source").as("src_a"),
        col("n").as("n_a"))), "src_a")
      .join(broadcast(counts.select(col("source").as("src_b"),
        col("n").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        expr("n_shared * 10000 div (n_a + n_b - n_shared)")
          .as("jaccard_x10k"))
  }

  /** g09 — INCREMENTAL connected components
    * ([[graft.operators.Graph.incrementalComponents]]): the standing
    * co-purchase graph's CC labeling folded forward by a delta edge
    * batch (orders ≡ 0 mod 7 arriving after the base build) — the
    * per-ingest form of d07's clustering, cost ∝ delta + touched
    * components, the base edges never re-read. Oracle: the FULL
    * REBUILD over base ∪ delta as an independent recursive-CTE
    * min-label closure — the merge must be indistinguishable from
    * rebuilding (q86/q88 discipline). */
  private def g09(s: SparkSession, d: String): DataFrame = {
    def edges(f: Column): DataFrame = {
      val op = Tables.lineitem(s, d)
        .filter(col("l_partkey") % 16 === 0 && f)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
      op.as("a").join(op.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
    }
    val base = graft.operators.Graph.connectedComponents(
      edges(col("l_orderkey") % 7 =!= 0))
    graft.operators.Graph.incrementalComponents(
      base, edges(col("l_orderkey") % 7 === 0))
  }

  /** g10 — common-neighbor LINK PREDICTION over the sparse co-purchase
    * graph ([[graft.operators.Graph.linkPrediction]]): the top-100
    * NON-adjacent pairs ranked by shared-neighbor count, with both
    * degrees — the entity-resolution candidate generator (surface the
    * pairs a pairwise matcher never compared) and the classic
    * missing-edge signal. Same %16 edge family as g05. Oracle: the
    * identical wedge/anti-join/top-k formulated as independent SQL
    * CTEs — integer-exact, and the (n_common desc, u, v) cutoff is a
    * total order so the top-100 set is engine-agnostic; a
    * from-first-principles reference on handcrafted graphs lives in
    * GraphSpec. The wedge join runs with the hub cap IN THE PLAN
    * (maxWedgeDeg = 64 — the 100× skew bound, r9 verdict item 1),
    * chosen lossless here: the fixture graph's max degree is 15 at
    * sf0.01 / 18 at sf0.1 (measured), so the capped plan returns the
    * exact answer and the unchanged full oracle keeps gating it. */
  private def g10(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .filter(col("l_partkey") % 16 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val edges = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
    graft.operators.Graph.linkPrediction(edges, topK = 100,
      maxWedgeDeg = 64)
  }

  /** q81 — keyed-snapshot maintenance from the event stream, the batch
    * twin of st12 ([[graft.streaming.SnapshotCdc.applyUserBatch]]):
    * events split into two deterministic "ingest batches" (day ≤ 15 /
    * rest), each batch's per-user LATEST event normalized into a
    * strict I/U/D changeset against the state the previous batch left
    * and applied through the q51 [[graft.operators.Cdc]] kernel —
    * upsert (purchase), guarded insert (signup), alive-only update
    * (click), tombstone (error). Balance is the raw event value
    * (byte-exact parquet pass-through, q51's no-rearithmetic
    * discipline). The oracle re-derives the two-step state machine
    * independently as a FULL OUTER join CASE table. */
  private def q81(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val empty = ev.select(col("user_id"), col("value").as("balance"))
      .limit(0).withColumn("alive", lit(true))
    graft.streaming.SnapshotCdc.applyUserBatch(
      graft.streaming.SnapshotCdc.applyUserBatch(
        empty, ev.filter(dayofmonth(col("ts")) <= 15)),
      ev.filter(dayofmonth(col("ts")) > 15))
  }

  /** q82 — per-user ingestion quota, the batch twin of st14
    * ([[graft.streaming.Quota]]): per user, the first 3 events in
    * (ts, event_id) order are accepted; every event keeps a verdict
    * with n_before = accepted count before it (capped at the quota).
    * The window form is per-user partitioned (scale = sessionization's)
    * and equals the streaming transformWithState result whenever
    * batches respect per-key event-time order — the equivalence
    * StreamingSpec drives both ways. */
  private def q82(s: SparkSession, d: String): DataFrame = {
    val quota = 3
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .select(col("user_id"), col("event_id"),
        least(col("rn") - 1, lit(quota)).cast("long").as("n_before"),
        (col("rn") <= quota).as("accepted"))
  }

  /** q83 — key-skew profiler: the diagnostic that DECIDES when q26's
    * salted aggregation / q42's salted join are worth their extra
    * shuffle stage. Per-key counts (one map-side-combined aggregation
    * — the full table contributes counters, never rows), then the
    * top-5 hot keys with exact integer skew metrics: share_bp =
    * cnt·10⁴ div total (basis points of all rows on this key),
    * skew_x100 = cnt·n_keys·100 div total (100 ⇔ perfectly uniform;
    * a key at 3200 holds 32× its fair share), and salt = the
    * suggested per-key salt fan-out max(1, cnt·n_keys div total) —
    * exactly the factor that would re-level the hot reducer. The
    * events fixture is near-uniform (skew ≈ 130), which the profiler
    * must REPORT, not assume: the honest "don't salt" verdict is the
    * common case. Integer-exact end to end; the only window is over
    * the 5-row top-k. */
  private def q83(s: SparkSession, d: String): DataFrame = {
    val cnts = Tables.events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val tot = cnts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"))
    cnts.orderBy(col("cnt").desc, col("user_id").asc).limit(5)
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("cnt").desc, col("user_id").asc))
        .cast("long"))
      .crossJoin(broadcast(tot))
      .select(col("rnk"), col("user_id"), col("cnt"),
        expr("cnt * 10000 div total").as("share_bp"),
        expr("cnt * n_keys * 100 div total").as("skew_x100"),
        greatest(lit(1L), expr("cnt * n_keys div total")).as("salt"))
  }

  /** q84 — batch twin of st15 ([[graft.streaming.EventStreams
    * .clickErrorJoinLeftOuter]]): the LEFT OUTER interval join run as
    * a batch plan — the SAME code path the st15 drive runs as a
    * watermarked stream-stream join (the st05/q39 discipline: one
    * implementation, oracle-gated here, benched there). Unmatched
    * errors survive with NULL click columns — the rows the inner st04
    * shape silently drops, and exactly the ones an alerting consumer
    * wants. */
  private def q84(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventStreams
      .clickErrorJoinLeftOuter(Tables.events(s, d))
      .select(col("user_id"), col("error_id"), col("click_id"),
        col("matched"))

  /** q85 — batch twin of st16 ([[graft.streaming.EventStreams
    * .dedupedTumblingAgg]]): exact dedup on event_id feeding the q15
    * tumbling aggregation — the chained-stateful-operator semantics
    * as one batch plan. The batch dedup picks a DETERMINISTIC
    * representative (min over the (ts, event_type, value) struct — a
    * total order over the payload, so duplicate ids resolve
    * identically on any engine/partitioning; the streaming form's
    * first-arrival-wins is gated separately in StreamingSpec where
    * arrival order is controlled). On the fixture event_id is unique,
    * so q85 ≡ q15 row-for-row — the dedup stage must be a no-op, which
    * IS the assertion. */
  private def q85(s: SparkSession, d: String): DataFrame = {
    val dedup = Tables.events(s, d)
      .groupBy(col("event_id"))
      .agg(min(struct(col("ts"), col("event_type"), col("value"))).as("e"))
      .select(col("e.ts").as("ts"), col("e.event_type").as("event_type"),
        col("e.value").as("value"))
    dedup
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** t20 — BPE merge-pair statistics (the inner loop of byte-pair-
    * encoding tokenizer training): count adjacent CHARACTER pairs
    * within corpus words, emit the top 20 merge candidates under a
    * total (count desc, pair) order. Pairs come straight off the char
    * split in the projection (t15's bigram idiom one level down); one
    * partial-combined count shuffle over a ≤ |alphabet|² key space.
    * Pair expansion here runs per word OCCURRENCE — see t27 for the
    * vocabulary-weighted re-plan whose expansion cost is bounded by
    * the vocabulary instead of the corpus. */
  private def t20(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(explode(
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
        .as("w"))
      .filter(length(col("w")) >= 2)
    words
      .select(explode(transform(sequence(lit(0), length(col("w")) - 2),
        i => col("w").substr(i + 1, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)
  }

  /** c05 — the COMPLETE pre-training data pipeline, composed end to end
    * from this engine's own operators: quality gate → exact dedup →
    * near-dup prune ([[graft.operators.Curate.kept]], the c01 stages) →
    * benchmark decontamination (drop any training doc sharing a trigram
    * with the held-out eval slice — d08's probe, applied as a filter) →
    * per-language mixing (c03's integer-arithmetic md5-rank sampling) →
    * sequence packing totals (t18's bin arithmetic). One registered
    * statement proving the stages COMPOSE — a user's whole curation run
    * is this query with their thresholds. All-integer output row, and
    * every stage keeps its scale shape: nothing here collects, every
    * join is the semi/anti/broadcast form its component query pinned.
    * The oracle re-derives the entire funnel in one SQL chain built
    * from the per-stage oracles — no shared code with this side.
    * (Fixture note: the ~31-word synthetic vocabulary makes trigram
    * collisions with the eval slice near-universal, so decontamination
    * drops most docs here — 4756→295 at sf0.1. That is the fixture's
    * density artifact, the same one documented at d04's Zipf note, not
    * an operator property.) */
  /** q59 — unpivot (wide → long, the inverse of q19's pivot): q19's
    * nation × segment revenue matrix melted back to long form via
    * stack, null cells (segment absent for a nation) dropped. Pivot
    * and unpivot round-trip through the same 4dp-rounded sums, so the
    * oracle can restate the result as the DIRECT long-form aggregation
    * — proving the wide detour loses nothing. */
  private def q59(s: SparkSession, d: String): DataFrame =
    q19(s, d).select(col("n_name"), expr(
      """stack(5,
        |  'AUTOMOBILE', AUTOMOBILE, 'BUILDING', BUILDING,
        |  'FURNITURE', FURNITURE, 'HOUSEHOLD', HOUSEHOLD,
        |  'MACHINERY', MACHINERY) AS (segment, revenue)""".stripMargin))
      .filter(col("revenue").isNotNull)

  /** q60 — rank-function battery (rank / dense_rank / percent_rank /
    * cume_dist) per order priority over the TIE-BEARING o_orderdate
    * order — the point: rank functions depend only on ORDER-KEY values,
    * so ties produce identical ranks deterministically (no total-order
    * requirement, unlike row_number — the q22 distinction in the other
    * direction). percent_rank/cume_dist are ratios of rank integers:
    * identical doubles both engines, 6dp safe. */
  private def q60(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderdate"))
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_orderpriority"),
      rank().over(w).cast("long").as("rnk"),
      dense_rank().over(w).cast("long").as("drnk"),
      round(percent_rank().over(w), 6).as("pr"),
      round(cume_dist().over(w), 6).as("cd"))
  }

  /** q63 — struct-type battery: named_struct construction, field
    * access, and lexicographic array_sort of structs (the ordering the
    * engine's canonical-order machinery leans on internally — here
    * pinned as an observable contract). Per order-priority: sort the
    * (totalprice, orderkey) structs, emit the extremes' fields. Output
    * flattened to scalars (q61 discipline); sorting structs of
    * (double, long) is lexicographic on exact parquet doubles — no
    * arithmetic, so cross-engine deterministic. */
  private def q63(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(sort_array(collect_list(
        struct(col("o_totalprice"), col("o_orderkey")))).as("sorted"))
      .select(col("o_orderpriority"),
        size(col("sorted")).as("n"),
        col("sorted").getItem(0).getField("o_totalprice").as("min_price"),
        col("sorted").getItem(0).getField("o_orderkey").as("min_key"),
        element_at(col("sorted"), -1).getField("o_totalprice").as("max_price"),
        element_at(col("sorted"), -1).getField("o_orderkey").as("max_key"))

  /** q64 — conditional-aggregate battery: count_if / every / any /
    * sum-FILTER semantics (Spark's count_if, every, any against
    * DuckDB's FILTER clause and bool_and/bool_or) — the idiom family
    * behind every selective metric in the t-series, pinned directly.
    * All counts/booleans — integer-exact gate. */
  private def q64(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count_if(col("l_quantity") > 25).as("n_big"),
        expr("every(l_quantity > 0)").as("all_positive"),
        expr("any(l_discount > 0.09)").as("has_deep_discount"),
        count(when(col("l_tax") > 0.05, 1)).as("n_taxed"))

  /** q62 — subquery-form battery over the spark.sql entry path:
    * IN / EXISTS / NOT EXISTS / NOT IN, with the NOT-IN-vs-NULL trap
    * pinned on purpose — the probe list contains a NULL (planted via a
    * CASE over linenumber), so `NOT IN` is three-valued-logic-empty
    * while `NOT EXISTS` returns the real complement. Both engines
    * implement ANSI semantics; the gate proves this engine does NOT
    * paper over the divergence. One row of counts. */
  private def q62(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("li_q62")
    Tables.orders(s, d).createOrReplaceTempView("o_q62")
    s.sql(
      """WITH probe AS (
        |  SELECT CASE WHEN l_linenumber = 7 THEN CAST(NULL AS BIGINT)
        |              ELSE l_orderkey END AS k
        |  FROM li_q62 WHERE l_linenumber >= 6)
        |SELECT
        |  (SELECT count(*) FROM o_q62
        |   WHERE o_orderkey IN (SELECT k FROM probe)) AS n_in,
        |  (SELECT count(*) FROM o_q62 o
        |   WHERE EXISTS (SELECT 1 FROM probe p
        |                 WHERE p.k = o.o_orderkey)) AS n_exists,
        |  (SELECT count(*) FROM o_q62 o
        |   WHERE NOT EXISTS (SELECT 1 FROM probe p
        |                     WHERE p.k = o.o_orderkey)) AS n_not_exists,
        |  (SELECT count(*) FROM o_q62
        |   WHERE o_orderkey NOT IN (SELECT k FROM probe)) AS n_not_in
        |""".stripMargin)
  }

  /** q61 — map-type battery: construct (map), merge (map_concat),
    * enumerate (map_keys, sorted), look up (element_at), and parse
    * (from_json into map<string,bigint>) — the map surface no other
    * query exercises. Output is FLATTENED to scalars so the oracle can
    * re-derive every value from first principles without map types
    * (the maps are Spark-side plumbing; only their observable content
    * is gated). Bucket values stringify via integer casts only — never
    * stringify a double (engine formatting differs). */
  private def q61(s: SparkSession, d: String): DataFrame = {
    val bucket = floor(col("value") / 100).cast("long").cast("string")
    val m = map(lit("type"), col("event_type"), lit("bucket"), bucket)
    val m2 = map_concat(m,
      map(lit("day"), Cleaning.dateToString(col("ts"))))
    val parsed = from_json(col("props"), lit("map<string,bigint>"))
    Tables.events(s, d).select(
      col("event_id"),
      size(m2).as("n_entries"),
      element_at(m2, "type").as("type_val"),
      element_at(m2, "bucket").as("bucket_val"),
      element_at(m2, "day").as("day_val"),
      array_join(array_sort(map_keys(m2)), ",").as("keys"),
      element_at(parsed, "k").as("k_val"))
  }

  /** t21 — readability scoring (Flesch reading-ease form): sentence,
    * word, and syllable-proxy counts per doc plus the standard linear
    * score 206.835 − 1.015·(W/S) − 84.6·(Syl/W) — the classic quality
    * signal beyond t02's length/punct ratios. Syllables proxied by
    * vowel-group runs (the usual heuristic; exact same regex both
    * engines, Java∩RE2 dialect). Pure projection + codegen regexp
    * counts, no shuffle at all. Zero-able denominators nullif'd BOTH
    * sides (no sentence punctuation ⇒ NULL score); the score divides
    * and linearly combines identical integers, so 4dp is safe. */
  private def t21(s: SparkSession, d: String): DataFrame = {
    val words = regexp_count(col("text"), lit("\\S+")).cast("long")
    val sents = regexp_count(col("text"), lit("[.!?]+")).cast("long")
    val sylls = regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
    Tables.documents(s, d).select(
      col("doc_id"),
      words.as("n_words"), sents.as("n_sentences"), sylls.as("n_syllables"),
      round(lit(206.835)
        - lit(1.015) * (words.cast("double") /
            nullif(sents.cast("double"), lit(0.0)))
        - lit(84.6) * (sylls.cast("double") /
            nullif(words.cast("double"), lit(0.0))), 4).as("flesch"))
  }

  /** q58 — grouped exact percentiles (median/p90 per order priority):
    * the per-segment distribution summary q25 does globally. Exact
    * percentile is a sort-based aggregate — per GROUP that means each
    * group's values collect to one reducer (fine: group count is tiny,
    * values per group ≪ executor memory at any SF; for billion-row
    * groups the q40 sketch is the scale form, documented there). Same
    * quantile_cont interpolation pairing as q25. */
  private def q58(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(o_totalprice, 0.5D)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9D)"), 4).as("p90"))

  /** s06 — exact MIPS top-10 ([[Similarity.mipsTopK]]): dot-product
    * ranking, the retrieval score embedding models train on. Fully
    * deterministic oracle (index-order summation, no sqrt/division). */
  private def s06(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.mipsTopK(emb, emb.filter(col("vec_id") < 10), k = 10)
  }

  /** s07 — Johnson–Lindenstrauss embedding compression (64 → 32 dims,
    * seeded Gaussian planes through the codegen'd
    * [[graft.plans.ProjectVector]] — 2× narrower vectors for every
    * downstream scan/shuffle). Contract oracle on what JL actually
    * guarantees: DISTANCE preservation. Over the deterministic disjoint
    * pairing (2i, 2i+1), mean |cos_proj − cos_exact| ≤ 0.2 and ≥80% of
    * pairs within 0.3 — measured 0.137/0.889 at sf0.01 and 0.141/0.916
    * at sf0.1 (RecallProbe), real margin on both bounds. Compressed
    * top-k RANKING on these near-random fixture embeddings is
    * near-chance (structureless data has no low-dim structure to keep),
    * so the rank-claim is deliberately NOT the contract —
    * [[graft.operators.Similarity.projectedTopK]] ships as the
    * shortlist-then-exact-rerank usage. The oracle re-derives n_pairs
    * structurally (even⋈odd id join) and asserts the booleans TRUE. */
  private def s07(s: SparkSession, d: String): DataFrame = {
    val pairs = Similarity.jlDistortionPairs(Tables.embeddings(s, d))
    pairs.agg(count(lit(1)).as("n_pairs"),
        avg(abs(col("cos_proj") - col("cos_exact"))).as("mae"),
        avg((abs(col("cos_proj") - col("cos_exact")) <= 0.3)
          .cast("int")).as("frac"))
      .select(col("n_pairs"),
        (col("mae") <= 0.2).as("mae_ok"),
        (col("frac") >= 0.8).as("frac_ok"))
  }

  private def c05(s: SparkSession, d: String): DataFrame =
    c05Funnel(s, d, exactPairs = true)

  private def c05Funnel(s: SparkSession, d: String,
                        exactPairs: Boolean): DataFrame = {
    val docs = Tables.documents(s, d)
    val kept = graft.operators.Curate.kept(docs, "doc_id", "text",
      exactPairs = exactPairs)
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val sh = docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(when(size(col("toks")) >= 3,
          transform(sequence(lit(0), size(col("toks")) - 3),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(3)))))
          .otherwise(array().cast("array<string>"))).as("sh3"))
    val evalSet = sh.filter(col("doc_id") % 97 === 0)
      .select("sh3").distinct()
    val contaminated = sh.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalSet), Seq("sh3")).select("doc_id").distinct()
    val clean = kept.filter(col("doc_id") % 97 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    val wMix = Window.partitionBy(col("lang"))
      .orderBy(md5(concat(col("doc_id").cast("string"), lit(":mix"))),
        col("doc_id"))
    val mixed = clean
      .withColumn("rn", row_number().over(wMix))
      .withColumn("n_lang", count(lit(1)).over(
        Window.partitionBy(col("lang"))))
      .filter(col("rn") * 10 <=
        when(col("lang") === "en", 8).otherwise(5) * col("n_lang"))
    val totals = mixed.select(size(toks).cast("long").as("n_tok"))
      .agg(count(lit(1)).as("n_mixed"),
        coalesce(sum(col("n_tok")), lit(0L)).as("n_tokens"))
    docs.agg(count(lit(1)).as("n_input"))
      .crossJoin(kept.agg(count(lit(1)).as("n_kept")))
      .crossJoin(clean.agg(count(lit(1)).as("n_clean")))
      .crossJoin(totals)
      .select(col("n_input"), col("n_kept"), col("n_clean"),
        col("n_mixed"), col("n_tokens"),
        expr("(n_tokens + 2047) DIV 2048").as("n_bins"))
  }

  /** q65 — exponentially-weighted moving average (trend smoothing, the
    * time-series class the suite lacked) per supplier over the TOTAL
    * order (shipdate, orderkey, linenumber, extendedprice — the q22
    * lesson: every emitted value must be order-pinned under ties). The
    * textbook EWMA recursion is not declarative, so this is the
    * closed-form bounded-lookback variant: 8 lag terms with weights
    * (1/2)^j renormalized over the terms that exist. α = 1/2 makes every
    * weight an exact binary fraction, so x·2⁻ʲ is EXACT double
    * arithmetic; the only inexact steps (the left-associated 8-term sums
    * and one division) are written in the same order in both engines and
    * land bit-identical. Scale: one window shuffle on l_suppkey; the
    * frame is 8 rows of running state per row — no second pass, no skew
    * beyond the supplier partitioning itself. */
  private def q65(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"))
    val terms = (0 to 7).map { j =>
      val x = if (j == 0) col("l_extendedprice")
              else lag(col("l_extendedprice"), j).over(w)
      val wt = lit(math.pow(0.5, j))
      (when(x.isNull, lit(0.0)).otherwise(x * wt),
        when(x.isNull, lit(0.0)).otherwise(wt))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    Tables.lineitem(s, d)
      .withColumn("ewma", round(num / den, 4))
      .select(col("l_suppkey").as("premise_code"),
        col("l_orderkey").as("order_key"),
        col("l_linenumber").as("line_no"),
        col("l_extendedprice").as("price"),
        col("ewma"))
  }

  /** q66 — robust outlier fences (Tukey IQR anomaly detection — the
    * data-quality screen every ingest pipeline runs) per part brand.
    * Everything compared is EXACT: prices ride as integer cents, exact
    * quartiles of integers interpolate to quarter fractions (binary-
    * exact), IQR·1.5 is a multiple of 1/8 (binary-exact), and the fences
    * are emitted ×4 / ×8 as integers so no decimal rounding exists
    * anywhere in the result. Plan: ONE broadcast dim join (part), one
    * grouped sort-agg for the 25-row fence table, fences broadcast back
    * onto the fact — the fact shuffles once, on p_brand. At 100 TB the
    * exact per-group percentile is the only sort-bearing step; its
    * group-local sort is the price of exactness (q40's GK sketch is the
    * sketch form when even that is too much). */
  private def q66(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
    val fences = li.groupBy(col("p_brand")).agg(
        expr("percentile(cents, 0.25D)").as("q1"),
        expr("percentile(cents, 0.75D)").as("q3"),
        count(lit(1)).as("n_rows"))
      .select(col("p_brand"), col("n_rows"), col("q1"), col("q3"),
        (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
    li.join(broadcast(fences.select("p_brand", "lo", "hi")), Seq("p_brand"))
      .groupBy(col("p_brand"))
      .agg(sum(when(col("cents") > col("hi"), 1L).otherwise(0L)).as("n_above"),
        sum(when(col("cents") < col("lo"), 1L).otherwise(0L)).as("n_below"))
      .join(broadcast(fences), Seq("p_brand"))
      .select(col("p_brand"), col("n_rows"),
        (col("q1") * 4).cast("long").as("q1_x4"),
        (col("q3") * 4).cast("long").as("q3_x4"),
        (col("lo") * 8).cast("long").as("lo_x8"),
        (col("hi") * 8).cast("long").as("hi_x8"),
        col("n_above"), col("n_below"))
  }

  /** q67 — count-min sketch frequency estimation over the shared t12
    * Zipfian token stream, completing the mergeable-sketch family (Bloom
    * q38, HLL q52, GK quantiles q40, Misra–Gries t12, CMS here). The
    * sketch is a depth×width counter grid (eps=0.001 → width 2000,
    * conf=0.99 → depth 7); merge is cell-wise sum — commutative, so the
    * estimate is partition-order invariant — and a point estimate is the
    * min over depth rows: never below the true count, over it by at most
    * eps·N w.h.p. Contract oracle (t12 discipline): emitted rows are the
    * DETERMINISTIC exact 1%-heavy tokens; the booleans assert both CMS
    * guarantees in exact integer arithmetic ((est−true)·1000 ≤ N ⇔
    * est−true ≤ eps·N). The probe itself runs through the native
    * [[graft.plans.CmsEstimate]] expression on the broadcast one-row
    * sketch — never a driver round-trip. At 100 TB the sketch build is
    * the only fact-path work (codegen'd partial agg, 56 KB of state per
    * partition); the exact heavy counts here are the verification
    * harness, not the operator. */
  private def q67(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d).select(explode(zipfTokens).as("token"))
    val totals = toks.agg(count(lit(1)).as("n_stream"))
    val sk = toks.agg(count_min_sketch(col("token"),
      lit(0.001d), lit(0.99d), lit(42)).as("sk"))
    val est = graft.plans.CmsFunctions.cmsEstimate(col("sk"), col("token"))
    toks.groupBy(col("token")).agg(count(lit(1)).as("n_true"))
      .crossJoin(broadcast(totals)).crossJoin(broadcast(sk))
      .filter(col("n_true") * 100 >= col("n_stream"))
      .select(col("token"), col("n_true"),
        (est >= col("n_true")).as("lower_ok"),
        ((est - col("n_true")) * 1000 <= col("n_stream")).as("upper_ok"))
  }

  /** q68 — time-weighted average price (TWAP): each (supplier, part)
    * price is in effect from its ship date until the next one; weight
    * by that exact integer day span. The time-series sibling of q65's
    * EWMA (event-weighted vs duration-weighted). Emits exact integer
    * sums — Σ(cents·days) and Σdays — never the ratio: both engines
    * divide identically-exact integers into a float only at the
    * consumer, so nothing can drift. One window shuffle on the
    * (suppkey) key for lead(), one grouped agg on the same key — AQE
    * coalesces them into a single exchange. */
  private def q68(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"))
    Tables.lineitem(s, d)
      .withColumn("next_ts", lead(col("l_shipdate"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      .select(col("l_suppkey"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
        datediff(col("next_ts").cast("date"),
          col("l_shipdate").cast("date")).cast("long").as("days"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("cents") * col("days")).as("sum_cents_days"),
        sum(col("days")).as("sum_days"))
  }

  /** q69 — OHLC bars (open/high/low/close per supplier per month): the
    * financial-bars shape. Open/close are the first/last price under
    * the TOTAL (shipdate, orderkey, linenumber, price) order — the q22
    * tie lesson again, since lineitem plants equal-key rows with
    * different prices; high/low are plain extremes. Two window passes
    * (asc row_number for open, desc for close) and the bar agg all
    * share ONE (suppkey, month) partitioning. Prices ride as exact
    * cents. */
  private def q69(s: SparkSession, d: String): DataFrame = {
    // bar_month is materialized as a COLUMN before the windows so both
    // window passes and the bar agg key on the same (suppkey, bar_month)
    // pair — Catalyst then plans exactly one hash exchange for all three
    // (pinned in PlanShapeSpec); keying the agg on a fresh
    // date_trunc expression instead would buy a second shuffle
    val asc = Window.partitionBy(col("l_suppkey"), col("bar_month"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
        col("l_linenumber").asc, col("l_extendedprice").asc)
    val desc = Window.partitionBy(col("l_suppkey"), col("bar_month"))
      .orderBy(col("l_shipdate").desc, col("l_orderkey").desc,
        col("l_linenumber").desc, col("l_extendedprice").desc)
    Tables.lineitem(s, d)
      .select(col("l_suppkey"),
        Cleaning.dateToString(date_trunc("month", col("l_shipdate")))
          .as("bar_month"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy(col("l_suppkey"), col("bar_month"))
      .agg(count(lit(1)).as("n_trades"),
        max(when(col("rn_a") === 1, col("cents"))).as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max(when(col("rn_d") === 1, col("cents"))).as("close_cents"))
  }

  /** q72 — trailing moving MEDIAN (7-row frame) per supplier: the
    * robust sibling of q22's moving average (one planted outlier drags
    * a mean for 7 rows; the median shrugs it off). Exact percentile as
    * a WINDOW aggregate over integer cents — ≤7 values per frame, so
    * the median is an element or a .5 midpoint; emitted ×2 as an
    * integer so nothing is ever decimal-rounded. Same single
    * (suppkey) exchange as q65/q68. */
  private def q72(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"))
      .rowsBetween(-6, Window.currentRow)
    Tables.lineitem(s, d)
      .withColumn("cents",
        round(col("l_extendedprice") * 100, 0).cast("long"))
      .withColumn("med2",
        (expr("percentile(cents, 0.5D)").over(w) * 2).cast("long"))
      .select(col("l_suppkey").as("premise_code"),
        col("l_orderkey").as("order_key"),
        col("l_linenumber").as("line_no"),
        col("cents"), col("med2"))
  }

  /** q73 — ABC / Pareto classification: parts ranked by revenue, class
    * A = parts within the leading 80% of cumulative revenue, B to 95%,
    * C the tail (the inventory-analytics standard). The global
    * cumulative ranking runs over the PER-PART aggregate (dim-sized —
    * |parts| rows, never the fact), which is the only way this op
    * exists at 100 TB: aggregate first, rank the reduction. Integer
    * cents end-to-end; class boundaries compare cum·100 ≤ 80·total in
    * exact int64. Tie order (revenue DESC, partkey) is total. */
  private def q73(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .select(col("l_partkey"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      .groupBy(col("l_partkey")).agg(sum(col("cents")).as("rev"))
    val w = Window.orderBy(col("rev").desc, col("l_partkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.withColumn("cum", sum(col("rev")).over(w))
      .crossJoin(broadcast(rev.agg(sum(col("rev")).as("total"))))
      .withColumn("abc_class",
        when(col("cum") * 100 <= col("total") * 80, "A")
          .when(col("cum") * 100 <= col("total") * 95, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("sum_rev"))
  }

  /** q70 — LATERAL join battery: the correlated-subquery-as-a-TABLE
    * surface (SQL:1999 lateral derived tables, supported by Spark 4's
    * planner via subquery decorrelation). Two forms no other query
    * exercises: (a) LATERAL with ORDER BY … LIMIT — "top-2 line items
    * per order", which Catalyst decorrelates into a windowed
    * rank-limit instead of running a per-row subquery (the same
    * WindowGroupLimit shape q55 pins directly); (b) LATERAL aggregate —
    * per-order scalar stats joined positionally. Both engines evaluate
    * the same ANSI text modulo view names. Exact columns only: prices
    * ride as stored doubles, counts as bigints, and the top-2 ORDER BY
    * is total (price DESC, linenumber) within an order. */
  private def q70(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("o_q70")
    Tables.lineitem(s, d).createOrReplaceTempView("li_q70")
    s.sql(
      """SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice,
        |       a.n_lines, a.max_price
        |FROM o_q70 o,
        |LATERAL (
        |  SELECT l_linenumber, l_extendedprice FROM li_q70
        |  WHERE l_orderkey = o.o_orderkey
        |  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t,
        |LATERAL (
        |  SELECT count(*) AS n_lines, max(l_extendedprice) AS max_price
        |  FROM li_q70 WHERE l_orderkey = o.o_orderkey) a
        |WHERE o.o_orderstatus = 'O'
        |""".stripMargin)
  }

  /** q71 — last-touch marketing attribution: each purchase is credited
    * to the user's most recent click/view within a 3-day lookback, else
    * "none". The single-exchange shape (q48/AsOfJoin discipline): union
    * touches+purchases, ONE (user_id) window pass carries the latest
    * touch forward under the TOTAL (ts, event_id) order — no per-user
    * event-history array, no touches⨯purchases join. The lookback is
    * checked AFTER the carry-forward: the newest touch overall is the
    * newest within the window whenever one exists, so the filter is
    * equivalent to windowed argmax (the oracle re-derives it as the
    * joined QUALIFY form to prove exactly that). At 100 TB this is the
    * attribution shape that survives: state per user is one struct, not
    * a history. */
  private def q71(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val touchT = "struct<t_ts:timestamp,t_id:bigint,t_type:string>"
    val u = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts"), col("event_id"),
        struct(col("ts").as("t_ts"), col("event_id").as("t_id"),
          col("event_type").as("t_type")).as("touch"),
        lit(null).cast("double").as("value"), lit(false).as("is_p"))
      .unionByName(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(null).cast(touchT).as("touch"),
          col("value"), lit(true).as("is_p")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("last_touch", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("is_p"))
      .select(col("value"),
        when(col("last_touch").isNotNull &&
            col("last_touch.t_ts") >= col("ts") - expr("INTERVAL 3 DAYS"),
          col("last_touch.t_type")).otherwise(lit("none")).as("attr_type"))
      .groupBy(col("attr_type"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  /** q74 — recursive CTE (SQL:1999 WITH RECURSIVE, new in Spark 4):
    * transitive closure over a synthetic binary-halving hierarchy on
    * part keys (parent(k) = k div 2 — every chain ends at 1, depth
    * ~log₂ k). Seeds are the p_size=50 parts; the walk enumerates each
    * seed's ancestor chain and aggregates exact integer facts per seed.
    * Each recursion step is a self-union iteration the engine drives to
    * fixpoint — the SQL-surface form of the iterative-join loop
    * `operators.Graph` hand-rolls for connected components. All-integer
    * output; DuckDB runs the same construct natively (its `//` is
    * Spark's `DIV`). */
  private def q74(s: SparkSession, d: String): DataFrame = {
    Tables.part(s, d).createOrReplaceTempView("p_q74")
    s.sql(
      """WITH RECURSIVE anc(seed, cur, depth) AS (
        |  SELECT p_partkey, p_partkey, 0 FROM p_q74 WHERE p_size = 50
        |  UNION ALL
        |  SELECT seed, cur DIV 2, depth + 1 FROM anc WHERE cur > 1)
        |SELECT seed, max(depth) AS max_depth, count(*) AS n_nodes,
        |  sum(cur) AS sum_keys
        |FROM anc GROUP BY seed""".stripMargin)
  }

  /** s08 — hybrid retrieval: BM25 lexical ranks fused with dense cosine
    * ranks by reciprocal-rank fusion (RRF, Cormack et al. SIGIR'09):
    * score(d) = Σ_lists 1/(60 + rank_d). The fixture's vec_id indexes
    * the same corpus as doc_id, so the two rankers disagree exactly the
    * way real lexical/dense retrievers do and the fusion is observable.
    * Cross-engine rank discipline: both branches rank over the ROUNDED
    * (4dp) score with an id tie-break — a total order on emitted values
    * — and the RRF sum is two fixed-order terms over small integers, so
    * the doubles are bit-identical. Scale: each branch ends in a
    * top-20 (TakeOrdered on the reduction); the fusion is a full-outer
    * join of two 20-row frames — nothing fact-sized moves. */
  private def s08(s: SparkSession, d: String): DataFrame = {
    val lex = t14(s, d).select(col("doc_id"), col("rnk").as("lex_rank"))
    val emb = Tables.embeddings(s, d)
    val q0 = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val sims = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q0))
      .select(col("vec_id").as("doc_id"),
        round(graft.plans.VectorFunctions.cosine(col("embedding"),
          col("qv")), 4).as("sim"))
    val vec = sims.orderBy(col("sim").desc, col("doc_id").asc).limit(20)
      .withColumn("vec_rank", row_number()
        .over(Window.orderBy(col("sim").desc, col("doc_id").asc))
        .cast("long"))
      .select(col("doc_id"), col("vec_rank"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        round(
          coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)), 6)
          .as("rrf"))
  }

  /** q75 — window idiom battery: the standard tricks for per-partition
    * facts no direct window function computes. (a) exact DISTINCT COUNT
    * over a partition = max(dense_rank) — count_distinct is not a
    * window function in either engine; (b) per-partition MEDIAN as a
    * windowed exact percentile on integer cents (×2 integer); (c) share
    * of partition total (ratio-to-report) from two exact integers,
    * rounded at 6dp — one division, identical operands both engines.
    * All three ride ONE (returnflag, linestatus) partitioning; the
    * dense_rank pass adds a second sort, not a second exchange. */
  private def q75(s: SparkSession, d: String): DataFrame = {
    val part = Seq(col("l_returnflag"), col("l_linestatus"))
    val byPart = Window.partitionBy(part: _*)
    val bySupp = Window.partitionBy(part: _*).orderBy(col("l_suppkey"))
    Tables.lineitem(s, d)
      .withColumn("cents",
        round(col("l_extendedprice") * 100, 0).cast("long"))
      .withColumn("dr", dense_rank().over(bySupp))
      .withColumn("n_supp", max(col("dr")).over(byPart).cast("long"))
      .withColumn("med2",
        (expr("percentile(cents, 0.5D)").over(byPart) * 2).cast("long"))
      .withColumn("share",
        round(col("cents").cast("double") /
          sum(col("cents")).over(byPart).cast("double"), 6))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_orderkey"), col("l_linenumber"), col("cents"),
        col("n_supp"), col("med2"), col("share"))
  }

  /** t22 — duplicated-passage removal with document reassembly: the
    * RefinedWeb/CCNet "line dedup" curation step, at 10-token chunk
    * granularity (the synthetic corpus carries no newlines). Chunk
    * every doc into non-overlapping passages, count DISTINCT docs per
    * passage, drop passages appearing in >= 2 docs, reassemble the
    * survivors in position order. The cross-doc frequency pass groups
    * on xxhash64(chunk) so the shuffle key is 8 bytes, never passage
    * text (d08 lemma: hash ≡ string modulo a 2⁻⁶⁴ collision that would
    * fail the gate deterministically, not flake). Reassembly is
    * sort_array(collect_list(struct(pos, chunk))) — order restored
    * from the data, never from arrival order, so the result is
    * partition-invariant. Oracle runs the passage STRINGS with
    * string_agg(... ORDER BY pos). */
  private def t22(s: SparkSession, d: String): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val len = 10
    val nChunks =
      greatest(ceil(size(toks) / lit(len.toDouble)), lit(1)).cast("int")
    val chunks = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(toks, i * len + 1, lit(len))))))
      .select(col("doc_id"), col("pos").cast("int").as("pos"),
        col("col").as("chunk"))
      .filter(col("chunk") =!= "")
      .withColumn("h", xxhash64(col("chunk")))
    // join ONLY the duplicated-hash set (df >= 2): the df==1 majority
    // never enters the build side, so the join input is the duplicated-
    // passage dictionary, not the corpus — AQE broadcasts it when small
    val dupTab = chunks.select(col("doc_id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("doc_df"))
      .filter(col("doc_df") >= 2)
    chunks.join(dupTab, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("doc_df").isNull, 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          sort_array(collect_list(when(col("doc_df").isNull,
            struct(col("pos"), col("chunk"))))),
          x => x.getField("chunk")), " ").as("clean_text"))
  }

  /** t33 — CONTENT-DEFINED chunking (the LBFS/FastCDC family): chunk
    * boundaries cut where a rolling 3-token window's hash satisfies a
    * modulus rule — cut AFTER token p iff md5(t[p-2] t[p-1] t[p])
    * starts with '0' (expected chunk ≈ 16 tokens) — so boundaries are
    * a function of LOCAL content: an insertion re-chunks only its
    * neighborhood, where t05/t22's fixed-size grid shifts every
    * downstream chunk. That stability is why CDC is the storage-dedup
    * standard; the emitted n_shared_chunks (chunks also present in
    * ANOTHER doc) is the dedup potential it exposes. The md5-prefix
    * rule (not xxhash64) keeps the boundary CONTRACT recomputable by
    * the oracle. Scale shape: per-token rows ride ONE per-doc exchange
    * (the lag and running-sum windows share it, q48 discipline); the
    * chunk-df probe joins only the duplicated-hash dictionary (t22's
    * df>=2 prune). Integer-exact. */
  private def t33(s: SparkSession, d: String): DataFrame = {
    val toksC = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val rows = Tables.documents(s, d)
      .select(col("doc_id"), toksC.as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), posexplode(col("toks")))
      .select(col("doc_id"), col("pos"), col("col").as("tok"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val flagged = rows.withColumn("flag",
      when(col("pos") >= 2 && substring(md5(concat_ws(" ",
        lag(col("tok"), 2).over(wd), lag(col("tok"), 1).over(wd),
        col("tok"))), 1, 1) === "0", 1L).otherwise(0L))
    val withChunk = flagged.withColumn("chunk_id",
      coalesce(sum(col("flag")).over(
        wd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val chunks = withChunk.groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("clen"),
        md5(array_join(transform(sort_array(collect_list(
          struct(col("pos"), col("tok")))), x => x.getField("tok")), " "))
          .as("ch"))
    val dup = chunks.select(col("doc_id"), col("ch")).distinct()
      .groupBy(col("ch")).agg(count(lit(1)).as("ddf"))
      .filter(col("ddf") >= 2)
    chunks.join(dup, Seq("ch"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), max(col("clen")).as("max_chunk"),
        sum(col("clen")).as("n_toks"),
        count(when(col("ddf").isNotNull, 1)).as("n_shared_chunks"))
  }

  /** t23 — shingle novelty: per doc, how many of its DISTINCT 3-token
    * shingles first appear in THIS doc (first = smallest owning
    * doc_id) — the standard contribution metric for incremental corpus
    * growth (a doc whose shingles all exist elsewhere adds nothing).
    * Exact integer counts. First-owner is a min over a window keyed on
    * the 8-byte shingle hash — one shuffle — and the per-doc rollup is
    * the second; text never shuffles. */
  private def t23(s: SparkSession, d: String): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val sh3 = when(size(col("toks")) < 3,
        array(concat_ws(" ", col("toks"))))
      .otherwise(transform(sequence(lit(0), size(col("toks")) - 3),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(3)))))
    val se = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), explode(array_distinct(sh3)).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
    val w = Window.partitionBy(col("h"))
    se.withColumn("first_doc", min(col("doc_id")).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
  }

  /** d11 — near-dup cluster canonicalization: the step AFTER d07's
    * connected components — pick one representative per cluster (max
    * n_chars, tie smallest doc_id: keep the richest copy) and report
    * what the dedup drops. Completes the near-dedup story: pairs (d04)
    * → clusters (d07) → keep/drop decision (here). The per-cluster
    * argmax is a WindowGroupLimit-shaped top-1, partitioned by
    * component — cluster sizes are bounded by the dup structure, never
    * by corpus size. Oracle: independent recursive-CTE closure (d07's)
    * + the same top-1 under a total order. */
  private def d11(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = TextDedup.tokenJaccardPairs(docs, "doc_id", "text",
      blockCol = "source", threshold = 0.5)
    val clusters = graft.operators.Graph.dupClusters(
        docs.select(col("doc_id")), pairs.select(col("id_a"), col("id_b")))
      .select(col("node").as("doc_id"), col("component"), col("cluster_size"))
    val w = Window.partitionBy(col("component"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    clusters.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("component"), col("doc_id").as("keep_id"),
        col("cluster_size"), (col("cluster_size") - 1).as("n_dropped"))
  }

  /** c06 — UniMax-style budget waterfilling across language strata +
    * exact stratified sampling: give every stratum its full doc count
    * while the budget allows (ascending waterfill), split the
    * remainder uniformly over the capped strata (floor share +
    * deterministic distribution of the modulo to the smallest capped
    * strata), then take exactly `alloc` docs per stratum by md5 rank.
    * The waterfill is CLOSED-FORM over per-stratum counts (funded_i ⇔
    * prefix_i + (S-i)·n_i ≤ T — no sequential recurrence), all integer
    * arithmetic. The per-stratum rank reuses t18's two-level trick:
    * the md5 key's 2-hex-char prefix hash-partitions the rank windows,
    * a tiny (stratum × 256)-row exclusive prefix forms base offsets,
    * and bases + allocations broadcast — no per-stratum single-
    * partition window, so a language holding 40% of a 100 TB corpus
    * still ranks in parallel. */
  private def c06(s: SparkSession, d: String): DataFrame = {
    // strata = lang (the skewed axis: en dominates) so the fixture
    // exercises all three branches: fully-funded small langs, floor
    // share for capped ones, modulo distribution (75% budget)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    val n = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val alloc = graft.operators.Curate.unimaxAlloc(n, "lang", 3L, 4L)
    graft.operators.Curate.md5RankByStratum(docs, "doc_id", "lang", "unimax")
      .join(broadcast(alloc), "lang")
      .filter(col("rn") <= col("alloc"))
      .select(col("doc_id"), col("lang"), col("rn"), col("alloc"))
  }

  /** c07 — balance-to-largest upsampling: the complement of c06's
    * budgeted DOWN-sampling — every language stratum is oversampled to
    * the largest stratum's count via integer repeat factors
    * (epoch-style corpus weighting): base = N_max div n_s repeats for
    * every doc, plus one extra epoch for the first (N_max mod n_s)
    * docs by md5 rank, so Σ n_repeats = N_max exactly per stratum.
    * Rank via the shared two-level [[Curate.md5RankByStratum]];
    * integer arithmetic → exact oracle. */
  private def c07(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    val n = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val alloc = n.crossJoin(broadcast(n.agg(max(col("n")).as("nmax"))))
      .select(col("lang"), expr("nmax div n").as("base_rep"),
        expr("nmax % n").as("extra"))
    graft.operators.Curate.md5RankByStratum(docs, "doc_id", "lang", "balance")
      .join(broadcast(alloc), "lang")
      .select(col("doc_id"), col("lang"), col("rn"),
        (col("base_rep") +
          when(col("rn") <= col("extra"), 1L).otherwise(0L)).as("n_repeats"))
  }

  /** c08 — DSIR importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every doc
    * by how much more likely its tokens are under a TARGET unigram LM
    * (the English stratum) than under the RAW corpus LM —
    * w(doc) = Σ_tok [ ln p̂_T(tok) − ln p̂_R(tok) ], add-1 smoothed
    * over the shared vocabulary. High weight ⇒ target-like text worth
    * upweighting. t13's exact float discipline: both engines evaluate
    * the identical ln-of-ratio terms (ULP drift ~1e-16/term), the sum
    * rounds stably at 4dp, and the exact token count rides along so
    * consumers can per-token normalize without a rounded avg. Scale
    * shape: one vocabulary-sized aggregate carrying BOTH corpus counts
    * (single pass; the lang predicate rides the count), AQE-broadcast
    * against the token stream, then a map-side-combined per-doc sum —
    * the corpus text itself never shuffles. */
  private def c08(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"),
        lit(0))).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(
      sum(col("cr")).cast("double").as("nr"),
      sum(col("ct")).cast("double").as("nt"),
      count(lit(1)).cast("double").as("v"))
    val lam = counts.crossJoin(broadcast(totals)).select(col("tok"),
      (log((col("ct") + 1).cast("double") / (col("nt") + col("v"))) -
        log((col("cr") + 1).cast("double") / (col("nr") + col("v"))))
        .as("lam"))
    toks.join(lam, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("lam")), 4).as("dsir_weight"),
        count(lit(1)).as("n_toks"))
  }

  /** c09 — temperature-based mixture allocation (the multilingual-LM
    * α-sampling scheme, α = 1/2: sampling weights ∝ n^α renormalized,
    * upweighting small language strata relative to their natural
    * share) via [[graft.operators.Curate.temperatureAlloc]]'s
    * largest-remainder integer apportionment (Σalloc = T exactly;
    * property-tested vs a sequential BigInt Hamilton reference in
    * CurateSpec). Selection reuses the two-level
    * [[graft.operators.Curate.md5RankByStratum]], so no stratum ranks
    * on one partition; the S-row allocation table broadcasts. */
  private def c09(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    val n = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val alloc = graft.operators.Curate.temperatureAlloc(n, "lang")
    graft.operators.Curate.md5RankByStratum(docs, "doc_id", "lang", "temper")
      .join(broadcast(alloc), "lang")
      .filter(col("rn") <= col("alloc"))
      .select(col("doc_id"), col("lang"), col("rn"), col("alloc"))
  }

  /** c10 — DSIR-select + temperature-mix, composed: the modern
    * data-selection pipeline in one statement. Keep documents whose
    * 4dp-rounded DSIR weight (c08's signal) is POSITIVE — i.e. more
    * target-like than the raw corpus; a thresholdless, rank-free gate
    * both engines decide identically on the rounded value — then
    * allocate the survivors across languages with
    * [[graft.operators.Curate.temperatureAlloc]] (c09's α-sampling)
    * and select by the shared two-level md5 rank. Proves c08's weight,
    * the Hamilton allocation, and the stratified rank COMPOSE with
    * every stage keeping its scale shape (vocab-sized broadcast,
    * S-row allocation, no data-sized global window). The oracle
    * re-derives the full chain independently. */
  private def c10(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"),
        lit(0))).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(
      sum(col("cr")).cast("double").as("nr"),
      sum(col("ct")).cast("double").as("nt"),
      count(lit(1)).cast("double").as("v"))
    val lam = counts.crossJoin(broadcast(totals)).select(col("tok"),
      (log((col("ct") + 1).cast("double") / (col("nt") + col("v"))) -
        log((col("cr") + 1).cast("double") / (col("nr") + col("v"))))
        .as("lam"))
    val kept = toks.join(lam, Seq("tok"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(round(sum(col("lam")), 4).as("dw"))
      .filter(col("dw") > 0)
    val n = kept.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val alloc = graft.operators.Curate.temperatureAlloc(n, "lang")
    graft.operators.Curate.md5RankByStratum(kept, "doc_id", "lang", "dsirmix")
      .join(broadcast(alloc), "lang")
      .filter(col("rn") <= col("alloc"))
      .select(col("doc_id"), col("lang"), col("dw"), col("rn"),
        col("alloc"))
  }

  /** g01 — integer PageRank centrality over the customer–supplier
    * trade graph ([[graft.operators.Graph.pageRankInt]]): nodes are
    * customers (2k) and suppliers (2k+1), one undirected edge per
    * DISTINCT trading pair from orders ⋈ lineitem, encoded as both
    * directions so every node owns an outdegree. 3 fixed iterations of
    * the exact millionths-scaled floor-division recurrence — bit-equal
    * on any engine, so the oracle replays the identical unrolled
    * arithmetic. The edge derivation is the scale story: the fact-fact
    * join shuffles on orderkey once, pairs dedup with a map-side
    * partial distinct, and each PR round is one node-sized join
    * against the checkpointed edge frame. */
  private def g01(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d)
      .select(col("o_orderkey").as("ok"), (col("o_custkey") * 2).as("c"))
      .join(Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), (col("l_suppkey") * 2 + 1).as("sp")),
        "ok")
      .select(col("c"), col("sp")).distinct()
    val edges = pairs.select(col("c").as("src"), col("sp").as("dst"))
      .unionByName(pairs.select(col("sp").as("src"), col("c").as("dst")))
    graft.operators.Graph.pageRankInt(edges, iters = 3)
  }

  /** g02 — WEIGHTED integer PageRank: g01's exact recurrence with mass
    * flowing proportionally to integer edge weights (trade intensity —
    * the distinct-order count each customer–supplier pair shares),
    * floor((pr·w) div Σw_out) per edge. Same bit-deterministic
    * arithmetic, same per-round node-sized join; the weight aggregation
    * replaces g01's pair-distinct with one partial-combined groupBy, so
    * the edge build costs the same single orderkey shuffle. */
  private def g02(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d)
      .select(col("o_orderkey").as("ok"), (col("o_custkey") * 2).as("c"))
      .join(Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), (col("l_suppkey") * 2 + 1).as("sp")),
        "ok")
      .groupBy(col("c"), col("sp"))
      .agg(countDistinct(col("ok")).as("w"))
    val edges = pairs
      .select(col("c").as("src"), col("sp").as("dst"), col("w"))
      .unionByName(pairs
        .select(col("sp").as("src"), col("c").as("dst"), col("w")))
    graft.operators.Graph.pageRankInt(edges, iters = 3)
  }

  /** g03 — PERSONALIZED integer PageRank
    * ([[graft.operators.Graph.pageRankIntPersonalized]]): g01's graph
    * and exact recurrence, but teleport mass restricted to a seed set
    * (nation-1 customers) — proximity-to-trusted-seeds ranking, the
    * curation form of topic-sensitive PageRank. Non-seed nodes hold
    * rank only through trade paths from the seeds; the per-node floor
    * rides the pinned node-universe frame, so the oracle's unrolled
    * replay must LEFT-join the same universe (zero-in-degree handling
    * is part of the contract, cross-checked by GraphSpec's directed
    * first-principles references). */
  private def g03(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d)
      .select(col("o_orderkey").as("ok"), (col("o_custkey") * 2).as("c"))
      .join(Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), (col("l_suppkey") * 2 + 1).as("sp")),
        "ok")
      .select(col("c"), col("sp")).distinct()
    val edges = pairs.select(col("c").as("src"), col("sp").as("dst"))
      .unionByName(pairs.select(col("sp").as("src"), col("c").as("dst")))
    val seeds = Tables.customer(s, d)
      .filter(col("c_nationkey") === 1)
      .select((col("c_custkey") * 2).as("node"))
    graft.operators.Graph.pageRankIntPersonalized(edges, seeds, iters = 3)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_clean_project" -> (q01 _),
    "q02_dedup_latest" -> (q02 _),
    "q02b_dedup_latest_agg" -> (q02b _),
    "q03_enrich_join" -> (q03 _),
    "q04_unique_assert" -> (q04 _),
    "q05_agg_pricing" -> (q05 _),
    "q06_filter_pushdown" -> (q06 _),
    "q07_topk_orders" -> (q07 _),
    "q08_set_ops" -> (q08 _),
    "q09_window_analytics" -> (q09 _),
    "q10_scalar_battery" -> (q10 _),
    "q11_semi_anti_join" -> (q11 _),
    "q12_rollup" -> (q12 _),
    "q13_distinct_exact" -> (q13 _),
    "q14_join_agg" -> (q14 _),
    "q15_events_tumbling" -> (q15 _),
    "q16_events_sessions" -> (q16 _),
    "q17_approx_distinct" -> (q17 _),
    "q18_asof_join" -> (q18 _),
    "q18b_asof_payload" -> (q18b _),
    "q18c_asof_forward" -> (q18c _),
    "q19_pivot" -> (q19 _),
    "q20_stats" -> (q20 _),
    "q21_string_agg" -> (q21 _),
    "q22_moving_avg" -> (q22 _),
    "q23_full_outer" -> (q23 _),
    "q24_cube" -> (q24 _),
    "q25_percentiles" -> (q25 _),
    "q26_salted_agg" -> (q26 _),
    "q27_tpch_q3" -> (q27 _),
    "q28_tpch_q5" -> (q28 _),
    "q29_histogram" -> (q29 _),
    "q30_json_extract" -> (q30 _),
    "q31_datetime" -> (q31 _),
    "q32_corr_subquery" -> (q32 _),
    "q33_bag_setops" -> (q33 _),
    "q34_window_nav" -> (q34 _),
    "q35_string_battery2" -> (q35 _),
    "q36_grouping_sets" -> (q36 _),
    "q37_range_join" -> (q37 _),
    "q38_bloom_join" -> (q38 _),
    "q39_events_dim_join" -> (q39 _),
    "q40_approx_quantiles" -> (q40 _),
    "l01_jsonl_roundtrip" -> (l01 _),
    "l03_orc_roundtrip" -> (l03 _),
    "l04_schema_evolution" -> (l04 _),
    "l05_avro_roundtrip" -> (l05 _),
    "l06_dpp_prune" -> (l06 _),
    "l07_compaction" -> (l07 _),
    "l08_zonemap_skip" -> (l08 _),
    "l09_time_travel" -> (l09 _),
    "l10_vacuum" -> (l10 _),
    "l11_merge_into" -> (l11 _),
    "l12_versioned_zonemap" -> (l12 _),
    "l13_table_changes" -> (l13 _),
    "l14_versioned_optimize" -> (l14 _),
    "l15_merge_delete" -> (l15 _),
    "l16_versioned_schema_evolution" -> (l16 _),
    "l17_zorder_optimize" -> (l17 _),
    "l18_timestamp_asof" -> (l18 _),
    "l19_cdf_ivm" -> (l19 _),
    "l20_clone" -> (l20 _),
    "l21_restore" -> (l21 _),
    "l22_append_feed" -> (l22 _),
    "l23_deletion_vectors" -> (l23 _),
    "l24_column_mapping" -> (l24 _),
    "l25_segmented_manifests" -> (l25 _),
    "l26_table_constraints" -> (l26 _),
    "l27_hidden_partitioning" -> (l27 _),
    "l28_bloom_index" -> (l28 _),
    "l29_table_history" -> (l29 _),
    "l30_merge_schema_evolution" -> (l30 _),
    "l31_partspec_evolution" -> (l31 _),
    "l32_type_widening" -> (l32 _),
    "l33_merge_dv" -> (l33 _),
    "l34_datasource_v2" -> (l34 _),
    "l35_datasource_v2_write" -> (l35 _),
    "c13_split_decontam" -> (c13 _),
    "c14_weighted_sample" -> (c14 _),
    "t33_cdc_chunking" -> (t33 _),
    "g09_incremental_cc" -> (g09 _),
    "g10_link_prediction" -> (g10 _),
    "c01_curation_pipeline" -> (c01 _),
    "c02_incremental_dedup" -> (c02 _),
    "t05_chunking" -> (t05 _),
    "t06_stopword_filter" -> (t06 _),
    "t07_vocabulary" -> (t07 _),
    "t08_hash_sample" -> (t08 _),
    "t09_redaction" -> (t09 _),
    "m01_multimodal_features" -> (m01 _),
    "m02_frame_sampling" -> (m02 _),
    "m03_image_resize" -> (m03 _),
    "m04_audio_stats" -> (m04 _),
    "d01_dedup_exact" -> (d01 _),
    "d02_dedup_minhash" -> (d02 _),
    "d03_dedup_simhash" -> (d03 _),
    "d04_token_jaccard" -> (d04 _),
    "d04b_token_jaccard_capped" -> (d04b _),
    "d05_embed_neardup" -> (d05 _),
    "d06_ngram_jaccard" -> (d06 _),
    "d07_dup_clusters" -> (d07 _),
    "t10_tfidf_keywords" -> (t10 _),
    "t11_repetition" -> (t11 _),
    "t12_heavy_hitters" -> (t12 _),
    "t13_lm_score" -> (t13 _),
    "t14_bm25" -> (t14 _),
    "t15_bigram_lm" -> (t15 _),
    "t16_containment" -> (t16 _),
    "t17_unicode_norm" -> (t17 _),
    "q41_array_battery" -> (q41 _),
    "q42_salted_join" -> (q42 _),
    "q43_range_frame" -> (q43 _),
    "q44_gap_fill" -> (q44 _),
    "q45_funnel" -> (q45 _),
    "q46_nullsafe_join" -> (q46 _),
    "t18_seq_pack" -> (t18 _),
    "d08_decontaminate" -> (d08 _),
    "d09_semdedup" -> (d09 _),
    "c03_corpus_mix" -> (c03 _),
    "c04_ccnet_buckets" -> (c04 _),
    "s01_ann_brute" -> (s01 _),
    "s02_ann_lsh" -> (s02 _),
    "s03_ann_ivf" -> (s03 _),
    "s04_label_centroids" -> (s04 _),
    "s05_ann_quantized" -> (s05 _),
    "t01_langid" -> (t01 _),
    "t02_text_quality" -> (t02 _),
    "t03_token_count" -> (t03 _),
    "t04_fingerprint" -> (t04 _),
    "q47_zorder_key" -> (q47 _),
    "q48_scd2_history" -> (q48 _),
    "q49_price_index" -> (q49 _),
    "q50_retention" -> (q50 _),
    "q51_cdc_apply" -> (q51 _),
    "q52_hll_sketches" -> (q52 _),
    "q53_transitions" -> (q53 _),
    "q54_profile" -> (q54 _),
    "d10_repeated_spans" -> (d10 _),
    "q55_topn_per_group" -> (q55 _),
    "q56_snapshot_diff" -> (q56 _),
    "q57_fuzzy_join" -> (q57 _),
    "c05_training_mix" -> (c05 _),
    "s06_mips_brute" -> (s06 _),
    "q58_grouped_percentiles" -> (q58 _),
    "t21_readability" -> (t21 _),
    "q59_unpivot" -> (q59 _),
    "q60_rank_battery" -> (q60 _),
    "q61_map_battery" -> (q61 _),
    "q62_subquery_battery" -> (q62 _),
    "q63_struct_battery" -> (q63 _),
    "q64_conditional_agg" -> (q64 _),
    "t20_bpe_pairs" -> (t20 _),
    "t19_inverted_index" -> (t19 _),
    "q65_ewma" -> (q65 _),
    "q66_outlier_fences" -> (q66 _),
    "q67_cms_freq" -> (q67 _),
    "s07_jl_distortion" -> (s07 _),
    "l02_csv_quarantine" -> (l02 _),
    "q68_twap" -> (q68 _),
    "q69_ohlc_bars" -> (q69 _),
    "q70_lateral" -> (q70 _),
    "q71_attribution" -> (q71 _),
    "q72_moving_median" -> (q72 _),
    "q73_abc_pareto" -> (q73 _),
    "q74_recursive_cte" -> (q74 _),
    "s08_hybrid_rrf" -> (s08 _),
    "q75_window_idioms" -> (q75 _),
    "t22_chunk_dedup" -> (t22 _),
    "t23_shingle_novelty" -> (t23 _),
    "d11_cluster_keep_best" -> (d11 _),
    "d12_minhash_estimate" -> (d12 _),
    "c06_unimax_mix" -> (c06 _),
    "s09_mmr_rerank" -> (s09 _),
    "m05_image_dhash" -> (m05 _),
    "m06_audio_fingerprint" -> (m06 _),
    "m07_video_fingerprint" -> (m07 _),
    "m08_image_neardup" -> (m08 _),
    "m09_caption_conflict" -> (m09 _),
    "q76_variant_battery" -> (q76 _),
    "c07_balance_upsample" -> (c07 _),
    "t24_pack_materialize" -> (t24 _),
    "t25_vocab_coverage" -> (t25 _),
    "c08_dsir_weights" -> (c08 _),
    "c09_temperature_mix" -> (c09 _),
    "c10_dsir_select_mix" -> (c10 _),
    "c11_soft_dedup_weights" -> (c11 _),
    "c12_split_holdout" -> (c12 _),
    "t26_approx_topk" -> (t26 _),
    "t28_quality_classifier" -> (t28 _),
    "t29_bpe_train" -> (t29 _),
    "t30_bpe_encode" -> (t30 _),
    "t31_calibration" -> (t31 _),
    "t32_padding_waste" -> (t32 _),
    "q77_topk_lifecycle" -> (q77 _),
    "q78_kll_quantiles" -> (q78 _),
    "q79_theta_setops" -> (q79 _),
    "q80_entity_resolution" -> (q80 _),
    "g01_pagerank" -> (g01 _),
    "g02_pagerank_weighted" -> (g02 _),
    "g03_pagerank_personalized" -> (g03 _),
    "g04_triangle_count" -> (g04 _),
    "g05_kcore" -> (g05 _),
    "g06_label_prop" -> (g06 _),
    "g07_two_hop" -> (g07 _),
    "g08_bfs_distance" -> (g08 _),
    "d13_source_overlap" -> (d13 _),
    "d14_incremental_lsh" -> (d14 _),
    "d15_index_takedown" -> (d15 _),
    "q87_join_size_profile" -> (q87 _),
    "q81_snapshot_maintain" -> (q81 _),
    "q82_quota_cap" -> (q82 _),
    "q83_skew_profile" -> (q83 _),
    "q84_outer_interval_join" -> (q84 _),
    "q85_dedup_tumbling" -> (q85 _),
    "q86_scd2_merge" -> (q86 _),
    "q88_ivm_agg" -> (q88 _),
    "q89_observe_metrics" -> (q89 _),
    "q90_dq_suite" -> (q90 _),
    "q91_poisson_bootstrap" -> (q91 _),
    "s10_ann_pq" -> (s10 _),
    "s11_hard_negatives" -> (s11 _),
    "s12_ann_filtered" -> (s12 _),
    "s13_kmeans_lloyd" -> (s13 _),
    "s14_embedding_drift" -> (s14 _),
    "s15_ann_persisted" -> (s15 _),
    "s16_ann_ivfadc" -> (s16 _),
    "s18_ann_ivfadc_persisted" -> (s18 _),
    "s19_crossmodal_search" -> (s19 _),
    "s20_ivfadc_incremental" -> (s20 _),
    "s21_ivfadc_takedown" -> (s21 _),
    "t27_bpe_pairs" -> (t27 _),
  )

  /** Bench-time substitutes for the contract-check queries: the checks
    * (d02/d03/d05/s02/s03/q17) deliberately compute an exact brute-force
    * ground truth NEXT TO the operator so the oracle can assert a
    * recall/error bound — that verification harness is O(N²) by design
    * and is not what a user of the operator executes. The bench measures
    * the operator itself; correctness still runs the full checks through
    * [[queries]]. */
  def benchOverrides: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the user-facing form: curated chunks via the MinHash prune (the
    // oracle's stats form re-runs the funnel with exact pairs 5×)
    "c01_curation_pipeline" -> ((s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      graft.operators.Curate.chunks(
        graft.operators.Curate.kept(docs, "doc_id", "text",
          exactPairs = false), "doc_id", "text")
    }),
    // l19's operator is the change-feed maintenance fold (commits +
    // feeds + re-combine); the in-path rebuild-equality join is the
    // oracle gate's harness (r11 verdict)
    "l19_cdf_ivm" -> ((s: SparkSession, d: String) =>
      l19Impl(s, d, rebuildCheck = false)),
    "q17_approx_distinct" -> ((s: SparkSession, d: String) =>
      Tables.lineitem(s, d).agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))),
    // the operator is the sketch agg; the global-sort rank check is
    // the contract harness
    "q40_approx_quantiles" -> ((s: SparkSession, d: String) =>
      Tables.orders(s, d).agg(expr(
        "approx_percentile(o_totalprice, " +
          "array(0.25D, 0.5D, 0.75D, 0.99D), 1000)").as("ap"))),
    "d02_dedup_minhash" -> ((s: SparkSession, d: String) =>
      TextDedup.minhashPairs(Tables.documents(s, d), "doc_id", "text")),
    "d03_dedup_simhash" -> ((s: SparkSession, d: String) =>
      TextDedup.simhashPairs(Tables.documents(s, d), "doc_id", "text")),
    "d05_embed_neardup" -> ((s: SparkSession, d: String) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d), threshold = 0.4)),
    "d09_semdedup" -> ((s: SparkSession, d: String) =>
      Similarity.semDedup(Tables.embeddings(s, d), threshold = 0.4)),
    "s02_ann_lsh" -> ((s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), k = 10)
    }),
    // the operator is sketch build + point probes on a fixed token
    // list; the exact heavy-hitter groupBy is the contract harness
    "q67_cms_freq" -> ((s: SparkSession, d: String) => {
      val toks = Tables.documents(s, d)
        .select(explode(zipfTokens).as("token"))
      val sk = toks.agg(count_min_sketch(col("token"),
        lit(0.001d), lit(0.99d), lit(42)).as("sk"))
      val probes = (1 to 10).map(r => s"zipf$r")
      sk.select(probes.map(t => graft.plans.CmsFunctions
        .cmsEstimate(col("sk"), lit(t)).as(s"est_$t")): _*)
    }),
    // the operator is the projection itself (write-time compression);
    // exact full-dim cosines are the contract harness
    "s07_jl_distortion" -> ((s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      val (_, dim) = Similarity.corpusStats(emb)
      emb.select(col("vec_id"),
        graft.plans.ProjectVectorFunctions.projectVector(
          col("embedding"), Similarity.hyperplanes(32, dim, 7L))
          .as("proj"))
    }),
    "s03_ann_ivf" -> ((s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 10,
        nProbe = 7)
    }),
    "s10_ann_pq" -> ((s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10), k = 10)
    }),
    "s16_ann_ivfadc" -> ((s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfAdcTopK(emb, emb.filter(col("vec_id") < 10), k = 10,
        m = 16, rerank = 500)
    }),
    "s12_ann_filtered" -> ((s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopKFiltered(emb, emb.filter(col("vec_id") < 10),
        k = 10, nProbe = 10)
    }),
    // the user-facing funnel runs the MinHash near-dup route (c01's
    // split); the exact-pairs route exists for the oracle's benefit
    "c05_training_mix" -> ((s: SparkSession, d: String) =>
      c05Funnel(s, d, exactPairs = false)),
    // the operator is the sketch build + union-merge; the exact
    // count_distinct next to it is the contract harness
    "q52_hll_sketches" -> ((s: SparkSession, d: String) => {
      val days = Tables.events(s, d)
        .select(Cleaning.dateToString(col("ts")).as("day"), col("user_id"))
      days.groupBy(col("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_total"))
    }),
    // d11's operator is the keep-best top-1 over ALREADY-computed d07
    // clusters — a pipeline clusters once and both d07 (labeling) and
    // d11 (selection) consume that one result; the registered query
    // recomputes the clustering only so its oracle stays
    // self-contained. d07 itself stays benched as the full pipeline.
    // the weight column on top of the SHARED persisted clustering —
    // like d11, a production pipeline computes the clusters once
    "c11_soft_dedup_weights" -> ((s: SparkSession, d: String) =>
      cachedClusters(s, d).select(col("doc_id"), col("cluster_size"),
        expr("1000000L div cluster_size").as("w_micro"))),
    // d14's operator is the delta probe against the PERSISTED lake
    // index (built once, ever); the registered query additionally runs
    // the full rebuild + exact brute-force truth — the equivalence and
    // recall harness the oracle gates
    "d14_incremental_lsh" -> ((s: SparkSession, d: String) => {
      val (tables, idx) = cachedLshIndex(s, d)
      val emb = Tables.embeddings(s, d)
      Similarity.probeNearDupDelta(emb.filter(col("vec_id") % 4 === 3),
        s.read.parquet(idx), emb.filter(col("vec_id") % 4 =!= 3),
        0.4, tables)
    }),
    // d15's operator is ONE retraction against an existing index; the
    // registered query also builds two indexes and re-scans all six
    // stores for the equivalence/purge booleans (the audit harness).
    // Each measured run restores the pristine index by file copy
    // (MB-scale) then retracts — what a pipeline executes per takedown.
    "d15_index_takedown" -> ((s: SparkSession, d: String) => {
      val (tables, pristine) = cachedTakedownIndex(s, d)
      val work = s"${pristine}_work"
      copyDir(pristine, work)
      val emb = Tables.embeddings(s, d)
      graft.streaming.EmbedStreams.retractIds(
        emb.filter(col("vec_id") % 10 === 7).select("vec_id"), work)
      // report the post-takedown store size (forces the work to finish)
      s.read.parquet(s"$work/vecs").agg(count(lit(1)).as("n_vecs_after"))
    }),
    // s15's operator is the query probe against the PERSISTED search
    // index; the registered query also runs the rebuild-form lshTopK +
    // brute-force truth (the equivalence/recall harness)
    "s15_ann_persisted" -> ((s: SparkSession, d: String) => {
      val (tables, idx) = cachedLshSearchIndex(s, d)
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopKOverIndex(emb, s.read.parquet(idx),
        emb.filter(col("vec_id") < 10), k = 10, tables)
    }),
    // s18's operator is the query probe against the PERSISTED IVFADC
    // index; the registered query also builds the index and runs the
    // rebuild-form + brute-force truth (the equivalence/recall harness)
    "s18_ann_ivfadc_persisted" -> ((s: SparkSession, d: String) => {
      val idx = cachedIvfAdcIndex(s, d)
      val emb = Tables.embeddings(s, d)
      Similarity.ivfAdcSearch(emb, idx, emb.filter(col("vec_id") < 10),
        k = 10, m = 16, rerank = 500)
    }),
    // s19's operator is the text-batch probe of the SAME persisted
    // image index; the brute-force cross-modal truth in the registered
    // query is the recall harness
    "s19_crossmodal_search" -> ((s: SparkSession, d: String) =>
      Similarity.ivfAdcSearch(Tables.embeddings(s, d),
        cachedIvfAdcIndex(s, d), crossModalQueries(s, d),
        k = 10, nProbe = 9, rerank = 500)),
    // s20's operator is the 4-batch frozen-index encode+commit ingest
    // plus ONE search over the grown index; the registered query also
    // re-encodes everything at once and searches TWICE (the
    // rebuild-equality harness a user never runs)
    "s20_ivfadc_incremental" -> ((s: SparkSession, d: String) => {
      import graft.sources.VersionedLake
      val emb = Tables.embeddings(s, d)
      val idx = cachedIvfAdcIndex(s, d)
      val lake = s"/tmp/graft_codeslakeb_${Integer.toHexString(d.hashCode)}"
      VersionedLake.reset(s, lake)
      val delta = emb.filter(col("vec_id") % 10 < 4)
        .withColumn("vec_id", col("vec_id") + 200000L)
      (0 to 3).foreach { r =>
        VersionedLake.commitBatchAppend(
          Similarity.encodeIvfAdc(
            delta.filter(pmod(col("vec_id"), lit(4)) === r), idx),
          "cell", lake, txn = r.toLong)
      }
      Similarity.ivfAdcSearch(emb.unionByName(delta),
        Similarity.IvfAdcIndex(idx.centroids, idx.codebook,
          idx.codes.unionByName(VersionedLake.readLatest(s, lake))),
        emb.filter(col("vec_id") < 10), k = 10, rerank = 500)
    }),
    // s21's operator is seed-ingest + ONE merge-delete takedown; the
    // registered query additionally re-encodes the surviving delta and
    // re-scans for survivors (the equivalence/purge harness)
    "s21_ivfadc_takedown" -> ((s: SparkSession, d: String) => {
      import graft.sources.VersionedLake
      val emb = Tables.embeddings(s, d)
      val idx = cachedIvfAdcIndex(s, d)
      val lake = s"/tmp/graft_cdtdlakeb_${Integer.toHexString(d.hashCode)}"
      VersionedLake.reset(s, lake)
      val delta = emb.filter(col("vec_id") % 10 < 4)
        .withColumn("vec_id", col("vec_id") + 200000L)
      (0 to 1).foreach { r =>
        VersionedLake.commitBatchAppend(
          Similarity.encodeIvfAdc(
            delta.filter(pmod(col("vec_id"), lit(2)) === r), idx),
          "cell", lake, txn = r.toLong)
      }
      val retract = delta.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("cand_id"))
      val tomb = VersionedLake.readLatest(s, lake)
        .join(broadcast(retract), Seq("cand_id"), "left_semi")
        .withColumn("is_delete", lit(true))
      VersionedLake.commitMerge(tomb, Seq("cand_id", "j"), "cell", lake,
        deleteCol = Some("is_delete"))
      VersionedLake.readLatest(s, lake)
        .agg(count(lit(1)).as("n_codes_after"))
    }),
    // d12's operator is signatures + the agreement join over a
    // persisted truth-pair frame; the registered query re-derives d06's
    // exact shingle-Jaccard truth from scratch only so its oracle is
    // self-contained (the benchOverrides rule)
    "d12_minhash_estimate" -> ((s: SparkSession, d: String) =>
      TextDedup.minhashEstimateOverPairs(Tables.documents(s, d),
        cachedShinglePairs(s, d), "doc_id", "text")),
    "d11_cluster_keep_best" -> ((s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val clusters = cachedClusters(s, d)
      val w = Window.partitionBy(col("component"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      clusters.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("component"), col("doc_id").as("keep_id"),
          col("cluster_size"), (col("cluster_size") - 1).as("n_dropped"))
    }))

  /** d07's cluster labeling computed once per sf dir and persisted —
    * the shared upstream for the d11 bench drive above. Persisting is
    * exactly what a production pipeline does with the clustering
    * result; without it Bench double-charges the 7 s clustering to
    * both d07 and d11. */
  private val clustersCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** d06's exact shingle-Jaccard truth pairs computed once per sf dir
    * and persisted — the shared upstream for the d12 bench drive (the
    * cachedClusters discipline: a pipeline derives the truth/candidate
    * pair set once, then every signature-quality probe reuses it). */
  private val shinglePairsCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def cachedShinglePairs(s: SparkSession, d: String): DataFrame =
    shinglePairsCache.getOrElseUpdate(d, {
      val p = TextDedup.shingleJaccardPairs(
        Tables.documents(s, d), "doc_id", "text").persist()
      p.count()
      p
    })

  /** d14's persisted base-corpus LSH index, built once per sf dir —
    * exactly what the lake holds in the continuous-ingest shape (st18);
    * the bench then measures only the delta probe. */
  private val lshIndexCache = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[Array[Array[Float]]], String)]
  private def cachedLshIndex(s: SparkSession, d: String)
      : (Seq[Array[Array[Float]]], String) =
    lshIndexCache.getOrElseUpdate(d, {
      val emb = Tables.embeddings(s, d)
      val (n, dim) = Similarity.corpusStats(emb)
      val tables = Similarity.nearDupTables(n, dim, 0.4)
      val idx = s"/tmp/graft_lshidx_bench_${Integer.toHexString(d.hashCode)}"
      Similarity.bandTable(emb.filter(col("vec_id") % 4 =!= 3), tables)
        .write.mode("overwrite").parquet(idx)
      (tables, idx)
    })

  /** d15's pristine two-batch index, built once per sf dir; each bench
    * run file-copies it and retracts against the copy. */
  private val takedownIndexCache = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[Array[Array[Float]]], String)]
  private def cachedTakedownIndex(s: SparkSession, d: String)
      : (Seq[Array[Array[Float]]], String) =
    takedownIndexCache.getOrElseUpdate(d, {
      val emb = Tables.embeddings(s, d)
      val (n, dim) = Similarity.corpusStats(emb)
      val tables = Similarity.nearDupTables(n, dim, 0.4)
      val idx =
        s"/tmp/graft_takedown_bench_${Integer.toHexString(d.hashCode)}"
      val p = java.nio.file.Paths.get(idx)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      graft.streaming.EmbedStreams.ingestBatch(
        emb.filter(col("vec_id") % 4 =!= 3), 0L, idx, tables, 0.4)
      graft.streaming.EmbedStreams.ingestBatch(
        emb.filter(col("vec_id") % 4 === 3), 1L, idx, tables, 0.4)
      (tables, idx)
    })

  private def copyDir(src: String, dst: String): Unit = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    val s0 = Paths.get(src); val d0 = Paths.get(dst)
    if (Files.exists(d0))
      Files.walk(d0).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
    Files.walk(s0).forEach { p =>
      val t = d0.resolve(s0.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }

  /** s15's full-corpus SEARCH index (s02 tuning), built once per sf
    * dir — distinct from d14's dedup index (different simFloor/recall
    * dials and a base-only corpus). */
  private val lshSearchIndexCache = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[Array[Array[Float]]], String)]
  private def cachedLshSearchIndex(s: SparkSession, d: String)
      : (Seq[Array[Array[Float]]], String) =
    lshSearchIndexCache.getOrElseUpdate(d, {
      val emb = Tables.embeddings(s, d)
      val (n, dim) = Similarity.corpusStats(emb)
      val tables = Similarity.nearDupTables(n, dim, 0.25, targetRecall = 0.9)
      val idx =
        s"/tmp/graft_lshsearch_bench_${Integer.toHexString(d.hashCode)}"
      Similarity.bandTable(emb, tables).write.mode("overwrite").parquet(idx)
      (tables, idx)
    })

  /** s18's full-corpus IVFADC index, built + persisted once per sf
    * dir — the bench then measures ONLY the search probe (the
    * production per-retrieval-batch cost), per the s15 discipline. */
  private val ivfAdcIndexCache = scala.collection.concurrent.TrieMap
    .empty[String, graft.operators.Similarity.IvfAdcIndex]
  private def cachedIvfAdcIndex(s: SparkSession, d: String)
      : graft.operators.Similarity.IvfAdcIndex =
    ivfAdcIndexCache.getOrElseUpdate(d, {
      val emb = Tables.embeddings(s, d)
      val root = s"/tmp/graft_ivfadc_bench_${Integer.toHexString(d.hashCode)}"
      val built = Similarity.buildIvfAdcIndex(emb, m = 16)
      built.centroids.write.mode("overwrite").parquet(s"$root/centroids")
      built.codebook.write.mode("overwrite").parquet(s"$root/codebook")
      built.codes.write.mode("overwrite").parquet(s"$root/codes")
      Similarity.IvfAdcIndex(
        s.read.parquet(s"$root/centroids"),
        s.read.parquet(s"$root/codebook"),
        s.read.parquet(s"$root/codes"))
    })

  private def cachedClusters(s: SparkSession, d: String): DataFrame =
    clustersCache.getOrElseUpdate(d, {
      val docs = Tables.documents(s, d)
      val pairs = TextDedup.tokenJaccardPairs(docs, "doc_id", "text",
        blockCol = "source", threshold = 0.5)
      val c = graft.operators.Graph.dupClusters(
          docs.select(col("doc_id")), pairs.select(col("id_a"), col("id_b")))
        .select(col("node").as("doc_id"), col("component"),
          col("cluster_size"))
        .persist()
      c.count()
      c
    })

  /** Bench-only batch extras (no oracle — the oracled d04/d04b cover
    * correctness): the same token-Jaccard pair ops over a Zipfian-
    * vocabulary derivative of the documents table. The fixture's ~100-
    * word flat vocabulary makes the df-cap nearly a no-op, so this is
    * where the stopword-shaped quadratic head actually appears — the
    * rank-r Zipf token lands in ~min(1, 30/r) of each block. Extra
    * tokens are pure deterministic arithmetic (hash → inverse-power
    * transform), no RNG state. */
  def benchExtras: Map[String, (SparkSession, String) => DataFrame] = {
    def zipfDocs(s: SparkSession, d: String): DataFrame = {
      // u ~ Uniform(0,1] per (doc, slot) from a hash; rank = floor(1/u)
      // gives P(rank = r) ~ 1/r^2 — a classic Zipf-ish tail with a
      // heavy head (rank 1 hits half the slots)
      val extra = transform(sequence(lit(1), lit(30)), i => {
        val u = (pmod(xxhash64(col("doc_id"), i), lit(1000000L))
          .cast("double") + lit(1.0)) / lit(1000000.0)
        concat(lit("zipf"),
          least(floor(lit(1.0) / u), lit(20000L)).cast("long"))
      })
      Tables.documents(s, d).withColumn("text",
        concat_ws(" ", col("text"), array_join(extra, " ")))
    }
    // q02's two dedup-latest plans measured on the grouping shape each
    // is FOR (r7 verdict item 4): the registered q02/q02b pair runs on
    // lineitem's near-distinct (suppkey, partkey) groups — the window
    // form's best case and the agg form's worst. This pair runs the
    // same contest on FAT groups ((returnflag, linestatus): 6 groups ×
    // ~100k rows): map-side max_by combine shuffles one row per
    // group-per-partition, while the window form shuffles every row
    // into 6 skewed partitions. The crossover numbers are cited in
    // Dedup.scala's scaladoc.
    def liSlim(s: SparkSession, d: String): DataFrame =
      Tables.lineitem(s, d).select(
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"),
        col("l_orderkey"), col("l_linenumber"))
    val fatKeys = Seq("l_returnflag", "l_linestatus")
    val fatOrd = struct(col("l_shipdate"), col("l_orderkey"),
      col("l_linenumber"))
    Map(
      "d04z_jaccard_zipf" -> ((s: SparkSession, d: String) =>
        TextDedup.tokenJaccardPairs(zipfDocs(s, d), "doc_id", "text",
          blockCol = "source", threshold = 0.5)),
      "d04bz_jaccard_zipf_capped" -> ((s: SparkSession, d: String) =>
        TextDedup.tokenJaccardPairs(zipfDocs(s, d), "doc_id", "text",
          blockCol = "source", threshold = 0.5, maxDfRatio = 0.8)),
      "q02z_dedup_fat_agg" -> ((s: SparkSession, d: String) =>
        Dedup.latestPerGroupAgg(liSlim(s, d), fatKeys, fatOrd,
          payload = Seq("l_shipdate", "l_orderkey", "l_linenumber"))),
      "q02zw_dedup_fat_window" -> ((s: SparkSession, d: String) =>
        Dedup.latestPerGroup(liSlim(s, d), fatKeys,
          Seq(col("l_shipdate").desc, col("l_orderkey").desc,
            col("l_linenumber").desc))),
      // l06's counter-measurement pair: the SAME join over a
      // PRE-STAGED lake (the write that dominates the registered l06
      // row lands once per JVM here), pruned vs DPP-off. With DPP off
      // every month's files are opened and the month predicate runs as
      // a post-scan join filter. Measured at sf0.1 the pair is at
      // PARITY (~0.7-0.8 s each, inside noise): the fixture's 84
      // partitions are KB-sized, so the skipped IO is worth about as
      // much as the prune's fixed subquery overhead — the honest
      // local reading. The prune's value scales with partition SIZE
      // (at production month sizes the un-pruned form reads 28x the
      // bytes); the 3-of-84 PartitionFilters plan shape pinned in
      // PlanShapeSpec is the contract, these rows keep the overhead
      // visible. DPP is an OPTIMIZER-TIME rule applied when the action
      // runs, so the conf toggle must wrap the EXECUTION, not the plan
      // construction (r9 advice: returning the lazy frame and restoring
      // the conf in `finally` made the toggle a no-op — both rows
      // measured with DPP on). Both rows therefore materialize INSIDE
      // the function via executedNow (l06y too, so the pair stays
      // like-for-like) and hand Bench a 3-row local frame whose
      // noop-write costs nothing.
      "l06y_dpp_query" -> ((s: SparkSession, d: String) =>
        executedNow(s, dppLakeQuery(s, d))),
      "l06z_dpp_off" -> { (s: SparkSession, d: String) =>
        val key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
        val prev = s.conf.getOption(key)
        s.conf.set(key, "false")
        try executedNow(s, dppLakeQuery(s, d))
        finally prev match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      })
  }

  /** Execute `df` NOW (inside the caller's conf window — optimizer
    * toggles like DPP bind at action time, not plan-construction time)
    * and return its rows as a LOCAL frame, so a downstream consumer's
    * action re-executes nothing under restored confs. Result-sized
    * collect: callers are small-aggregate queries (l06y/l06z: 3 rows). */
  private def executedNow(s: SparkSession, df: DataFrame): DataFrame = {
    val rows = df.collect()
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(rows: _*)), df.schema)
  }

  /** The l06 join+aggregate over a once-per-JVM staged lake — the
    * query-only form the l06y/l06z bench pair measures. */
  private val dppLakeCache = scala.collection.concurrent.TrieMap
    .empty[String, String]
  private def dppLakeQuery(s: SparkSession, d: String): DataFrame = {
    val lake = dppLakeCache.getOrElseUpdate(d, {
      val p = s"/tmp/graft_dpp_bench_${Integer.toHexString(d.hashCode)}"
      graft.sources.PartitionedLake.writeByMonth(
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_shipdate"),
        "l_shipdate", p)
      p
    })
    val dim = Tables.orders(s, d)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"))
      .filter(col("yr") === 1997 && col("qtr") === 1)
      .select("month").distinct()
    s.read.parquet(lake).join(dim, Seq("month"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
  }

  /** Bench-only streaming drives: the events table replayed as a file-
    * source stream through each stateful operator into the noop sink
    * (Trigger.AvailableNow, fresh checkpoint per run). Correctness of
    * the windowed semantics is gated by the batch twins (q15/q16) and
    * StreamingSpec; these rows make state-store-path regressions visible
    * in BENCH. */
  /** st22's drive body, shared between the registered gate form
    * (verify = true: LakeIvm asserts maintained == full recompute
    * after EVERY commit) and the bench operator form (verify = false:
    * the maintenance alone — the O(base) per-batch rebuild check is
    * verification harness, not what the operator executes; r11
    * verdict). Each micro-batch is a full-state restatement upserted
    * as an exactly-once commit; the commit's CHANGE FEED — never the
    * base table — maintains the per-month materialized aggregate.
    * Batches arrive in whatever file order the source lists — the
    * invariant is order-independent by construction. l19 is the
    * oracle-gated batch twin. */
  private def st22Drive(s: SparkSession, d: String,
                        verify: Boolean): Unit = {
    import java.nio.file.{Files, Path, Paths}
    import java.util.Comparator
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.VersionedLake
    def wipe(p: Path): Unit =
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => { Files.deleteIfExists(f); () })
    val srcFile = Paths.get(s"$d/lineitem.parquet")
    val stage = Paths.get(
      s"/tmp/graft_stream_ivm_${Integer.toHexString(d.hashCode)}")
    val marker = stage.resolve("_SUCCESS")
    val stale = !Files.exists(marker) ||
      Files.getLastModifiedTime(marker)
        .compareTo(Files.getLastModifiedTime(srcFile)) < 0
    if (stale) {
      wipe(stage)
      val li = ttSlimLineitem(s, d, dedupKeys = true)
        .select(col("l_orderkey"), col("l_linenumber"), col("month"),
          round(col("l_quantity") * 100, 0).cast("long").as("qty_c"))
      // 4 full-state restatements: step r adds line numbers up to
      // 4+r, retracts the orderkey%17==r slice, and restates lines
      // <= 2 by +100r cents — adds, removes, AND changes per step.
      // Each state lands as exactly ONE file moved into the stream
      // dir, so one micro-batch == one restatement.
      Files.createDirectories(stage)
      (0 to 3).foreach { r =>
        val tmp = Paths.get(s"${stage}_tmp$r")
        li.filter(col("l_linenumber") <= 4 + r)
          .filter(pmod(col("l_orderkey"), lit(17)) =!= r)
          .withColumn("qty_c", when(col("l_linenumber") <= 2,
            col("qty_c") + r * 100L).otherwise(col("qty_c")))
          .coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        val part = Files.list(tmp).filter(
          _.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        Files.move(part, stage.resolve(f"state-$r%02d.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        wipe(tmp)
      }
      Files.write(marker, Array.emptyByteArray)
    }
    val lake =
      s"/tmp/graft_stream_ivmlake_${Integer.toHexString(d.hashCode)}"
    val view =
      s"/tmp/graft_stream_ivmview_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    wipe(Paths.get(view))
    val ckpt = Files.createTempDirectory("graft_ckpt")
    try {
      val schema = s.read.parquet(stage.toString).schema
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      val q = graft.streaming.LakeIvm
        .maintainedView(src, lake, view, verify)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt.toString)
        .start()
      q.awaitTermination()
    } finally {
      org.apache.spark.sql.graftglue.GraftGlue.unloadStateStores()
      wipe(ckpt)
    }
    // one commit per micro-batch landed (the per-batch IVM
    // invariant already ran INSIDE each step)
    require(VersionedLake.versions(s, lake) == Seq(1, 2, 3, 4),
      "st22 expected one version per batch")
  }

  /** Bench-time operator forms for streaming drives whose registered
    * form carries an in-path verification harness (the benchOverrides
    * rule applied to [[streamingDrives]]): st22's registered drive
    * re-derives the view from the full base after every commit as its
    * gate — the bench measures the change-feed maintenance itself.
    * Correctness still runs the registered form through Verify-side
    * gates and StreamingSpec. */
  def streamingDriveOverrides
      : Map[String, (SparkSession, String) => Unit] = Map(
    "st22_stream_cdf_ivm" -> ((s: SparkSession, d: String) =>
      st22Drive(s, d, verify = false)))

  def streamingDrives: Map[String, (SparkSession, String) => Unit] = {
    import org.apache.spark.sql.streaming.Trigger
    def drive(f: (SparkSession, String, DataFrame) => DataFrame)
        : (SparkSession, String) => Unit =
      driveWith((s, d, src) => f(s, d, src).writeStream.format("noop"))
    def driveWith(mk: (SparkSession, String, DataFrame) =>
          org.apache.spark.sql.streaming.DataStreamWriter[
            org.apache.spark.sql.Row])
        : (SparkSession, String) => Unit =
      (s: SparkSession, d: String) => {
        // the events fixture stores TIMESTAMP(NANOS), which the vectorized
        // reader rejects — same nanosAsLong treatment as Tables.events,
        // but held for the QUERY's lifetime (micro-batch planning re-reads
        // footers after .start(), unlike the one-shot batch scan)
        val key = "spark.sql.legacy.parquet.nanosAsLong"
        val prev = s.conf.getOption(key)
        s.conf.set(key, "true")
        try {
          // FileStreamSource wants a DIRECTORY; the fixture is one file —
          // stage a byte-copy once per (sf, JVM) and reuse across runs so
          // the copy cost lands in the warmup pass, not the measurement.
          // Staleness guard: the stage dir is keyed on PATH only and
          // survives JVMs, so a driver-regenerated fixture at the same
          // path would otherwise silently keep serving old bytes —
          // re-copy whenever size or mtime diverges from the source.
          val srcFile = java.nio.file.Paths.get(s"$d/events.parquet")
          val stage = java.nio.file.Paths
            .get(s"/tmp/graft_stream_src_${Integer.toHexString(d.hashCode)}")
          val staged = stage.resolve("events.parquet")
          val stale = !java.nio.file.Files.exists(staged) ||
            java.nio.file.Files.size(staged) !=
              java.nio.file.Files.size(srcFile) ||
            java.nio.file.Files.getLastModifiedTime(staged) !=
              java.nio.file.Files.getLastModifiedTime(srcFile)
          if (stale) {
            java.nio.file.Files.createDirectories(stage)
            java.nio.file.Files.copy(srcFile, staged,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING,
              java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
          }
          val path = stage.toString
          val rawSchema = s.read.parquet(path).schema
          // same ts normalization as every batch consumer (nanos-as-long
          // AND ntz-era fixtures) — one conversion, defined in Tables
          val src = Tables.normalizeTs(
            s.readStream.schema(rawSchema).parquet(path))
          val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
          try {
            val q = mk(s, d, src)
              .trigger(Trigger.AvailableNow())
              .option("checkpointLocation", ckpt.toString)
              .start()
            q.awaitTermination()
          } finally {
            // a fresh-checkpoint run's state dir is never reused — drop
            // it from disk, and drop its state-store providers from the
            // executor: back-to-back drives otherwise accumulate
            // in-memory state maps, and the heap residue inflated the
            // LAST drive 3× in the full suite vs a quiet JVM
            org.apache.spark.sql.graftglue.GraftGlue.unloadStateStores()
            import java.nio.file.{Files, Path}
            import java.util.Comparator
            Files.walk(ckpt).sorted(Comparator.reverseOrder[Path]())
              .forEach(p => Files.deleteIfExists(p))
          }
        } finally prev match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      }
    Map(
      // the production per-ingest curation shape end to end: documents
      // replayed as 4 micro-batches (maxFilesPerTrigger=1 over a
      // 4-file staging), each batch probed against the corpus the
      // PREVIOUS batches accumulated (Curate.incremental — cost ∝
      // delta) and its survivors appended replay-idempotently
      // (PartitionedLake.upsertBatchKeyed). StreamingSpec gates the
      // accumulate/replay semantics; this row benches it.
      "st11_stream_incremental_dedup" ->
        ((s: SparkSession, d: String) => {
          import java.nio.file.{Files, Path, Paths}
          import java.util.Comparator
          def wipe(p: Path): Unit =
            if (Files.exists(p))
              Files.walk(p).sorted(Comparator.reverseOrder[Path]())
                .forEach(f => { Files.deleteIfExists(f); () })
          // stage once per (sf, JVM); range-split so file contents are
          // deterministic; staleness-guarded on the fixture's mtime
          val srcFile = Paths.get(s"$d/documents.parquet")
          val stage = Paths.get(
            s"/tmp/graft_stream_docs_${Integer.toHexString(d.hashCode)}")
          val marker = stage.resolve("_SUCCESS")
          val stale = !Files.exists(marker) ||
            Files.getLastModifiedTime(marker)
              .compareTo(Files.getLastModifiedTime(srcFile)) < 0
          if (stale) {
            wipe(stage)
            Tables.documents(s, d)
              .repartitionByRange(4, col("doc_id"))
              .write.mode("overwrite").parquet(stage.toString)
          }
          // fresh corpus + checkpoint per run: the measurement is the
          // whole 4-batch ingest against a growing store
          val corpus = Paths.get(
            s"/tmp/graft_stream_corpus_${Integer.toHexString(d.hashCode)}")
          wipe(corpus)
          val ckpt = Files.createTempDirectory("graft_ckpt")
          try {
            val schema = s.read.parquet(stage.toString).schema
            val src = s.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(stage.toString)
            val q = graft.streaming.DocStreams
              .incrementalDedupIngest(src, corpus.toString)
              .trigger(Trigger.AvailableNow())
              .option("checkpointLocation", ckpt.toString)
              .start()
            q.awaitTermination()
          } finally {
            org.apache.spark.sql.graftglue.GraftGlue.unloadStateStores()
            wipe(ckpt)
          }
        }),
      // the embedding-modality twin of st11: 4 micro-batches of
      // vectors, each probed against the PERSISTED LSH band table the
      // previous batches accumulated (EmbedStreams — cost ∝ delta),
      // pairs + index rows appended replay-idempotently. d14 gates the
      // full-rebuild equivalence in batch form; StreamingSpec gates
      // the replay semantics; this row benches the whole ingest.
      "st18_stream_embed_dedup" ->
        ((s: SparkSession, d: String) => {
          import java.nio.file.{Files, Path, Paths}
          import java.util.Comparator
          def wipe(p: Path): Unit =
            if (Files.exists(p))
              Files.walk(p).sorted(Comparator.reverseOrder[Path]())
                .forEach(f => { Files.deleteIfExists(f); () })
          val srcFile = Paths.get(s"$d/embeddings.parquet")
          val stage = Paths.get(
            s"/tmp/graft_stream_emb_${Integer.toHexString(d.hashCode)}")
          val marker = stage.resolve("_SUCCESS")
          val stale = !Files.exists(marker) ||
            Files.getLastModifiedTime(marker)
              .compareTo(Files.getLastModifiedTime(srcFile)) < 0
          if (stale) {
            wipe(stage)
            Tables.embeddings(s, d)
              .repartitionByRange(4, col("vec_id"))
              .write.mode("overwrite").parquet(stage.toString)
          }
          val emb = Tables.embeddings(s, d)
          val (n, dim) = Similarity.corpusStats(emb)
          val tables = Similarity.nearDupTables(n, dim, 0.4)
          // fresh index + checkpoint per run: the measurement is the
          // whole 4-batch ingest against a growing lake index
          val idx = Paths.get(
            s"/tmp/graft_stream_lshidx_${Integer.toHexString(d.hashCode)}")
          wipe(idx)
          val ckpt = Files.createTempDirectory("graft_ckpt")
          try {
            val schema = s.read.parquet(stage.toString).schema
            val src = s.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(stage.toString)
            val q = graft.streaming.EmbedStreams
              .incrementalEmbedDedup(src, idx.toString, tables, 0.4)
              .trigger(Trigger.AvailableNow())
              .option("checkpointLocation", ckpt.toString)
              .start()
            q.awaitTermination()
          } finally {
            org.apache.spark.sql.graftglue.GraftGlue.unloadStateStores()
            wipe(ckpt)
          }
        }),
      "st01_stream_tumbling" ->
        drive((_, _, src) => graft.streaming.EventStreams.tumblingAgg(src)),
      "st02_stream_sessions" ->
        drive((_, _, src) =>
          graft.streaming.EventStreams.sessionWindowAgg(src)),
      "st03_stream_dedup" ->
        drive((_, _, src) =>
          graft.streaming.EventStreams.dedupWithinWatermark(src)),
      "st04_stream_interval_join" ->
        drive((_, _, src) => graft.streaming.EventStreams.clickErrorJoin(src)),
      "st15_stream_outer_interval_join" ->
        drive((_, _, src) =>
          graft.streaming.EventStreams.clickErrorJoinLeftOuter(src)),
      "st16_stream_dedup_tumbling" ->
        drive((_, _, src) =>
          graft.streaming.EventStreams.dedupedTumblingAgg(src)),
      // observed ingest metrics riding the tumbling-agg scan (q89's
      // one-pass observability contract in streaming form; per-batch
      // counter semantics gated in StreamingSpec)
      "st17_stream_observed" ->
        drive((_, _, src) =>
          graft.streaming.EventStreams.observedTumblingAgg(src)),
      // RocksDB twin of st04 — the scale-correct backend for large
      // stream-stream join state (HDFSBacked keeps every key on-heap;
      // RocksDB spills to local disk and bounds executor memory at
      // 100 TB state). Benched NEXT TO the default-provider row so the
      // backend delta stays visible round-over-round ("z" suffix sorts
      // it directly after st04 in the deterministic drive order).
      "st04z_interval_join_rocksdb" -> { (s: SparkSession, d: String) =>
        val key = "spark.sql.streaming.stateStore.providerClass"
        // changelog checkpointing (SPARK-43421): commit uploads the
        // per-batch delta instead of snapshotting the full RocksDB
        // instance — the production setting for large join state,
        // which shaves the per-batch commit overhead this drive
        // documents vs st04's default provider
        val ckKey = "spark.sql.streaming.stateStore.rocksdb." +
          "changelogCheckpointing.enabled"
        val prev = s.conf.getOption(key)
        val prevCk = s.conf.getOption(ckKey)
        s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
          "state.RocksDBStateStoreProvider")
        s.conf.set(ckKey, "true")
        try drive((_, _, src) =>
          graft.streaming.EventStreams.clickErrorJoin(src))(s, d)
        finally {
          prev match {
            case Some(v) => s.conf.set(key, v)
            case None => s.conf.unset(key)
          }
          prevCk match {
            case Some(v) => s.conf.set(ckKey, v)
            case None => s.conf.unset(ckKey)
          }
        }
      },
      "st07_stream_sliding" ->
        drive((_, _, src) => graft.streaming.EventStreams.slidingAgg(src)),
      // the sketch family in the stream: windowed HLL distinct-users —
      // KBs of state per window vs an exact distinct's every-user-id
      "st10_stream_approx_distinct" ->
        drive((_, _, src) =>
          graft.streaming.EventStreams.tumblingApproxDistinct(src)),
      // frequent-items sketch in the stream: windowed approx_top_k
      // heavy hitters (t26/q77's mergeable sketch as window state)
      "st13_stream_topk" ->
        drive((_, _, src) =>
          graft.streaming.EventStreams.tumblingTopK(src)),
      "st05_stream_dim_join" ->
        drive((s, d, src) => graft.streaming.EventStreams
          .enrichedTumblingAgg(src, Tables.customer(s, d))),
      // the arbitrary-state path (flatMapGroupsWithState): AvailableNow
      // on one file is a single micro-batch, so what's measured is the
      // per-key state-machine ingest (the dominant cost) — event-time
      // timeouts need a later batch to fire and emit nothing here
      // stateless pass-through baseline: source ingest + codegen
      // projection only, no state store — the throughput floor the
      // stateful rows (st01-st07) are read against
      "st08_stream_stateless" ->
        drive((_, _, src) => src
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"),
            (col("value") * 2).as("v2"))),
      // real ingest: micro-batches upserted into a month-partitioned
      // lake under (month, ingest_batch) — replay-idempotent
      // (StreamingSpec gates the semantics); measures actual parquet
      // write throughput, so it's the cost ceiling next to st08's floor
      "st09_stream_lake_sink" ->
        driveWith((s, d, src) => {
          // fixed path, wiped at run start: each measured pass ingests
          // into an empty lake and nothing accumulates across runs
          val lake = java.nio.file.Paths.get(
            s"/tmp/graft_stream_lake_${Integer.toHexString(d.hashCode)}")
          if (java.nio.file.Files.exists(lake)) {
            import java.nio.file.{Files, Path}
            import java.util.Comparator
            Files.walk(lake).sorted(Comparator.reverseOrder[Path]())
              .forEach(p => Files.deleteIfExists(p))
          }
          graft.streaming.EventStreams.toLake(src, lake.toString)
        }),
      // keyed-store maintenance: each micro-batch's changes MERGE into
      // a bucket-partitioned snapshot, rewriting only affected buckets
      // (q81 is the oracle-gated batch twin of the normalization +
      // apply kernel; StreamingSpec drives accumulate + replay)
      "st12_stream_snapshot_cdc" ->
        driveWith((s, d, src) => {
          val store = java.nio.file.Paths.get(
            s"/tmp/graft_stream_snap_${Integer.toHexString(d.hashCode)}")
          if (java.nio.file.Files.exists(store)) {
            import java.nio.file.{Files, Path}
            import java.util.Comparator
            Files.walk(store).sorted(Comparator.reverseOrder[Path]())
              .forEach(p => Files.deleteIfExists(p))
          }
          graft.streaming.SnapshotCdc.userSnapshotSink(src, store.toString)
        }),
      "st06_stream_stateful_sessions" ->
        drive((s, _, src) => {
          implicit val sp: SparkSession = s
          import s.implicits._
          graft.streaming.EventStreams.sessionizeStateful(
            src.select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"), col("props"))
              .as[graft.model.Rows.Event]).toDF()
        }),
      // transformWithState (arbitrary-state v2) quota enforcement —
      // requires the RocksDB provider, same conf wrap as st04z
      "st14_stream_quota_tws" -> { (s: SparkSession, d: String) =>
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
          "state.RocksDBStateStoreProvider")
        try drive((ss, _, src) => {
          import ss.implicits._
          graft.streaming.Quota.enforce(
            src.select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"), col("props"))
              .as[graft.model.Rows.Event]).toDF()
        })(s, d)
        finally prev match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      },
      // ingest + MAINTENANCE in one drive: st09's per-batch upsert
      // leaves one (month, ingest_batch) dir per micro-batch — the
      // small-file debt a continuous ingest accrues; compactAll then
      // folds each month to ONE file, retiring the ingest_batch
      // partition level into a plain column (exactly the "compacted
      // away by the maintenance path" step PartitionedLake.upsertBatch
      // promises). The measured row is the full ingest+compact cycle;
      // a content change aborts the drive loudly (count +
      // order-insensitive signature re-read from the lake either side
      // of the rewrite; layout semantics gated in StreamingSpec).
      "st19_stream_lake_compact" -> { (s: SparkSession, d: String) =>
        val lake = java.nio.file.Paths.get(
          s"/tmp/graft_stream_lakec_${Integer.toHexString(d.hashCode)}")
        if (java.nio.file.Files.exists(lake)) {
          import java.nio.file.{Files, Path}
          import java.util.Comparator
          Files.walk(lake).sorted(Comparator.reverseOrder[Path]())
            .forEach(p => Files.deleteIfExists(p))
        }
        driveWith((_, _, src) =>
          graft.streaming.EventStreams.toLake(src, lake.toString))(s, d)
        def sig() = s.read.parquet(lake.toString)
          .agg(count(lit(1)).as("n"), expr(
            "bit_xor(xxhash64(event_id, user_id, month, ingest_batch))")
            .as("sig"))
          .collect().head
        val before = sig()
        graft.sources.PartitionedLake.compactAll(s, lake.toString, "month")
        val after = sig()
        require(before == after,
          s"st19 compaction changed lake content: $before vs $after")
      },
      // streaming ingest into the VERSIONED lake (st19's cycle on the
      // l09/l10 commit log): 4 micro-batches, each an exactly-once
      // txn-deduped APPEND commit — every batch a readable snapshot,
      // replay skipped at the commit. The drive asserts the whole
      // contract: one version per batch, latest content == source
      // (count + order-insensitive signature), and a replayed last
      // batch neither forks history nor changes content.
      "st20_stream_versioned_ingest" -> { (s: SparkSession, d: String) =>
        import java.nio.file.{Files, Path, Paths}
        import java.util.Comparator
        import graft.sources.VersionedLake
        def wipe(p: Path): Unit =
          if (Files.exists(p))
            Files.walk(p).sorted(Comparator.reverseOrder[Path]())
              .forEach(f => { Files.deleteIfExists(f); () })
        // stage once per (sf, JVM); range-split on event_id so the 4
        // batch payloads are deterministic; staleness-guarded
        val srcFile = Paths.get(s"$d/events.parquet")
        val stage = Paths.get(
          s"/tmp/graft_stream_vev_${Integer.toHexString(d.hashCode)}")
        val marker = stage.resolve("_SUCCESS")
        val stale = !Files.exists(marker) ||
          Files.getLastModifiedTime(marker)
            .compareTo(Files.getLastModifiedTime(srcFile)) < 0
        if (stale) {
          wipe(stage)
          Tables.events(s, d)
            .repartitionByRange(4, col("event_id"))
            .write.mode("overwrite").parquet(stage.toString)
        }
        val lake =
          s"/tmp/graft_stream_vlake_${Integer.toHexString(d.hashCode)}"
        VersionedLake.reset(s, lake)
        val ckpt = Files.createTempDirectory("graft_ckpt")
        try {
          val schema = s.read.parquet(stage.toString).schema
          val src = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(stage.toString)
          val q = graft.streaming.EventStreams
            .toVersionedLake(src, lake)
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", ckpt.toString)
            .start()
          q.awaitTermination()
        } finally {
          org.apache.spark.sql.graftglue.GraftGlue.unloadStateStores()
          wipe(ckpt)
        }
        val vs = VersionedLake.versions(s, lake)
        require(vs == Seq(1, 2, 3, 4),
          s"st20 expected one version per batch, got $vs")
        def sig(df: DataFrame) = df
          .agg(count(lit(1)).as("n"),
            expr("bit_xor(xxhash64(event_id, user_id))").as("sig"))
          .collect().head
        val srcSig = sig(s.read.parquet(stage.toString))
        require(sig(VersionedLake.readLatest(s, lake)) == srcSig,
          "st20 latest version diverges from the ingested source")
        // checkpoint replay of the last batch: same txn -> no-op
        val replay = s.read.parquet(stage.toString).limit(5)
          .withColumn("month", date_format(col("ts"), "yyyy-MM"))
        require(VersionedLake.commitBatchUpsert(replay, "month", lake,
            txn = 3L) == 4, "st20 replayed txn forked history")
        require(sig(VersionedLake.readLatest(s, lake)) == srcSig,
          "st20 replayed txn changed content")
      },
      // streaming IVFADC maintenance (st20's exactly-once commit log
      // carrying s18's index): 4 micro-batches of NEW vectors, each
      // assigned + PQ-encoded against the FROZEN coarse/PQ codebooks
      // (never retrained) and appended to a cell-partitioned versioned
      // codes table. The drive asserts the whole contract: one version
      // per batch, accumulated codes == one-shot encode of everything
      // (count + order-insensitive signature — the s20 oracle gates
      // full set equality), replayed txn a no-op. Measures the
      // ingest-side lifecycle; s20's bench override measures
      // ingest + search.
      "st21_stream_ivfadc_ingest" -> { (s: SparkSession, d: String) =>
        import java.nio.file.{Files, Path, Paths}
        import java.util.Comparator
        import graft.sources.VersionedLake
        def wipe(p: Path): Unit =
          if (Files.exists(p))
            Files.walk(p).sorted(Comparator.reverseOrder[Path]())
              .forEach(f => { Files.deleteIfExists(f); () })
        val srcFile = Paths.get(s"$d/embeddings.parquet")
        val stage = Paths.get(
          s"/tmp/graft_stream_ivf_${Integer.toHexString(d.hashCode)}")
        val marker = stage.resolve("_SUCCESS")
        val stale = !Files.exists(marker) ||
          Files.getLastModifiedTime(marker)
            .compareTo(Files.getLastModifiedTime(srcFile)) < 0
        val delta = Tables.embeddings(s, d)
          .filter(col("vec_id") % 10 < 4)
          .withColumn("vec_id", col("vec_id") + 200000L)
        if (stale) {
          wipe(stage)
          delta.repartitionByRange(4, col("vec_id"))
            .write.mode("overwrite").parquet(stage.toString)
        }
        val idx = cachedIvfAdcIndex(s, d)
        val lake =
          s"/tmp/graft_stream_codes_${Integer.toHexString(d.hashCode)}"
        VersionedLake.reset(s, lake)
        val ckpt = Files.createTempDirectory("graft_ckpt")
        try {
          val schema = s.read.parquet(stage.toString).schema
          val src = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(stage.toString)
          val q = graft.streaming.EmbedStreams
            .ivfAdcCodesIngest(src, idx, lake)
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", ckpt.toString)
            .start()
          q.awaitTermination()
        } finally {
          org.apache.spark.sql.graftglue.GraftGlue.unloadStateStores()
          wipe(ckpt)
        }
        val vs = VersionedLake.versions(s, lake)
        require(vs == Seq(1, 2, 3, 4),
          s"st21 expected one version per batch, got $vs")
        def sig(df: DataFrame) = df
          .agg(count(lit(1)).as("n"),
            expr("bit_xor(xxhash64(cand_id, cell, j, code))").as("sig"))
          .collect().head
        val want = sig(graft.operators.Similarity.encodeIvfAdc(delta, idx))
        require(sig(VersionedLake.readLatest(s, lake)) == want,
          "st21 streamed codes diverge from the one-shot encode")
        // checkpoint replay of the last batch: same txn -> no-op
        require(VersionedLake.commitBatchAppend(
          graft.operators.Similarity.encodeIvfAdc(delta.limit(2), idx),
          "cell", lake, txn = 3L) == 4,
          "st21 replayed txn forked history")
        require(sig(VersionedLake.readLatest(s, lake)) == want,
          "st21 replayed txn changed content")
      },
      // change-feed-driven IVM (st22): each micro-batch is a full-state
      // restatement upserted as an exactly-once commit; the commit's
      // CHANGE FEED — never the base table — maintains the per-month
      // materialized aggregate, and LakeIvm.step REQUIRES maintained ==
      // full recompute after EVERY commit (l19 is the oracle-gated
      // batch twin). Batches arrive in whatever file order the source
      // lists — the invariant is order-independent by construction.
      "st22_stream_cdf_ivm" -> ((s: SparkSession, d: String) =>
        st22Drive(s, d, verify = true)),
      // the versioned lake as a STREAMING SOURCE (st23): st20's txn
      // ingest on the write side, and on the READ side a version-
      // cursor poll loop consuming appendsBetween — each step reads
      // ONLY the newly appended files (cost ∝ delta; the base is never
      // re-read). The drive asserts the consumed union equals the full
      // table (count + order-insensitive signature folded across
      // steps — appends are disjoint, so the XOR of step signatures
      // IS the table's signature).
      "st23_stream_lake_source" -> { (s: SparkSession, d: String) =>
        import graft.sources.VersionedLake
        val lake = stageVersionedEventsLake(s, d)
        // the consumption side: cursor 0 -> latest, one poll per commit
        val latest = VersionedLake.latestVersion(s, lake)
        require(latest == 4, s"st23 expected 4 ingest commits, got $latest")
        var cursor = 0
        var n = 0L
        var sig = 0L
        while (cursor < latest) {
          val (sn, ss) = lakeFeedSig(
            VersionedLake.appendsBetween(s, lake, cursor, cursor + 1))
          n += sn; sig ^= ss
          cursor += 1
        }
        val (wantN, wantSig) =
          lakeFeedSig(VersionedLake.readLatest(s, lake))
        require(n == wantN && sig == wantSig,
          s"st23 consumed feed diverges from the table: ($n, $sig) vs " +
            s"($wantN, $wantSig)")
      },
      // ADMISSION CONTROL on the lake streaming source (st24): st23's
      // cursor loop, but a BURST of commits lands before the reader
      // polls, and each poll admits at most maxFiles files
      // (VersionedLake.pollAppends — Delta's maxFilesPerTrigger): the
      // burst drains over exactly ceil(files/maxFiles) polls with
      // sub-version cursor progress, and the consumed union still
      // equals the table (count + XOR signature — the st23 identity).
      "st24_stream_lake_admission" -> { (s: SparkSession, d: String) =>
        import graft.sources.VersionedLake
        val lake = stageVersionedEventsLake(s, d)
        val latest = VersionedLake.latestVersion(s, lake)
        require(latest == 4, s"st24 expected 4 ingest commits, got $latest")
        // every entry at the head is an appended file (append-only lake)
        val totalFiles = VersionedLake.manifestFiles(s, lake, latest).size
        val maxFiles = 2
        var cursor = (0, 0)
        var polls = 0
        var n = 0L
        var sig = 0L
        while (cursor != ((latest, 0))) {
          val (batch, next) =
            VersionedLake.pollAppends(s, lake, cursor, maxFiles)
          require(next != cursor, s"st24 poll made no progress at $cursor")
          val (sn, ss) = lakeFeedSig(batch)
          n += sn; sig ^= ss
          cursor = next
          polls += 1
        }
        require(polls == (totalFiles + maxFiles - 1) / maxFiles,
          s"st24 expected ceil($totalFiles/$maxFiles) polls, got $polls")
        val (wantN, wantSig) =
          lakeFeedSig(VersionedLake.readLatest(s, lake))
        require(n == wantN && sig == wantSig,
          s"st24 consumed feed diverges from the table: ($n, $sig) vs " +
            s"($wantN, $wantSig)")
      },
      // GOVERNED streaming ingest (st25): st23's exactly-once txn
      // ingest composed with hidden partitioning (l27 — the partition
      // derives through the lake's RECORDED month(ts) transform inside
      // the sink, never a sink-side formula) and table constraints
      // (l26 — a violating micro-batch ABORTS before any version is
      // claimed: the quality gate lives in the table and no stream can
      // bypass it). Asserts: one txn commit per batch, derived
      // partitions well-formed, a transform-pruned month read equals
      // the plain filter, checkpoint replay is a no-op, and the
      // violating batch mints nothing while a clean one still lands.
      "st25_stream_governed_lake" -> { (s: SparkSession, d: String) =>
        import org.apache.spark.sql.streaming.Trigger
        import graft.sources.{HiddenPartitioning => HP, VersionedLake}
        val stage = stagedEventFiles(s, d)
        val lake =
          s"/tmp/graft_stream_gvrn_${Integer.toHexString(d.hashCode)}"
        VersionedLake.reset(s, lake)
        HP.define(s, lake, HP.Spec("ts", HP.Month))
        val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
        try {
          val schema = s.read.parquet(stage).schema
          val src = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(stage)
          val q = graft.streaming.EventStreams.toGovernedLake(src, lake)
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", ckpt.toString)
            .start()
          q.awaitTermination()
        } finally {
          org.apache.spark.sql.graftglue.GraftGlue.unloadStateStores()
          java.nio.file.Files.walk(ckpt)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
        }
        val latest = VersionedLake.latestVersion(s, lake)
        require(latest == 4, s"st25 expected 4 txn commits, got $latest")
        val parts = VersionedLake.manifestFiles(s, lake, latest)
          .map(_.part).distinct
        require(parts.nonEmpty && parts.forall(_.matches("""\d{4}-\d{2}""")),
          s"st25 derived month partitions malformed: $parts")
        // a transform-pruned month window == the plain row filter
        val m = parts.min
        val (lo, hi) = (s"$m-01 00:00:00", s"$m-28 23:59:59")
        require(HP.partsBetween(s, lake, latest, lo, hi) == Seq(m),
          "st25 month range must prune to one partition")
        val got = lakeFeedSig(HP.readBetween(s, lake, lo, hi))
        val want = lakeFeedSig(VersionedLake.readLatest(s, lake)
          .filter(col("ts").between(lo, hi)))
        require(got == want,
          s"st25 pruned month read diverges: $got vs $want")
        // checkpoint replay of the last batch: same txn -> no-op
        val replay = s.read.parquet(stage).limit(3)
        require(HP.commitBatchAppend(replay, lake, txn = 3L) == 4,
          "st25 replayed txn forked history")
        // the constraint gate composes: a violating micro-batch aborts
        // minting nothing; a clean one still lands
        VersionedLake.commitAddConstraint(s, lake, "eid_nn",
          "event_id IS NOT NULL")
        val bad = s.read.parquet(stage).limit(2)
          .withColumn("event_id", lit(null).cast("long"))
        val aborted =
          try { HP.commitBatchAppend(bad, lake, txn = 99L); false }
          catch { case _: IllegalStateException => true }
        require(aborted, "st25 violating micro-batch must abort")
        require(VersionedLake.latestVersion(s, lake) == 5,
          "st25 aborted batch must mint no version")
        require(HP.commitBatchAppend(s.read.parquet(stage).limit(2),
          lake, txn = 100L) == 6,
          "st25 clean batch must land after the abort")
      },
      // STREAMING INDEX MAINTENANCE (st26): st23's txn ingest with the
      // l28 Bloom file-skipping index kept fresh INSIDE each
      // micro-batch — filters attach to immutable files, so each
      // batch's ensure indexes exactly its fresh files (cost ∝ batch,
      // never a rebuild), the index covers the whole lake at every
      // step, and a replayed ensure is a no-op. A point lookup after
      // the stream equals the plain filter (count + XOR signature).
      "st26_stream_index_maintenance" -> { (s: SparkSession, d: String) =>
        import org.apache.spark.sql.streaming.Trigger
        import graft.sources.{BloomIndex, VersionedLake}
        val stage = stagedEventFiles(s, d)
        val lake =
          s"/tmp/graft_stream_bfi_${Integer.toHexString(d.hashCode)}"
        VersionedLake.reset(s, lake)
        BloomIndex.define(s, lake, BloomIndex.Cfg("user_id"))
        val perBatch = scala.collection.mutable.ArrayBuffer.empty[Int]
        val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
        try {
          val schema = s.read.parquet(stage).schema
          val src = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(stage)
          val q = graft.streaming.EventStreams
            .toIndexedLake(src, lake, n => { perBatch += n; () })
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", ckpt.toString)
            .start()
          q.awaitTermination()
        } finally {
          org.apache.spark.sql.graftglue.GraftGlue.unloadStateStores()
          java.nio.file.Files.walk(ckpt)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
        }
        val latest = VersionedLake.latestVersion(s, lake)
        require(latest == 4, s"st26 expected 4 txn commits, got $latest")
        // every batch indexed only ITS files; the union covers the lake
        require(perBatch.size == 4 && perBatch.forall(_ > 0),
          s"st26 per-batch ensure counts: $perBatch")
        val live = VersionedLake.manifestFiles(s, lake, latest)
          .filter(_.kind == "data").map(_.rel).toSet
        require(perBatch.sum == live.size,
          s"st26 index coverage ${perBatch.sum} != ${live.size} files")
        require(BloomIndex.ensure(s, lake, latest).isEmpty,
          "st26 re-ensure must be a no-op")
        // index-served point lookup == plain filter
        val ids = VersionedLake.readLatest(s, lake)
          .select(col("user_id")).distinct()
          .orderBy(col("user_id")).limit(2)
        val got = lakeFeedSig(BloomIndex.lookup(s, lake, ids))
        val want = lakeFeedSig(VersionedLake.readLatest(s, lake)
          .join(broadcast(ids), Seq("user_id"), "left_semi"))
        require(got == want,
          s"st26 index-served lookup diverges: $got vs $want")
      },
      // STREAMING DV-MERGE (st27): the continuous form of l33 — a
      // keyed user store maintained by per-batch MERGE THROUGH
      // DELETION VECTORS. The store seeds with every user at a
      // sentinel payload (so every batch's changeset MATCHES and the
      // DV path carries the whole load), then 4 user-ranged batches
      // each update/tombstone their users in ONE
      // commitBatchMergeDv: matched rows die positionally, upserts
      // append, every base data file carries forward by pointer —
      // per-batch bytes ∝ the changeset, never store size. Batches
      // are user-disjoint (range staging on user_id), so the final
      // store is batch-ORDER-independent and equals the batch
      // recomputation from the raw events; a replayed txn must be a
      // no-op.
      "st27_stream_dv_merge" -> { (s: SparkSession, d: String) =>
        import org.apache.spark.sql.streaming.Trigger
        import graft.sources.VersionedLake
        val stage = stagedUserRangedEventFiles(s, d)
        val lake =
          s"/tmp/graft_stream_mdv_${Integer.toHexString(d.hashCode)}"
        VersionedLake.reset(s, lake)
        val changeShape = Tables.events(s, d)
          .select(col("user_id")).distinct()
          .withColumn("last_ts", lit(null).cast("timestamp"))
          .withColumn("last_type", lit("seed"))
          .withColumn("last_value", lit(0.0))
          .withColumn("bucket",
            pmod(col("user_id"), lit(8L)).cast("string"))
        VersionedLake.commitOverwrite(changeShape, "bucket", lake)
        val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
        try {
          val schema = s.read.parquet(stage).schema
          val src = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(stage)
          val q = graft.streaming.EventStreams.toDvMergeStore(src, lake)
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", ckpt.toString)
            .start()
          q.awaitTermination()
        } finally {
          org.apache.spark.sql.graftglue.GraftGlue.unloadStateStores()
          java.nio.file.Files.walk(ckpt)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
        }
        val latest = VersionedLake.latestVersion(s, lake)
        require(latest == 5, s"st27 seed + 4 DV-merges, got $latest")
        // pointer economy across the WHOLE ingest: data files only ADD
        val byV = (1 to latest).map(v =>
          VersionedLake.manifestFiles(s, lake, v)
            .filter(_.kind == "data").map(_.rel).toSet)
        require(byV.sliding(2).forall(w => w.head.subsetOf(w.last)),
          "st27 a base data file left the manifest — partition rewrite")
        require(VersionedLake.manifestFiles(s, lake, latest)
          .exists(_.kind == "dv"),
          "st27 the update path must run through deletion vectors")
        // the store == the batch recomputation of the same semantics
        def sig(df: DataFrame): (Long, Long) = {
          val r = df.agg(count(lit(1)),
            coalesce(expr("bit_xor(xxhash64(user_id, last_ts, " +
              "last_type, last_value, bucket))"), lit(0L))).head()
          (r.getLong(0), r.getLong(1))
        }
        val expect = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
            col("value"))).as("m"))
          .select(col("user_id"), col("m.ts").as("last_ts"),
            col("m.event_type").as("last_type"),
            col("m.value").as("last_value"))
          .filter(col("last_type") =!= "error")
          .withColumn("bucket",
            pmod(col("user_id"), lit(8L)).cast("string"))
        val (gotN, gotX) = sig(VersionedLake.readLatest(s, lake))
        val (wantN, wantX) = sig(expect)
        require(gotN == wantN && gotX == wantX,
          s"st27 store diverges: ($gotN,$gotX) vs ($wantN,$wantX)")
        // a replayed transaction is a commit-level no-op
        val replay = Tables.events(s, d).limit(1)
          .select(col("user_id"),
            col("ts").as("last_ts"),
            col("event_type").as("last_type"),
            col("value").as("last_value"))
          .withColumn("bucket",
            pmod(col("user_id"), lit(8L)).cast("string"))
          .withColumn("is_del", lit(false))
        require(VersionedLake.commitBatchMergeDv(replay, Seq("user_id"),
          "bucket", lake, txn = 0L, deleteCol = Some("is_del")) == latest,
          "st27 replayed txn must mint nothing")
      },
      // MID-STREAM PARTITION-SPEC EVOLUTION (st28): l31 composed with
      // st25's governed ingest — the production migration story. Two
      // batches land under month(ts); the spec then EVOLVES to
      // day(ts) while the stream's checkpoint survives; two more
      // batches land at day granularity. Nothing is rewritten: each
      // era keeps its layout, the era split is visible in the
      // manifest, and a range read spanning both eras projects
      // through BOTH transforms (month-era partitions prune at month,
      // day-era at day) and equals the plain row filter.
      "st28_stream_spec_evolution" -> { (s: SparkSession, d: String) =>
        import org.apache.spark.sql.streaming.Trigger
        import graft.sources.{HiddenPartitioning => HP, VersionedLake}
        import java.nio.file.{Files, Path, Paths, StandardCopyOption}
        import java.util.Comparator
        val allStage = stagedEventFiles(s, d)
        val incoming = Paths.get(
          s"/tmp/graft_stream_spev_${Integer.toHexString(d.hashCode)}")
        if (Files.exists(incoming))
          Files.walk(incoming).sorted(Comparator.reverseOrder[Path]())
            .forEach(f => { Files.deleteIfExists(f); () })
        Files.createDirectories(incoming)
        val srcFiles = {
          import scala.jdk.CollectionConverters._
          val st = Files.list(Paths.get(allStage))
          try st.filter(_.getFileName.toString.endsWith(".parquet"))
            .sorted().iterator().asScala.toSeq
          finally st.close()
        }
        require(srcFiles.size == 4, s"staging: ${srcFiles.size} files")
        def copyIn(fs: Seq[Path]): Unit = fs.foreach(f =>
          Files.copy(f, incoming.resolve(f.getFileName),
            StandardCopyOption.REPLACE_EXISTING))
        val lake =
          s"/tmp/graft_stream_spel_${Integer.toHexString(d.hashCode)}"
        VersionedLake.reset(s, lake)
        HP.define(s, lake, HP.Spec("ts", HP.Month))
        val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
        val schema = s.read.parquet(allStage).schema
        def runOnce(): Unit = {
          val src = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(incoming.toString)
          val q = graft.streaming.EventStreams.toGovernedLake(src, lake)
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", ckpt.toString)
            .start()
          q.awaitTermination()
        }
        try {
          copyIn(srcFiles.take(2))
          runOnce()
          require(VersionedLake.latestVersion(s, lake) == 2,
            "st28 two month-era commits before the evolution")
          HP.evolve(s, lake, HP.Spec("ts", HP.Day))
          copyIn(srcFiles.drop(2))
          runOnce() // checkpoint survives the evolution
        } finally {
          org.apache.spark.sql.graftglue.GraftGlue.unloadStateStores()
          java.nio.file.Files.walk(ckpt)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
        }
        val latest = VersionedLake.latestVersion(s, lake)
        require(latest == 4, s"st28 expected 4 txn commits, got $latest")
        // the era split is structural: month-era entries carry 7-char
        // partitions, day-era 10-char — derived through the spec each
        // era recorded, no file rewritten
        val entries = VersionedLake.manifestFiles(s, lake, latest)
          .filter(_.kind == "data")
        require(entries.forall(e => e.era.exists(v =>
          if (v <= 2) e.part.length == 7 else e.part.length == 10)),
          s"st28 era/layout mismatch: ${entries.map(e => (e.era, e.part))}")
        // a range read spanning both eras: BOTH projections
        // contribute pruned partitions, and the result equals the
        // plain row filter over the whole ingested set
        val m = entries.filter(_.part.length == 7).map(_.part).min
        val (lo, hi) = (s"$m-05 00:00:00", s"$m-25 23:59:59")
        val pruned = HP.partsBetween(s, lake, latest, lo, hi)
        require(pruned.exists(_.length == 7) &&
          pruned.exists(_.length == 10),
          s"st28 both eras must contribute to the pruned set: $pruned")
        val got = lakeFeedSig(HP.readBetween(s, lake, lo, hi))
        val want = lakeFeedSig(VersionedLake.readLatest(s, lake)
          .filter(col("ts").between(lo, hi)))
        require(got == want,
          s"st28 mixed-era pruned read diverges: $got vs $want")
      })
  }

  /** st23/st24's shared write side: stage the events fixture as 4
    * range-split files (staleness-guarded), stream them through
    * [[graft.streaming.EventStreams.toVersionedLake]] (one txn-deduped
    * APPEND commit per micro-batch) into a fresh versioned lake, and
    * return the lake path. */
  /** st20/st23/st25's shared staleness-guarded staging: the events
    * fixture re-written as 4 range-split parquet files (one per
    * micro-batch under maxFilesPerTrigger=1). Returns the stage dir. */
  private def stagedEventFiles(s: SparkSession, d: String): String = {
    import java.nio.file.{Files, Path, Paths}
    import java.util.Comparator
    def wipe(p: Path): Unit =
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => { Files.deleteIfExists(f); () })
    val srcFile = Paths.get(s"$d/events.parquet")
    val stage = Paths.get(
      s"/tmp/graft_stream_vev_${Integer.toHexString(d.hashCode)}")
    val marker = stage.resolve("_SUCCESS")
    val stale = !Files.exists(marker) ||
      Files.getLastModifiedTime(marker)
        .compareTo(Files.getLastModifiedTime(srcFile)) < 0
    if (stale) {
      wipe(stage)
      Tables.events(s, d)
        .repartitionByRange(4, col("event_id"))
        .write.mode("overwrite").parquet(stage.toString)
    }
    stage.toString
  }

  /** st27's staging: 4 files ranged on USER_ID, so each user's whole
    * history lands in exactly one micro-batch — the final DV-merged
    * store is then batch-ORDER-independent (file-source ordering is
    * an implementation detail no witness should lean on) while every
    * batch still UPDATES its users' seeded rows through the DV path. */
  private def stagedUserRangedEventFiles(s: SparkSession,
                                         d: String): String = {
    import java.nio.file.{Files, Path, Paths}
    import java.util.Comparator
    def wipe(p: Path): Unit =
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => { Files.deleteIfExists(f); () })
    val srcFile = Paths.get(s"$d/events.parquet")
    val stage = Paths.get(
      s"/tmp/graft_stream_uev_${Integer.toHexString(d.hashCode)}")
    val marker = stage.resolve("_SUCCESS")
    val stale = !Files.exists(marker) ||
      Files.getLastModifiedTime(marker)
        .compareTo(Files.getLastModifiedTime(srcFile)) < 0
    if (stale) {
      wipe(stage)
      Tables.events(s, d)
        .repartitionByRange(4, col("user_id"))
        .write.mode("overwrite").parquet(stage.toString)
    }
    stage.toString
  }

  private def stageVersionedEventsLake(s: SparkSession,
                                       d: String): String = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.VersionedLake
    def wipe(p: Path): Unit =
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => { Files.deleteIfExists(f); () })
    val stage = java.nio.file.Paths.get(stagedEventFiles(s, d))
    val lake =
      s"/tmp/graft_stream_vsrc_${Integer.toHexString(d.hashCode)}"
    VersionedLake.reset(s, lake)
    val ckpt = Files.createTempDirectory("graft_ckpt")
    try {
      val schema = s.read.parquet(stage.toString).schema
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      val q = graft.streaming.EventStreams
        .toVersionedLake(src, lake)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt.toString)
        .start()
      q.awaitTermination()
    } finally {
      org.apache.spark.sql.graftglue.GraftGlue.unloadStateStores()
      wipe(ckpt)
    }
    lake
  }

  /** (count, order-insensitive XOR signature) of an events feed —
    * appends are disjoint, so the XOR of per-poll signatures IS the
    * table's signature (st23/st24's consumption identity). */
  private def lakeFeedSig(df: DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)),
      coalesce(expr("bit_xor(xxhash64(event_id, user_id))"),
        lit(0L))).collect().head
    (r.getLong(0), r.getLong(1))
  }

  /** The independent SCD2 full-rebuild derivation (min/groupBy runs —
    * not the engine's all-window form). Shared by q48 (direct) and q86
    * (the incremental merge must be indistinguishable from it). */
  private val scd2RebuildSql: String =
    """WITH marked AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
      |    CASE WHEN lag(o_orderstatus) OVER w IS NULL
      |           OR lag(o_orderstatus) OVER w <> o_orderstatus
      |         THEN 1 ELSE 0 END AS chg
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey
      |               ORDER BY o_orderdate, o_orderkey)),
      |versioned AS (
      |  SELECT *, CAST(sum(chg) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS version
      |  FROM marked),
      |runs AS (
      |  SELECT o_custkey, version, min(o_orderstatus) AS status,
      |         min(o_orderdate) AS from_ts,
      |         count(*) AS n_orders
      |  FROM versioned GROUP BY o_custkey, version)
      |SELECT o_custkey AS custkey, version, status,
      |  strftime(from_ts, '%Y-%m-%d') AS valid_from,
      |  strftime(lead(from_ts) OVER (PARTITION BY o_custkey
      |    ORDER BY version), '%Y-%m-%d') AS valid_to,
      |  CAST(n_orders AS BIGINT) AS n_orders
      |FROM runs""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // the incremental merge is gated against the FULL REBUILD
    "q86_scd2_merge" -> scd2RebuildSql,
    "g07_two_hop" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |  FROM lineitem WHERE l_partkey % 16 = 0),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM op a JOIN op b
        |  ON a.ok = b.ok AND a.p < b.p),
        |nbr AS (SELECT u AS node, v AS nb FROM e
        |  UNION ALL SELECT v, u FROM e),
        |two AS (SELECT x.node, y.nb AS nb2 FROM nbr x
        |  JOIN nbr y ON y.node = x.nb WHERE y.nb <> x.node),
        |reach AS (SELECT node, count(*) AS n_reach2 FROM (
        |    SELECT DISTINCT node, r FROM (
        |      SELECT node, nb AS r FROM nbr
        |      UNION ALL SELECT node, nb2 FROM two)) GROUP BY 1),
        |deg AS (SELECT node, count(*) AS deg FROM nbr GROUP BY 1)
        |SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
        |  CAST(n_reach2 AS BIGINT) AS n_reach2
        |FROM deg d JOIN reach USING (node)""".stripMargin,
    "q87_join_size_profile" ->
      """WITH c AS (SELECT l_partkey, count(*) AS c
        |  FROM lineitem GROUP BY 1),
        |a AS (SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(sum(c * c) AS BIGINT) AS self_join_rows FROM c),
        |t AS (SELECT l_partkey AS top_key, c AS top_c FROM c
        |  ORDER BY c DESC, l_partkey DESC LIMIT 1)
        |SELECT n_keys, n_rows, self_join_rows, top_key, top_c,
        |  self_join_rows * 100 // n_rows AS amp_x100
        |FROM a, t""".stripMargin,
    // q88 oracle = FULL RECOMPUTE over (base minus deletes) plus
    // inserts — deliberately shares no structure with the incremental
    // state-merge plan (the q86 MERGE-vs-rebuild discipline).
    "q88_ivm_agg" ->
      """SELECT l_returnflag AS flag, l_linestatus AS status,
        |  strftime(l_shipdate, '%Y-%m') AS month,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS price_cents
        |FROM lineitem
        |WHERE (l_shipdate <= '1995-12-31' AND l_suppkey % 13 <> 0)
        |   OR l_shipdate > '1995-12-31'
        |GROUP BY 1, 2, 3""".stripMargin,
    "q89_observe_metrics" ->
      """SELECT CAST(count(*) AS BIGINT) AS rows_in,
        |  CAST(count(CASE WHEN l_quantity >= 25 THEN 1 END) AS BIGINT)
        |    AS rows_kept,
        |  CAST(count(CASE WHEN l_discount = 0 THEN 1 END) AS BIGINT)
        |    AS zero_discount,
        |  CAST(sum(CASE WHEN l_quantity >= 25
        |    THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS kept_cents
        |FROM lineitem""".stripMargin,
    // q90: every metric re-derived as plain SQL aggregates; the pass
    // booleans repeat the same integer comparisons
    "q90_dq_suite" ->
      """WITH b AS (
        |  SELECT count(*) AS n_rows,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_null_cust,
        |    count(*) - count(DISTINCT o_orderkey) AS n_dup_key,
        |    CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_price,
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL
        |      OR o_orderstatus NOT IN ('O', 'F', 'P')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_status
        |  FROM orders),
        |orph AS (
        |  SELECT count(*) AS n_orphan FROM orders o
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |SELECT 'row_count_min' AS check_name, n_rows AS metric,
        |  n_rows >= 1000 AS pass FROM b
        |UNION ALL SELECT 'complete_o_custkey', n_null_cust,
        |  n_null_cust = 0 FROM b
        |UNION ALL SELECT 'unique_o_orderkey', n_dup_key,
        |  n_dup_key = 0 FROM b
        |UNION ALL SELECT 'range_o_totalprice_pos', n_bad_price,
        |  n_bad_price = 0 FROM b
        |UNION ALL SELECT 'values_o_orderstatus', n_bad_status,
        |  n_bad_status = 0 FROM b
        |UNION ALL SELECT 'ref_orders_customer', n_orphan,
        |  n_orphan = 0 FROM orph""".stripMargin,
    // q91: identical integer-hash draw — the 52-bit md5 prefix compares
    // against the SAME pre-computed integer thresholds, so weights and
    // both sums are bit-identical integers in both engines
    "q91_poisson_bootstrap" ->
      """WITH reps AS (SELECT range AS b FROM range(0, 33)),
        |k AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT)
        |    AS cents, b,
        |    ('0x' || substr(md5(o_orderkey || ':bs' || b), 1, 13))::BIGINT
        |      AS k
        |  FROM orders, reps),
        |r AS (SELECT cents, b,
        |    CASE WHEN b = 0 THEN 1
        |      WHEN k < 1656781714176974 THEN 0
        |      WHEN k < 3313563428353948 THEN 1
        |      WHEN k < 4141954285442435 THEN 2
        |      WHEN k < 4418084571138597 THEN 3
        |      WHEN k < 4487117142562638 THEN 4
        |      WHEN k < 4500923656847446 THEN 5
        |      ELSE 6 END AS w
        |  FROM k)
        |SELECT CAST(b AS BIGINT) AS b, CAST(sum(w) AS BIGINT) AS n_eff,
        |  CAST(sum(w * cents) AS BIGINT) AS sum_cents
        |FROM r GROUP BY 1""".stripMargin,
    "q01_clean_project" ->
      """SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        |CAST(l_suppkey AS BIGINT) AS premise_code,
        |CAST(l_partkey AS BIGINT) AS item_code,
        |CAST(l_extendedprice AS DOUBLE) AS price,
        |COALESCE(trim(l_returnflag), 'UNKNOWN') AS flag
        |FROM lineitem""".stripMargin,
    "q02_dedup_latest" ->
      """SELECT l_suppkey AS premise_code, l_partkey AS item_code,
        |strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        |l_extendedprice AS price
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_suppkey, l_partkey
        |      ORDER BY l_shipdate DESC, l_orderkey, l_linenumber, l_extendedprice) AS rn
        |      FROM lineitem) WHERE rn = 1""".stripMargin,
    "q02b_dedup_latest_agg" ->
      """SELECT l_suppkey AS premise_code, l_partkey AS item_code,
        |strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        |l_extendedprice AS price
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_suppkey, l_partkey
        |      ORDER BY l_shipdate DESC, l_orderkey, l_linenumber, l_extendedprice) AS rn
        |      FROM lineitem) WHERE rn = 1""".stripMargin,
    "q03_enrich_join" ->
      """WITH latest AS (
        |  SELECT l_suppkey AS premise_code, l_partkey AS item_code,
        |         strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        |         l_extendedprice AS price
        |  FROM (SELECT *, row_number() OVER (PARTITION BY l_suppkey, l_partkey
        |        ORDER BY l_shipdate DESC, l_orderkey, l_linenumber, l_extendedprice) AS rn
        |        FROM lineitem) WHERE rn = 1)
        |SELECT premise_code, item_code, ship_date, price,
        |       p_name AS item, p_brand AS brand, s_name AS premise
        |FROM latest
        |JOIN part ON item_code = p_partkey
        |JOIN supplier ON premise_code = s_suppkey""".stripMargin,
    "q04_unique_assert" ->
      """SELECT 'part' AS tbl, CAST(count(*) AS BIGINT) AS dup_keys
        |FROM (SELECT p_partkey FROM part GROUP BY 1 HAVING count(*) > 1)
        |UNION ALL
        |SELECT 'supplier' AS tbl, CAST(count(*) AS BIGINT) AS dup_keys
        |FROM (SELECT s_suppkey FROM supplier GROUP BY 1 HAVING count(*) > 1)""".stripMargin,
    "q05_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |round(CAST(sum(l_quantity) AS DOUBLE), 4) AS sum_qty,
        |round(CAST(sum(l_extendedprice) AS DOUBLE), 4) AS sum_base_price,
        |round(CAST(sum(l_extendedprice * (1.0 - l_discount)) AS DOUBLE), 4) AS sum_disc_price,
        |round(CAST(sum(l_discount) AS DOUBLE), 4) AS sum_disc,
        |CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q06_filter_pushdown" ->
      """SELECT l_orderkey, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00' AND l_quantity < 10""".stripMargin,
    "q07_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q08_set_ops" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | UNION
        | SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |EXCEPT
        |(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | INTERSECT
        | SELECT c_custkey FROM customer WHERE c_acctbal > 5000)""".stripMargin,
    "q09_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(rank() OVER (PARTITION BY o_custkey
        |     ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk,
        |strftime(lag(o_orderdate, 1) OVER w, '%Y-%m-%d') AS prev_date,
        |round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |     ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_total
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q10_scalar_battery" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, lower(p_type) AS type_l,
        |substring(p_name, 1, 5) AS name5,
        |CAST(len(p_name) AS BIGINT) AS name_len,
        |round(p_retailprice, 1) AS price_r,
        |concat_ws('-', p_brand, p_type) AS brand_type,
        |regexp_replace(p_name, ' ', '_', 'g') AS name_us,
        |CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
        |p_partkey % 7 AS key_mod,
        |CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS size_class
        |FROM part""".stripMargin,
    "q11_semi_anti_join" ->
      """SELECT 'with_orders' AS cohort, CAST(count(*) AS BIGINT) AS cnt FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'without_orders' AS cohort, CAST(count(*) AS BIGINT) AS cnt FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q12_rollup" ->
      """SELECT COALESCE(n_name, 'ALL') AS nation,
        |COALESCE(c_mktsegment, 'ALL') AS segment,
        |CAST(count(*) AS BIGINT) AS n_cust,
        |round(CAST(sum(c_acctbal) AS DOUBLE), 4) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)""".stripMargin,
    "q13_distinct_exact" ->
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS d_parts,
        |CAST(count(DISTINCT l_suppkey) AS BIGINT) AS d_supps,
        |CAST(count(DISTINCT (l_partkey, l_suppkey)) AS BIGINT) AS d_pairs
        |FROM lineitem""".stripMargin,
    "q14_join_agg" ->
      """SELECT n_name, round(CAST(sum(o_totalprice) AS DOUBLE), 4) AS revenue,
        |CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q15_events_tumbling" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
        |event_type, CAST(count(*) AS BIGINT) AS n,
        |round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // q85: per-id deterministic representative via a row_number window
    // (an independent formulation of the engine's min-struct agg),
    // then the q15 reduction
    "q85_dedup_tumbling" ->
      """WITH d AS (SELECT ts, event_type, value FROM (
        |    SELECT ts, event_type, value, row_number() OVER (
        |      PARTITION BY event_id ORDER BY ts, event_type, value)
        |      AS rn
        |    FROM events) WHERE rn = 1)
        |SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
        |event_type, CAST(count(*) AS BIGINT) AS n,
        |round(sum(value), 4) AS sum_value
        |FROM d GROUP BY 1, 2""".stripMargin,
    "q39_events_dim_join" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
        |c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n,
        |round(sum(value), 4) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2""".stripMargin,
    "q16_events_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800.0 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sess GROUP BY 1, 2""".stripMargin,
    "q17_approx_distinct" ->
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS d_parts,
        |CAST(count(DISTINCT l_orderkey) AS BIGINT) AS d_orders,
        |TRUE AS parts_within_5pct,
        |TRUE AS orders_within_5pct
        |FROM lineitem""".stripMargin,
    "q18_asof_join" ->
      """SELECT o_orderkey,
        |strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |strftime(l_shipdate, '%Y-%m-%d') AS asof_date
        |FROM (SELECT o_orderkey, o_orderdate, o_custkey % 10 AS k FROM orders) o
        |ASOF JOIN (SELECT l_suppkey AS k, l_shipdate FROM lineitem) l
        |ON o.k = l.k AND l.l_shipdate <= o.o_orderdate""".stripMargin,
    "q18b_asof_payload" ->
      """WITH ships AS (
        |  SELECT l_suppkey AS k, l_shipdate, max(l_extendedprice) AS ship_price
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT o_orderkey,
        |strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |strftime(l_shipdate, '%Y-%m-%d') AS asof_date,
        |ship_price
        |FROM (SELECT o_orderkey, o_orderdate, o_custkey % 10 AS k FROM orders) o
        |ASOF JOIN ships l
        |ON o.k = l.k AND l.l_shipdate <= o.o_orderdate""".stripMargin,
    "q18c_asof_forward" ->
      """SELECT o_orderkey,
        |strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |strftime(l_shipdate, '%Y-%m-%d') AS asof_date
        |FROM (SELECT o_orderkey, o_orderdate, o_custkey % 10 AS k FROM orders) o
        |ASOF JOIN (SELECT l_suppkey AS k, l_shipdate FROM lineitem) l
        |ON o.k = l.k AND l.l_shipdate >= o.o_orderdate""".stripMargin,
    "q19_pivot" ->
      """SELECT n_name,
        |round(sum(CASE WHEN c_mktsegment='AUTOMOBILE' THEN o_totalprice END), 4) AS "AUTOMOBILE",
        |round(sum(CASE WHEN c_mktsegment='BUILDING' THEN o_totalprice END), 4) AS "BUILDING",
        |round(sum(CASE WHEN c_mktsegment='FURNITURE' THEN o_totalprice END), 4) AS "FURNITURE",
        |round(sum(CASE WHEN c_mktsegment='HOUSEHOLD' THEN o_totalprice END), 4) AS "HOUSEHOLD",
        |round(sum(CASE WHEN c_mktsegment='MACHINERY' THEN o_totalprice END), 4) AS "MACHINERY"
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q20_stats" ->
      """SELECT round(corr(o_totalprice, o_custkey), 6) AS corr_tc,
        |round(stddev_samp(o_totalprice), 4) AS sd_total,
        |round(var_samp(o_totalprice), 4) AS var_total,
        |round(covar_samp(o_totalprice, o_custkey), 4) AS cov_tc
        |FROM orders""".stripMargin,
    "q21_string_agg" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey""".stripMargin,
    "q22_moving_avg" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |round(sum(l_extendedprice) OVER w, 2) AS ma4_sum,
        |CAST(count(*) OVER w AS BIGINT) AS ma4_n
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q23_full_outer" ->
      """SELECT CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'both'
        |  WHEN c_custkey IS NOT NULL THEN 'customer_only'
        |  ELSE 'orders_only' END AS presence,
        |CAST(count(*) AS BIGINT) AS cnt
        |FROM customer FULL OUTER JOIN
        |  (SELECT DISTINCT o_custkey FROM orders) o ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,
    "q24_cube" ->
      """SELECT COALESCE(n_name, 'ALL') AS nation,
        |COALESCE(c_mktsegment, 'ALL') AS segment,
        |CAST(count(*) AS BIGINT) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE (n_name, c_mktsegment)""".stripMargin,
    "q25_percentiles" ->
      """SELECT round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        |FROM orders""".stripMargin,
    // extremes restated via plain min/max + arg-min/max under the SAME
    // lexicographic tie-break (min key among min-price rows)
    "q63_struct_battery" ->
      """WITH ex AS (
        |  SELECT o_orderpriority,
        |    count(*) AS n,
        |    min(o_totalprice) AS min_price,
        |    max(o_totalprice) AS max_price
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT ex.o_orderpriority, CAST(n AS INT) AS n,
        |  min_price,
        |  (SELECT min(o_orderkey) FROM orders o
        |   WHERE o.o_orderpriority = ex.o_orderpriority
        |     AND o.o_totalprice = ex.min_price) AS min_key,
        |  max_price,
        |  (SELECT max(o_orderkey) FROM orders o
        |   WHERE o.o_orderpriority = ex.o_orderpriority
        |     AND o.o_totalprice = ex.max_price) AS max_key
        |FROM ex""".stripMargin,
    "q64_conditional_agg" ->
      """SELECT l_returnflag,
        |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
        |  bool_and(l_quantity > 0) AS all_positive,
        |  bool_or(l_discount > 0.09) AS has_deep_discount,
        |  CAST(count(*) FILTER (WHERE l_tax > 0.05) AS BIGINT) AS n_taxed
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q62_subquery_battery" ->
      """WITH probe AS (
        |  SELECT CASE WHEN l_linenumber = 7 THEN CAST(NULL AS BIGINT)
        |              ELSE l_orderkey END AS k
        |  FROM lineitem WHERE l_linenumber >= 6)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |   WHERE o_orderkey IN (SELECT k FROM probe)) AS n_in,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |   WHERE EXISTS (SELECT 1 FROM probe p
        |                 WHERE p.k = o.o_orderkey)) AS n_exists,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |   WHERE NOT EXISTS (SELECT 1 FROM probe p
        |                     WHERE p.k = o.o_orderkey)) AS n_not_exists,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |   WHERE o_orderkey NOT IN (SELECT k FROM probe)) AS n_not_in""".stripMargin,
    // every map-derived value restated from first principles, no maps
    "q61_map_battery" ->
      """SELECT event_id,
        |  3 AS n_entries,
        |  event_type AS type_val,
        |  CAST(CAST(floor(value / 100) AS BIGINT) AS VARCHAR) AS bucket_val,
        |  strftime(ts, '%Y-%m-%d') AS day_val,
        |  'bucket,day,type' AS keys,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
        |FROM events""".stripMargin,
    // restated as the direct long-form aggregation (no pivot detour)
    "q59_unpivot" ->
      """SELECT n_name, c_mktsegment AS segment,
        |  round(CAST(sum(o_totalprice) AS DOUBLE), 4) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE',
        |  'HOUSEHOLD', 'MACHINERY')
        |GROUP BY n_name, c_mktsegment""".stripMargin,
    "q60_rank_battery" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate)""".stripMargin,
    "t21_readability" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |    AS n_syllables,
        |  round(206.835
        |    - 1.015 * (CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE)
        |        / nullif(CAST(len(regexp_extract_all(text, '[.!?]+')) AS DOUBLE), 0))
        |    - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
        |        / nullif(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 0)),
        |    4) AS flesch
        |FROM documents""".stripMargin,
    "q58_grouped_percentiles" ->
      """SELECT o_orderpriority, count(*) AS n,
        |round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q26_salted_agg" ->
      """SELECT l_returnflag,
        |round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS total,
        |CAST(count(l_extendedprice) AS BIGINT) AS n,
        |min(l_quantity) AS mn, max(l_quantity) AS mx
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q27_tpch_q3" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |o_orderpriority,
        |round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q28_tpch_q5" ->
      """SELECT n_name,
        |round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q29_histogram" ->
      """SELECT least(CAST(floor(o_totalprice / 50000) AS BIGINT), 11) AS bucket,
        |CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    "q30_json_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
        |GROUP BY event_type""".stripMargin,
    "q31_datetime" ->
      """SELECT o_orderkey,
        |CAST(year(o_orderdate) AS BIGINT) AS y,
        |CAST(month(o_orderdate) AS BIGINT) AS m,
        |CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
        |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS age_days
        |FROM orders""".stripMargin,
    "q32_corr_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |round(cust_sum, 2) AS cust_sum, cust_n
        |FROM orders JOIN (SELECT o_custkey AS ck, avg(o_totalprice) AS avg_price,
        |                    CAST(sum(o_totalprice) AS DOUBLE) AS cust_sum,
        |                    CAST(count(*) AS BIGINT) AS cust_n
        |                  FROM orders GROUP BY 1) a ON o_custkey = ck
        |WHERE o_totalprice > avg_price""".stripMargin,
    "q33_bag_setops" ->
      """SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_kept FROM (
        |  SELECT l_partkey FROM lineitem
        |  EXCEPT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_quantity > 25
        |) GROUP BY l_partkey""".stripMargin,
    "q34_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |first_value(o_orderkey) OVER wf AS first_order,
        |last_value(o_orderkey) OVER wf AS last_order,
        |nth_value(o_orderkey, 2) OVER wf AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "q35_string_battery2" ->
      """SELECT n_nationkey,
        |lpad(n_name, 12, '_') AS padded,
        |translate(n_name, 'AEIOU', 'aeiou') AS lowered_vowels,
        |reverse(n_name) AS reversed,
        |repeat(substring(n_name, 1, 2), 3) AS repeated,
        |CAST(strpos(n_name, '_') AS BIGINT) AS underscore_at
        |FROM nation""".stripMargin,
    "q36_grouping_sets" ->
      """SELECT COALESCE(n_name, 'ALL') AS nation,
        |COALESCE(c_mktsegment, 'ALL') AS segment,
        |CAST(count(*) AS BIGINT) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())""".stripMargin,
    // Naive BETWEEN join — the bucketized Spark plan must produce the
    // identical match set (bucketization is lossless by construction).
    "q37_range_join" ->
      """WITH iv AS (
        |  SELECT event_id AS interval_id, ts AS s,
        |         ts + INTERVAL 10 MINUTE AS e
        |  FROM events WHERE event_type = 'purchase' AND value > 95)
        |SELECT interval_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_users,
        |  round(sum(ev.value), 4) AS sum_value
        |FROM iv JOIN events ev ON ev.ts >= iv.s AND ev.ts < iv.e
        |GROUP BY 1""".stripMargin,
    // rank-bound contract: lo/hi are raw values at ranks (q ± 0.01)n —
    // 10x the sketch's n/1000 guarantee — derived here from first
    // principles (ordered row_number), independent of the Spark harness
    "q40_approx_quantiles" ->
      """WITH nn AS (SELECT count(*) AS n FROM orders),
        |v AS (SELECT o_totalprice AS val,
        |        row_number() OVER (ORDER BY o_totalprice) AS r
        |      FROM orders),
        |qs AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.99]) AS DOUBLE)
        |          AS quantile),
        |-- DOUBLE on purpose — mirror the engine's IEEE rank product
        |-- (see the q78 oracle note)
        |k AS (SELECT quantile,
        |        greatest(1, CAST(floor((quantile - CAST(0.01 AS DOUBLE))
        |          * n) AS BIGINT)) AS klo,
        |        least(n, CAST(ceil((quantile + CAST(0.01 AS DOUBLE))
        |          * n) AS BIGINT)) AS khi
        |      FROM qs, nn)
        |SELECT k.quantile, vlo.val AS lo, vhi.val AS hi,
        |  TRUE AS within_bounds
        |FROM k JOIN v vlo ON vlo.r = k.klo
        |JOIN v vhi ON vhi.r = k.khi""".stripMargin,
    // aggregate-parity oracle; the content equality lives in the
    // Spark-side signature comparison (roundtrip_ok)
    "l01_jsonl_roundtrip" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs, TRUE AS roundtrip_ok
        |FROM documents""".stripMargin,
    // g09: FULL REBUILD over base ∪ delta via the independent
    // recursive-CTE min-label closure (d07's oracle form) — the
    // incremental merge must be indistinguishable from it
    "g09_incremental_cc" ->
      """WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS ok,
        |    l_partkey AS p
        |  FROM lineitem WHERE l_partkey % 16 = 0),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.p < b.p),
        |sym AS (SELECT u AS a, v AS b FROM e
        |  UNION SELECT v, u FROM e),
        |nodes AS (SELECT DISTINCT a AS n FROM sym),
        |reach(id, comp) AS (
        |  SELECT n, n FROM nodes
        |  UNION
        |  SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.id)
        |SELECT id AS node, CAST(min(comp) AS BIGINT) AS component
        |FROM reach GROUP BY 1""".stripMargin,
    // g10: the identical wedge/anti-join/top-k re-formulated as SQL
    // CTEs; integer-exact, (n_common desc, u, v) is a total order so
    // the top-100 cutoff is engine-agnostic
    "g10_link_prediction" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok,
        |    l_partkey AS p
        |  FROM lineitem WHERE l_partkey % 16 = 0),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.p < b.p),
        |adj AS (SELECT u AS a, v AS b FROM e
        |  UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT a, count(*) AS deg FROM adj GROUP BY 1),
        |wed AS (SELECT x.b AS u, y.b AS v, count(*) AS n_common
        |  FROM adj x JOIN adj y ON x.a = y.a AND x.b < y.b
        |  GROUP BY 1, 2),
        |cand AS (SELECT w.u, w.v, w.n_common FROM wed w
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM e WHERE e.u = w.u AND e.v = w.v))
        |SELECT c.u, c.v, c.n_common,
        |  du.deg AS deg_u, dv.deg AS deg_v
        |FROM cand c
        |JOIN deg du ON du.a = c.u
        |JOIN deg dv ON dv.a = c.v
        |ORDER BY c.n_common DESC, c.u, c.v
        |LIMIT 100""".stripMargin,
    // t33: same md5-prefix boundary CONTRACT (that is why it is md5,
    // not xxhash64 — the oracle must recompute it); segmentation
    // arithmetic re-derived with DuckDB's own window/string_agg forms
    "t33_cdc_chunking" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents
        |  WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 1),
        |r AS (SELECT doc_id, i, toks[CAST(i AS INT)] AS tok,
        |    CASE WHEN i >= 3 AND substr(md5(
        |      toks[CAST(i AS INT) - 2] || ' ' ||
        |      toks[CAST(i AS INT) - 1] || ' ' ||
        |      toks[CAST(i AS INT)]), 1, 1) = '0' THEN 1 ELSE 0 END AS flag
        |  FROM (SELECT doc_id, toks,
        |          unnest(range(1, len(toks) + 1)) AS i FROM t)),
        |c AS (SELECT doc_id, i, tok,
        |    coalesce(sum(flag) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS chunk_id
        |  FROM r),
        |ch AS MATERIALIZED (SELECT doc_id, chunk_id, count(*) AS clen,
        |    md5(string_agg(tok, ' ' ORDER BY i)) AS ch
        |  FROM c GROUP BY 1, 2),
        |dup AS (SELECT ch FROM (SELECT DISTINCT doc_id, ch FROM ch)
        |  GROUP BY ch HAVING count(*) >= 2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(max(clen) AS BIGINT) AS max_chunk,
        |  CAST(sum(clen) AS BIGINT) AS n_toks,
        |  CAST(count(CASE WHEN ch.ch IN (SELECT ch FROM dup) THEN 1 END)
        |    AS BIGINT) AS n_shared_chunks
        |FROM ch GROUP BY 1""".stripMargin,
    // c13: c12's split windows + d08's string-shingle joins, with the
    // AFTER-decontamination count recomputed from the pruned set
    "c13_split_decontam" ->
      """WITH r AS (SELECT doc_id, lang, text,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':split'), doc_id)
        |      AS BIGINT) AS rn
        |  FROM documents),
        |n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |sp AS MATERIALIZED (SELECT doc_id, text,
        |    CASE WHEN rn * 100 <= n.n * 98 THEN 'train'
        |         WHEN rn * 100 <= n.n * 99 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM r JOIN n ON r.lang = n.lang),
        |t AS (SELECT doc_id, split,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM sp WHERE split <> 'val'),
        |sh AS MATERIALIZED (SELECT doc_id, split, s FROM (
        |    SELECT doc_id, split, unnest(
        |      CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
        |           ELSE [array_to_string(toks[i+1:i+3], ' ')
        |                 FOR i IN range(0, len(toks)-2)] END) AS s
        |    FROM t)),
        |te AS MATERIALIZED (SELECT DISTINCT s FROM sh
        |  WHERE split = 'test'),
        |tr AS MATERIALIZED (SELECT doc_id, s FROM sh
        |  WHERE split = 'train'),
        |leaky AS MATERIALIZED (SELECT doc_id, count(DISTINCT s) AS ns
        |  FROM tr JOIN te USING (s) GROUP BY 1),
        |pruned AS MATERIALIZED (SELECT doc_id FROM leaky WHERE ns >= 2)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM sp WHERE split = 'train')
        |    AS n_train,
        |  (SELECT CAST(count(*) AS BIGINT) FROM sp WHERE split = 'test')
        |    AS n_test,
        |  (SELECT CAST(count(*) AS BIGINT) FROM leaky) AS n_leaky_train,
        |  (SELECT CAST(count(*) AS BIGINT) FROM pruned) AS n_pruned_train,
        |  (SELECT CAST(count(DISTINCT s) AS BIGINT)
        |   FROM tr JOIN te USING (s)) AS shared_before,
        |  (SELECT CAST(count(DISTINCT s) AS BIGINT) FROM tr JOIN te USING (s)
        |   WHERE tr.doc_id NOT IN (SELECT doc_id FROM pruned))
        |    AS shared_after""".stripMargin,
    // c14: the identical integer-hash priority arithmetic — u is an
    // exact 52-bit integer both engines derive from the same md5 hex,
    // u/w is one correctly-rounded IEEE division, so even the double
    // `priority` column is bit-identical
    "c14_weighted_sample" ->
      """SELECT doc_id, lang, n_chars,
        |  (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ws42'),
        |      1, 13))::BIGINT + 1)::DOUBLE
        |    / greatest(n_chars, 1) AS priority
        |FROM documents
        |ORDER BY priority, doc_id
        |LIMIT 100""".stripMargin,
    // l04: every number predicted from documents + the parity split
    // rule — the staged evolving-schema files are never read here
    "l04_schema_evolution" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT)
        |    AS n_with_quality,
        |  CAST(coalesce(sum(CASE WHEN doc_id % 2 = 1
        |    THEN n_chars % 100 END), 0) AS BIGINT) AS sum_quality,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    // l03: the per-lang numbers are recomputed from PARQUET — they gate
    // the ORC write→read→aggregate path; content equality is the
    // Spark-side signature boolean (l01 discipline)
    "l03_orc_roundtrip" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_lang,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars, TRUE AS roundtrip_ok
        |FROM documents GROUP BY 1""".stripMargin,
    // l05: same contract as l03 — the per-lang numbers are recomputed
    // from PARQUET and gate the avro write→read→aggregate path; content
    // equality is the Spark-side signature boolean
    "l05_avro_roundtrip" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_lang,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars, TRUE AS roundtrip_ok
        |FROM documents GROUP BY 1""".stripMargin,
    // l06: the join+aggregate recomputed from the ORIGINAL parquet —
    // gates the partitioned write, the runtime prune, and the join; the
    // dim month-set is re-derived independently as an IN-subquery
    "l06_dpp_prune" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |  count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE strftime(l_shipdate, '%Y-%m') IN (
        |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m')
        |  FROM orders
        |  WHERE year(o_orderdate) = 1997 AND quarter(o_orderdate) = 1)
        |GROUP BY 1""".stripMargin,
    // l07: per-lang numbers recomputed from parquet gate that the
    // compaction re-layout moved no rows; files_before is the
    // FS-MEASURED pre-compaction file count, which the deterministic
    // residue-staged fragmenter makes equal to the data-derivable
    // count(DISTINCT doc_id % 4) at any SF; compacted_ok is the
    // FS-measured one-file-per-lang boolean
    "l07_compaction" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(count(DISTINCT doc_id % 4) AS BIGINT) AS files_before,
        |  TRUE AS compacted_ok
        |FROM documents GROUP BY 1""".stripMargin,
    // l08: the key-range bounds re-derived from the table's own
    // min/max with the same integer arithmetic, the aggregate from the
    // FULL table — if the manifest prune dropped a row, the numbers
    // diverge; skip_effective is the Spark-side file-count measurement
    "l08_zonemap_skip" ->
      """WITH b AS (SELECT min(l_orderkey) AS gmin,
        |    max(l_orderkey) AS gmax FROM lineitem)
        |SELECT count(*) AS n_items,
        |  CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
        |    AS qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS price_cents,
        |  TRUE AS skip_effective
        |FROM lineitem, b
        |WHERE l_orderkey BETWEEN gmin + (gmax - gmin) // 2
        |  AND gmin + (gmax - gmin) * 5 // 8""".stripMargin,
    // l09: both snapshots and the between-version diff re-derived from
    // the original parquet — the versioned lake's two time-travel
    // reads must reproduce them exactly (v1 from the version-1
    // manifest AFTER version 2 landed, v2 with January/March carried
    // forward by pointer)
    "l09_time_travel" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    strftime(l_shipdate, '%Y-%m') AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'),
        |v2 AS (
        |  SELECT * FROM li WHERE month <> '1997-02'
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity + 1, month
        |  FROM li WHERE month = '1997-02' AND l_linenumber <= 4),
        |s1 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM li),
        |s2 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM v2),
        |d AS (SELECT
        |    CAST(sum(CASE WHEN a.l_orderkey IS NOT NULL
        |      AND b.l_orderkey IS NOT NULL
        |      AND a.l_quantity <> b.l_quantity THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_changed_vs_prev,
        |    CAST(sum(CASE WHEN b.l_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_removed_vs_prev,
        |    CAST(sum(CASE WHEN a.l_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_added_vs_prev
        |  FROM li a FULL OUTER JOIN v2 b
        |    ON a.l_orderkey = b.l_orderkey
        |    AND a.l_linenumber = b.l_linenumber)
        |SELECT CAST(1 AS INTEGER) AS version, s1.n_rows, s1.sum_qty,
        |  s1.key_sig, CAST(0 AS BIGINT) AS n_changed_vs_prev,
        |  CAST(0 AS BIGINT) AS n_removed_vs_prev,
        |  CAST(0 AS BIGINT) AS n_added_vs_prev
        |FROM s1
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), s2.n_rows, s2.sum_qty, s2.key_sig,
        |  d.n_changed_vs_prev, d.n_removed_vs_prev, d.n_added_vs_prev
        |FROM s2, d""".stripMargin,
    // l10: the two RETAINED snapshots re-derived from the original
    // parquet — read AFTER the vacuum, so a deleted live file fails
    // the numbers; the vacuum/orphan/readability outcomes are computed
    // Spark-side booleans
    "l10_vacuum" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    strftime(l_shipdate, '%Y-%m') AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'),
        |v2 AS (
        |  SELECT * FROM li WHERE month <> '1997-02'
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity + 1, month
        |  FROM li WHERE month = '1997-02' AND l_linenumber <= 4),
        |v3 AS (
        |  SELECT * FROM v2 WHERE month <> '1997-03'
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity + 2, month
        |  FROM li WHERE month = '1997-03' AND l_linenumber <= 3)
        |SELECT CAST(2 AS INTEGER) AS version, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  TRUE AS v1_vacuumed, TRUE AS no_orphans,
        |  TRUE AS files_deleted
        |FROM v2
        |UNION ALL
        |SELECT CAST(3 AS INTEGER), count(*), round(sum(l_quantity), 2),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT),
        |  TRUE, TRUE, TRUE
        |FROM v3""".stripMargin,
    // l11: the MERGEd snapshot re-derived from the original parquet —
    // updates as a CASE over the key predicate, inserts appended; the
    // diff counts follow from the construction (every update changes
    // the quantity, nothing is removed)
    "l11_merge_into" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    min(l_quantity) AS l_quantity,
        |    min(strftime(l_shipdate, '%Y-%m')) AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'
        |  GROUP BY 1, 2),
        |v2 AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN month = '1997-02' AND l_linenumber <= 2
        |         THEN l_quantity + 5 ELSE l_quantity END AS l_quantity,
        |    month
        |  FROM li
        |  UNION ALL
        |  SELECT l_orderkey +
        |      (SELECT (max(l_orderkey) // 10000000 + 1) * 10000000
        |       FROM li),
        |    l_linenumber, l_quantity + 3, month
        |  FROM li WHERE month = '1997-02' AND l_linenumber = 7),
        |s1 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM li),
        |s2 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM v2),
        |d AS (SELECT
        |    CAST(count(CASE WHEN month = '1997-02' AND l_linenumber <= 2
        |      THEN 1 END) AS BIGINT) AS n_changed_vs_prev,
        |    CAST(0 AS BIGINT) AS n_removed_vs_prev,
        |    CAST(count(CASE WHEN month = '1997-02' AND l_linenumber = 7
        |      THEN 1 END) AS BIGINT) AS n_added_vs_prev
        |  FROM li)
        |SELECT CAST(1 AS INTEGER) AS version, s1.n_rows, s1.sum_qty,
        |  s1.key_sig, CAST(0 AS BIGINT) AS n_changed_vs_prev,
        |  CAST(0 AS BIGINT) AS n_removed_vs_prev,
        |  CAST(0 AS BIGINT) AS n_added_vs_prev
        |FROM s1
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), s2.n_rows, s2.sum_qty, s2.key_sig,
        |  d.n_changed_vs_prev, d.n_removed_vs_prev, d.n_added_vs_prev
        |FROM s2, d""".stripMargin,
    // l12: both versions' range aggregates re-derived from the
    // original parquet with the bounds recomputed from the table's own
    // min/max (== the manifest stats' global bounds by construction);
    // a wrongly-skipped file diverges the numbers, skip_effective is
    // the Spark-side file-count measurement
    "l12_versioned_zonemap" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    strftime(l_shipdate, '%Y-%m') AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'),
        |v2 AS (
        |  SELECT * FROM li WHERE month <> '1997-02'
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity + 1, month
        |  FROM li WHERE month = '1997-02' AND l_linenumber <= 4),
        |r AS (SELECT gmin + (gmax - gmin) * 3 // 8 AS lo,
        |    gmin + (gmax - gmin) // 2 AS hi
        |  FROM (SELECT min(l_orderkey) AS gmin,
        |    max(l_orderkey) AS gmax FROM li))
        |SELECT CAST(1 AS INTEGER) AS version, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  TRUE AS skip_effective
        |FROM li, r WHERE l_orderkey BETWEEN lo AND hi
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), count(*), round(sum(l_quantity), 2),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT), TRUE
        |FROM v2, r WHERE l_orderkey BETWEEN lo AND hi""".stripMargin,
    // l13: every change-feed number re-derived from the original
    // parquet by the restatement's construction — updates are the
    // deduped February lines <= 4 (before = original, after = +1),
    // removals the lines > 4, inserts the offset copies of line 7
    "l13_table_changes" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    min(l_quantity) AS l_quantity,
        |    min(strftime(l_shipdate, '%Y-%m')) AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'
        |  GROUP BY 1, 2),
        |feb AS (SELECT * FROM li WHERE month = '1997-02')
        |SELECT 'added' AS change_kind, count(*) AS n,
        |  round(0.0, 2) AS sum_before,
        |  round(sum(l_quantity + 3), 2) AS sum_after
        |FROM feb WHERE l_linenumber = 7
        |UNION ALL
        |SELECT 'changed', count(*), round(sum(l_quantity), 2),
        |  round(sum(l_quantity + 1), 2)
        |FROM feb WHERE l_linenumber <= 4
        |UNION ALL
        |SELECT 'removed', count(*), round(sum(l_quantity), 2),
        |  round(0.0, 2)
        |FROM feb WHERE l_linenumber > 4""".stripMargin,
    // l14: per-month numbers from the original parquet gate that the
    // OPTIMIZE re-layout moved no rows; files_before is the
    // FS-measured manifest count, equal by the deterministic staging
    // to 3 for the thrice-appended February and 1 elsewhere
    "l14_versioned_optimize" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |  count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  CAST(CASE WHEN strftime(l_shipdate, '%Y-%m') = '1997-02'
        |    THEN 3 ELSE 1 END AS BIGINT) AS files_before,
        |  TRUE AS compacted_ok
        |FROM lineitem
        |WHERE strftime(l_shipdate, '%Y-%m')
        |  BETWEEN '1997-01' AND '1997-03'
        |GROUP BY 1""".stripMargin,
    // l15: l11's oracle shape with the DELETE verb — tombstoned lines
    // 5-6 leave v2 entirely, so s2/d re-derive from the construction:
    // updates = feb lines <= 2, removals = lines 5-6, inserts = line 7
    // at the max-key-derived offset
    "l15_merge_delete" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    min(l_quantity) AS l_quantity,
        |    min(strftime(l_shipdate, '%Y-%m')) AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'
        |  GROUP BY 1, 2),
        |v2 AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN month = '1997-02' AND l_linenumber <= 2
        |         THEN l_quantity + 5 ELSE l_quantity END AS l_quantity,
        |    month
        |  FROM li
        |  WHERE NOT (month = '1997-02' AND l_linenumber BETWEEN 5 AND 6)
        |  UNION ALL
        |  SELECT l_orderkey +
        |      (SELECT (max(l_orderkey) // 10000000 + 1) * 10000000
        |       FROM li),
        |    l_linenumber, l_quantity + 3, month
        |  FROM li WHERE month = '1997-02' AND l_linenumber = 7),
        |s1 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM li),
        |s2 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM v2),
        |d AS (SELECT
        |    CAST(count(CASE WHEN month = '1997-02' AND l_linenumber <= 2
        |      THEN 1 END) AS BIGINT) AS n_changed_vs_prev,
        |    CAST(count(CASE WHEN month = '1997-02'
        |      AND l_linenumber BETWEEN 5 AND 6
        |      THEN 1 END) AS BIGINT) AS n_removed_vs_prev,
        |    CAST(count(CASE WHEN month = '1997-02' AND l_linenumber = 7
        |      THEN 1 END) AS BIGINT) AS n_added_vs_prev
        |  FROM li)
        |SELECT CAST(1 AS INTEGER) AS version, s1.n_rows, s1.sum_qty,
        |  s1.key_sig, CAST(0 AS BIGINT) AS n_changed_vs_prev,
        |  CAST(0 AS BIGINT) AS n_removed_vs_prev,
        |  CAST(0 AS BIGINT) AS n_added_vs_prev
        |FROM s1
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), s2.n_rows, s2.sum_qty, s2.key_sig,
        |  d.n_changed_vs_prev, d.n_removed_vs_prev, d.n_added_vs_prev
        |FROM s2, d""".stripMargin,
    // l33: the DV-merge must be read-indistinguishable from l15's
    // rewrite merge, so v2/s1/s2/d restate l15's oracle verbatim; the
    // economics columns re-derive from the construction — dv_rows =
    // matched stored rows (updates + tombstones), fresh_rows = the
    // delta's upsert rows (updates + inserts); base_files_carried is
    // the engine-side pointer invariant (the l10 boolean discipline)
    "l33_merge_dv" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    min(l_quantity) AS l_quantity,
        |    min(strftime(l_shipdate, '%Y-%m')) AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'
        |  GROUP BY 1, 2),
        |v2 AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN month = '1997-02' AND l_linenumber <= 2
        |         THEN l_quantity + 5 ELSE l_quantity END AS l_quantity,
        |    month
        |  FROM li
        |  WHERE NOT (month = '1997-02' AND l_linenumber BETWEEN 5 AND 6)
        |  UNION ALL
        |  SELECT l_orderkey +
        |      (SELECT (max(l_orderkey) // 10000000 + 1) * 10000000
        |       FROM li),
        |    l_linenumber, l_quantity + 3, month
        |  FROM li WHERE month = '1997-02' AND l_linenumber = 7),
        |s1 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM li),
        |s2 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM v2),
        |d AS (SELECT
        |    CAST(count(CASE WHEN month = '1997-02' AND l_linenumber <= 2
        |      THEN 1 END) AS BIGINT) AS n_changed_vs_prev,
        |    CAST(count(CASE WHEN month = '1997-02'
        |      AND l_linenumber BETWEEN 5 AND 6
        |      THEN 1 END) AS BIGINT) AS n_removed_vs_prev,
        |    CAST(count(CASE WHEN month = '1997-02' AND l_linenumber = 7
        |      THEN 1 END) AS BIGINT) AS n_added_vs_prev,
        |    CAST(count(CASE WHEN month = '1997-02'
        |      AND (l_linenumber <= 2 OR l_linenumber BETWEEN 5 AND 6)
        |      THEN 1 END) AS BIGINT) AS dv_rows,
        |    CAST(count(CASE WHEN month = '1997-02'
        |      AND (l_linenumber <= 2 OR l_linenumber = 7)
        |      THEN 1 END) AS BIGINT) AS fresh_rows
        |  FROM li)
        |SELECT CAST(1 AS INTEGER) AS version, s1.n_rows, s1.sum_qty,
        |  s1.key_sig, CAST(0 AS BIGINT) AS n_changed_vs_prev,
        |  CAST(0 AS BIGINT) AS n_removed_vs_prev,
        |  CAST(0 AS BIGINT) AS n_added_vs_prev,
        |  TRUE AS base_files_carried, d.dv_rows, d.fresh_rows
        |FROM s1, d
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), s2.n_rows, s2.sum_qty, s2.key_sig,
        |  d.n_changed_vs_prev, d.n_removed_vs_prev, d.n_added_vs_prev,
        |  TRUE, d.dv_rows, d.fresh_rows
        |FROM s2, d""".stripMargin,
    // l16: v2 = January/March untouched + February restated to lines
    // <= 4 with quantity + 1 and a marker column; n_src counts the
    // restated rows (0 for v1 — the back-filled NULLs)
    "l16_versioned_schema_evolution" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    strftime(l_shipdate, '%Y-%m') AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'),
        |v2 AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, 0 AS src_n
        |  FROM li WHERE month <> '1997-02'
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity + 1, 1
        |  FROM li WHERE month = '1997-02' AND l_linenumber <= 4)
        |SELECT CAST(1 AS INTEGER) AS version, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  CAST(0 AS BIGINT) AS n_src
        |FROM li
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), count(*), round(sum(l_quantity), 2),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT),
        |  CAST(sum(src_n) AS BIGINT)
        |FROM v2""".stripMargin,
    // l17: OPTIMIZE ZORDER is pure re-layout, so BOTH phases' numbers
    // are the same range aggregate over the original parquet (bounds
    // re-derived from the table's own min/max — == the manifest's
    // global stats by construction); layout_ok carries the Spark-side
    // file-skip measurement as a margin boolean
    "l17_zorder_optimize" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    strftime(l_shipdate, '%Y-%m') AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'),
        |r AS (SELECT gmin + (gmax - gmin) * 3 // 8 AS lo,
        |    gmin + (gmax - gmin) // 2 AS hi
        |  FROM (SELECT min(l_orderkey) AS gmin,
        |    max(l_orderkey) AS gmax FROM li))
        |SELECT 'pre' AS phase, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  TRUE AS layout_ok
        |FROM li, r WHERE l_orderkey BETWEEN lo AND hi
        |UNION ALL
        |SELECT 'post', count(*), round(sum(l_quantity), 2),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT), TRUE
        |FROM li, r WHERE l_orderkey BETWEEN lo AND hi""".stripMargin,
    // l18: the three as-of resolutions re-derived by construction —
    // ts 250 lands between commits (version 2), 300 hits exactly
    // (version 3), 9999 resolves to the newest stamped commit
    "l18_timestamp_asof" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    strftime(l_shipdate, '%Y-%m') AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'),
        |v2 AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, month
        |  FROM li WHERE month <> '1997-02'
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity + 1, month
        |  FROM li WHERE month = '1997-02' AND l_linenumber <= 4),
        |v3 AS (
        |  SELECT * FROM v2 WHERE month <> '1997-03'
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity + 2, month
        |  FROM li WHERE month = '1997-03' AND l_linenumber <= 3),
        |s2 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM v2),
        |s3 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM v3)
        |SELECT CAST(2 AS INTEGER) AS version, n_rows, sum_qty, key_sig,
        |  CAST(250 AS BIGINT) AS asof_ts, TRUE AS before_first_fails
        |FROM s2
        |UNION ALL
        |SELECT CAST(3 AS INTEGER), n_rows, sum_qty, key_sig,
        |  CAST(300 AS BIGINT), TRUE
        |FROM s3
        |UNION ALL
        |SELECT CAST(3 AS INTEGER), n_rows, sum_qty, key_sig,
        |  CAST(9999 AS BIGINT), TRUE
        |FROM s3""".stripMargin,
    // l19: the FULL RECOMPUTE of the maintained view over the final
    // state by the restatements' construction — maintenance is correct
    // iff indistinguishable from rebuilding (the q86/q88 discipline);
    // integer cents end to end
    "l19_cdf_ivm" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(round(min(l_quantity) * 100, 0) AS BIGINT) AS qty_c,
        |    min(strftime(l_shipdate, '%Y-%m')) AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'
        |  GROUP BY 1, 2),
        |v3 AS (
        |  SELECT month, qty_c FROM li WHERE month = '1997-01'
        |  UNION ALL
        |  SELECT month, qty_c + 100 FROM li
        |  WHERE month = '1997-02' AND l_linenumber <= 4
        |  UNION ALL
        |  SELECT month, qty_c + 300 FROM li
        |  WHERE month = '1997-02' AND l_linenumber = 7
        |  UNION ALL
        |  SELECT month, qty_c + 200 FROM li
        |  WHERE month = '1997-03' AND l_linenumber <= 3)
        |SELECT month, count(*) AS n_rows,
        |  CAST(sum(qty_c) AS BIGINT) AS qty_cents,
        |  TRUE AS ivm_eq_rebuild
        |FROM v3 GROUP BY 1""".stripMargin,
    // l20: the three post-vacuum snapshots by construction — src and
    // the deep clone hold version 2 (February restated), the shallow
    // branch adds its own March restatement on top
    "l20_clone" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    strftime(l_shipdate, '%Y-%m') AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'),
        |v2 AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, month
        |  FROM li WHERE month <> '1997-02'
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity + 1, month
        |  FROM li WHERE month = '1997-02' AND l_linenumber <= 4),
        |br AS (
        |  SELECT * FROM v2 WHERE month <> '1997-03'
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity + 2, month
        |  FROM li WHERE month = '1997-03' AND l_linenumber <= 3),
        |agg2 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM v2),
        |aggb AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM br)
        |SELECT n_rows, sum_qty, key_sig, 'src' AS snapshot FROM agg2
        |UNION ALL
        |SELECT n_rows, sum_qty, key_sig, 'branch' FROM aggb
        |UNION ALL
        |SELECT n_rows, sum_qty, key_sig, 'deep' FROM agg2""".stripMargin,
    // l21: the bad version's snapshot and the restored one — which
    // must equal version 1 (the plain Q1 slice) exactly
    "l21_restore" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    strftime(l_shipdate, '%Y-%m') AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'),
        |v2 AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity
        |  FROM li WHERE month <> '1997-02'
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity + 9
        |  FROM li WHERE month = '1997-02' AND l_linenumber <= 2)
        |SELECT CAST(2 AS INTEGER) AS version, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  TRUE AS history_forward, TRUE AS zero_copy
        |FROM v2
        |UNION ALL
        |SELECT CAST(3 AS INTEGER), count(*), round(sum(l_quantity), 2),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT),
        |  TRUE, TRUE
        |FROM li""".stripMargin,
    // l22: the (1, 3] append feed is exactly the February + March
    // commits' rows by construction; the rewrite refusal is the
    // Spark-side boolean
    "l22_append_feed" ->
      """SELECT count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  TRUE AS rewrite_refused
        |FROM lineitem
        |WHERE strftime(l_shipdate, '%Y-%m') IN ('1997-02', '1997-03')""".stripMargin,
    // l23: l15's delete slice executed as DELETION VECTORS — v2 folds
    // feb lines 5-6 out (removed-only diff), v3 is the OPTIMIZE
    // re-layout (content identical to v2, zero diffs); the manifest
    // witnesses (no data rewrite, sidecars present, sidecars retired)
    // are engine-side booleans the oracle expects TRUE
    "l23_deletion_vectors" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    min(l_quantity) AS l_quantity,
        |    min(strftime(l_shipdate, '%Y-%m')) AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'
        |  GROUP BY 1, 2),
        |v2 AS (
        |  SELECT * FROM li
        |  WHERE NOT (month = '1997-02' AND l_linenumber BETWEEN 5 AND 6)),
        |s1 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM li),
        |s2 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM v2),
        |d AS (SELECT CAST(count(*) AS BIGINT) AS n_removed FROM li
        |  WHERE month = '1997-02' AND l_linenumber BETWEEN 5 AND 6)
        |SELECT CAST(1 AS INTEGER) AS version, s1.n_rows, s1.sum_qty,
        |  s1.key_sig, CAST(0 AS BIGINT) AS n_changed_vs_prev,
        |  CAST(0 AS BIGINT) AS n_removed_vs_prev,
        |  CAST(0 AS BIGINT) AS n_added_vs_prev,
        |  TRUE AS no_data_rewrite, TRUE AS dv_sidecars_v2,
        |  TRUE AS dv_retired_v3
        |FROM s1
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), s2.n_rows, s2.sum_qty, s2.key_sig,
        |  CAST(0 AS BIGINT), d.n_removed, CAST(0 AS BIGINT),
        |  TRUE, TRUE, TRUE
        |FROM s2, d
        |UNION ALL
        |SELECT CAST(3 AS INTEGER), s2.n_rows, s2.sum_qty, s2.key_sig,
        |  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |  TRUE, TRUE, TRUE
        |FROM s2""".stripMargin,
    // l24: every probe re-derived from the construction — v3 mixes
    // January/March (old physical name, values pass through the id
    // map) with the +1 February restatement; v5's January/March read
    // NULL for the re-added qty (fresh id — no resurrection), so
    // n_qty counts only the new February rows; v1_evolved is all-NULL
    "l24_column_mapping" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    min(l_quantity) AS l_quantity,
        |    min(strftime(l_shipdate, '%Y-%m')) AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'
        |  GROUP BY 1, 2),
        |jm AS (SELECT * FROM li WHERE month <> '1997-02'),
        |v3 AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity AS qty FROM jm
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_quantity + 1 FROM li
        |  WHERE month = '1997-02' AND l_linenumber <= 4),
        |v5 AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(NULL AS DOUBLE) AS qty FROM jm
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_linenumber AS DOUBLE) FROM li
        |  WHERE month = '1997-02' AND l_linenumber <= 2)
        |SELECT 'v1' AS probe, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  count(l_quantity) AS n_qty, TRUE AS rename_zero_copy
        |FROM li
        |UNION ALL
        |SELECT 'v3_renamed', count(*), round(sum(qty), 2),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT),
        |  count(qty), TRUE
        |FROM v3
        |UNION ALL
        |SELECT 'v5_readd', count(*),
        |  round(coalesce(sum(qty), 0), 2),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT),
        |  count(qty), TRUE
        |FROM v5
        |UNION ALL
        |SELECT 'v1_evolved', count(*), CAST(0.0 AS DOUBLE),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT),
        |  CAST(0 AS BIGINT), TRUE
        |FROM li""".stripMargin,
    // l25: l09's restatement story on a SEGMENTED-manifest lake — the
    // v1/v2 snapshots and diff re-derive from parquet (an entry line
    // lost/duplicated/mis-expanded by segmentation fails
    // n_rows/key_sig); version 3 is the pointer-PRUNED February read
    // of v2; the segment counters are per-partition (3 months → 3
    // segments, Feb restated → 1 fresh + 2 reused), deterministic by
    // construction
    "l25_segmented_manifests" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    min(l_quantity) AS l_quantity,
        |    min(strftime(l_shipdate, '%Y-%m')) AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'
        |  GROUP BY 1, 2),
        |v2 AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN month = '1997-02' THEN l_quantity + 1
        |         ELSE l_quantity END AS l_quantity,
        |    month
        |  FROM li
        |  WHERE month <> '1997-02' OR l_linenumber <= 4),
        |s1 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM li),
        |s2 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM v2),
        |s3 AS (SELECT count(*) AS n_rows,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |      AS key_sig
        |  FROM v2 WHERE month = '1997-02'),
        |chg AS (SELECT CAST(count(*) AS BIGINT) AS n FROM li
        |  WHERE month = '1997-02' AND l_linenumber <= 4),
        |rem AS (SELECT CAST(count(*) AS BIGINT) AS n FROM li
        |  WHERE month = '1997-02' AND l_linenumber > 4)
        |SELECT CAST(1 AS INTEGER) AS version, s1.n_rows, s1.sum_qty,
        |  s1.key_sig, CAST(0 AS BIGINT) AS n_changed_vs_prev,
        |  CAST(0 AS BIGINT) AS n_removed_vs_prev,
        |  CAST(0 AS BIGINT) AS n_added_vs_prev,
        |  CAST(3 AS INTEGER) AS segs_total,
        |  CAST(2 AS INTEGER) AS segs_reused_v2,
        |  CAST(1 AS INTEGER) AS segs_fresh_v2
        |FROM s1
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), s2.n_rows, s2.sum_qty, s2.key_sig,
        |  chg.n, rem.n, CAST(0 AS BIGINT),
        |  CAST(3 AS INTEGER), CAST(2 AS INTEGER), CAST(1 AS INTEGER)
        |FROM s2, chg, rem
        |UNION ALL
        |SELECT CAST(3 AS INTEGER), s3.n_rows, s3.sum_qty, s3.key_sig,
        |  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |  CAST(3 AS INTEGER), CAST(2 AS INTEGER), CAST(1 AS INTEGER)
        |FROM s3""".stripMargin,
    // l26: the final snapshot (Jan/Mar ∪ Feb lines<=4 qty+1 — the
    // violating qty=-5 restatement never landed) and the violating
    // delta's row count re-derive from parquet; the engine booleans
    // are expected TRUE except add_over_violating_refused, which the
    // oracle re-derives as the actual refusal condition max(qty) > 10
    "l26_table_constraints" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    min(l_quantity) AS l_quantity,
        |    min(strftime(l_shipdate, '%Y-%m')) AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'
        |  GROUP BY 1, 2),
        |v4 AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN month = '1997-02' THEN l_quantity + 1
        |         ELSE l_quantity END AS l_quantity,
        |    month
        |  FROM li
        |  WHERE month <> '1997-02' OR l_linenumber <= 4)
        |SELECT count(*) AS n_rows_v4,
        |  round(sum(l_quantity), 2) AS sum_qty_v4,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT)
        |    AS key_sig_v4,
        |  (SELECT CAST(count(*) AS BIGINT) FROM li
        |   WHERE month = '1997-02' AND l_linenumber <= 2) AS viol_rows,
        |  TRUE AS violating_commit_aborted,
        |  TRUE AS no_version_minted,
        |  (SELECT max(l_quantity) > 10 FROM v4)
        |    AS add_over_violating_refused,
        |  TRUE AS drop_column_refused,
        |  TRUE AS constraint_carried
        |FROM v4""".stripMargin,
    // l27: both probes re-derive with PLAIN source-column predicates —
    // the transform/prune machinery must be invisible in the result;
    // partition counters are per-partition (3 months, Feb range -> 1),
    // deterministic; bucket keys are the 5 lowest distinct February
    // orderkeys (deterministic)
    "l27_hidden_partitioning" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    min(l_quantity) AS l_quantity,
        |    min(CAST(l_shipdate AS DATE)) AS l_shipdate
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE)
        |    BETWEEN DATE '1997-01-01' AND DATE '1997-03-31'
        |  GROUP BY 1, 2),
        |keys AS (
        |  SELECT DISTINCT l_orderkey FROM li
        |  WHERE strftime(l_shipdate, '%Y-%m') = '1997-02'
        |  ORDER BY 1 LIMIT 5)
        |SELECT 'range_month' AS probe, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  CAST(3 AS INTEGER) AS parts_total_month,
        |  CAST(1 AS INTEGER) AS parts_scanned_range,
        |  TRUE AS bucket_pruned, TRUE AS hidden_col_absent
        |FROM li
        |WHERE l_shipdate BETWEEN DATE '1997-02-03' AND DATE '1997-02-20'
        |UNION ALL
        |SELECT 'match_bucket', count(*), round(sum(l_quantity), 2),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT),
        |  CAST(3 AS INTEGER), CAST(1 AS INTEGER), TRUE, TRUE
        |FROM li
        |WHERE l_orderkey IN (SELECT l_orderkey FROM keys)""".stripMargin,
    // l31: the mixed-era reads must be TRANSFORM-INVISIBLE — plain
    // source-column predicates over the original parquet; the scanned
    // counters re-derive from the data (months with data in the
    // projected month window for the month era, days with data in the
    // bound window for the day era); pruned is the engine boolean
    "l31_partspec_evolution" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    min(l_quantity) AS l_quantity,
        |    min(CAST(l_shipdate AS DATE)) AS l_shipdate
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE)
        |    BETWEEN DATE '1997-01-01' AND DATE '1997-04-30'
        |  GROUP BY 1, 2),
        |me AS (
        |  SELECT CAST(count(DISTINCT strftime(l_shipdate, '%Y-%m'))
        |      AS INTEGER) AS n
        |  FROM li
        |  WHERE l_shipdate < DATE '1997-04-01'
        |    AND strftime(l_shipdate, '%Y-%m') >= '1997-02'),
        |de AS (
        |  SELECT CAST(count(DISTINCT l_shipdate) AS INTEGER) AS n
        |  FROM li
        |  WHERE l_shipdate
        |    BETWEEN DATE '1997-04-01' AND DATE '1997-04-05')
        |SELECT 'range_mixed' AS probe, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  me.n AS parts_month_era_scanned,
        |  de.n AS parts_day_era_scanned,
        |  TRUE AS pruned
        |FROM li, me, de
        |WHERE l_shipdate BETWEEN DATE '1997-02-10' AND DATE '1997-04-05'
        |GROUP BY me.n, de.n
        |UNION ALL
        |SELECT 'match_mixed', count(*), round(sum(l_quantity), 2),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT),
        |  me.n, de.n, TRUE
        |FROM li, me, de
        |WHERE l_shipdate IN (DATE '1997-02-14', DATE '1997-04-03')
        |GROUP BY me.n, de.n""".stripMargin,
    // l34: both views' February aggregates re-derive from the
    // original parquet (v2 = the l09 restatement: lines <= 4 kept at
    // quantity + 1); the prune counters are the Q1 fixture's 3 month
    // partitions with 1 probed
    "l34_datasource_v2" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    strftime(l_shipdate, '%Y-%m') AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03')
        |SELECT 'v1_feb' AS probe, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  CAST(3 AS INTEGER) AS parts_live,
        |  CAST(1 AS INTEGER) AS parts_read
        |FROM li WHERE month = '1997-02'
        |UNION ALL
        |SELECT 'v2_feb', count(*), round(sum(l_quantity + 1), 2),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT),
        |  CAST(3 AS INTEGER), CAST(1 AS INTEGER)
        |FROM li WHERE month = '1997-02' AND l_linenumber <= 4""".stripMargin,
    // l35: the library-append equality — Q1+Apr+May re-derive from
    // the original parquet; if the format's append/txn-append had
    // landed differently from library appends (dropped rows, a
    // double-applied May replay, a forked version) the aggregates or
    // the engine booleans would miss
    "l35_datasource_v2_write" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    strftime(l_shipdate, '%Y-%m') AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-05')
        |SELECT 'fmt_appended' AS probe, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  TRUE AS replay_noop, TRUE AS tt_write_refused
        |FROM li
        |UNION ALL
        |SELECT 'pre_append', count(*), round(sum(l_quantity), 2),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT),
        |  TRUE, TRUE
        |FROM li WHERE month <= '1997-03'""".stripMargin,
    // l32: both versions' aggregates re-derive through the same
    // narrow-then-widen casts (quantities are integral, so the
    // REAL→DOUBLE sums are bit-exact); the refusal witnesses are
    // engine booleans
    "l32_type_widening" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS REAL) AS qf,
        |    CAST(l_quantity AS DOUBLE) AS qd,
        |    strftime(l_shipdate, '%Y-%m') AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-04')
        |SELECT 'v1_narrow' AS probe, count(*) AS n_rows,
        |  round(sum(CAST(qf AS DOUBLE)), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  TRUE AS narrow_refused, TRUE AS minted_nothing,
        |  TRUE AS types_widened
        |FROM li WHERE month < '1997-04'
        |UNION ALL
        |SELECT 'v2_mixed', count(*),
        |  round(sum(CASE WHEN month < '1997-04'
        |    THEN CAST(qf AS DOUBLE) ELSE qd END), 2),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT),
        |  TRUE, TRUE, TRUE
        |FROM li""".stripMargin,
    // l28: both lookups re-derive with PLAIN IN predicates (the bloom
    // prune must be result-invisible — a wrongly skipped file loses
    // rows); keys are the 5 lowest distinct partkeys (deterministic);
    // the append carries kmin on shifted orderkeys (ttKeyOffset rule);
    // skip/incremental witnesses are engine booleans expected TRUE
    "l28_bloom_index" ->
      s"""WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    min(l_quantity) AS l_quantity,
        |    min(l_partkey) AS l_partkey,
        |    min(strftime(l_shipdate, '%Y-%m')) AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'
        |  GROUP BY 1, 2),
        |keys AS (
        |  SELECT DISTINCT l_partkey FROM li ORDER BY 1 LIMIT 5),
        |v2 AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_partkey
        |  FROM li
        |  UNION ALL
        |  SELECT l_orderkey + $ttKeyOffsetSql, l_linenumber,
        |    l_quantity, (SELECT min(l_partkey) FROM keys)
        |  FROM li WHERE month = '1997-02' AND l_linenumber <= 2)
        |SELECT 'v1_lookup' AS probe, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  TRUE AS bloom_skips_v1, TRUE AS bloom_skips_v2,
        |  TRUE AS incremental_fresh_only
        |FROM li WHERE l_partkey IN (SELECT l_partkey FROM keys)
        |UNION ALL
        |SELECT 'v2_lookup', count(*), round(sum(l_quantity), 2),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT),
        |  TRUE, TRUE, TRUE
        |FROM v2 WHERE l_partkey IN (SELECT l_partkey FROM keys)"""
        .stripMargin,
    // l29: every history field re-derives from the construction — the
    // five verbs' op labels, txn/ts presence, partition counts, DV
    // flag, constraint count, and each version's snapshot row count
    "l29_table_history" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    min(l_quantity) AS l_quantity,
        |    min(strftime(l_shipdate, '%Y-%m')) AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'
        |  GROUP BY 1, 2),
        |n1 AS (SELECT count(*) AS n FROM li),
        |n2 AS (SELECT
        |    (SELECT count(*) FROM li WHERE month <> '1997-02') +
        |    (SELECT count(*) FROM li
        |     WHERE month = '1997-02' AND l_linenumber <= 4) AS n),
        |d1 AS (SELECT count(*) AS n FROM li
        |  WHERE month = '1997-02' AND l_linenumber = 1)
        |SELECT CAST(1 AS INTEGER) AS version, 'overwrite' AS op,
        |  FALSE AS has_txn, FALSE AS has_ts,
        |  CAST(3 AS INTEGER) AS n_parts, FALSE AS has_dvs,
        |  CAST(0 AS INTEGER) AS n_constraints,
        |  (SELECT n FROM n1) AS n_rows
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), 'upsert', TRUE, FALSE,
        |  CAST(3 AS INTEGER), FALSE, CAST(0 AS INTEGER),
        |  (SELECT n FROM n2)
        |UNION ALL
        |SELECT CAST(3 AS INTEGER), 'delete', FALSE, FALSE,
        |  CAST(3 AS INTEGER), TRUE, CAST(0 AS INTEGER),
        |  (SELECT n FROM n2) - (SELECT n FROM d1)
        |UNION ALL
        |SELECT CAST(4 AS INTEGER), 'restore', FALSE, TRUE,
        |  CAST(3 AS INTEGER), FALSE, CAST(0 AS INTEGER),
        |  (SELECT n FROM n1)
        |UNION ALL
        |SELECT CAST(5 AS INTEGER), 'add_constraint', FALSE, FALSE,
        |  CAST(3 AS INTEGER), FALSE, CAST(1 AS INTEGER),
        |  (SELECT n FROM n1)""".stripMargin,
    // l30: the merged snapshot re-derives from the construction —
    // updated Feb lines <= 2 (qty+1, src set), inserted offset-keyed
    // line-1 copies (src set), every other row carried with src NULL;
    // v1 read evolved is all-NULL src; strict-mode refusal booleans
    // are engine-side, expected TRUE
    "l30_merge_schema_evolution" ->
      s"""WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    min(l_quantity) AS l_quantity,
        |    min(strftime(l_shipdate, '%Y-%m')) AS month
        |  FROM lineitem
        |  WHERE strftime(l_shipdate, '%Y-%m')
        |    BETWEEN '1997-01' AND '1997-03'
        |  GROUP BY 1, 2),
        |v2 AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN month = '1997-02' AND l_linenumber <= 2
        |         THEN l_quantity + 1 ELSE l_quantity END AS l_quantity,
        |    CASE WHEN month = '1997-02' AND l_linenumber <= 2
        |         THEN 1 END AS s
        |  FROM li
        |  UNION ALL
        |  SELECT l_orderkey + $ttKeyOffsetSql, l_linenumber,
        |    l_quantity, 1
        |  FROM li WHERE month = '1997-02' AND l_linenumber = 1)
        |SELECT 'v2_merged' AS probe, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sig,
        |  count(s) AS n_src,
        |  TRUE AS strict_refused, TRUE AS strict_minted_nothing
        |FROM v2
        |UNION ALL
        |SELECT 'v1_evolved', count(*), round(sum(l_quantity), 2),
        |  CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT),
        |  CAST(0 AS BIGINT), TRUE, TRUE
        |FROM li""".stripMargin,
    // the Bloom prune is output-invisible by construction (false
    // positives die in the exact join), so the oracle is the PLAIN join
    "q38_bloom_join" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS suppkey, s_name,
        |  round(sum(l_extendedprice), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_acctbal > 5000.0
        |GROUP BY 1, 2""".stripMargin,
    // both probes re-derived independently of the engine: exact dup on
    // RAW TEXT equality (not the engine's sha2 rewrite), near dup from
    // the naive inverted-index Jaccard restricted to delta x corpus
    // (not the prefix-filtered join)
    "c02_incremental_dedup" ->
      """WITH delta AS (
        |  SELECT doc_id, text, source FROM documents
        |  WHERE doc_id % 100 >= 80
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text, source FROM documents
        |  WHERE doc_id % 100 < 10),
        |corpus AS (SELECT doc_id, text, source FROM documents
        |  WHERE doc_id % 100 < 80),
        |ex AS (SELECT DISTINCT d.doc_id
        |  FROM delta d JOIN corpus c ON d.text = c.text),
        |tok AS (SELECT doc_id, source,
        |    unnest(list_distinct(regexp_extract_all(lower(text),
        |      '[a-z0-9]+'))) AS t
        |  FROM (SELECT * FROM delta UNION ALL SELECT * FROM corpus)),
        |cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
        |dd AS (SELECT doc_id FROM delta),
        |cc AS (SELECT doc_id FROM corpus),
        |inter AS (
        |  SELECT a.doc_id AS pid, b.doc_id AS cid, count(*) AS i
        |  FROM tok a JOIN tok b ON a.t = b.t AND a.source = b.source
        |  JOIN dd ON a.doc_id = dd.doc_id
        |  JOIN cc ON b.doc_id = cc.doc_id
        |  GROUP BY 1, 2),
        |near AS (SELECT DISTINCT pid AS doc_id FROM inter
        |  JOIN cnt ca ON pid = ca.doc_id
        |  JOIN cnt cb ON cid = cb.doc_id
        |  WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5)
        |SELECT d.doc_id,
        |  (e.doc_id IS NOT NULL) AS exact_dup,
        |  (n.doc_id IS NOT NULL) AS near_dup,
        |  (e.doc_id IS NULL AND n.doc_id IS NULL) AS kept
        |FROM delta d
        |LEFT JOIN ex e ON d.doc_id = e.doc_id
        |LEFT JOIN near n ON d.doc_id = n.doc_id""".stripMargin,
    "t06_stopword_filter" ->
      """WITH t AS (SELECT doc_id,
        |  list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS toks
        |  FROM documents)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |CAST(len(list_filter(toks, x -> x NOT IN
        |  ('the','a','of','and','to','in','is','it','that','for'))) AS BIGINT)
        |  AS n_content_tokens
        |FROM t""".stripMargin,
    // The funnel re-derived end to end; the cluster-canonical count
    // comes from a recursive-CTE min-label closure over the verified
    // pair set — independent of the Spark-side star algorithm.
    "c01_curation_pipeline" ->
      """WITH RECURSIVE q AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE len(regexp_extract_all(text, '\S+')) >= 5
        |    AND len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
        |        / nullif(CAST(len(text) AS DOUBLE), 0) <= 0.3),
        |u AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text, min(doc_id) OVER (PARTITION BY
        |      md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))) AS canon
        |    FROM q) WHERE doc_id = canon),
        |raw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM u),
        |t AS (SELECT doc_id, list_filter(tk, (x,i) -> list_position(tk, x) = i) AS toks FROM raw),
        |sh AS (SELECT doc_id, toks,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i+1:i+3], ' ')
        |               FOR i IN range(0, len(toks)-2)] END AS shingles FROM t),
        |cnt AS (SELECT doc_id, len(shingles) AS ns, len(toks) AS nt FROM sh),
        |se AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |si AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS i FROM se a
        |       JOIN se b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |te AS (SELECT doc_id, unnest(toks) AS tk FROM t),
        |ti AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS i FROM te a
        |       JOIN te b ON a.tk = b.tk AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |e2 AS (
        |  SELECT si.ia AS a, si.ib AS b
        |  FROM si JOIN ti ON si.ia = ti.ia AND si.ib = ti.ib
        |  JOIN cnt ca ON si.ia = ca.doc_id JOIN cnt cb ON si.ib = cb.doc_id
        |  WHERE CAST(si.i AS DOUBLE) / (ca.ns + cb.ns - si.i) >= 0.6
        |    AND CAST(ti.i AS DOUBLE) / (ca.nt + cb.nt - ti.i) >= 0.6),
        |kept AS (SELECT u.doc_id, u.text FROM u
        |         LEFT JOIN (SELECT DISTINCT b FROM e2) d ON u.doc_id = d.b
        |         WHERE d.b IS NULL),
        |sym2 AS (SELECT a, b FROM e2 UNION SELECT b AS a, a AS b FROM e2),
        |reach2(id, comp) AS (
        |  SELECT doc_id, doc_id FROM u
        |  UNION
        |  SELECT s.b, r.comp FROM reach2 r JOIN sym2 s ON s.a = r.id),
        |lab2 AS (SELECT id, min(comp) AS component FROM reach2 GROUP BY 1),
        |ch AS (SELECT CAST(ceil(greatest(
        |    len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 30, 0) / 20.0)
        |    AS BIGINT) + 1 AS nch FROM kept)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_input,
        |  (SELECT CAST(count(*) AS BIGINT) FROM q) AS n_quality,
        |  (SELECT CAST(count(*) AS BIGINT) FROM u) AS n_unique,
        |  (SELECT CAST(count(*) AS BIGINT) FROM kept) AS n_kept,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lab2 WHERE id = component)
        |    AS n_kept_clustered,
        |  (SELECT CAST(COALESCE(sum(nch), 0) AS BIGINT) FROM ch) AS n_chunks""".stripMargin,
    "t05_chunking" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |idx AS (SELECT doc_id, toks,
        |    unnest(range(0, CAST(ceil(greatest(len(toks) - 30, 0) / 20.0) AS BIGINT) + 1)) AS i
        |  FROM t)
        |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |  array_to_string(toks[i*20+1 : i*20+30], ' ') AS chunk
        |FROM idx""".stripMargin,
    "d01_dedup_exact" ->
      """SELECT min(doc_id) AS canonical_id, CAST(count(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    // d02 oracle: the truth count is recomputed from scratch in DuckDB
    // (order-preserving distinct via first-occurrence list_filter, 3-gram
    // shingles, inverted-index joins); recall_ok is the LSH contract.
    "d02_dedup_minhash" ->
      """WITH raw AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
        |t AS (SELECT doc_id,
        |    list_filter(tk, (x,i) -> list_position(tk, x) = i) AS toks FROM raw),
        |sh AS (SELECT doc_id, toks,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i+1:i+3], ' ')
        |               FOR i IN range(0, len(toks)-2)] END AS shingles
        |    FROM t),
        |cnt AS (SELECT doc_id, len(shingles) AS ns, len(toks) AS nt FROM sh),
        |se AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |si AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS i FROM se a
        |       JOIN se b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |te AS (SELECT doc_id, unnest(toks) AS tk FROM t),
        |ti AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS i FROM te a
        |       JOIN te b ON a.tk = b.tk AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_true, TRUE AS recall_ok
        |FROM si JOIN ti ON si.ia = ti.ia AND si.ib = ti.ib
        |JOIN cnt ca ON si.ia = ca.doc_id JOIN cnt cb ON si.ib = cb.doc_id
        |WHERE CAST(si.i AS DOUBLE) / (ca.ns + cb.ns - si.i) >= 0.6
        |  AND CAST(ti.i AS DOUBLE) / (ca.nt + cb.nt - ti.i) >= 0.6""".stripMargin,
    // d03 oracle: constant contract row — the in-Spark check is the
    // brute-force cross-validation (pigeonhole blocking is exact).
    "d03_dedup_simhash" ->
      "SELECT TRUE AS blocking_exact, TRUE AS pairs_nonzero",
    // d12: the d02 truth CTEs in PER-PAIR form with the exact shingle
    // Jaccard; est_ok is the in-Spark estimator-accuracy boolean
    // (signature internals have no SQL equivalent)
    "d12_minhash_estimate" ->
      """WITH raw AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
        |t AS (SELECT doc_id,
        |    list_filter(tk, (x,i) -> list_position(tk, x) = i) AS toks FROM raw),
        |sh AS (SELECT doc_id, toks,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i+1:i+3], ' ')
        |               FOR i IN range(0, len(toks)-2)] END AS shingles
        |    FROM t),
        |cnt AS (SELECT doc_id, len(shingles) AS ns, len(toks) AS nt FROM sh),
        |se AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |si AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS i FROM se a
        |       JOIN se b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |te AS (SELECT doc_id, unnest(toks) AS tk FROM t),
        |ti AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS i FROM te a
        |       JOIN te b ON a.tk = b.tk AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT si.ia AS id_a, si.ib AS id_b,
        |  round(CAST(si.i AS DOUBLE) / (ca.ns + cb.ns - si.i), 4) AS jaccard,
        |  TRUE AS est_ok
        |FROM si JOIN ti ON si.ia = ti.ia AND si.ib = ti.ib
        |JOIN cnt ca ON si.ia = ca.doc_id JOIN cnt cb ON si.ib = cb.doc_id
        |WHERE CAST(si.i AS DOUBLE) / (ca.ns + cb.ns - si.i) >= 0.6
        |  AND CAST(ti.i AS DOUBLE) / (ca.nt + cb.nt - ti.i) >= 0.6""".stripMargin,
    "d05_embed_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |p AS (SELECT list_cosine_similarity(a.v, b.v) AS s
        |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_true, TRUE AS recall_ok
        |FROM p WHERE s >= 0.4""".stripMargin,
    // d15: exact takedown arithmetic recomputed from embeddings; the
    // two booleans are the computed purge-completeness and the
    // store-signature equality vs the from-scratch rebuild, pinned
    "d15_index_takedown" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vecs_before,
        |  CAST(count(CASE WHEN vec_id % 10 <> 7 THEN 1 END) AS BIGINT)
        |    AS n_vecs_after,
        |  CAST(count(CASE WHEN vec_id % 10 = 7 THEN 1 END) AS BIGINT)
        |    AS n_takedown,
        |  TRUE AS purge_complete, TRUE AS stores_eq_rebuild
        |FROM embeddings""".stripMargin,
    // d14: n_true = d05's exact all-pairs truth RESTRICTED to pairs
    // touching the delta quarter; the two booleans are the Spark-side
    // incremental==rebuild equality and the recall bound, pinned
    "d14_incremental_lsh" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |p AS (SELECT list_cosine_similarity(a.v, b.v) AS s
        |      FROM e a JOIN e b ON a.vec_id < b.vec_id
        |      WHERE a.vec_id % 4 = 3 OR b.vec_id % 4 = 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_true, TRUE AS recall_ok,
        |  TRUE AS inc_eq_rebuild
        |FROM p WHERE s >= 0.4""".stripMargin,
    // d09: n_ideal = distinct higher ids over the SAME all-pairs cosine
    // truth d05 recomputes; the two booleans are the Spark-side checks,
    // pinned (recall floor 0.7 — measured 0.96/0.88, RecallMarginSpec)
    "d09_semdedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |p AS (SELECT b.vec_id AS id_b
        |      FROM e a JOIN e b ON a.vec_id < b.vec_id
        |      WHERE list_cosine_similarity(a.v, b.v) >= 0.4)
        |SELECT CAST(count(DISTINCT id_b) AS BIGINT) AS n_ideal,
        |  TRUE AS recall_ok, TRUE AS drops_justified
        |FROM p""".stripMargin,
    "s02_ann_lsh" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    "s03_ann_ivf" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    // s16: same contract shape as s03/s10 — the recall bound vs the
    // exact truth is asserted in-Spark (annRecallCheck)
    "s16_ann_ivfadc" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    // s18: s16's recall contract + the computed persisted==rebuild
    // set equality (the s15 discipline on the IVFADC modality)
    "s18_ann_ivfadc_persisted" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok,
        |  TRUE AS idx_eq_rebuild
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    // s19: cross-modal recall contract — the bound vs the exact
    // text-query × image-corpus brute force is asserted in-Spark
    // (annRecallCheck); text query ids are the +100000-offset space
    "s19_crossmodal_search" ->
      """SELECT vec_id + 100000 AS query_id, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    // s20: the incremental-ingest contract — n_new_vecs/n_codes are
    // re-derived from the delta's construction (m = 16 code rows per
    // vector); the equality booleans are computed in-Spark against
    // the one-shot rebuild (the q86/q88 rebuild discipline)
    "s20_ivfadc_incremental" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_new_vecs,
        |  CAST(count(*) * 16 AS BIGINT) AS n_codes,
        |  TRUE AS one_version_per_batch,
        |  TRUE AS codes_eq_rebuild,
        |  TRUE AS search_eq_rebuild
        |FROM embeddings WHERE vec_id % 10 < 4""".stripMargin,
    // s21: counts re-derived from the delta/retract construction
    // ((v+200000) % 5 == v % 5, so the retracted slice is vec_id%10<4
    // AND vec_id%5==0; 16 code rows per vector); the purge and
    // never-ingested-equivalence booleans are computed in-Spark (the
    // d15 discipline on the codes modality)
    "s21_ivfadc_takedown" ->
      """WITH d AS (SELECT vec_id FROM embeddings WHERE vec_id % 10 < 4),
        |r AS (SELECT vec_id FROM d WHERE vec_id % 5 = 0)
        |SELECT CAST((SELECT count(*) FROM d) * 16 AS BIGINT)
        |    AS n_codes_before,
        |  CAST(((SELECT count(*) FROM d) - (SELECT count(*) FROM r))
        |    * 16 AS BIGINT) AS n_codes_after,
        |  TRUE AS purge_complete,
        |  TRUE AS equiv_never_ingested""".stripMargin,
    // s15: s02's recall contract + the computed index==rebuild equality
    "s15_ann_persisted" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok,
        |  TRUE AS idx_eq_rebuild
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    // filtered ANN: same contract shape — the recall bound vs the
    // exact label-filtered truth is asserted in-Spark (annRecallCheck)
    "s12_ann_filtered" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    "d04_token_jaccard" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS t
        |  FROM documents),
        |cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM tok a JOIN tok b
        |    ON a.t = b.t AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 4) AS jaccard
        |FROM inter
        |JOIN cnt ca ON id_a = ca.doc_id
        |JOIN cnt cb ON id_b = cb.doc_id
        |WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5""".stripMargin,
    "d04b_token_jaccard_capped" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS t
        |  FROM documents),
        |bs AS (SELECT source, count(*) AS b FROM documents GROUP BY 1),
        |keep AS (SELECT source, t FROM tok JOIN bs USING (source)
        |         GROUP BY source, t, b HAVING count(*) <= 0.8 * b),
        |ft AS (SELECT doc_id, source, t FROM tok JOIN keep USING (source, t)),
        |cnt AS (SELECT doc_id, count(*) AS n FROM ft GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM ft a JOIN ft b
        |    ON a.t = b.t AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 4) AS jaccard
        |FROM inter
        |JOIN cnt ca ON id_a = ca.doc_id
        |JOIN cnt cb ON id_b = cb.doc_id
        |WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5""".stripMargin,
    // Components derived INDEPENDENTLY of the Spark-side star
    // algorithm: recursive-CTE min-label transitive closure over the
    // symmetric closure of the same ≥0.5 token-Jaccard pair set.
    "d07_dup_clusters" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS t
        |  FROM documents),
        |cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM tok a JOIN tok b
        |    ON a.t = b.t AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |e AS (
        |  SELECT id_a AS a, id_b AS b FROM inter
        |  JOIN cnt ca ON id_a = ca.doc_id
        |  JOIN cnt cb ON id_b = cb.doc_id
        |  WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5),
        |sym AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
        |reach(id, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.id),
        |lab AS (SELECT id AS doc_id, min(comp) AS component
        |        FROM reach GROUP BY 1)
        |SELECT doc_id, component,
        |  CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
        |    AS cluster_size
        |FROM lab""".stripMargin,
    // c11: the d07 closure with the exact micro-weight column — the
    // oracle re-derives components via the same independent
    // recursive-CTE min-label closure, never the star algorithm
    "c12_split_holdout" ->
      """WITH r AS (SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':split'), doc_id)
        |      AS BIGINT) AS rn
        |  FROM documents),
        |n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1)
        |SELECT doc_id, r.lang, rn,
        |  CASE WHEN rn * 100 <= n * 98 THEN 'train'
        |       WHEN rn * 100 <= n * 99 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM r JOIN n ON r.lang = n.lang""".stripMargin,
    "c11_soft_dedup_weights" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS t
        |  FROM documents),
        |cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM tok a JOIN tok b
        |    ON a.t = b.t AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |e AS (
        |  SELECT id_a AS a, id_b AS b FROM inter
        |  JOIN cnt ca ON id_a = ca.doc_id
        |  JOIN cnt cb ON id_b = cb.doc_id
        |  WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5),
        |sym AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
        |reach(id, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.id),
        |lab AS (SELECT id AS doc_id, min(comp) AS component
        |        FROM reach GROUP BY 1)
        |SELECT doc_id,
        |  CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
        |    AS cluster_size,
        |  CAST(1000000 // count(*) OVER (PARTITION BY component)
        |    AS BIGINT) AS w_micro
        |FROM lab""".stripMargin,
    // Independent restatement of the QUANTIZATION CONTRACT
    // (QuantizeExpressions.scaladoc): per-dim max-abs scales, codes =
    // clamp(floor(v*127/s + 0.5)), int64 scores — all exact arithmetic,
    // so this hash-matches the Spark result bit-for-bit.
    "s05_ann_quantized" ->
      """WITH dims AS (SELECT unnest(range(1,
        |    (SELECT max(len(embedding)) FROM embeddings) + 1)) AS i),
        |sc AS (SELECT i, max(abs(CAST(embedding[i] AS DOUBLE))) AS s
        |       FROM embeddings, dims GROUP BY i),
        |sv AS (SELECT list(s ORDER BY i) AS s FROM sc),
        |qz AS (SELECT vec_id,
        |  [CASE WHEN sv.s[i] = 0 THEN 0
        |        ELSE CAST(least(127, greatest(-127,
        |          floor(CAST(embedding[i] AS DOUBLE) * 127 / sv.s[i] + 0.5)))
        |          AS BIGINT) END
        |   FOR i IN range(1, len(embedding) + 1)] AS q
        |  FROM embeddings, sv),
        |qs AS (SELECT vec_id AS query_id, q AS qq FROM qz WHERE vec_id < 10),
        |scored AS (SELECT qs.query_id, c.vec_id AS cand_id,
        |    CAST(list_sum([c.q[i] * qs.qq[i]
        |      FOR i IN range(1, len(c.q) + 1)]) AS BIGINT) AS iscore
        |  FROM qz c, qs WHERE c.vec_id <> qs.query_id),
        |ranked AS (SELECT query_id, cand_id, iscore,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY iscore DESC, cand_id) AS INT) AS rnk
        |  FROM scored)
        |SELECT query_id, rnk, cand_id, iscore FROM ranked
        |WHERE rnk <= 10""".stripMargin,
    // s14: same 1e-4 quantization grid re-derived per element; the
    // denominator-free centroid displacement n_cand·Σref − n_ref·Σcand
    // keeps every cell integer
    "s14_embedding_drift" ->
      """WITH qz AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    vec_id % 2 = 1 AS cand,
        |    [CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000 + 0.5)
        |       AS BIGINT) FOR i IN range(1, len(embedding) + 1)] AS q
        |  FROM embeddings),
        |ex AS (SELECT label, cand, i, q[i] AS qi
        |  FROM qz, (SELECT unnest(range(1,
        |    (SELECT max(len(q)) FROM qz) + 1)) AS i)
        |  WHERE i <= len(q)),
        |dim AS (SELECT label, i,
        |    CAST(sum(CASE WHEN NOT cand THEN qi ELSE 0 END) AS BIGINT)
        |      AS sr,
        |    CAST(sum(CASE WHEN cand THEN qi ELSE 0 END) AS BIGINT) AS sc
        |  FROM ex GROUP BY 1, 2),
        |lab AS (SELECT label,
        |    CAST(count(CASE WHEN NOT cand THEN 1 END) AS BIGINT) AS n_ref,
        |    CAST(count(CASE WHEN cand THEN 1 END) AS BIGINT) AS n_cand
        |  FROM qz GROUP BY 1),
        |n2 AS (SELECT label,
        |    CAST(sum(CASE WHEN NOT cand THEN qi * qi ELSE 0 END)
        |      AS BIGINT) AS norm2_ref,
        |    CAST(sum(CASE WHEN cand THEN qi * qi ELSE 0 END) AS BIGINT)
        |      AS norm2_cand
        |  FROM ex GROUP BY 1)
        |SELECT l.label, n_ref, n_cand, norm2_ref, norm2_cand,
        |  CAST(max(abs(n_cand * sr - n_ref * sc)) AS BIGINT) AS shift_max
        |FROM dim d JOIN lab l ON d.label = l.label
        |JOIN n2 ON n2.label = l.label
        |GROUP BY 1, 2, 3, 4, 5""".stripMargin,
    // Lloyd k-means: both unrolled iterations replayed in SQL — the
    // same QUANTIZATION CONTRACT codes as s05, hash-ranked seeds,
    // row_number argmin per vector (tie to smallest cid), per-dim
    // HUGEINT-cast sums, and the pmod floor-division
    // (s - ((s % n) + n) % n) // n which equals Math.floorDiv on a
    // divisible numerator regardless of the engine's // semantics.
    // Empty clusters keep their previous centroid via LEFT JOIN.
    "s13_kmeans_lloyd" ->
      """WITH dims AS (SELECT unnest(range(1,
        |    (SELECT max(len(embedding)) FROM embeddings) + 1)) AS i),
        |sc AS (SELECT i, max(abs(CAST(embedding[i] AS DOUBLE))) AS s
        |       FROM embeddings, dims GROUP BY i),
        |sv AS (SELECT list(s ORDER BY i) AS s FROM sc),
        |qz AS (SELECT vec_id,
        |  [CASE WHEN sv.s[i] = 0 THEN 0
        |        ELSE CAST(least(127, greatest(-127,
        |          floor(CAST(embedding[i] AS DOUBLE) * 127 / sv.s[i] + 0.5)))
        |          AS BIGINT) END
        |   FOR i IN range(1, len(embedding) + 1)] AS q
        |  FROM embeddings, sv),
        |c0 AS (SELECT CAST(rn - 1 AS INT) AS cid, q AS cen FROM (
        |    SELECT q, row_number() OVER (
        |      ORDER BY md5(CAST(vec_id AS VARCHAR) || ':km'), vec_id) AS rn
        |    FROM qz) WHERE rn <= 8),
        |a1 AS (SELECT vec_id, q, cid FROM (
        |    SELECT z.vec_id, z.q, c.cid, row_number() OVER (
        |        PARTITION BY z.vec_id ORDER BY
        |        list_sum([(z.q[i] - c.cen[i]) * (z.q[i] - c.cen[i])
        |          FOR i IN range(1, len(z.q) + 1)]), c.cid) AS rn
        |    FROM qz z, c0 c) WHERE rn = 1),
        |u1 AS (SELECT cid, i AS d, CAST(sum(q[i]) AS BIGINT) AS s,
        |    count(*) AS n
        |  FROM a1, dims GROUP BY cid, i),
        |c1 AS (SELECT c0.cid, coalesce(nu.cen, c0.cen) AS cen
        |  FROM c0 LEFT JOIN (
        |    SELECT cid, list((s - ((s % n) + n) % n) // n ORDER BY d)
        |      AS cen
        |    FROM u1 GROUP BY cid) nu ON nu.cid = c0.cid),
        |a2 AS (SELECT vec_id, q, cid FROM (
        |    SELECT z.vec_id, z.q, c.cid, row_number() OVER (
        |        PARTITION BY z.vec_id ORDER BY
        |        list_sum([(z.q[i] - c.cen[i]) * (z.q[i] - c.cen[i])
        |          FOR i IN range(1, len(z.q) + 1)]), c.cid) AS rn
        |    FROM qz z, c1 c) WHERE rn = 1),
        |u2 AS (SELECT cid, i AS d, CAST(sum(q[i]) AS BIGINT) AS s,
        |    count(*) AS n
        |  FROM a2, dims GROUP BY cid, i),
        |c2 AS (SELECT c1.cid, coalesce(nu.cen, c1.cen) AS cen
        |  FROM c1 LEFT JOIN (
        |    SELECT cid, list((s - ((s % n) + n) % n) // n ORDER BY d)
        |      AS cen
        |    FROM u2 GROUP BY cid) nu ON nu.cid = c1.cid),
        |a3 AS (SELECT vec_id, cid, dist FROM (
        |    SELECT z.vec_id, c.cid,
        |      CAST(list_sum([(z.q[i] - c.cen[i]) * (z.q[i] - c.cen[i])
        |        FOR i IN range(1, len(z.q) + 1)]) AS BIGINT) AS dist,
        |      row_number() OVER (PARTITION BY z.vec_id ORDER BY
        |        list_sum([(z.q[i] - c.cen[i]) * (z.q[i] - c.cen[i])
        |          FOR i IN range(1, len(z.q) + 1)]), c.cid) AS rn
        |    FROM qz z, c2 c) WHERE rn = 1)
        |SELECT vec_id, cid, dist,
        |  CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS cluster_n
        |FROM a3""".stripMargin,
    "s01_ann_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS cand_id,
        |    list_cosine_similarity(
        |      CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS sim
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, cand_id, sim, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY sim DESC, cand_id) AS INT) AS rnk
        |  FROM scored)
        |SELECT query_id, rnk, cand_id, round(sim, 4) AS sim
        |FROM ranked WHERE rnk <= 10""".stripMargin,
    "s06_mips_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS cand_id,
        |    list_dot_product(
        |      CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS score
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, cand_id, score, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY score DESC, cand_id) AS INT) AS rnk
        |  FROM scored)
        |SELECT query_id, rnk, cand_id, round(score, 4) AS score
        |FROM ranked WHERE rnk <= 10""".stripMargin,
    "s04_label_centroids" ->
      """SELECT label, CAST(i AS BIGINT) AS dim,
        |round(sum(CAST(v AS DOUBLE)), 4) AS s,
        |CAST(count(v) AS BIGINT) AS n
        |FROM (SELECT label, unnest(embedding) AS v,
        |      generate_subscripts(embedding, 1) AS i FROM embeddings)
        |GROUP BY 1, 2""".stripMargin,
    "t01_langid" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit|ein|zu|den)\b')) AS BIGINT) AS s_de,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is|it|that|for)\b')) AS BIGINT) AS s_en,
        |  CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|del|por|para|con|se)\b')) AS BIGINT) AS s_es,
        |  CAST(len(regexp_extract_all(lower(text), '\b(le|les|et|est|une|dans|que|pour|sur|avec)\b')) AS BIGINT) AS s_fr,
        |  CAST(len(regexp_extract_all(lower(text), '[\x{4e00}-\x{9fff}]')) AS BIGINT) AS s_zh
        |  FROM documents)
        |SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh,
        |  CASE
        |    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |    WHEN s_es >= s_de AND s_es >= s_en AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |    WHEN s_fr >= s_de AND s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
        |    ELSE 'zh' END AS predicted
        |FROM s""".stripMargin,
    "t02_text_quality" ->
      """WITH m AS (SELECT doc_id,
        |  CAST(len(text) AS DOUBLE) AS nc,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS nw,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) AS np,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is|it|that|for)\b')) AS DOUBLE) AS ns
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(nc AS BIGINT) AS n_chars_m,
        |  CAST(nw AS BIGINT) AS n_words,
        |  round(np / nullif(nc, 0), 4) AS punct_ratio,
        |  round(ns / nullif(nw, 0), 4) AS stop_ratio,
        |  round(nc / nullif(nw, 0), 4) AS chars_per_word,
        |  round(least(1.0, nw / 50.0) * (1.0 - np / nullif(nc, 0))
        |    * least(1.0, 0.5 + ns / nullif(nw, 0)), 4) AS quality
        |FROM m""".stripMargin,
    "t03_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens,
        |  round(CAST(len(text) AS DOUBLE) /
        |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')), 4) AS chars_per_token
        |FROM documents""".stripMargin,
    "t04_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,
    "t07_vocabulary" ->
      """SELECT t AS tok, CAST(count(*) AS BIGINT) AS tf,
        |CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |FROM (SELECT doc_id,
        |      unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
        |      FROM documents)
        |GROUP BY 1 ORDER BY tf DESC, tok LIMIT 50""".stripMargin,
    "t08_hash_sample" ->
      """SELECT doc_id, source, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) WHERE rn <= 5""".stripMargin,
    // The exact heavy-hitter set over the SAME md5-derived Zipf stream
    // (identical hex parse and float path: floor(1e6/(m+1)) with m from
    // the first 6 md5 hex digits); the sketch's guarantee booleans are
    // theorems for any merge order, pinned TRUE.
    "t12_heavy_hitters" ->
      """WITH slots AS (SELECT doc_id, unnest(range(1, 31)) AS i
        |               FROM documents),
        |tok AS (SELECT concat('zipf', CAST(CAST(least(floor(1000000.0 /
        |    (CAST(('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR), ':',
        |       CAST(i AS VARCHAR))), 1, 6)) AS BIGINT) % 1000000 + 1)),
        |    20000.0) AS BIGINT) AS VARCHAR)) AS token
        |  FROM slots),
        |tot AS (SELECT count(*) AS n_stream FROM tok),
        |heavy AS (SELECT token, count(*) AS n_true FROM tok GROUP BY 1)
        |SELECT token, CAST(n_true AS BIGINT) AS n_true,
        |  TRUE AS in_sketch, TRUE AS est_ok
        |FROM heavy, tot WHERE n_true * 17 > n_stream""".stripMargin,
    // unigram LM fit on the same corpus; nll = sum over token
    // OCCURRENCES of ln(total) - ln(count). Sum-of-lns rounds stably at
    // 4dp (per-term cross-engine drift is last-ulp); count stays exact.
    "t13_lm_score" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |  FROM documents),
        |cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n_total FROM cnt)
        |SELECT doc_id,
        |  round(sum(ln(n_total) - ln(CAST(c AS DOUBLE))), 4) AS nll,
        |  count(*) AS n_toks
        |FROM tok JOIN cnt USING (tok) CROSS JOIN tot
        |GROUP BY 1""".stripMargin,
    // BM25: formula mirrored association-for-association (same IEEE
    // double ops in the same order ⇒ identical bits before the 4dp
    // round); ranking uses the rounded score + doc_id so the top-20
    // cutoff is deterministic on both engines.
    "t14_bm25" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
        |       WHERE tok IN ('vector', 'stream', 'window') GROUP BY 1, 2),
        |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (SELECT tf.doc_id,
        |    ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) *
        |      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) /
        |        (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS contrib
        |  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id)
        |  CROSS JOIN stats),
        |agg AS (SELECT doc_id, round(sum(contrib), 4) AS bm25,
        |    count(*) AS n_terms FROM scored GROUP BY 1)
        |SELECT CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
        |    AS rnk, doc_id, bm25, n_terms
        |FROM agg ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    // RANGE frame over integer days-since-epoch: identical frame
    // arithmetic both engines; count exact, sum 4dp
    "q43_range_frame" ->
      """SELECT o_custkey, o_orderdate,
        |  CAST(count(*) OVER w AS BIGINT) AS n_orders_30d,
        |  round(sum(o_totalprice) OVER w, 4) AS rev_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)""".stripMargin,
    // gap fill: spine × sparse daily revenue, forward-filled with
    // last_value IGNORE NULLS over the same total (cust, day) order
    "q44_gap_fill" ->
      """WITH spine AS (
        |  SELECT c_custkey, CAST(unnest(generate_series(DATE '1995-01-01',
        |    DATE '1995-03-02', INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM customer WHERE c_custkey < 100),
        |daily AS (
        |  SELECT o_custkey AS c_custkey, o_orderdate AS day,
        |    round(sum(o_totalprice), 4) AS rev
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-02'
        |    AND o_custkey < 100
        |  GROUP BY 1, 2)
        |SELECT c_custkey, day, rev,
        |  last_value(rev IGNORE NULLS) OVER (PARTITION BY c_custkey
        |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS rev_filled
        |FROM spine LEFT JOIN daily USING (c_custkey, day)""".stripMargin,
    // sequence packing: same md5 layout order, integer offsets
    "t18_seq_pack" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
        |      AS n_tok
        |  FROM documents),
        |o AS (SELECT doc_id, n_tok,
        |    sum(n_tok) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || ':pack'),
        |      doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS end_off
        |  FROM t)
        |SELECT doc_id, n_tok,
        |  CAST(floor((end_off - n_tok) / 2048.0) AS BIGINT) AS bin,
        |  CAST((end_off - n_tok) % 2048 AS BIGINT) AS bin_off,
        |  CAST(floor((end_off - 1) / 2048.0)
        |    - floor((end_off - n_tok) / 2048.0) + 1 AS BIGINT) AS n_bins
        |FROM o""".stripMargin,
    // null-safe join: IS NOT DISTINCT FROM matches NULL keys together
    "q46_nullsafe_join" ->
      """WITH li AS (SELECT CASE WHEN l_linenumber > 4
        |      THEN CAST(l_linenumber AS BIGINT) END AS k, l_quantity
        |    FROM lineitem),
        |dim AS (SELECT DISTINCT k,
        |    coalesce(CAST(k AS VARCHAR), 'null-key') AS tag
        |  FROM li)
        |SELECT tag, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM li JOIN dim ON li.k IS NOT DISTINCT FROM dim.k
        |GROUP BY 1""".stripMargin,
    // funnel: same three conditional-min stages, left-joined back
    "q45_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, v.t_view, min(e.ts) AS t_click
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view
        |      GROUP BY 1, 2),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |      GROUP BY 1)
        |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
        |  CAST(1 + (CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END)
        |         + (CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,
    // bigram LM: c(w1 w2) and c(w1 ·) refit from scratch; Σ-of-lns 4dp
    "t15_bigram_lm" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |bg AS (SELECT doc_id, unnest(
        |    CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
        |         ELSE [toks[i+1] || ' ' || toks[i+2]
        |               FOR i IN range(0, len(toks)-1)] END) AS bg
        |  FROM t),
        |cbg AS (SELECT bg, count(*) AS c_bg,
        |    string_split(bg, ' ')[1] AS ctx FROM bg GROUP BY 1),
        |cctx AS (SELECT ctx, sum(c_bg) AS c_ctx FROM cbg GROUP BY 1)
        |SELECT doc_id,
        |  round(sum(ln(CAST(c_ctx AS DOUBLE)) - ln(CAST(c_bg AS DOUBLE))), 4)
        |    AS nll,
        |  count(*) AS n_bigrams
        |FROM bg JOIN cbg USING (bg) JOIN cctx USING (ctx)
        |GROUP BY 1""".stripMargin,
    // integer-only higher-order list battery — every hashed value exact
    "q41_array_battery" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |l AS (SELECT doc_id, toks,
        |    list_transform(toks, x -> CAST(length(x) AS BIGINT)) AS lens
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_toks,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |  list_contains(toks, 'vector') AS has_vector,
        |  CAST(list_sum(lens) AS BIGINT) AS sum_len,
        |  list_max(lens) AS max_len,
        |  list_min(lens) AS min_len,
        |  CAST(len(list_filter(lens, x -> x > 4)) AS BIGINT) AS n_long,
        |  array_to_string(list_transform(list_reverse(list_sort(lens))[1:3],
        |    x -> CAST(x AS VARCHAR)), ',') AS top3_lens,
        |  CAST(list_sum(list_transform(list_zip(lens, list_reverse(lens)),
        |    z -> z[1] * z[2])) AS BIGINT) AS dot_rev
        |FROM l""".stripMargin,
    // the salted join IS a plain inner join — the oracle runs the plain
    // form; the Spark side's salt reassociates the sum an extra level,
    // so both sides round at 2dp (q26 precedent)
    "q42_salted_join" ->
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice), 2) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,
    // CCNet buckets: t13's nll (already gate-proven bit-equal) per
    // token, terciled with the same total order
    "c04_ccnet_buckets" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |  FROM documents),
        |cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n_total FROM cnt),
        |scored AS (SELECT doc_id,
        |    round(sum(ln(n_total) - ln(CAST(c AS DOUBLE))), 4) AS nll,
        |    count(*) AS n_toks
        |  FROM tok JOIN cnt USING (tok) CROSS JOIN tot GROUP BY 1)
        |SELECT doc_id, nll, n_toks,
        |  CAST(ntile(3) OVER (ORDER BY nll / n_toks, doc_id) AS BIGINT)
        |    AS bucket
        |FROM scored""".stripMargin,
    // unicode normalization: DuckDB's built-ins are the oracle twins
    "t17_unicode_norm" ->
      """SELECT doc_id, nfc_normalize(text) AS nfc_text,
        |  strip_accents(text) AS folded_text,
        |  length(nfc_normalize(text)) = length(text) AS nfc_ascii_identity
        |FROM documents""".stripMargin,
    // containment: naive inverted-index recompute — same output set the
    // prefix-filtered engine plan produces; i/n_sub is an exact rational
    "t16_containment" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS t
        |  FROM documents),
        |cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_sub, b.doc_id AS id_sup, count(*) AS i
        |  FROM tok a JOIN tok b
        |    ON a.t = b.t AND a.source = b.source AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_sub, id_sup,
        |  round(CAST(i AS DOUBLE) / ca.n, 4) AS containment
        |FROM inter JOIN cnt ca ON id_sub = ca.doc_id
        |WHERE CAST(i AS DOUBLE) / ca.n >= 0.9""".stripMargin,
    // decontamination: the oracle joins shingle STRINGS where the engine
    // joins xxhash64(shingle) — equal unless the 64-bit hash collides,
    // which would fail deterministically, not flake.
    "d08_decontaminate" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(
        |    CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
        |         ELSE [array_to_string(toks[i+1:i+3], ' ')
        |               FOR i IN range(0, len(toks)-2)] END) AS s
        |  FROM t),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
        |SELECT doc_id, CAST(count(DISTINCT s) AS BIGINT) AS n_shared
        |FROM sh JOIN ev USING (s)
        |WHERE doc_id % 97 <> 0
        |GROUP BY 1""".stripMargin,
    // per-stratum keep test is integer arithmetic: 10·rn <= w10·n_lang
    "c03_corpus_mix" ->
      """WITH r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':mix'), doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n_lang
        |  FROM documents)
        |SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
        |FROM r
        |WHERE rn * 10 <= (CASE WHEN lang = 'en' THEN 8 ELSE 5 END) * n_lang""".stripMargin,
    "t09_redaction" ->
      """SELECT doc_id,
        |regexp_replace(
        |  regexp_replace(
        |    regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g'),
        |  '\+?[0-9][0-9()\- ]{6,}[0-9]', '[PHONE]', 'g') AS redacted,
        |CAST(len(regexp_extract_all(text,
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |CAST(len(regexp_extract_all(text,
        |  '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |CAST(len(regexp_extract_all(text,
        |  '\+?[0-9][0-9()\- ]{6,}[0-9]')) AS BIGINT) AS n_phones
        |FROM documents""".stripMargin,
    // d06: same derivation as the d02 oracle (order-preserving distinct,
    // shingling, dual Jaccard conditions) but emitting the pairs
    "d06_ngram_jaccard" ->
      """WITH raw AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
        |t AS (SELECT doc_id,
        |    list_filter(tk, (x,i) -> list_position(tk, x) = i) AS toks FROM raw),
        |sh AS (SELECT doc_id, toks,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i+1:i+3], ' ')
        |               FOR i IN range(0, len(toks)-2)] END AS shingles
        |    FROM t),
        |cnt AS (SELECT doc_id, len(shingles) AS ns, len(toks) AS nt FROM sh),
        |se AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |si AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS i FROM se a
        |       JOIN se b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |te AS (SELECT doc_id, unnest(toks) AS tk FROM t),
        |ti AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS i FROM te a
        |       JOIN te b ON a.tk = b.tk AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT si.ia AS id_a, si.ib AS id_b
        |FROM si JOIN ti ON si.ia = ti.ia AND si.ib = ti.ib
        |JOIN cnt ca ON si.ia = ca.doc_id JOIN cnt cb ON si.ib = cb.doc_id
        |WHERE CAST(si.i AS DOUBLE) / (ca.ns + cb.ns - si.i) >= 0.6
        |  AND CAST(ti.i AS DOUBLE) / (ca.nt + cb.nt - ti.i) >= 0.6""".stripMargin,
    "t10_tfidf_keywords" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |    FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (SELECT doc_id, tok, tf, df,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tf DESC, df, tok) AS rnk
        |    FROM tf JOIN df USING (tok) CROSS JOIN n)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, tok,
        |    CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf
        |FROM scored WHERE rnk <= 3""".stripMargin,
    "t11_repetition" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |    FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(max(c) AS BIGINT) AS top_tf FROM tf GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_words, 0) AS n_words,
        |    coalesce(n_distinct, 0) AS n_distinct,
        |    coalesce(top_tf, 0) AS top_tf,
        |    round(CAST(top_tf AS DOUBLE) / nullif(n_words, 0), 4) AS rep_ratio,
        |    round(CAST(n_distinct AS DOUBLE) / nullif(n_words, 0), 4)
        |      AS distinct_ratio
        |FROM documents d LEFT JOIN agg USING (doc_id)""".stripMargin,
    "m01_multimodal_features" ->
      """SELECT doc_id AS asset_id,
        |CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |     WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |CAST(CASE WHEN doc_id % 3 = 1 THEN 0
        |     ELSE doc_id % 640 + 64 END AS BIGINT) AS width,
        |CAST(CASE WHEN doc_id % 3 = 1 THEN 0
        |     ELSE doc_id % 480 + 48 END AS BIGINT) AS height,
        |CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 8) * 1000
        |     ELSE 0 END AS BIGINT) AS sample_rate,
        |CAST(8 AS BIGINT) AS dim
        |FROM documents""".stripMargin,
    "m02_frame_sampling" ->
      """SELECT doc_id AS asset_id,
        |CAST(ceil(strlen(text) / 64.0) AS BIGINT) AS n_frames
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,
    // Header facts + truncating integer arithmetic from the asset
    // contract; amp_ok (the dual-route PCM16 parse agreement) is the
    // in-Spark contract boolean, pinned TRUE.
    "m04_audio_stats" ->
      """SELECT doc_id AS asset_id,
        |CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS sample_rate,
        |CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |CAST(strlen(text) // (2 * (1 + doc_id % 2)) AS BIGINT) AS n_samples,
        |CAST((strlen(text) // (2 * (1 + doc_id % 2))) * 1000
        |     // (8000 + (doc_id % 8) * 1000) AS BIGINT) AS duration_ms,
        |TRUE AS amp_ok
        |FROM documents WHERE doc_id % 3 = 1""".stripMargin,
    // Re-derives the RESIZE CONTRACT (Multimodal.scaladoc) from the
    // asset contract: fit-in-64 nearest-neighbor dims by integer
    // division, 4-byte-padded BMP rows, 54-byte header. roundtrip_ok
    // is the in-Spark contract boolean — pinned TRUE here.
    "m03_image_resize" ->
      """WITH img AS (
        |  SELECT doc_id AS asset_id,
        |         CAST(doc_id % 640 + 64 AS BIGINT) AS in_width,
        |         CAST(doc_id % 480 + 48 AS BIGINT) AS in_height
        |  FROM documents WHERE doc_id % 3 = 0),
        |dims AS (
        |  SELECT *, greatest(in_width, in_height) AS g FROM img),
        |o AS (
        |  SELECT asset_id, in_width, in_height,
        |         CASE WHEN g <= 64 THEN in_width
        |              ELSE greatest(1, in_width * 64 // g) END AS out_width,
        |         CASE WHEN g <= 64 THEN in_height
        |              ELSE greatest(1, in_height * 64 // g) END AS out_height
        |  FROM dims)
        |SELECT asset_id, in_width, in_height, out_width, out_height,
        |       CAST(54 + ((out_width * 3 + 3) // 4) * 4 * out_height
        |            AS BIGINT) AS out_bytes,
        |       TRUE AS roundtrip_ok
        |FROM o""".stripMargin,
    // independent derivation: per-bit shift/mask sum over
    // generate_series — no spread-mask shortcut shared with the Spark
    // side (bit i of x lands at 2i, bit i of y at 2i+1; inputs mod 2^32)
    "q47_zorder_key" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST((SELECT sum(((l_suppkey >> t.i) & 1) << (2 * t.i))
        |            + sum(((l_partkey >> t.i) & 1) << (2 * t.i + 1))
        |        FROM generate_series(0, 31) t(i)) AS BIGINT) AS zkey
        |FROM lineitem""".stripMargin,
    "q48_scd2_history" -> scd2RebuildSql,
    "q49_price_index" ->
      """WITH mp AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS month, l_partkey,
        |         min(l_extendedprice) AS p
        |  FROM lineitem GROUP BY 1, 2),
        |base AS (
        |  SELECT l_partkey, p AS p_base FROM mp
        |  WHERE month = (SELECT min(month) FROM mp))
        |SELECT mp.month, count(*) AS n_items,
        |  round(CAST(sum(mp.p) AS DOUBLE), 4) AS sum_cur,
        |  round(CAST(sum(base.p_base) AS DOUBLE), 4) AS sum_base,
        |  round(round(CAST(sum(mp.p) AS DOUBLE), 4)
        |    / nullif(round(CAST(sum(base.p_base) AS DOUBLE), 4), 0),
        |    6) AS price_index
        |FROM mp JOIN base USING (l_partkey)
        |GROUP BY mp.month""".stripMargin,
    "q50_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |first_day AS (
        |  SELECT user_id, min(day) AS cohort FROM act GROUP BY user_id)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
        |  CAST(date_diff('day', cohort, day) AS INT) AS offset_days,
        |  count(*) AS users
        |FROM act JOIN first_day USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    // the apply semantics re-derived as one SQL statement (left join +
    // filter + case), not via the operator's fold
    "q51_cdc_apply" ->
      """WITH latest AS (
        |  SELECT o_custkey, o_orderstatus, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders),
        |ch AS (
        |  SELECT o_custkey AS k,
        |    CASE o_orderstatus WHEN 'F' THEN 'U'
        |                       WHEN 'O' THEN 'I'
        |                       ELSE 'D' END AS op,
        |    o_totalprice AS new_bal
        |  FROM latest WHERE rn = 1)
        |SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN op = 'U' THEN new_bal ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment
        |FROM customer LEFT JOIN (SELECT * FROM ch WHERE op <> 'I') mu
        |  ON c_custkey = mu.k
        |WHERE op IS NULL OR op = 'U'
        |UNION ALL
        |SELECT k + 1000000, 'NEW', 0, new_bal, 'NEW'
        |FROM ch WHERE op = 'I'""".stripMargin,
    // spans re-derived via the lockstep-unnest index walk (t19 idiom) +
    // per-position list_slice, not any shared transform helper
    "d10_repeated_spans" ->
      """WITH lsts AS (
        |  SELECT doc_id,
        |         regexp_extract_all(lower(text), '[a-z0-9]+') AS lst
        |  FROM documents WHERE length(regexp_extract_all(lower(text),
        |    '[a-z0-9]+')) >= 20),
        |spans AS (
        |  SELECT doc_id,
        |    array_to_string(lst[i:i+19], ' ') AS span
        |  FROM (SELECT doc_id, lst,
        |          unnest(generate_series(1, length(lst) - 19)) AS i
        |        FROM lsts)),
        |grouped AS (
        |  SELECT span, count(*) AS n_occ,
        |         count(DISTINCT doc_id) AS n_docs
        |  FROM spans GROUP BY span
        |  HAVING count(DISTINCT doc_id) >= 2)
        |SELECT span, n_occ, n_docs FROM grouped
        |ORDER BY n_occ DESC, n_docs DESC, span
        |LIMIT 100""".stripMargin,
    // the full-funnel oracle: c01's quality/unique/near-dup chain +
    // d08's trigram decontamination + c03's md5-rank mixing + t18's bin
    // arithmetic, composed as one independent SQL derivation
    "c05_training_mix" ->
      """WITH q AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE len(regexp_extract_all(text, '\S+')) >= 5
        |    AND len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
        |        / nullif(CAST(len(text) AS DOUBLE), 0) <= 0.3),
        |u AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text, min(doc_id) OVER (PARTITION BY
        |      md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))) AS canon
        |    FROM q) WHERE doc_id = canon),
        |raw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM u),
        |t AS (SELECT doc_id, list_filter(tk, (x,i) -> list_position(tk, x) = i) AS toks FROM raw),
        |shg AS (SELECT doc_id, toks,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i+1:i+3], ' ')
        |               FOR i IN range(0, len(toks)-2)] END AS shingles FROM t),
        |cnt AS (SELECT doc_id, len(shingles) AS ns, len(toks) AS nt FROM shg),
        |se AS (SELECT doc_id, unnest(shingles) AS s FROM shg),
        |si AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS i FROM se a
        |       JOIN se b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |te AS (SELECT doc_id, unnest(toks) AS tk FROM t),
        |ti AS (SELECT a.doc_id ia, b.doc_id ib, count(*) AS i FROM te a
        |       JOIN te b ON a.tk = b.tk AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |e2 AS (
        |  SELECT si.ia AS a, si.ib AS b
        |  FROM si JOIN ti ON si.ia = ti.ia AND si.ib = ti.ib
        |  JOIN cnt ca ON si.ia = ca.doc_id JOIN cnt cb ON si.ib = cb.doc_id
        |  WHERE CAST(si.i AS DOUBLE) / (ca.ns + cb.ns - si.i) >= 0.6
        |    AND CAST(ti.i AS DOUBLE) / (ca.nt + cb.nt - ti.i) >= 0.6),
        |kept AS (SELECT u.doc_id, u.text FROM u
        |         LEFT JOIN (SELECT DISTINCT b FROM e2) dd ON u.doc_id = dd.b
        |         WHERE dd.b IS NULL),
        |rt AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |rsh AS (SELECT doc_id, unnest(
        |    CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
        |         ELSE [array_to_string(toks[i+1:i+3], ' ')
        |               FOR i IN range(0, len(toks)-2)] END) AS s
        |  FROM rt),
        |ev AS (SELECT DISTINCT s FROM rsh WHERE doc_id % 97 = 0),
        |contam AS (SELECT DISTINCT doc_id FROM rsh JOIN ev USING (s)
        |           WHERE doc_id % 97 <> 0),
        |cl AS (SELECT k.doc_id, k.text, d.lang
        |  FROM kept k JOIN documents d USING (doc_id)
        |  LEFT JOIN contam c ON k.doc_id = c.doc_id
        |  WHERE c.doc_id IS NULL AND k.doc_id % 97 <> 0),
        |r AS (SELECT doc_id, text, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':mix'), doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n_lang
        |  FROM cl),
        |mixed AS (SELECT doc_id, text FROM r
        |  WHERE rn * 10 <= (CASE WHEN lang = 'en' THEN 8 ELSE 5 END) * n_lang),
        |tk2 AS (SELECT CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |    AS BIGINT) AS n_tok FROM mixed)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_input,
        |  (SELECT CAST(count(*) AS BIGINT) FROM kept) AS n_kept,
        |  (SELECT CAST(count(*) AS BIGINT) FROM cl) AS n_clean,
        |  (SELECT CAST(count(*) AS BIGINT) FROM tk2) AS n_mixed,
        |  (SELECT CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM tk2) AS n_tokens,
        |  (SELECT CAST((coalesce(sum(n_tok), 0) + 2047) // 2048 AS BIGINT)
        |   FROM tk2) AS n_bins""".stripMargin,
    "q57_fuzzy_join" ->
      """WITH c AS (
        |  SELECT c_custkey AS id, c_name AS name,
        |         substring(c_name, 1, 16) AS blk
        |  FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
        |WHERE levenshtein(a.name, b.name) <= 1""".stripMargin,
    // char pairs re-derived via the lockstep-unnest index walk over the
    // split word, not a shared substring helper
    "t20_bpe_pairs" ->
      """WITH words AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents),
        |pairs AS (
        |  SELECT substring(w, i, 2) AS pair
        |  FROM (SELECT w, unnest(generate_series(1, length(w) - 1)) AS i
        |        FROM words WHERE length(w) >= 2))
        |SELECT pair, count(*) AS n FROM pairs GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    "q55_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |      FROM orders)
        |WHERE rnk <= 3""".stripMargin,
    // the diff is re-stated from first principles over the SAME apply
    // SQL as q51 (inlined), not by inverting the operator
    "q56_snapshot_diff" ->
      """WITH latest AS (
        |  SELECT o_custkey, o_orderstatus, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders),
        |ch AS (
        |  SELECT o_custkey AS k,
        |    CASE o_orderstatus WHEN 'F' THEN 'U'
        |                       WHEN 'O' THEN 'I'
        |                       ELSE 'D' END AS op,
        |    o_totalprice AS new_bal
        |  FROM latest WHERE rn = 1),
        |after AS (
        |  SELECT c_custkey, CASE WHEN op = 'U' THEN new_bal
        |                         ELSE c_acctbal END AS bal
        |  FROM customer LEFT JOIN (SELECT * FROM ch WHERE op <> 'I') mu
        |    ON c_custkey = mu.k
        |  WHERE op IS NULL OR op = 'U'
        |  UNION ALL
        |  SELECT k + 1000000, new_bal FROM ch WHERE op = 'I')
        |SELECT COALESCE(c.c_custkey, a.c_custkey) AS c_custkey,
        |  CASE WHEN c.c_custkey IS NULL THEN 'added'
        |       WHEN a.c_custkey IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change_kind,
        |  c.c_acctbal AS bal_before, a.bal AS bal_after
        |FROM customer c FULL OUTER JOIN after a
        |  ON c.c_custkey = a.c_custkey
        |WHERE c.c_custkey IS NULL OR a.c_custkey IS NULL
        |   OR c.c_acctbal <> a.bal""".stripMargin,
    "q53_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |trans AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |         count(*) AS n
        |  FROM seq WHERE next_type IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) /
        |    sum(n) OVER (PARTITION BY from_type), 6) AS share
        |FROM trans""".stripMargin,
    "q54_profile" ->
      """WITH a AS (
        |  SELECT count(*) AS n_rows,
        |    sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS nn_name,
        |    count(DISTINCT c_name) AS nd_name,
        |    sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS nn_seg,
        |    count(DISTINCT c_mktsegment) AS nd_seg,
        |    sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS nn_bal,
        |    count(DISTINCT c_acctbal) AS nd_bal,
        |    min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
        |    sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS nn_nat,
        |    count(DISTINCT c_nationkey) AS nd_nat,
        |    CAST(min(c_nationkey) AS DOUBLE) AS min_nat,
        |    CAST(max(c_nationkey) AS DOUBLE) AS max_nat
        |  FROM customer)
        |SELECT col_name, n_rows, CAST(n_null AS BIGINT) AS n_null,
        |  n_distinct, min_val, max_val FROM (
        |  SELECT 'c_name' AS col_name, n_rows, nn_name AS n_null,
        |    nd_name AS n_distinct, CAST(NULL AS DOUBLE) AS min_val,
        |    CAST(NULL AS DOUBLE) AS max_val FROM a
        |  UNION ALL SELECT 'c_mktsegment', n_rows, nn_seg, nd_seg,
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a
        |  UNION ALL SELECT 'c_acctbal', n_rows, nn_bal, nd_bal,
        |    min_bal, max_bal FROM a
        |  UNION ALL SELECT 'c_nationkey', n_rows, nn_nat, nd_nat,
        |    min_nat, max_nat FROM a)""".stripMargin,
    // exact counts only — the estimate is engine-specific; the booleans
    // carry the error contract (q17 discipline)
    "q52_hll_sketches" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(DISTINCT user_id) AS n_exact, TRUE AS within_5pct
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT 'TOTAL', count(DISTINCT user_id), TRUE
        |FROM events""".stripMargin,
    // positions re-derived via a lateral index walk over the token list
    // (1-based generate_series → 0-based positions), not via any shared
    // explode helper
    "t19_inverted_index" ->
      """WITH lsts AS (
        |  SELECT doc_id,
        |         regexp_extract_all(lower(text), '[a-z0-9]+') AS lst
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(lst) AS token,
        |         unnest(generate_series(1, length(lst))) - 1 AS pos
        |  FROM lsts),
        |df_tab AS (
        |  SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1)
        |SELECT token, df, doc_id, count(*) AS tf,
        |  string_agg(pos, ',' ORDER BY pos) AS positions
        |FROM toks JOIN df_tab USING (token)
        |GROUP BY token, df, doc_id""".stripMargin,
    // EWMA restated as the same closed-form 8-term expression. Every
    // weight 2^-j is an exact binary fraction (DuckDB's DECIMAL literal
    // casts to the same exact double), x*2^-j is exact, and the sums /
    // division are written left-associated exactly as the Spark side
    // reduces them — the doubles are bit-identical before the 4dp round.
    "q65_ewma" ->
      """WITH t AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    lag(l_extendedprice, 1) OVER w AS x1,
        |    lag(l_extendedprice, 2) OVER w AS x2,
        |    lag(l_extendedprice, 3) OVER w AS x3,
        |    lag(l_extendedprice, 4) OVER w AS x4,
        |    lag(l_extendedprice, 5) OVER w AS x5,
        |    lag(l_extendedprice, 6) OVER w AS x6,
        |    lag(l_extendedprice, 7) OVER w AS x7
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice))
        |SELECT l_suppkey AS premise_code, l_orderkey AS order_key,
        |  l_linenumber AS line_no, l_extendedprice AS price,
        |  round(
        |   (l_extendedprice * 1.0
        |    + (CASE WHEN x1 IS NULL THEN 0.0 ELSE x1 * 0.5 END)
        |    + (CASE WHEN x2 IS NULL THEN 0.0 ELSE x2 * 0.25 END)
        |    + (CASE WHEN x3 IS NULL THEN 0.0 ELSE x3 * 0.125 END)
        |    + (CASE WHEN x4 IS NULL THEN 0.0 ELSE x4 * 0.0625 END)
        |    + (CASE WHEN x5 IS NULL THEN 0.0 ELSE x5 * 0.03125 END)
        |    + (CASE WHEN x6 IS NULL THEN 0.0 ELSE x6 * 0.015625 END)
        |    + (CASE WHEN x7 IS NULL THEN 0.0 ELSE x7 * 0.0078125 END))
        |   /
        |   (1.0
        |    + (CASE WHEN x1 IS NULL THEN 0.0 ELSE 0.5 END)
        |    + (CASE WHEN x2 IS NULL THEN 0.0 ELSE 0.25 END)
        |    + (CASE WHEN x3 IS NULL THEN 0.0 ELSE 0.125 END)
        |    + (CASE WHEN x4 IS NULL THEN 0.0 ELSE 0.0625 END)
        |    + (CASE WHEN x5 IS NULL THEN 0.0 ELSE 0.03125 END)
        |    + (CASE WHEN x6 IS NULL THEN 0.0 ELSE 0.015625 END)
        |    + (CASE WHEN x7 IS NULL THEN 0.0 ELSE 0.0078125 END)), 4) AS ewma
        |FROM t""".stripMargin,
    // Tukey fences re-derived from quantile_cont (same p*(n-1) linear
    // interpolation definition): all arithmetic on integer cents is
    // binary-exact (quartiles land on quarter fractions, 1.5*IQR on
    // eighths), so the ×4/×8 integer encodings and the fence
    // comparisons cannot drift between engines.
    "q66_outlier_fences" ->
      """WITH li AS (
        |  SELECT p_brand,
        |         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |f AS (
        |  SELECT p_brand, count(*) AS n_rows,
        |         quantile_cont(cents, 0.25) AS q1,
        |         quantile_cont(cents, 0.75) AS q3
        |  FROM li GROUP BY 1),
        |f2 AS (
        |  SELECT p_brand, n_rows, q1, q3,
        |         q1 - (q3 - q1) * 1.5 AS lo,
        |         q3 + (q3 - q1) * 1.5 AS hi
        |  FROM f)
        |SELECT li.p_brand, n_rows,
        |  CAST(q1 * 4 AS BIGINT) AS q1_x4,
        |  CAST(q3 * 4 AS BIGINT) AS q3_x4,
        |  CAST(lo * 8 AS BIGINT) AS lo_x8,
        |  CAST(hi * 8 AS BIGINT) AS hi_x8,
        |  CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |  CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        |FROM li JOIN f2 ON li.p_brand = f2.p_brand
        |GROUP BY li.p_brand, n_rows, q1, q3, lo, hi""".stripMargin,
    // CMS contract (t12 discipline): the oracle recomputes the exact
    // heavy-hitter set and true counts from the same md5 Zipf stream and
    // asserts the sketch booleans as TRUE — the Spark side proves them
    // via exact integer comparisons against the sketch's estimates.
    "q67_cms_freq" ->
      """WITH slots AS (SELECT doc_id, unnest(range(1, 31)) AS i
        |               FROM documents),
        |tok AS (SELECT concat('zipf', CAST(CAST(least(floor(1000000.0 /
        |    (CAST(('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR), ':',
        |       CAST(i AS VARCHAR))), 1, 6)) AS BIGINT) % 1000000 + 1)),
        |    20000.0) AS BIGINT) AS VARCHAR)) AS token
        |  FROM slots),
        |tot AS (SELECT count(*) AS n_stream FROM tok),
        |heavy AS (SELECT token, count(*) AS n_true FROM tok GROUP BY 1)
        |SELECT token, CAST(n_true AS BIGINT) AS n_true,
        |  TRUE AS lower_ok, TRUE AS upper_ok
        |FROM heavy, tot WHERE n_true * 100 >= n_stream""".stripMargin,
    // JL distortion contract: n_pairs re-derived structurally (even id
    // joined to its odd successor), bound booleans asserted TRUE — the
    // Spark side proves them against its own exact full-dim cosines.
    "s07_jl_distortion" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  TRUE AS mae_ok, TRUE AS frac_ok
        |FROM embeddings a JOIN embeddings b
        |  ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0""".stripMargin,
    // quarantine counts re-derived from parquet via the planting rule —
    // the oracle never parses the CSV, it predicts what a correct
    // PERMISSIVE parse must report
    "l02_csv_quarantine" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_bad,
        |  CAST(sum(CASE WHEN doc_id % 97 <> 0 THEN n_chars ELSE 0 END)
        |       AS BIGINT) AS sum_chars_good
        |FROM documents""".stripMargin,
    // TWAP re-derived over the same total order; day spans and cents
    // are exact integers in both engines, and only sums are emitted
    "q68_twap" ->
      """WITH t AS (
        |  SELECT l_suppkey,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
        |    l_shipdate,
        |    lead(l_shipdate) OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber,
        |               l_extendedprice) AS next_ts
        |  FROM lineitem)
        |SELECT l_suppkey, count(*) AS n_spans,
        |  CAST(sum(cents * datediff('day', CAST(l_shipdate AS DATE),
        |       CAST(next_ts AS DATE))) AS BIGINT) AS sum_cents_days,
        |  CAST(sum(datediff('day', CAST(l_shipdate AS DATE),
        |       CAST(next_ts AS DATE))) AS BIGINT) AS sum_days
        |FROM t WHERE next_ts IS NOT NULL
        |GROUP BY 1""".stripMargin,
    // OHLC bars: open/close via first/last row_number under the same
    // total order, high/low as plain extremes on exact cents
    "q69_ohlc_bars" ->
      """WITH t AS (
        |  SELECT l_suppkey,
        |    strftime(date_trunc('month', l_shipdate), '%Y-%m-%d')
        |      AS bar_month,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY l_suppkey,
        |        date_trunc('month', l_shipdate)
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber,
        |               l_extendedprice) AS rn_a,
        |    row_number() OVER (PARTITION BY l_suppkey,
        |        date_trunc('month', l_shipdate)
        |      ORDER BY l_shipdate DESC, l_orderkey DESC,
        |               l_linenumber DESC, l_extendedprice DESC) AS rn_d
        |  FROM lineitem)
        |SELECT l_suppkey, bar_month, count(*) AS n_trades,
        |  CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT)
        |    AS open_cents,
        |  CAST(max(cents) AS BIGINT) AS high_cents,
        |  CAST(min(cents) AS BIGINT) AS low_cents,
        |  CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT)
        |    AS close_cents
        |FROM t GROUP BY 1, 2""".stripMargin,
    // the same ANSI lateral text, DuckDB's native LATERAL evaluation
    // vs Spark's decorrelation — identical result sets prove the
    // rewrite preserves semantics
    "q70_lateral" ->
      """SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice,
        |       CAST(a.n_lines AS BIGINT) AS n_lines, a.max_price
        |FROM orders o,
        |LATERAL (
        |  SELECT l_linenumber, l_extendedprice FROM lineitem
        |  WHERE l_orderkey = o.o_orderkey
        |  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t,
        |LATERAL (
        |  SELECT count(*) AS n_lines, max(l_extendedprice) AS max_price
        |  FROM lineitem WHERE l_orderkey = o.o_orderkey) a
        |WHERE o.o_orderstatus = 'O'""".stripMargin,
    // attribution re-derived as the join+QUALIFY windowed-argmax form —
    // structurally different from the Spark side's carry-forward, so a
    // tie-handling or lookback bug in either cannot cancel out
    "q71_attribution" ->
      """WITH touches AS (
        |  SELECT user_id, ts, event_id, event_type FROM events
        |  WHERE event_type IN ('click', 'view')),
        |purchases AS (
        |  SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'purchase'),
        |best AS (
        |  SELECT p.event_id AS pid, t.event_type AS t_type,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY t.ts DESC, t.event_id DESC) AS rn
        |  FROM purchases p JOIN touches t
        |    ON t.user_id = p.user_id
        |   AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id))
        |   AND t.ts >= p.ts - INTERVAL 3 DAY)
        |SELECT coalesce(b.t_type, 'none') AS attr_type,
        |  count(*) AS n_purchases, round(sum(p.value), 4) AS sum_value
        |FROM purchases p
        |LEFT JOIN (SELECT pid, t_type FROM best WHERE rn = 1) b
        |  ON p.event_id = b.pid
        |GROUP BY 1""".stripMargin,
    // moving median over the same 7-row frame; quantile_cont on ≤7
    // integers lands on an element or a .5 midpoint — ×2 is exact
    "q72_moving_median" ->
      """SELECT l_suppkey AS premise_code, l_orderkey AS order_key,
        |  l_linenumber AS line_no,
        |  CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
        |  CAST(quantile_cont(
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT), 0.5)
        |    OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber,
        |               l_extendedprice
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) * 2
        |    AS BIGINT) AS med2
        |FROM lineitem""".stripMargin,
    // ABC classes re-derived over the same per-part reduction; all
    // comparisons in exact int64
    "q73_abc_pareto" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT rev,
        |    sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    (SELECT sum(rev) FROM rev) AS total
        |  FROM rev)
        |SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
        |            WHEN cum * 100 <= total * 95 THEN 'B'
        |            ELSE 'C' END AS abc_class,
        |  count(*) AS n_parts, CAST(sum(rev) AS BIGINT) AS sum_rev
        |FROM c GROUP BY 1""".stripMargin,
    // the same recursive construct run natively by DuckDB (// is DIV)
    "q74_recursive_cte" ->
      """WITH RECURSIVE anc(seed, cur, depth) AS (
        |  SELECT p_partkey, p_partkey, 0 FROM part WHERE p_size = 50
        |  UNION ALL
        |  SELECT seed, cur // 2, depth + 1 FROM anc WHERE cur > 1)
        |SELECT seed, CAST(max(depth) AS INT) AS max_depth,
        |  count(*) AS n_nodes, CAST(sum(cur) AS BIGINT) AS sum_keys
        |FROM anc GROUP BY seed""".stripMargin,
    // both branches re-derived from scratch (BM25 via the t14 formula,
    // dense via list_cosine_similarity), ranked over the same rounded
    // scores, fused with the same two-term RRF arithmetic
    "s08_hybrid_rrf" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
        |       WHERE tok IN ('vector', 'stream', 'window') GROUP BY 1, 2),
        |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (SELECT tf.doc_id,
        |    ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) *
        |      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) /
        |        (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS contrib
        |  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id)
        |  CROSS JOIN stats),
        |agg AS (SELECT doc_id, round(sum(contrib), 4) AS bm25
        |        FROM scored GROUP BY 1),
        |lex AS (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
        |      AS lex_rank
        |  FROM agg ORDER BY bm25 DESC, doc_id LIMIT 20),
        |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        |sims AS (SELECT vec_id AS doc_id,
        |    round(list_cosine_similarity(embedding, q), 4) AS sim
        |  FROM embeddings, qv WHERE vec_id <> 0),
        |vec AS (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT)
        |      AS vec_rank
        |  FROM sims ORDER BY sim DESC, doc_id LIMIT 20)
        |SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
        |  lex_rank, vec_rank,
        |  round(coalesce(1.0 / (60 + lex_rank), 0.0) +
        |        coalesce(1.0 / (60 + vec_rank), 0.0), 6) AS rrf
        |FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id""".stripMargin,
    // the same three idioms restated: max(dense_rank) distinct count,
    // windowed quantile_cont median, exact-integer ratio-to-report
    "q75_window_idioms" ->
      """WITH t AS (
        |  SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
        |    dense_rank() OVER (PARTITION BY l_returnflag, l_linestatus
        |      ORDER BY l_suppkey) AS dr
        |  FROM lineitem)
        |SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
        |  cents,
        |  CAST(max(dr) OVER w AS BIGINT) AS n_supp,
        |  CAST(quantile_cont(cents, 0.5) OVER w * 2 AS BIGINT) AS med2,
        |  round(CAST(cents AS DOUBLE) /
        |        CAST(sum(cents) OVER w AS DOUBLE), 6) AS share
        |FROM t
        |WINDOW w AS (PARTITION BY l_returnflag, l_linestatus)""".stripMargin,
    // passage dedup over the chunk STRINGS (the Spark side joins on
    // xxhash64 — hash-join ≡ string-join modulo collisions, which
    // would fail this gate deterministically); reassembly order pinned
    // by ORDER BY pos inside string_agg
    "t22_chunk_dedup" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |ch0 AS (SELECT doc_id, toks,
        |    unnest(range(0, greatest(
        |      CAST(ceil(len(toks) / 10.0) AS BIGINT), 1))) AS pos
        |  FROM t),
        |ch AS (SELECT doc_id, CAST(pos AS INT) AS pos,
        |    array_to_string(toks[pos*10+1 : pos*10+10], ' ') AS chunk
        |  FROM ch0
        |  WHERE array_to_string(toks[pos*10+1 : pos*10+10], ' ') <> ''),
        |df AS (SELECT chunk, count(DISTINCT doc_id) AS doc_df
        |  FROM ch GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN doc_df < 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  coalesce(string_agg(CASE WHEN doc_df < 2 THEN chunk END,
        |    ' ' ORDER BY pos), '') AS clean_text
        |FROM ch JOIN df USING (chunk)
        |GROUP BY doc_id""".stripMargin,
    // shingle novelty over the shingle STRINGS; first owner = min doc_id
    "t23_shingle_novelty" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i+1:i+3], ' ')
        |               FOR i IN range(0, len(toks)-2)] END AS shingles
        |  FROM t),
        |se AS (SELECT DISTINCT doc_id, sh FROM
        |  (SELECT doc_id, unnest(shingles) AS sh FROM sh)),
        |fo AS (SELECT sh, min(doc_id) AS first_doc FROM se GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel
        |FROM se JOIN fo USING (sh)
        |GROUP BY doc_id""".stripMargin,
    // d07's independent recursive-CTE closure + top-1 per component
    // under the total order (n_chars desc, doc_id asc)
    "d11_cluster_keep_best" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS t
        |  FROM documents),
        |cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM tok a JOIN tok b
        |    ON a.t = b.t AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |e AS (
        |  SELECT id_a AS a, id_b AS b FROM inter
        |  JOIN cnt ca ON id_a = ca.doc_id
        |  JOIN cnt cb ON id_b = cb.doc_id
        |  WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5),
        |sym AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
        |reach(id, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.id),
        |lab AS (SELECT id AS doc_id, min(comp) AS component
        |        FROM reach GROUP BY 1),
        |sized AS (SELECT doc_id, component,
        |    CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
        |      AS cluster_size
        |  FROM lab)
        |SELECT component, doc_id AS keep_id, cluster_size,
        |  cluster_size - 1 AS n_dropped
        |FROM (SELECT s.doc_id, s.component, s.cluster_size,
        |    row_number() OVER (PARTITION BY s.component
        |      ORDER BY d.n_chars DESC, s.doc_id ASC) AS rn
        |  FROM sized s JOIN documents d USING (doc_id))
        |WHERE rn = 1""".stripMargin,
    // integer waterfill: funded prefix in ascending (n, source) order,
    // remainder floor-split over capped sources with the modulo going
    // to the smallest; md5-rank stratified take of exactly alloc docs
    "c06_unimax_mix" ->
      """WITH n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |b AS (SELECT CAST((sum(n) * 3) // 4 AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS s FROM n),
        |idx AS (SELECT lang, n,
        |    CAST(row_number() OVER (ORDER BY n, lang) AS BIGINT) AS i,
        |    CAST(sum(n) OVER (ORDER BY n, lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS pre
        |  FROM n),
        |f AS (SELECT idx.*, (pre + (s - i) * n <= t) AS funded
        |  FROM idx CROSS JOIN b),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN funded THEN n ELSE 0 END) AS BIGINT) AS fsum,
        |    CAST(sum(CASE WHEN funded THEN 0 ELSE 1 END) AS BIGINT) AS k,
        |    CAST(sum(CASE WHEN funded THEN 1 ELSE 0 END) AS BIGINT) AS nf
        |  FROM f),
        |alloc AS (SELECT lang,
        |    CASE WHEN funded THEN n ELSE (t - fsum) // k +
        |      (CASE WHEN i - nf <= (t - fsum) % k THEN 1 ELSE 0 END) END
        |      AS alloc
        |  FROM f CROSS JOIN a CROSS JOIN b),
        |r AS (SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':unimax'), doc_id)
        |      AS BIGINT) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, rn, alloc
        |FROM r JOIN alloc USING (lang)
        |WHERE rn <= alloc""".stripMargin,
    // greedy MMR replayed with a recursive CTE carrying the selected
    // set; λ=1/2 → 0.5·rel − 0.5·max(sim) is bit-identical to the
    // Spark side (same doubles, same association, same argmax)
    "s09_mmr_rerank" ->
      """WITH RECURSIVE q AS (SELECT vec_id AS query_id, embedding AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |scored AS (SELECT q.query_id, e.vec_id AS cand_id,
        |    round(list_cosine_similarity(
        |      CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 9)
        |      AS rel
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        |top20 AS (SELECT query_id, cand_id, rel FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY rel DESC, cand_id) AS rnk
        |    FROM scored) WHERE rnk <= 20),
        |pair AS (SELECT a.query_id, a.cand_id AS ia, b.cand_id AS ib,
        |    round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
        |      CAST(eb.embedding AS DOUBLE[])), 9) AS s
        |  FROM top20 a JOIN top20 b USING (query_id)
        |  JOIN embeddings ea ON ea.vec_id = a.cand_id
        |  JOIN embeddings eb ON eb.vec_id = b.cand_id
        |  WHERE a.cand_id <> b.cand_id),
        |sel(query_id, step, cand_id, score, selected) AS (
        |  SELECT query_id, 1, cand_id, rel, [cand_id] FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY rel DESC, cand_id) AS r
        |    FROM top20) WHERE r = 1
        |  UNION ALL
        |  SELECT s.query_id, s.step + 1, c.cand_id, c.score,
        |    list_append(s.selected, c.cand_id)
        |  FROM sel s, LATERAL (
        |    SELECT t.cand_id, 0.5*t.rel - 0.5*max(p.s) AS score
        |    FROM top20 t JOIN pair p ON p.query_id = s.query_id
        |      AND p.ia = t.cand_id AND list_contains(s.selected, p.ib)
        |    WHERE t.query_id = s.query_id
        |      AND NOT list_contains(s.selected, t.cand_id)
        |    GROUP BY t.cand_id, t.rel
        |    ORDER BY score DESC, t.cand_id
        |    LIMIT 1) c
        |  WHERE s.step < 10)
        |SELECT query_id, step, cand_id, round(score, 4) AS mmr
        |FROM sel""".stripMargin,
    // dHash recomputed from the ASSET CONTRACT: the pixel array IS the
    // doc's text bytes (ASCII — length == octet_length on this corpus,
    // asserted by the engine's gate staying green), bytes past the body
    // read 0; signed-64 packing via HUGEINT fold
    "m05_image_dhash" ->
      """WITH img AS (SELECT doc_id, text, length(text) AS tl,
        |    CAST(doc_id % 640 + 64 AS BIGINT) AS w,
        |    CAST(doc_id % 480 + 48 AS BIGINT) AS h,
        |    CAST(((doc_id % 640 + 64) * 3 + 3) // 4 * 4 AS BIGINT) AS stride
        |  FROM documents WHERE doc_id % 3 = 0),
        |grid AS (SELECT doc_id, w, h, stride, text, tl,
        |    r1.range AS x, r2.range AS y
        |  FROM img, range(9) r1, range(8) r2),
        |px AS (SELECT doc_id, w, h, x, y,
        |    (SELECT sum(CASE
        |        WHEN (y*h//8)*stride + (x*w//9)*3 + c.range < tl
        |        THEN ascii(substr(text,
        |          CAST((y*h//8)*stride + (x*w//9)*3 + c.range AS INT) + 1, 1))
        |        ELSE 0 END)
        |     FROM range(3) c) AS bright
        |  FROM grid),
        |bits AS (SELECT a.doc_id, a.w, a.h, a.y, a.x,
        |    CASE WHEN a.bright > b.bright THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.y = b.y
        |    AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |hash AS (SELECT doc_id, w, h,
        |    CAST(CASE WHEN h128 >= 9223372036854775808
        |         THEN h128 - 18446744073709551616 ELSE h128 END AS BIGINT)
        |      AS dhash
        |  FROM (SELECT doc_id,
        |      sum(bit * (1::HUGEINT << CAST(y*8 + x AS INT))) AS h128,
        |      any_value(w) AS w, any_value(h) AS h
        |    FROM bits GROUP BY doc_id))
        |SELECT doc_id AS asset_id, w AS width, h AS height, dhash,
        |  CAST(count(*) OVER (PARTITION BY dhash) AS BIGINT) AS n_same_hash
        |FROM hash""".stripMargin,
    // audio fingerprint recomputed from the ASSET CONTRACT: PCM16 LE
    // samples are consecutive text byte pairs (signed high byte),
    // 8 integer-division windows, |energy| gradient bits
    "m06_audio_fingerprint" ->
      """WITH aud AS (SELECT doc_id, text, length(text) AS tl,
        |    CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS sample_rate
        |  FROM documents WHERE doc_id % 3 = 1),
        |sig AS (SELECT doc_id, sample_rate, tl // 2 AS n,
        |    [CASE WHEN ascii(substr(text, 2*i+2, 1)) >= 128
        |       THEN abs(ascii(substr(text, 2*i+1, 1))
        |            + 256*ascii(substr(text, 2*i+2, 1)) - 65536)
        |       ELSE ascii(substr(text, 2*i+1, 1))
        |            + 256*ascii(substr(text, 2*i+2, 1)) END
        |     FOR i IN range(0, tl // 2)] AS absamp
        |  FROM aud),
        |smp AS (SELECT doc_id, n, unnest(absamp) AS v,
        |    unnest(range(n)) AS i
        |  FROM sig WHERE n > 0),
        |en0 AS (SELECT doc_id, (i*8)//n AS w, sum(v) AS e
        |  FROM smp GROUP BY 1, 2),
        |grid AS (SELECT doc_id, r.range AS w FROM sig, range(8) r),
        |en AS (SELECT g.doc_id, g.w, coalesce(e, 0) AS e
        |  FROM grid g LEFT JOIN en0 ON en0.doc_id = g.doc_id
        |    AND en0.w = g.w),
        |fp AS (SELECT a.doc_id,
        |    CAST(sum(CASE WHEN a.e > b.e
        |      THEN 1::BIGINT << CAST(a.w AS INT) ELSE 0 END) AS BIGINT)
        |      AS afp
        |  FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.w = a.w + 1
        |  WHERE a.w < 7 GROUP BY 1),
        |base AS (SELECT s.doc_id, s.sample_rate,
        |    CAST(s.n AS BIGINT) AS n_samples, coalesce(fp.afp, 0) AS afp
        |  FROM sig s LEFT JOIN fp USING (doc_id))
        |SELECT doc_id AS asset_id, sample_rate, n_samples, afp,
        |  CAST(count(*) OVER (PARTITION BY afp) AS BIGINT) AS n_same_fp
        |FROM base""".stripMargin,
    // m07: every video fingerprint recomputed from the asset
    // contract's text-as-frame-bytes derivation (the m06 byte-fold
    // technique at frame granularity); width/height predicted from the
    // contract vs the engine's header parse
    "m07_video_fingerprint" ->
      """WITH vid AS (SELECT doc_id, text, length(text) AS tl,
        |    CAST(doc_id % 640 + 64 AS INT) AS width,
        |    CAST(doc_id % 480 + 48 AS INT) AS height
        |  FROM documents WHERE doc_id % 3 = 2),
        |ch AS (SELECT doc_id, text, unnest(range(least(tl, 512))) AS i
        |  FROM vid WHERE tl > 0),
        |en0 AS (SELECT doc_id, i // 64 AS w,
        |    CAST(sum(ascii(substr(text, CAST(i AS INT) + 1, 1)))
        |      AS BIGINT) AS e
        |  FROM ch GROUP BY 1, 2),
        |grid AS (SELECT v.doc_id, r.range AS w FROM vid v, range(8) r),
        |en AS (SELECT g.doc_id, g.w, coalesce(e, 0) AS e
        |  FROM grid g LEFT JOIN en0 ON en0.doc_id = g.doc_id
        |    AND en0.w = g.w),
        |fp AS (SELECT a.doc_id,
        |    CAST(sum(CASE WHEN a.e > b.e
        |      THEN 1::BIGINT << CAST(a.w AS INT) ELSE 0 END) AS BIGINT)
        |      AS vfp
        |  FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.w = a.w + 1
        |  WHERE a.w < 7 GROUP BY 1),
        |base AS (SELECT v.doc_id, v.width, v.height,
        |    CAST((v.tl + 63) // 64 AS BIGINT) AS n_frames,
        |    coalesce(fp.vfp, 0) AS vfp
        |  FROM vid v LEFT JOIN fp USING (doc_id))
        |SELECT doc_id AS asset_id, width, height, n_frames, vfp,
        |  CAST(count(*) OVER (PARTITION BY vfp) AS BIGINT) AS n_same_fp
        |FROM base""".stripMargin,
    // m08: every dHash recomputed from the asset contract (the m05
    // derivation), then the DIRECT quadratic Hamming join — the
    // engine's banded multi-index must reproduce it exactly because
    // the 4x16-bit pigeonhole is lossless at cutoff 2
    "m08_image_neardup" ->
      """WITH img AS (SELECT doc_id, text, length(text) AS tl,
        |    CAST(doc_id % 640 + 64 AS BIGINT) AS w,
        |    CAST(doc_id % 480 + 48 AS BIGINT) AS h,
        |    CAST(((doc_id % 640 + 64) * 3 + 3) // 4 * 4 AS BIGINT) AS stride
        |  FROM documents WHERE doc_id % 3 = 0),
        |grid AS (SELECT doc_id, w, h, stride, text, tl,
        |    r1.range AS x, r2.range AS y
        |  FROM img, range(9) r1, range(8) r2),
        |px AS (SELECT doc_id, x, y,
        |    (SELECT sum(CASE
        |        WHEN (y*h//8)*stride + (x*w//9)*3 + c.range < tl
        |        THEN ascii(substr(text,
        |          CAST((y*h//8)*stride + (x*w//9)*3 + c.range AS INT) + 1, 1))
        |        ELSE 0 END)
        |     FROM range(3) c) AS bright
        |  FROM grid),
        |bits AS (SELECT a.doc_id, a.y, a.x,
        |    CASE WHEN a.bright > b.bright THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.y = b.y
        |    AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |hash AS (SELECT doc_id,
        |    CAST(CASE WHEN h128 >= 9223372036854775808
        |         THEN h128 - 18446744073709551616 ELSE h128 END AS BIGINT)
        |      AS dhash
        |  FROM (SELECT doc_id,
        |      sum(bit * (1::HUGEINT << CAST(y*8 + x AS INT))) AS h128
        |    FROM bits GROUP BY doc_id))
        |SELECT a.doc_id AS asset_a, b.doc_id AS asset_b,
        |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
        |FROM hash a JOIN hash b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.dhash, b.dhash)) <= 2""".stripMargin,
    // m09: m08's full dHash recomputation + the d04 token convention,
    // composed; token-set sizes from documents directly (len of the
    // distinct list) so a zero-token doc cannot drop the pair
    "m09_caption_conflict" ->
      """WITH img AS (SELECT doc_id, text, length(text) AS tl,
        |    CAST(doc_id % 640 + 64 AS BIGINT) AS w,
        |    CAST(doc_id % 480 + 48 AS BIGINT) AS h,
        |    CAST(((doc_id % 640 + 64) * 3 + 3) // 4 * 4 AS BIGINT) AS stride
        |  FROM documents WHERE doc_id % 3 = 0),
        |grid AS (SELECT doc_id, w, h, stride, text, tl,
        |    r1.range AS x, r2.range AS y
        |  FROM img, range(9) r1, range(8) r2),
        |px AS (SELECT doc_id, x, y,
        |    (SELECT sum(CASE
        |        WHEN (y*h//8)*stride + (x*w//9)*3 + c.range < tl
        |        THEN ascii(substr(text,
        |          CAST((y*h//8)*stride + (x*w//9)*3 + c.range AS INT) + 1, 1))
        |        ELSE 0 END)
        |     FROM range(3) c) AS bright
        |  FROM grid),
        |bits AS (SELECT a.doc_id, a.y, a.x,
        |    CASE WHEN a.bright > b.bright THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.y = b.y
        |    AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |hash AS (SELECT doc_id,
        |    CAST(CASE WHEN h128 >= 9223372036854775808
        |         THEN h128 - 18446744073709551616 ELSE h128 END AS BIGINT)
        |      AS dhash
        |  FROM (SELECT doc_id,
        |      sum(bit * (1::HUGEINT << CAST(y*8 + x AS INT))) AS h128
        |    FROM bits GROUP BY doc_id)),
        |hp AS (SELECT a.doc_id AS asset_a, b.doc_id AS asset_b,
        |    CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
        |  FROM hash a JOIN hash b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 2),
        |tk AS (SELECT doc_id, unnest(list_distinct(
        |    regexp_extract_all(lower(text), '[a-z0-9]+'))) AS tok
        |  FROM documents WHERE doc_id % 3 = 0),
        |sz AS (SELECT doc_id, CAST(len(list_distinct(
        |    regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 3 = 0),
        |inter AS (SELECT p.asset_a, p.asset_b, count(*) AS n_inter
        |  FROM hp p JOIN tk a ON a.doc_id = p.asset_a
        |            JOIN tk b ON b.doc_id = p.asset_b AND a.tok = b.tok
        |  GROUP BY 1, 2)
        |SELECT p.asset_a, p.asset_b, p.hamming,
        |  CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
        |  CAST(sa.n + sb.n - coalesce(i.n_inter, 0) AS BIGINT) AS n_union,
        |  coalesce(i.n_inter, 0) * 2
        |    < sa.n + sb.n - coalesce(i.n_inter, 0) AS caption_conflict
        |FROM hp p
        |JOIN sz sa ON sa.doc_id = p.asset_a
        |JOIN sz sb ON sb.doc_id = p.asset_b
        |LEFT JOIN inter i ON i.asset_a = p.asset_a
        |  AND i.asset_b = p.asset_b""".stripMargin,
    // VARIANT battery restated with DuckDB string-path JSON; the
    // minified roundtrip is REBUILT from the extracted value space
    // ('{"k":<int>}') rather than whitespace-stripping the raw string —
    // robust to any fixture reformatting that keeps the contract shape
    // (single integer key k, pinned in TablesSpec) and canonically
    // minified/key-sorted by construction, matching Variant to_json
    "q76_variant_battery" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract_string(props, '$.missing') AS BIGINT)
        |    AS missing_k,
        |  TRY_CAST(concat('}', props) AS JSON) IS NULL AS malformed_null,
        |  concat('{"k":',
        |    CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
        |      AS VARCHAR), '}') AS roundtrip
        |FROM events""".stripMargin,
    // balance-to-largest: integer epoch factors + md5-rank modulo spread
    "c07_balance_upsample" ->
      """WITH n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |mx AS (SELECT CAST(max(n) AS BIGINT) AS nmax FROM n),
        |alloc AS (SELECT lang, nmax // n AS base_rep, nmax % n AS extra
        |  FROM n CROSS JOIN mx),
        |r AS (SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':balance'), doc_id)
        |      AS BIGINT) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, rn,
        |  base_rep + (CASE WHEN rn <= extra THEN 1 ELSE 0 END)
        |    AS n_repeats
        |FROM r JOIN alloc USING (lang)""".stripMargin,
    // materialized packing: vocab ranks, t18's md5 layout offsets,
    // bins collect ids under the total (off) order
    "t24_pack_materialize" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |cnt AS (SELECT unnest(toks) AS tok FROM t),
        |cnt2 AS (SELECT tok, count(*) AS c FROM cnt GROUP BY 1),
        |vocab AS (SELECT tok,
        |    CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT)
        |      AS vid
        |  FROM cnt2),
        |o AS (SELECT doc_id, toks, len(toks) AS n_tok,
        |    CAST(sum(len(toks)) OVER (
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':pack'), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) - len(toks) AS start_off
        |  FROM t),
        |flat AS (SELECT doc_id, start_off + i AS off, tok
        |  FROM (SELECT doc_id, start_off,
        |      unnest(range(len(toks))) AS i, unnest(toks) AS tok
        |    FROM o)),
        |ids AS (SELECT off, CAST(off // 2048 AS BIGINT) AS bin, vid
        |  FROM flat JOIN vocab USING (tok))
        |SELECT bin, CAST(count(*) AS BIGINT) AS n_tok,
        |  string_agg(CAST(vid AS VARCHAR), ' ' ORDER BY off) AS ids
        |FROM ids GROUP BY bin""".stripMargin,
    // vocab coverage: top-64 under the (count desc, token asc) total
    // order; OOV = no vocab match
    "t25_vocab_coverage" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |  FROM documents),
        |v AS (SELECT tok AS vtok FROM (
        |    SELECT tok, count(*) AS c FROM tok GROUP BY 1
        |    ORDER BY c DESC, tok LIMIT 64))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |  CAST(sum(CASE WHEN vtok IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_in_vocab,
        |  CAST(sum(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_oov
        |FROM tok LEFT JOIN v ON tok.tok = v.vtok
        |GROUP BY doc_id""".stripMargin,
    // BPE trainer: all 3 rounds replayed on the double-space string
    // representation — merges as replace() over ' l  r ' patterns (the
    // doubled separator makes the non-overlapping scan equal the
    // engine's token-wise greedy scan), pair counts via string_split
    "t29_bpe_train" ->
      """WITH w AS (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
        |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS w
        |    FROM documents) GROUP BY 1),
        |s0 AS (SELECT '  ' || array_to_string(
        |    [w[i] FOR i IN range(1, len(w) + 1)], '  ') || '  ' AS s, wc
        |  FROM w),
        |x1 AS (SELECT string_split(trim(s), '  ') AS t, wc FROM s0),
        |e1 AS (SELECT t, wc, unnest(range(1, len(t))) AS i FROM x1),
        |p1 AS (SELECT t[CAST(i AS INT)] AS l, t[CAST(i AS INT) + 1] AS r,
        |    CAST(sum(wc) AS BIGINT) AS c
        |  FROM e1 GROUP BY 1, 2),
        |m1 AS (SELECT l, r, c FROM p1 ORDER BY c DESC, l, r LIMIT 1),
        |s1 AS (SELECT replace(s, ' ' || m1.l || '  ' || m1.r || ' ',
        |    ' ' || m1.l || m1.r || ' ') AS s, wc FROM s0, m1),
        |x2 AS (SELECT string_split(trim(s), '  ') AS t, wc FROM s1),
        |e2 AS (SELECT t, wc, unnest(range(1, len(t))) AS i FROM x2),
        |p2 AS (SELECT t[CAST(i AS INT)] AS l, t[CAST(i AS INT) + 1] AS r,
        |    CAST(sum(wc) AS BIGINT) AS c
        |  FROM e2 GROUP BY 1, 2),
        |m2 AS (SELECT l, r, c FROM p2 ORDER BY c DESC, l, r LIMIT 1),
        |s2 AS (SELECT replace(s, ' ' || m2.l || '  ' || m2.r || ' ',
        |    ' ' || m2.l || m2.r || ' ') AS s, wc FROM s1, m2),
        |x3 AS (SELECT string_split(trim(s), '  ') AS t, wc FROM s2),
        |e3 AS (SELECT t, wc, unnest(range(1, len(t))) AS i FROM x3),
        |p3 AS (SELECT t[CAST(i AS INT)] AS l, t[CAST(i AS INT) + 1] AS r,
        |    CAST(sum(wc) AS BIGINT) AS c
        |  FROM e3 GROUP BY 1, 2),
        |m3 AS (SELECT l, r, c FROM p3 ORDER BY c DESC, l, r LIMIT 1)
        |SELECT CAST(1 AS INT) AS round, l, r, c FROM m1
        |UNION ALL SELECT CAST(2 AS INT), l, r, c FROM m2
        |UNION ALL SELECT CAST(3 AS INT), l, r, c FROM m3""".stripMargin,
    // t30: the full t29 double-space replay, carrying the word through
    // the merge rounds, extended one step (apply m3 -> s3): the final
    // string's '  '-split length IS the word's BPE unit count; then
    // the identical per-doc reduction over the doc-word frame
    "t30_bpe_encode" ->
      """WITH w AS (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
        |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS w
        |    FROM documents) GROUP BY 1),
        |s0 AS (SELECT w, '  ' || array_to_string(
        |    [w[i] FOR i IN range(1, len(w) + 1)], '  ') || '  ' AS s, wc
        |  FROM w),
        |x1 AS (SELECT string_split(trim(s), '  ') AS t, wc FROM s0),
        |e1 AS (SELECT t, wc, unnest(range(1, len(t))) AS i FROM x1),
        |p1 AS (SELECT t[CAST(i AS INT)] AS l, t[CAST(i AS INT) + 1] AS r,
        |    CAST(sum(wc) AS BIGINT) AS c
        |  FROM e1 GROUP BY 1, 2),
        |m1 AS (SELECT l, r, c FROM p1 ORDER BY c DESC, l, r LIMIT 1),
        |s1 AS (SELECT w, replace(s, ' ' || m1.l || '  ' || m1.r || ' ',
        |    ' ' || m1.l || m1.r || ' ') AS s, wc FROM s0, m1),
        |x2 AS (SELECT string_split(trim(s), '  ') AS t, wc FROM s1),
        |e2 AS (SELECT t, wc, unnest(range(1, len(t))) AS i FROM x2),
        |p2 AS (SELECT t[CAST(i AS INT)] AS l, t[CAST(i AS INT) + 1] AS r,
        |    CAST(sum(wc) AS BIGINT) AS c
        |  FROM e2 GROUP BY 1, 2),
        |m2 AS (SELECT l, r, c FROM p2 ORDER BY c DESC, l, r LIMIT 1),
        |s2 AS (SELECT w, replace(s, ' ' || m2.l || '  ' || m2.r || ' ',
        |    ' ' || m2.l || m2.r || ' ') AS s, wc FROM s1, m2),
        |x3 AS (SELECT string_split(trim(s), '  ') AS t, wc FROM s2),
        |e3 AS (SELECT t, wc, unnest(range(1, len(t))) AS i FROM x3),
        |p3 AS (SELECT t[CAST(i AS INT)] AS l, t[CAST(i AS INT) + 1] AS r,
        |    CAST(sum(wc) AS BIGINT) AS c
        |  FROM e3 GROUP BY 1, 2),
        |m3 AS (SELECT l, r, c FROM p3 ORDER BY c DESC, l, r LIMIT 1),
        |s3 AS (SELECT w, replace(s, ' ' || m3.l || '  ' || m3.r || ' ',
        |    ' ' || m3.l || m3.r || ' ') AS s, wc FROM s2, m3),
        |wn AS (SELECT w,
        |    CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_units
        |  FROM s3),
        |dw AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |    CAST(sum(length(dw.w)) AS BIGINT) AS n_char_units,
        |    CAST(sum(n_units) AS BIGINT) AS n_bpe_units
        |  FROM dw JOIN wn USING (w) GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_words, 0) AS n_words,
        |  coalesce(n_char_units, 0) AS n_char_units,
        |  coalesce(n_bpe_units, 0) AS n_bpe_units
        |FROM documents d LEFT JOIN agg USING (doc_id)""".stripMargin,
    // quality classifier: every hashed-feature index re-derived from
    // the md5 HEX STRING (substr/ascii digit arithmetic) where the
    // engine extracts nibbles from the digest BYTES; the weight
    // formula (j * 2654435761) % 17 - 8 recomputed inline
    "t28_quality_classifier" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |u AS (SELECT doc_id, unnest(toks) AS f FROM t),
        |b AS (SELECT doc_id,
        |    toks[CAST(i AS INT)] || '_' || toks[CAST(i AS INT) + 1] AS f
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        |        FROM t)),
        |feats AS (SELECT doc_id, md5(f) AS m FROM u
        |  UNION ALL SELECT doc_id, md5(f) FROM b),
        |idx AS (SELECT doc_id,
        |    (ascii(substr(m, 1, 1)) - CASE WHEN ascii(substr(m, 1, 1))
        |       >= 97 THEN 87 ELSE 48 END) * 256
        |  + (ascii(substr(m, 2, 1)) - CASE WHEN ascii(substr(m, 2, 1))
        |       >= 97 THEN 87 ELSE 48 END) * 16
        |  + (ascii(substr(m, 3, 1)) - CASE WHEN ascii(substr(m, 3, 1))
        |       >= 97 THEN 87 ELSE 48 END) AS j
        |  FROM feats),
        |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
        |    CAST(sum((j * 2654435761) % 17 - 8) AS BIGINT) AS score
        |  FROM idx GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_feat, 0) AS n_feat,
        |  coalesce(score, 0) AS score, coalesce(score, 0) >= 0 AS keep
        |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""".stripMargin,
    // t31: t28's score CTE chain (the model is FROZEN and shared — the
    // derivation route via substr/ascii stays the independent one);
    // the confusion/precision/recall arithmetic is t31's own
    "t31_calibration" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |u AS (SELECT doc_id, unnest(toks) AS f FROM t),
        |b AS (SELECT doc_id,
        |    toks[CAST(i AS INT)] || '_' || toks[CAST(i AS INT) + 1] AS f
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        |        FROM t)),
        |feats AS (SELECT doc_id, md5(f) AS m FROM u
        |  UNION ALL SELECT doc_id, md5(f) FROM b),
        |idx AS (SELECT doc_id,
        |    (ascii(substr(m, 1, 1)) - CASE WHEN ascii(substr(m, 1, 1))
        |       >= 97 THEN 87 ELSE 48 END) * 256
        |  + (ascii(substr(m, 2, 1)) - CASE WHEN ascii(substr(m, 2, 1))
        |       >= 97 THEN 87 ELSE 48 END) * 16
        |  + (ascii(substr(m, 3, 1)) - CASE WHEN ascii(substr(m, 3, 1))
        |       >= 97 THEN 87 ELSE 48 END) AS j
        |  FROM feats),
        |sc AS (SELECT doc_id,
        |    CAST(sum((j * 2654435761) % 17 - 8) AS BIGINT) AS score
        |  FROM idx GROUP BY 1),
        |lab AS (SELECT d.doc_id, coalesce(score, 0) AS score,
        |    len(toks) BETWEEN 25 AND 60 AS truth
        |  FROM t d LEFT JOIN sc ON sc.doc_id = d.doc_id),
        |cf AS (SELECT thr,
        |    CAST(count(CASE WHEN score >= thr AND truth THEN 1 END)
        |      AS BIGINT) AS tp,
        |    CAST(count(CASE WHEN score >= thr AND NOT truth THEN 1 END)
        |      AS BIGINT) AS fp,
        |    CAST(count(CASE WHEN score < thr AND truth THEN 1 END)
        |      AS BIGINT) AS fn,
        |    CAST(count(CASE WHEN score < thr AND NOT truth THEN 1 END)
        |      AS BIGINT) AS tn
        |  FROM lab CROSS JOIN (SELECT CAST(unnest([-40, -20, 0, 20, 40])
        |    AS BIGINT) AS thr) GROUP BY 1)
        |SELECT thr, tp, fp, fn, tn,
        |  tp * 10000 // nullif(tp + fp, 0) AS prec_x10k,
        |  tp * 10000 // nullif(tp + fn, 0) AS rec_x10k
        |FROM cf""".stripMargin,
    // t32: both global orders as plain single-node windows — the
    // engine's two-level rank decompositions must land on identical
    // batch layouts
    "t32_padding_waste" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS len
        |  FROM documents),
        |a AS (SELECT len, row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':pad'), doc_id) AS rn
        |  FROM d),
        |s AS (SELECT len, row_number() OVER (
        |    ORDER BY len, md5(CAST(doc_id AS VARCHAR) || ':pads'), doc_id)
        |    AS rn
        |  FROM d),
        |ab AS (SELECT 'arrival' AS strategy, (rn - 1) // 32 AS batch_id,
        |    CAST(count(*) AS BIGINT) AS n_docs, max(len) AS max_len,
        |    CAST(sum(len) AS BIGINT) AS tok_sum
        |  FROM a GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'sorted', (rn - 1) // 32, CAST(count(*) AS BIGINT),
        |    max(len), CAST(sum(len) AS BIGINT)
        |  FROM s GROUP BY 1, 2)
        |SELECT strategy, CAST(batch_id AS BIGINT) AS batch_id, n_docs,
        |  max_len, tok_sum,
        |  max_len * n_docs - tok_sum AS padding
        |FROM ab""".stripMargin,
    // DSIR: identical ln-of-smoothed-ratio terms (t13 discipline),
    // summed per doc and rounded at 4dp; target LM = the en stratum
    "c08_dsir_weights" ->
      """WITH tok AS (SELECT doc_id, lang,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |  FROM documents),
        |cnt AS (SELECT tok, count(*) AS cr,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
        |  FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(cr) AS DOUBLE) AS nr,
        |    CAST(sum(ct) AS DOUBLE) AS nt,
        |    CAST(count(*) AS DOUBLE) AS v FROM cnt),
        |lam AS (SELECT tok,
        |    ln(CAST(ct + 1 AS DOUBLE) / (nt + v)) -
        |    ln(CAST(cr + 1 AS DOUBLE) / (nr + v)) AS lam
        |  FROM cnt CROSS JOIN tot)
        |SELECT doc_id, round(sum(lam), 4) AS dsir_weight,
        |  count(*) AS n_toks
        |FROM tok JOIN lam USING (tok)
        |GROUP BY 1""".stripMargin,
    // entity resolution: d07's independent recursive-CTE closure over
    // the q57 pair SQL
    "q80_entity_resolution" ->
      """WITH RECURSIVE c AS (
        |  SELECT c_custkey AS id, c_name AS name,
        |         substring(c_name, 1, 16) AS blk
        |  FROM customer),
        |e AS (
        |  SELECT a.id AS ia, b.id AS ib
        |  FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
        |  WHERE levenshtein(a.name, b.name) <= 1),
        |sym AS (SELECT ia AS a, ib AS b FROM e
        |  UNION SELECT ib AS a, ia AS b FROM e),
        |reach(id, comp) AS (
        |  SELECT c_custkey, c_custkey FROM customer
        |  UNION
        |  SELECT s.b, r.comp FROM reach r JOIN sym s ON s.a = r.id),
        |lab AS (SELECT id, min(comp) AS entity_id FROM reach GROUP BY 1)
        |SELECT id, entity_id,
        |  CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT)
        |    AS entity_size
        |FROM lab""".stripMargin,
    // KLL lifecycle: q40's rank-bound oracle with the wider 3% slack
    "q78_kll_quantiles" ->
      """WITH nn AS (SELECT count(*) AS n FROM orders),
        |v AS (SELECT o_totalprice AS val,
        |        row_number() OVER (ORDER BY o_totalprice) AS r
        |      FROM orders),
        |qs AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.99]) AS DOUBLE)
        |          AS quantile),
        |-- DOUBLE arithmetic on purpose: DECIMAL would compute the rank
        |-- exactly where the engine's IEEE product can land 1 ULP past
        |-- an integer and ceil one rank higher (bit at sf0.1, q=0.75)
        |k AS (SELECT quantile,
        |        greatest(1, CAST(floor((quantile - CAST(0.03 AS DOUBLE))
        |          * n) AS BIGINT)) AS klo,
        |        least(n, CAST(ceil((quantile + CAST(0.03 AS DOUBLE))
        |          * n) AS BIGINT)) AS khi
        |      FROM qs, nn)
        |SELECT k.quantile, vlo.val AS lo, vhi.val AS hi,
        |  TRUE AS within_bounds
        |FROM k JOIN v vlo ON vlo.r = k.klo
        |JOIN v vhi ON vhi.r = k.khi""".stripMargin,
    // theta set ops: exact pairwise intersections + contract boolean
    "q79_theta_setops" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT a.event_type AS ta, b.event_type AS tb,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_exact,
        |  TRUE AS within_10pct
        |FROM u a JOIN u b ON a.user_id = b.user_id
        |  AND a.event_type < b.event_type
        |GROUP BY 1, 2""".stripMargin,
    // sketch lifecycle: same exact-head contract shape as t26
    "q77_topk_lifecycle" ->
      """WITH slots AS (SELECT doc_id, unnest(range(1, 31)) AS i
        |               FROM documents),
        |tok AS (SELECT concat('zipf', CAST(CAST(least(floor(1000000.0 /
        |    (CAST(('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR), ':',
        |       CAST(i AS VARCHAR))), 1, 6)) AS BIGINT) % 1000000 + 1)),
        |    20000.0) AS BIGINT) AS VARCHAR)) AS token
        |  FROM slots),
        |tot AS (SELECT count(*) AS n_stream FROM tok),
        |heavy AS (SELECT token, count(*) AS n_true FROM tok GROUP BY 1)
        |SELECT token, CAST(n_true AS BIGINT) AS n_true,
        |  TRUE AS in_estimate, TRUE AS est_ok
        |FROM heavy, tot WHERE n_true * 17 > n_stream""".stripMargin,
    // native-sketch heavy hitters: t12's oracle shape (exact head
    // truth + TRUE contract booleans)
    "t26_approx_topk" ->
      """WITH slots AS (SELECT doc_id, unnest(range(1, 31)) AS i
        |               FROM documents),
        |tok AS (SELECT concat('zipf', CAST(CAST(least(floor(1000000.0 /
        |    (CAST(('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR), ':',
        |       CAST(i AS VARCHAR))), 1, 6)) AS BIGINT) % 1000000 + 1)),
        |    20000.0) AS BIGINT) AS VARCHAR)) AS token
        |  FROM slots),
        |tot AS (SELECT count(*) AS n_stream FROM tok),
        |heavy AS (SELECT token, count(*) AS n_true FROM tok GROUP BY 1)
        |SELECT token, CAST(n_true AS BIGINT) AS n_true,
        |  TRUE AS in_sketch, TRUE AS est_ok
        |FROM heavy, tot WHERE n_true * 17 > n_stream""".stripMargin,
    // composed DSIR-positive gate + Hamilton temperature allocation +
    // md5 stratified rank, re-derived end to end
    "c10_dsir_select_mix" ->
      """WITH tok AS (SELECT doc_id, lang,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |  FROM documents),
        |cnt AS (SELECT tok, count(*) AS cr,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
        |  FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(cr) AS DOUBLE) AS nr,
        |    CAST(sum(ct) AS DOUBLE) AS nt,
        |    CAST(count(*) AS DOUBLE) AS v FROM cnt),
        |lam AS (SELECT tok,
        |    ln(CAST(ct + 1 AS DOUBLE) / (nt + v)) -
        |    ln(CAST(cr + 1 AS DOUBLE) / (nr + v)) AS lam
        |  FROM cnt CROSS JOIN tot),
        |kept AS (SELECT doc_id, any_value(lang) AS lang,
        |    round(sum(lam), 4) AS dw
        |  FROM tok JOIN lam USING (tok)
        |  GROUP BY doc_id HAVING round(sum(lam), 4) > 0),
        |n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM kept GROUP BY 1),
        |w AS (SELECT lang, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
        |      AS w FROM n),
        |tt AS (SELECT CAST(sum(w) AS BIGINT) AS bw,
        |    CAST(sum(n) AS BIGINT) // 4 AS t FROM w),
        |a0 AS (SELECT lang, (t * w) // bw AS base, (t * w) % bw AS rem,
        |    t FROM w CROSS JOIN tt),
        |sh AS (SELECT CAST(max(t) AS BIGINT) - CAST(sum(base) AS BIGINT)
        |    AS r FROM a0),
        |a AS (SELECT lang, base +
        |    (CASE WHEN row_number() OVER (ORDER BY rem DESC, lang) <= r
        |      THEN 1 ELSE 0 END) AS alloc
        |  FROM a0 CROSS JOIN sh),
        |rk AS (SELECT doc_id, lang, dw,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':dsirmix'), doc_id)
        |      AS BIGINT) AS rn
        |  FROM kept)
        |SELECT doc_id, lang, dw, rn, alloc
        |FROM rk JOIN a USING (lang) WHERE rn <= alloc""".stripMargin,
    // hard negatives: identical 9dp-rounded cosine + id total order on
    // both engines (s09 discipline)
    "s11_hard_negatives" ->
      """WITH a AS (SELECT vec_id AS anchor_id, embedding AS av,
        |    label AS al FROM embeddings WHERE vec_id < 10),
        |scored AS (SELECT a.anchor_id, e.vec_id AS cand_id,
        |    e.label AS cand_label,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |      CAST(a.av AS DOUBLE[])), 9) AS simk
        |  FROM embeddings e, a
        |  WHERE e.vec_id <> a.anchor_id AND e.label <> a.al),
        |ranked AS (SELECT anchor_id, cand_id, cand_label, simk,
        |    CAST(row_number() OVER (PARTITION BY anchor_id
        |      ORDER BY simk DESC, cand_id) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT anchor_id, rnk, cand_id, cand_label, round(simk, 4) AS sim
        |FROM ranked WHERE rnk <= 5""".stripMargin,
    // temperature mixing: integer largest-remainder apportionment over
    // floor(sqrt·1e6) weights — exact on both engines
    "c09_temperature_mix" ->
      """WITH n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |w AS (SELECT lang, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
        |      AS w FROM n),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS bw,
        |    CAST(sum(n) AS BIGINT) // 4 AS t FROM w),
        |a0 AS (SELECT lang, (t * w) // bw AS base, (t * w) % bw AS rem,
        |    t FROM w CROSS JOIN tot),
        |sh AS (SELECT CAST(max(t) AS BIGINT) - CAST(sum(base) AS BIGINT)
        |    AS r FROM a0),
        |a AS (SELECT lang, base +
        |    (CASE WHEN row_number() OVER (ORDER BY rem DESC, lang) <= r
        |      THEN 1 ELSE 0 END) AS alloc
        |  FROM a0 CROSS JOIN sh),
        |rk AS (SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':temper'), doc_id)
        |      AS BIGINT) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, rn, alloc
        |FROM rk JOIN a USING (lang) WHERE rn <= alloc""".stripMargin,
    // PQ-ANN recall contract (s02/s03 shape): the boolean is computed
    // Spark-side vs the exact in-Spark brute-force truth
    "s10_ann_pq" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    // integer PageRank: the identical unrolled floor-division
    // recurrence (damping 1/2, millionths scale) — exact on any engine
    "g01_pagerank" ->
      """WITH pairs AS (SELECT DISTINCT o.o_custkey * 2 AS c,
        |    l.l_suppkey * 2 + 1 AS sp
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |edges AS (SELECT c AS src, sp AS dst FROM pairs
        |  UNION ALL SELECT sp AS src, c AS dst FROM pairs),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
        |  FROM edges GROUP BY 1),
        |pr0 AS (SELECT DISTINCT src AS node,
        |    CAST(1000000 AS BIGINT) AS pr FROM edges),
        |pr1 AS (SELECT e.dst AS node,
        |    CAST(500000 + CAST(sum(p.pr // d.deg) AS BIGINT) // 2
        |      AS BIGINT) AS pr
        |  FROM edges e JOIN deg d ON d.src = e.src
        |  JOIN pr0 p ON p.node = e.src GROUP BY e.dst),
        |pr2 AS (SELECT e.dst AS node,
        |    CAST(500000 + CAST(sum(p.pr // d.deg) AS BIGINT) // 2
        |      AS BIGINT) AS pr
        |  FROM edges e JOIN deg d ON d.src = e.src
        |  JOIN pr1 p ON p.node = e.src GROUP BY e.dst),
        |pr3 AS (SELECT e.dst AS node,
        |    CAST(500000 + CAST(sum(p.pr // d.deg) AS BIGINT) // 2
        |      AS BIGINT) AS pr
        |  FROM edges e JOIN deg d ON d.src = e.src
        |  JOIN pr2 p ON p.node = e.src GROUP BY e.dst)
        |SELECT node, pr FROM pr3""".stripMargin,
    // weighted PageRank: identical unrolled arithmetic with
    // floor((pr*w) div wsum) edge contributions
    "g02_pagerank_weighted" ->
      """WITH pairs AS (SELECT o.o_custkey * 2 AS c,
        |    l.l_suppkey * 2 + 1 AS sp,
        |    CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS w
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |edges AS (SELECT c AS src, sp AS dst, w FROM pairs
        |  UNION ALL SELECT sp AS src, c AS dst, w FROM pairs),
        |deg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wsum
        |  FROM edges GROUP BY 1),
        |pr0 AS (SELECT DISTINCT src AS node,
        |    CAST(1000000 AS BIGINT) AS pr FROM edges),
        |pr1 AS (SELECT e.dst AS node,
        |    CAST(500000 + CAST(sum((p.pr * e.w) // d.wsum) AS BIGINT)
        |      // 2 AS BIGINT) AS pr
        |  FROM edges e JOIN deg d ON d.src = e.src
        |  JOIN pr0 p ON p.node = e.src GROUP BY e.dst),
        |pr2 AS (SELECT e.dst AS node,
        |    CAST(500000 + CAST(sum((p.pr * e.w) // d.wsum) AS BIGINT)
        |      // 2 AS BIGINT) AS pr
        |  FROM edges e JOIN deg d ON d.src = e.src
        |  JOIN pr1 p ON p.node = e.src GROUP BY e.dst),
        |pr3 AS (SELECT e.dst AS node,
        |    CAST(500000 + CAST(sum((p.pr * e.w) // d.wsum) AS BIGINT)
        |      // 2 AS BIGINT) AS pr
        |  FROM edges e JOIN deg d ON d.src = e.src
        |  JOIN pr2 p ON p.node = e.src GROUP BY e.dst)
        |SELECT node, pr FROM pr3""".stripMargin,
    // personalized PageRank: identical unrolled arithmetic with the
    // seed-restricted floor, LEFT-joined against the full src-node
    // universe (zero-in-degree handling is part of the contract)
    "g03_pagerank_personalized" ->
      """WITH pairs AS (SELECT DISTINCT o.o_custkey * 2 AS c,
        |    l.l_suppkey * 2 + 1 AS sp
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |edges AS (SELECT c AS src, sp AS dst FROM pairs
        |  UNION ALL SELECT sp AS src, c AS dst FROM pairs),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
        |  FROM edges GROUP BY 1),
        |n0 AS (SELECT n.node,
        |    CASE WHEN s.node IS NOT NULL THEN CAST(500000 AS BIGINT)
        |         ELSE CAST(0 AS BIGINT) END AS fl
        |  FROM (SELECT DISTINCT src AS node FROM edges) n
        |  LEFT JOIN (SELECT DISTINCT c_custkey * 2 AS node
        |    FROM customer WHERE c_nationkey = 1) s ON s.node = n.node),
        |pr0 AS (SELECT node, fl * 2 AS pr FROM n0),
        |pr1 AS (SELECT n0.node,
        |    n0.fl + coalesce(c.sm, CAST(0 AS BIGINT)) // 2 AS pr
        |  FROM n0 LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS sm
        |    FROM edges e JOIN deg d ON d.src = e.src
        |    JOIN pr0 p ON p.node = e.src GROUP BY e.dst) c
        |    ON c.node = n0.node),
        |pr2 AS (SELECT n0.node,
        |    n0.fl + coalesce(c.sm, CAST(0 AS BIGINT)) // 2 AS pr
        |  FROM n0 LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS sm
        |    FROM edges e JOIN deg d ON d.src = e.src
        |    JOIN pr1 p ON p.node = e.src GROUP BY e.dst) c
        |    ON c.node = n0.node),
        |pr3 AS (SELECT n0.node,
        |    n0.fl + coalesce(c.sm, CAST(0 AS BIGINT)) // 2 AS pr
        |  FROM n0 LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS sm
        |    FROM edges e JOIN deg d ON d.src = e.src
        |    JOIN pr2 p ON p.node = e.src GROUP BY e.dst) c
        |    ON c.node = n0.node)
        |SELECT node, pr FROM pr3""".stripMargin,
    // g05: the same 9 peeling rounds unrolled as GENERATED CTE SQL
    // (each round: degree count -> keep list -> edge semi-filter); the
    // independent while-loop reference lives in GraphSpec. Every
    // round's edge CTE is AS MATERIALIZED: e_i references e_{i-1} three
    // times, and DuckDB's default CTE INLINING would expand the chain
    // to 3^rounds copies of the base scan (observed as a too-many-open-
    // files explosion on the lineitem parquet).
    "g05_kcore" -> {
      val k = 5; val rounds = 9
      val sb = new StringBuilder
      sb ++= """WITH op AS (SELECT DISTINCT l_orderkey AS ok,
               |    l_partkey AS p
               |  FROM lineitem WHERE l_partkey % 16 = 0),
               |e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
               |  FROM op a JOIN op b
               |  ON a.ok = b.ok AND a.p < b.p)""".stripMargin
      for (i <- 1 to rounds) sb ++= s""",
                |d$i AS (SELECT n, count(*) AS c FROM (
                |    SELECT u AS n FROM e${i - 1}
                |    UNION ALL SELECT v FROM e${i - 1}) GROUP BY 1),
                |k$i AS (SELECT n FROM d$i WHERE c >= $k),
                |e$i AS MATERIALIZED (SELECT u, v FROM e${i - 1}
                |  WHERE u IN (SELECT n FROM k$i)
                |    AND v IN (SELECT n FROM k$i))""".stripMargin
      sb ++= s""",
               |df AS (SELECT n, count(*) AS c FROM (
               |    SELECT u AS n FROM e$rounds
               |    UNION ALL SELECT v FROM e$rounds) GROUP BY 1)
               |SELECT n AS node, CAST(c AS BIGINT) AS deg,
               |  (SELECT coalesce(min(c), ${Long.MaxValue}) FROM df)
               |    >= $k AS converged
               |FROM df""".stripMargin
      sb.toString
    },
    // g06: the same 4 synchronous LPA rounds unrolled as generated CTE
    // SQL, with the per-node argmax formulated INDEPENDENTLY as a
    // row_number window over (count desc, label asc) — a shared
    // argmax-semantics bug cannot pass both forms. Every label table is
    // AS MATERIALIZED (referenced by the next round once and by the
    // convergence probe twice; DuckDB CTE inlining would re-expand the
    // chain per reference, the g05 lesson).
    "g06_label_prop" -> {
      val rounds = 4
      val sb = new StringBuilder
      sb ++= """WITH op AS (SELECT DISTINCT l_orderkey AS ok,
               |    l_partkey AS p
               |  FROM lineitem WHERE l_partkey % 8 = 0),
               |e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
               |  FROM op a JOIN op b
               |  ON a.ok = b.ok AND a.p < b.p),
               |nbr AS MATERIALIZED (SELECT u AS node, v AS nb FROM e0
               |  UNION ALL SELECT v, u FROM e0),
               |l0 AS MATERIALIZED (SELECT DISTINCT node, node AS lab
               |  FROM nbr)""".stripMargin
      for (i <- 1 to rounds) sb ++= s""",
                |c$i AS (SELECT n.node, l.lab, count(*) AS c
                |  FROM nbr n JOIN l${i - 1} l ON l.node = n.nb
                |  GROUP BY 1, 2),
                |l$i AS MATERIALIZED (SELECT node, lab FROM (
                |    SELECT node, lab, row_number() OVER (
                |      PARTITION BY node ORDER BY c DESC, lab) AS r
                |    FROM c$i) WHERE r = 1)""".stripMargin
      sb ++= s"""
               |SELECT f.node, f.lab,
               |  (SELECT count(*) FROM l$rounds x
               |     JOIN l${rounds - 1} y ON x.node = y.node
               |     AND x.lab <> y.lab) = 0 AS converged
               |FROM l$rounds f""".stripMargin
      sb.toString
    },
    // g08: the same 4 BFS rounds with the propagation formulated
    // INDEPENDENTLY — the oracle min-merges the FULL distance frame
    // every round (d_r = min over d_{r-1} ∪ {nbr dist+1}) where the
    // engine joins only the frontier delta; the two agree exactly iff
    // the BFS frontier invariant holds. Distance tables MATERIALIZED
    // (g05 lesson: each is referenced by the next round and d3/d4
    // twice by the settled probe).
    "g08_bfs_distance" -> {
      val rounds = 4
      val sb = new StringBuilder
      sb ++= """WITH op AS (SELECT DISTINCT l_orderkey AS ok,
               |    l_partkey AS p
               |  FROM lineitem WHERE l_partkey % 16 = 0),
               |e AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
               |  FROM op a JOIN op b
               |  ON a.ok = b.ok AND a.p < b.p),
               |nbr AS MATERIALIZED (SELECT u AS node, v AS nb FROM e
               |  UNION ALL SELECT v, u FROM e),
               |d0 AS MATERIALIZED (SELECT DISTINCT node, 0 AS dist
               |  FROM nbr WHERE node % 64 = 0)""".stripMargin
      for (i <- 1 to rounds) sb ++= s""",
                |d$i AS MATERIALIZED (SELECT node, min(dist) AS dist
                |  FROM (SELECT node, dist FROM d${i - 1}
                |    UNION ALL
                |    SELECT n.node, d.dist + 1
                |    FROM nbr n JOIN d${i - 1} d ON n.nb = d.node)
                |  GROUP BY 1)""".stripMargin
      sb ++= s"""
               |SELECT node, CAST(dist AS BIGINT) AS dist,
               |  (SELECT count(*) FROM d$rounds)
               |    = (SELECT count(*) FROM d${rounds - 1}) AS settled
               |FROM d$rounds""".stripMargin
      sb.toString
    },
    // d13: shingle-STRING joins vs the engine's xxhash64 keys (d08
    // discipline — a hash collision would fail deterministically)
    "d13_source_overlap" ->
      """WITH t AS (SELECT source,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |sh AS MATERIALIZED (SELECT DISTINCT source, s FROM (
        |    SELECT source, unnest(
        |      CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
        |           ELSE [array_to_string(toks[i+1:i+3], ' ')
        |                 FOR i IN range(0, len(toks)-2)] END) AS s
        |    FROM t)),
        |c AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.source AS src_a, b.source AS src_b,
        |    count(*) AS n_shared
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, CAST(n_shared AS BIGINT) AS n_shared,
        |  CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
        |  CAST(n_shared AS BIGINT) * 10000
        |    // (ca.n + cb.n - n_shared) AS jaccard_x10k
        |FROM p
        |JOIN c ca ON p.src_a = ca.source
        |JOIN c cb ON p.src_b = cb.source""".stripMargin,
    // g04: the id-ordered 3-way self-join count — a different
    // formulation from the engine's degree-ordered forward algorithm;
    // the exact integer counts must agree
    "g04_triangle_count" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |  FROM lineitem WHERE l_partkey % 4 = 0),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.p < b.p)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM e e1
        |   JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
        |   JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles""".stripMargin,
    // snapshot maintenance: the two-batch I/U/D state machine
    // re-derived INDEPENDENTLY as a full-outer-join CASE table over
    // quota cap: first-3-per-user rank re-derived directly
    "q82_quota_cap" ->
      """WITH r AS (SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_id,
        |  CAST(least(rn - 1, 3) AS BIGINT) AS n_before,
        |  rn <= 3 AS accepted
        |FROM r""".stripMargin,
    "q83_skew_profile" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
        |    count(*) AS n_keys FROM c),
        |top5 AS (SELECT user_id, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, user_id)
        |      AS BIGINT) AS rnk
        |  FROM c ORDER BY cnt DESC, user_id LIMIT 5)
        |SELECT rnk, user_id, cnt,
        |  cnt * 10000 // total AS share_bp,
        |  cnt * n_keys * 100 // total AS skew_x100,
        |  greatest(CAST(1 AS BIGINT), cnt * n_keys // total) AS salt
        |FROM top5, t""".stripMargin,
    "q84_outer_interval_join" ->
      """WITH c AS (SELECT user_id AS cu, ts AS c_ts,
        |    event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |e AS (SELECT user_id, ts AS e_ts, event_id AS error_id
        |  FROM events WHERE event_type = 'error')
        |SELECT e.user_id, error_id, click_id,
        |  click_id IS NOT NULL AS matched
        |FROM e LEFT JOIN c ON cu = e.user_id
        |  AND c_ts <= e_ts
        |  AND c_ts >= e_ts - INTERVAL '10 minutes'""".stripMargin,
    // each batch's latest-per-user event (never the Cdc kernel's
    // join-then-union shape)
    "q81_snapshot_maintain" ->
      """WITH e AS (SELECT user_id, event_type, value, ts, event_id,
        |    CASE WHEN day(ts) <= 15 THEN 1 ELSE 2 END AS b
        |  FROM events),
        |l AS (SELECT *, row_number() OVER (PARTITION BY user_id, b
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM e),
        |l1 AS (SELECT user_id, event_type, value FROM l
        |  WHERE b = 1 AND rn = 1),
        |l2 AS (SELECT user_id, event_type, value FROM l
        |  WHERE b = 2 AND rn = 1),
        |s1 AS (SELECT user_id, value AS balance, TRUE AS alive FROM l1
        |  WHERE event_type IN ('purchase', 'signup')),
        |f AS (SELECT coalesce(s1.user_id, l2.user_id) AS user_id,
        |    CASE
        |      WHEN l2.user_id IS NULL THEN s1.balance
        |      WHEN l2.event_type = 'purchase' THEN l2.value
        |      WHEN l2.event_type = 'signup'
        |        THEN coalesce(s1.balance, l2.value)
        |      WHEN l2.event_type = 'click' AND s1.user_id IS NOT NULL
        |        THEN l2.value
        |      ELSE s1.balance END AS balance,
        |    CASE WHEN l2.event_type = 'error' AND s1.user_id IS NOT NULL
        |      THEN FALSE ELSE TRUE END AS alive,
        |    CASE
        |      WHEN s1.user_id IS NOT NULL THEN TRUE
        |      WHEN l2.event_type IN ('purchase', 'signup') THEN TRUE
        |      ELSE FALSE END AS has_row
        |  FROM s1 FULL OUTER JOIN l2 ON l2.user_id = s1.user_id)
        |SELECT user_id, balance, alive FROM f WHERE has_row""".stripMargin,
    // BPE merge statistics: pair counts re-derived on the distinct-
    // word frame weighted by word frequency — independently of the
    // Spark-side transform/substr path
    "t27_bpe_pairs" ->
      """WITH w AS (SELECT unnest(regexp_extract_all(lower(text),
        |    '[a-z0-9]+')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS wc FROM w GROUP BY 1),
        |px AS (SELECT w, wc, unnest(range(1, length(w))) AS i
        |  FROM wc WHERE length(w) >= 2),
        |p AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair, wc
        |  FROM px)
        |SELECT pair, CAST(sum(wc) AS BIGINT) AS c
        |FROM p GROUP BY 1 ORDER BY c DESC, pair ASC LIMIT 50""".stripMargin,
  )
}
