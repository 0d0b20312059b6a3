package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Cleaning, Dedup, Quality}
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

  /** q02 — A1 dedup-latest with deterministic tie-break (window form). */
  private def q02(s: SparkSession, d: String): DataFrame =
    Dedup.latestPerGroup(
      Tables.lineitem(s, d),
      keys = Seq("l_suppkey", "l_partkey"),
      order = Seq(col("l_shipdate").desc, col("l_orderkey").asc,
                  col("l_linenumber").asc))
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
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_clean_project" -> (q01 _),
    "q02_dedup_latest" -> (q02 _),
    "q03_enrich_join" -> (q03 _),
    "q04_unique_assert" -> (q04 _),
    "q05_agg_pricing" -> (q05 _),
  )

  def oracleSql: Map[String, String] = Map(
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
        |      ORDER BY l_shipdate DESC, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem) WHERE rn = 1""".stripMargin,
    "q03_enrich_join" ->
      """WITH latest AS (
        |  SELECT l_suppkey AS premise_code, l_partkey AS item_code,
        |         strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        |         l_extendedprice AS price
        |  FROM (SELECT *, row_number() OVER (PARTITION BY l_suppkey, l_partkey
        |        ORDER BY l_shipdate DESC, l_orderkey, l_linenumber) AS rn
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
        |round(avg(l_quantity), 4) AS avg_qty,
        |round(avg(l_discount), 4) AS avg_disc,
        |CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
  )
}
