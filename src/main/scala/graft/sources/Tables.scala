package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source layer: parquet scans over the driver test tables.
  *
  * All reads go through `spark.read.parquet`, i.e. Spark's vectorized
  * columnar reader with predicate pushdown, column pruning and row-group
  * skipping — deliberately the opposite of the reference's
  * row-at-a-time, no-projection scan (`get_row_iter(None)`,
  * reference: src/main.rs:60-66). At 100 TB the scan IS the query cost:
  * downstream operators must keep filters/projections as Column
  * expressions so Catalyst can push them into these scans.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Relation memo — the library-local analog of a catalog/metastore
    * entry. `spark.read.parquet` pays a driver-side file listing +
    * footer schema read per call; repeated query invocations over the
    * same path (every Verify/Bench run, any composed pipeline) should
    * pay it once. DataFrames are immutable logical plans, so sharing is
    * safe; keyed per session (a plan is bound to its session). Bounded:
    * one entry per (session, path) actually read. */
  private val relCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  private def sessionKey(spark: SparkSession): Int =
    System.identityHashCode(spark)

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    // events is NOT memoized here: its relation is only valid when
    // created under the nanosAsLong conf, so `events` caches its
    // CONVERTED frame below instead (a raw cache entry made without the
    // conf would poison every later events read)
    if (name == "events") spark.read.parquet(s"$sfDir/$name.parquet")
    else relCache.getOrElseUpdate(
      (sessionKey(spark), s"$sfDir/$name.parquet"),
      spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects outright. Read nanos as raw int64
    * (legacy conf) and truncate to microsecond TimestampType with integer
    * `div` — a true `/` would round-trip through double and lose
    * precision above 2^53 ns. */
  def events(spark: SparkSession, d: String): DataFrame =
    relCache.getOrElseUpdate((sessionKey(spark), s"$d/events.parquet#conv"),
      eventsUncached(spark, d))

  private def eventsUncached(spark: SparkSession, d: String): DataFrame = {
    // set/restore around the read: leaving nanosAsLong set would silently
    // change every later parquet read in the session (a read must not
    // have session-wide side effects). The DataFrame stays valid after
    // restore — the scan's hadoop conf is captured at relation creation,
    // which .schema below forces (asserted by TablesSpec).
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val raw = load(spark, d, "events")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions
            .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
        case _ => raw
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` queries and the
    * SQLite-artifact parity layer can address them by name. `events`
    * goes through its dedicated accessor (NANOS handling) so the view
    * exposes the same TimestampType every other consumer sees. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
