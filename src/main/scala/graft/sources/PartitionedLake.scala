package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Month-partitioned parquet lake layout — the ingest organization for
  * the 100 TB fact table.
  *
  * The reference processes one month per run (PriceCatcher files are
  * monthly, reference: src/main.rs:219-233); the lake mirrors that:
  * `path/month=yyyy-MM/part-*.parquet`. A query filtering on `month`
  * never opens the other partitions' files (partition pruning — visible
  * as PartitionFilters in explain with partitionCount: 1), which is the
  * difference between scanning one month and scanning a decade.
  */
object PartitionedLake {

  /** Write `df` partitioned by the month of `tsCol`. */
  def writeByMonth(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("month", date_format(col(tsCol), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("month").parquet(path)

  /** Read one month — the `month` predicate prunes at planning time. */
  def readMonth(spark: SparkSession, path: String, month: String): DataFrame =
    spark.read.parquet(path).filter(col("month") === month)

  /** Incremental upsert of one month: dynamic partition overwrite
    * replaces ONLY the partitions present in `df` and leaves the rest of
    * the decade untouched — the daily-ingest pattern matching the
    * reference's one-month-per-run cadence (reference:
    * src/main.rs:219-233) at lake scale. (Static overwrite mode would
    * drop every other partition — the classic data-loss trap this
    * method exists to avoid.) */
  def upsertMonths(df: DataFrame, tsCol: String, path: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      df.withColumn("month", date_format(col(tsCol), "yyyy-MM"))
        .write.mode("overwrite").partitionBy("month").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Small-file compaction for one partition: rewrite a month's files
    * into ~`targetFiles` outputs. Streaming/incremental ingest produces
    * file counts proportional to micro-batches; scan cost at 100 TB is
    * dominated by file-open overhead once files shrink below ~100 MB. */
  def compactMonth(spark: SparkSession, path: String, month: String,
                   targetFiles: Int = 1): Unit = {
    val part = readMonth(spark, path, month).drop("month")
      .repartition(targetFiles)
    // write to a temp dir then atomically swap via upsertMonths semantics
    val tmp = part.cache()
    tmp.count() // materialize before overwriting the source partition
    val spark2 = spark
    val withMonth = tmp.withColumn("month", lit(month))
    val prev = spark2.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark2.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try withMonth.write.mode("overwrite").partitionBy("month").parquet(path)
    finally {
      tmp.unpersist()
      prev match {
        case Some(v) => spark2.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark2.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
