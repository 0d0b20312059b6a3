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
}
