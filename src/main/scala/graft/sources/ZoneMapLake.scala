package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range-clustered parquet lake with a PERSISTED per-file zone-map
  * manifest — the min/max data-skipping primitive every production
  * table format ships (Iceberg manifest files, Delta per-file stats,
  * parquet row-group pruning writ large), kept as a TABLE in the lake
  * instead of rebuilt per query.
  *
  * Layout:
  * {{{
  *   path/data/part-*.parquet      range-clustered on the key
  *   path/_zonemap/part-*.parquet  (file, lo, hi, n_rows) — one row
  *                                 per data file, written ONCE at
  *                                 write time
  * }}}
  *
  * The write clusters rows on the key (repartitionByRange +
  * sortWithinPartitions — one dimension of q47's z-order discipline),
  * which is what makes the zones tight: without clustering every
  * file's [lo, hi] spans the whole domain and nothing skips. The
  * manifest is built from one bootstrap scan of the fresh data (a
  * production format lifts the same numbers from the parquet footers
  * it just wrote; the content is identical) and persisted next to the
  * data, so QUERIES never rebuild it — the r9 per-query driver-array
  * rebuild is gone.
  *
  * A range query plans by filtering the MANIFEST TABLE to the files
  * whose [lo, hi] intersects the predicate and collecting only those
  * matched paths — metadata-scale planning (file-count-sized at most,
  * match-sized here), exactly what Iceberg/Delta drivers do before
  * handing the pruned file list to the scan. The unmatched files are
  * never opened.
  */
object ZoneMapLake {

  private def dataDir(path: String) = s"${path.stripSuffix("/")}/data"
  private def zoneDir(path: String) = s"${path.stripSuffix("/")}/_zonemap"

  /** Write `df` range-clustered on `keyCol` into `path/data` and
    * persist the per-file (file, lo, hi, n_rows) manifest at
    * `path/_zonemap`. `nFiles` bounds the cluster width (one output
    * file per range partition at fixture scale). */
  def write(df: DataFrame, keyCol: String, path: String,
            nFiles: Int): Unit = {
    val spark = df.sparkSession
    df.repartitionByRange(nFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write.mode("overwrite").parquet(dataDir(path))
    spark.read.parquet(dataDir(path))
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"),
        count(lit(1)).as("n_rows"))
      .coalesce(1) // manifest is file-count-sized metadata: one file
      .write.mode("overwrite").parquet(zoneDir(path))
  }

  /** The persisted manifest as a DataFrame — join/filter it like any
    * other table (the Iceberg `.files` metadata-table shape). */
  def manifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(zoneDir(path))

  /** Read only the files whose zone [lo, hi] intersects [qLo, qHi]:
    * the manifest FILTER runs as a query over the manifest table, and
    * only the matched paths — planning metadata, never row data —
    * reach the driver for the scan's file list. Returns the pruned
    * reader plus (matched, total) file counts for skip-effectiveness
    * accounting. A prune matching nothing returns an EMPTY frame with
    * the table's schema and matched=0 — an out-of-range query's
    * correct answer is zero rows, not an exception (r10 advice). The
    * caller still applies the row-level predicate: zones prune FILES,
    * they do not filter rows. */
  def prunedRead(spark: SparkSession, path: String, qLo: Long,
                 qHi: Long): (DataFrame, Long, Long) = {
    val mf = manifest(spark, path)
    val total = mf.count()
    val matched = mf.filter(col("hi") >= qLo && col("lo") <= qHi)
      .select("file").orderBy("file").collect().map(_.getString(0))
    val reader =
      if (matched.nonEmpty) spark.read.parquet(matched.toIndexedSeq: _*)
      else {
        // schema from one footer of the (never-empty) data dir — the
        // scan itself stays pruned to zero files
        val schema = spark.read.parquet(dataDir(path)).schema
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], schema)
      }
    (reader, matched.length.toLong, total)
  }
}
