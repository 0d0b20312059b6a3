package graft

import org.apache.spark.sql.SparkSession

import graft.sources.{GraftLakeSource, VersionedLake}

/** Fresh-JVM drive for the `graftlake` DataSource V2 surface
  * ([[graft.sources.GraftLakeSource]]): builds a small versioned lake,
  * then consumes it through PURE SQL — format resolution by short
  * name, `versionAsOf` time travel, and manifest-side partition
  * pruning from the pushed month filter (witnessed by the
  * live/read partition counters), including the r14 OR-union prune
  * and a format APPEND. Run:
  * `sbt 'runMain graft.LakeSqlDemo'` — expects
  * `DSV2_V1=3 DSV2_LATEST=3 DSV2_FEB_ID=4 DSV2_PARTS=3/1
  * DSV2_OR_N=2 DSV2_OR_PARTS=3/2 DSV2_W_N=4 DSV2_W_V=3`. */
object LakeSqlDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val lake =
      java.nio.file.Files.createTempDirectory("graftlake_demo").toString
    VersionedLake.reset(spark, lake)
    VersionedLake.commitOverwrite(
      Seq((1L, "1997-01", 10.0), (2L, "1997-02", 20.0),
        (3L, "1997-03", 30.0)).toDF("id", "month", "x"),
      "month", lake, commitTs = Some(1000L))
    VersionedLake.commitUpsert(
      Seq((4L, "1997-02", 40.0)).toDF("id", "month", "x"),
      "month", lake, commitTs = Some(2000L))
    spark.sql(s"""CREATE TEMPORARY VIEW lake_v1 USING graftlake
      OPTIONS (path '$lake', versionAsOf '1', partitionColumn 'month')""")
    spark.sql(s"""CREATE TEMPORARY VIEW lake_latest USING graftlake
      OPTIONS (path '$lake', partitionColumn 'month')""")
    val v1n = spark.sql("SELECT count(*) FROM lake_v1").head().getLong(0)
    val ln = spark.sql("SELECT count(*) FROM lake_latest").head().getLong(0)
    GraftLakeSource.lastScanParts.set(None)
    val febId = spark.sql(
      "SELECT max(id) FROM lake_latest WHERE month = '1997-02'")
      .head().getLong(0)
    val parts = GraftLakeSource.lastScanParts.get()
      .map { case (a, b) => s"$a/$b" }.getOrElse("none")
    // OR-union pruning (r14): two month equalities read two partitions
    GraftLakeSource.lastScanParts.set(None)
    val orN = spark.sql(
      """SELECT count(*) FROM lake_latest
        |WHERE month = '1997-01' OR month = '1997-03'""".stripMargin)
      .head().getLong(0)
    val orParts = GraftLakeSource.lastScanParts.get()
      .map { case (a, b) => s"$a/$b" }.getOrElse("none")
    // the format write path (r14): a plain df.write append through
    // graftlake, visible to the un-pinned view on its next scan
    Seq((5L, "1997-04", 50.0)).toDF("id", "month", "x")
      .write.format("graftlake").option("partitionColumn", "month")
      .mode("append").save(lake)
    val wN = spark.sql("SELECT count(*) FROM lake_latest")
      .head().getLong(0)
    val wV = VersionedLake.latestVersion(spark, lake)
    println(s"DSV2_V1=$v1n DSV2_LATEST=$ln DSV2_FEB_ID=$febId " +
      s"DSV2_PARTS=$parts DSV2_OR_N=$orN DSV2_OR_PARTS=$orParts " +
      s"DSV2_W_N=$wN DSV2_W_V=$wV")
    spark.stop()
  }
}
