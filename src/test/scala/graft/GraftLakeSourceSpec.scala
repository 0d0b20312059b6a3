package graft

import org.apache.spark.sql.functions._

import graft.sources.{GraftLakeSource, VersionedLake}

/** The `graftlake` DataSource V2 surface: format resolution by short
  * name, version/timestamp time travel, manifest-side partition
  * pruning from pushed filters, column pruning, pure-SQL consumption,
  * and composition with deletion vectors + type widening (the read
  * path IS the library read). */
class GraftLakeSourceSpec extends SparkSpec {
  import spark.implicits._

  private def freshLake(): String = {
    val lake = java.nio.file.Files.createTempDirectory("lake_dsv2").toString
    VersionedLake.reset(spark, lake)
    VersionedLake.commitOverwrite(
      Seq((1L, "1997-01", 10.0), (2L, "1997-02", 20.0),
        (3L, "1997-03", 30.0)).toDF("id", "month", "x"),
      "month", lake, commitTs = Some(1000L))
    VersionedLake.commitUpsert(
      Seq((4L, "1997-02", 40.0)).toDF("id", "month", "x"),
      "month", lake, commitTs = Some(2000L))
    lake
  }

  private def read(lake: String, opts: (String, String)*) = {
    val r = spark.read.format("graftlake")
      .option("partitionColumn", "month")
    opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load(lake)
  }

  test("graftlake: short-name resolution, latest read, versionAsOf " +
      "and timestampAsOf time travel") {
    val lake = freshLake()
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"id").as[Long].collect().toSet
    assert(ids(read(lake)) == Set(1L, 3L, 4L), "latest: Feb upserted")
    assert(ids(read(lake, "versionAsOf" -> "1")) == Set(1L, 2L, 3L))
    assert(ids(read(lake, "timestampAsOf" -> "1500")) == Set(1L, 2L, 3L))
    assert(ids(read(lake, "timestampAsOf" -> "2000")) == Set(1L, 3L, 4L))
  }

  test("graftlake: partition-column filters prune at the manifest; a " +
      "prune to nothing reads nothing; results stay row-exact") {
    val lake = freshLake()
    GraftLakeSource.lastScanParts.set(None)
    val feb = read(lake).filter($"month" === "1997-02")
      .select($"id", $"x").as[(Long, Double)].collect().toSet
    assert(feb == Set((4L, 40.0)))
    assert(GraftLakeSource.lastScanParts.get().contains((3, 1)),
      s"3 live partitions, 1 read: ${GraftLakeSource.lastScanParts.get()}")
    val range = read(lake, "versionAsOf" -> "1")
      .filter($"month" >= "1997-02" && $"month" <= "1997-03")
      .select(sum($"x")).as[Double].head()
    assert(range == 50.0)
    assert(GraftLakeSource.lastScanParts.get().contains((3, 2)))
    assert(read(lake).filter($"month" === "2099-12").count() == 0,
      "a prune that excludes every partition returns the typed empty")
  }

  test("graftlake: pure-SQL view with options, column pruning") {
    val lake = freshLake()
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW graft_lake_v1
      USING graftlake
      OPTIONS (path '$lake', versionAsOf '1', partitionColumn 'month')""")
    val got = spark.sql(
      """SELECT month, CAST(sum(x) AS BIGINT) AS sx
        |FROM graft_lake_v1 WHERE month <> '1997-01'
        |GROUP BY month ORDER BY month""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("1997-02", 20L), ("1997-03", 30L)))
  }

  test("manifest file sizes: every data entry records its exact " +
      "on-disk bytes, filesTable surfaces them") {
    val lake = freshLake()
    val files = VersionedLake.filesTable(spark, lake, 2)
      .filter($"kind" === "data")
      .select($"rel", $"size_bytes").as[(String, Option[Long])].collect()
    assert(files.nonEmpty && files.forall(_._2.isDefined),
      "every data entry carries an S size field")
    files.foreach { case (rel, sz) =>
      val actual = new java.io.File(s"$lake/$rel").length()
      assert(sz.contains(actual), s"$rel: manifest $sz vs disk $actual")
    }
  }

  test("graftlake: deletion vectors and type widening surface through " +
      "the format exactly as the library read") {
    val lake = java.nio.file.Files.createTempDirectory("lake_dsv2c").toString
    VersionedLake.reset(spark, lake)
    VersionedLake.commitOverwrite(
      Seq((1, "a", 1.5f), (2, "a", 2.5f)).toDF("id", "part", "y"),
      "part", lake)
    VersionedLake.commitAppend( // widen id->long, y->double
      Seq((3000000000L, "b", 3.25)).toDF("id", "part", "y"),
      "part", lake)
    VersionedLake.commitDelete(Seq((1L, "a")).toDF("id", "part"),
      Seq("id"), "part", lake)
    val df = spark.read.format("graftlake").load(lake)
    assert(df.schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(df.select($"id", $"y").as[(Long, Double)].collect().toSet ==
      Set((2L, 2.5), (3000000000L, 3.25)),
      "DV fold + widened cast-up both apply through the format")
  }
}
