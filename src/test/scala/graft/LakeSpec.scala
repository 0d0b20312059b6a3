package graft

import org.apache.spark.sql.functions._

import graft.sources.PartitionedLake

/** Partitioned-lake semantics: upsert replaces only its own partitions;
  * compaction reduces file count without changing data. */
class LakeSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic upsert replaces only the written month") {
    val lake = java.nio.file.Files.createTempDirectory("lake_spec").toString
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    PartitionedLake.writeByMonth(li, "l_shipdate", lake)
    val before = spark.read.parquet(lake).count()
    val beforeMarch = spark.read.parquet(lake)
      .filter($"month" === "1998-03").count()
    val beforeMonths = spark.read.parquet(lake).select($"month").distinct().count()

    // rewrite one month with a single marker row
    val marker = li.limit(1)
      .withColumn("l_shipdate", lit(java.sql.Timestamp.valueOf("1998-03-15 00:00:00")))
    PartitionedLake.upsertMonths(marker, "l_shipdate", lake)

    val after = spark.read.parquet(lake)
    assert(after.filter($"month" === "1998-03").count() == 1,
      "upserted month fully replaced")
    assert(after.select($"month").distinct().count() == beforeMonths,
      "all other months survived")
    assert(after.count() == before - beforeMarch + 1,
      "total changed only by the replaced month")
  }

  test("compaction reduces file count, preserves rows") {
    val lake = java.nio.file.Files.createTempDirectory("lake_spec2").toString
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    // fragment one month into many files
    PartitionedLake.upsertMonths(
      li.filter(date_format($"l_shipdate", "yyyy-MM") === "1998-03")
        .repartition(8),
      "l_shipdate", lake)
    def files(m: String) = new java.io.File(s"$lake/month=$m")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val rowsBefore = PartitionedLake.readMonth(spark, lake, "1998-03").count()
    assert(files("1998-03") == 8)

    PartitionedLake.compactMonth(spark, lake, "1998-03", targetFiles = 1)
    assert(files("1998-03") == 1)
    assert(PartitionedLake.readMonth(spark, lake, "1998-03").count() == rowsBefore)
  }
}
