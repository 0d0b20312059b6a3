package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.sources.Bucketing

/** Runtime demo/smoke for the bucketed-join path: writes lineitem and
  * orders bucketed by order key, joins them, and prints the shuffle
  * count in the executed plan (must be 0) plus the row count.
  * Usage: ScaleDemo [sfDir] */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val wh = java.nio.file.Files.createTempDirectory("graft_wh")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", wh.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE wraps plans in AdaptiveSparkPlanExec (a leaf for collect),
      // which would make the zero-shuffle assertion vacuously pass even
      // when exchanges exist — disable it for this plan-shape check
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select("l_orderkey", "o_totalprice")

    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8,
      sortCols = Seq("l_orderkey"))
    Bucketing.writeBucketed(o, "o_bucketed", "l_orderkey", 8,
      sortCols = Seq("l_orderkey"))

    val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "o_bucketed",
      "l_orderkey")
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.size
    println(s"BUCKETED_JOIN_SHUFFLES=$shuffles ROWS=${joined.count()}")

    // partition pruning: month-partitioned lake, single-month read
    val lake = java.nio.file.Files.createTempDirectory("graft_lake").toString
    graft.sources.PartitionedLake.writeByMonth(
      spark.read.parquet(s"$sfDir/lineitem.parquet"), "l_shipdate", lake)
    val oneMonth = graft.sources.PartitionedLake.readMonth(spark, lake, "1998-03")
    val scans = oneMonth.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    println(s"PRUNED_PARTITIONS_READ=${scans.sum} MONTH_ROWS=${oneMonth.count()}")

    // incremental upsert: replace exactly one month, then compact it
    val totalBefore = spark.read.parquet(lake).count()
    val marchBefore = oneMonth.count()
    graft.sources.PartitionedLake.upsertMonths(
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .filter(org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("l_shipdate"), "yyyy-MM") === "1998-03")
        .repartition(8),
      "l_shipdate", lake)
    def files = new java.io.File(s"$lake/month=1998-03")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val fragmented = files
    graft.sources.PartitionedLake.compactMonth(spark, lake, "1998-03")
    val totalAfter = spark.read.parquet(lake).count()
    println(s"UPSERT_TOTAL_STABLE=${totalBefore == totalAfter} " +
      s"COMPACTED_FILES=${fragmented}->${files} " +
      s"MONTH_ROWS_STABLE=${spark.read.parquet(lake)
        .filter(org.apache.spark.sql.functions.col("month") === "1998-03")
        .count() == marchBefore}")

    // bloom-pruned join (q38's pattern): how many fact rows the Bloom
    // drops BEFORE the join exchange vs the true matching count — the
    // gap is false-positive overhead (expect ~1% of non-matches at the
    // nominal fpp)
    import org.apache.spark.sql.functions.col
    val dim = spark.read.parquet(s"$sfDir/supplier.parquet")
      .filter(col("s_acctbal") > 5000.0)
      .select(col("s_suppkey").cast("long").as("k"))
    val bloom = dim.stat.bloomFilter("k", 1000000L, 0.01)
    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_suppkey").cast("long").as("k"))
    val nFact = fact.count()
    val survived = fact.filter(
      graft.plans.BloomFunctions.mightContain(col("k"), bloom)).count()
    val nTrue = fact.join(dim, Seq("k"), "left_semi").count()
    println(s"BLOOM_FACT_ROWS=$nFact SURVIVED=$survived TRUE_MATCHES=$nTrue " +
      s"SHUFFLE_SAVED=${(nFact - survived) * 100 / math.max(1, nFact)}%")

    // z-order layout: row-group/file skipping on BOTH clustered columns.
    // Files whose footer (min, max) excludes the predicate value are
    // never opened — count the files whose range admits the value, for
    // a point filter on EACH dimension, against a 1-dim-sorted layout
    // where the second column's ranges are ~global (no skipping).
    val zdir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val sdir = java.nio.file.Files.createTempDirectory("graft_s").toString
    val liZ = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_suppkey", "l_partkey", "l_extendedprice")
    Bucketing.zorderWrite(liZ, "l_suppkey", "l_partkey", zdir, 16)
    liZ.repartitionByRange(16, col("l_suppkey"))
      .sortWithinPartitions("l_suppkey")
      .write.mode("overwrite").parquet(sdir)
    def filesAdmitting(dir: String, c: String, v: Long): Int =
      spark.read.parquet(dir)
        .groupBy(org.apache.spark.sql.functions.input_file_name())
        .agg(org.apache.spark.sql.functions.min(col(c)).as("lo"),
          org.apache.spark.sql.functions.max(col(c)).as("hi"))
        .filter(col("lo") <= v && col("hi") >= v).count().toInt
    val (ps, pp) = (5L, 100L)
    println(s"ZORDER_FILES_READ suppkey=${filesAdmitting(zdir, "l_suppkey", ps)}/16 " +
      s"partkey=${filesAdmitting(zdir, "l_partkey", pp)}/16 | " +
      s"1DIM_SORT suppkey=${filesAdmitting(sdir, "l_suppkey", ps)}/16 " +
      s"partkey=${filesAdmitting(sdir, "l_partkey", pp)}/16")

    // AQE runtime skew-split: the OTHER half of the skew story next to
    // the explicit salt (q26/q42 — use the salt when the hot key is
    // known at authoring time; AQE catches the ones you didn't know
    // about). One synthetic hot key carrying ~half the fact rows joins
    // a small-but-over-threshold dim; with AQE skew-join on, the
    // oversized shuffle partition is split into task-sized reads —
    // visible as "skewed" in the final (adaptive) plan.
    val aqeSession = spark.newSession()
    aqeSession.conf.set("spark.sql.adaptive.enabled", "true")
    aqeSession.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    aqeSession.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    aqeSession.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    aqeSession.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    aqeSession.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    aqeSession.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "8KB")
    // a skewed REDUCE partition is split into subsets of MAP outputs,
    // so the demo fact must genuinely SPAN mappers: range() parallelizes
    // into 4 real map tasks that each hold hot-key rows. (A
    // single-row-group parquet fixture puts every row in ONE mapper no
    // matter how many byte-range splits exist — measured via
    // graft.SkewProbe: per-mapper sizes [0, 8MB, 0, 0] → unsplittable,
    // the sf0.01 analog of a real cluster's thousands of map tasks.)
    val skewFact = aqeSession.range(0, 1200000, 1, 4)
      .selectExpr("CASE WHEN id % 5 > 0 THEN 0L ELSE id % 100 END AS k",
        "CAST(id AS DOUBLE) AS v")
    val dimK = aqeSession.read.parquet(s"$sfDir/supplier.parquet")
      .selectExpr("CAST(s_suppkey AS LONG) AS k", "s_acctbal")
    val skewed = skewFact.join(dimK, "k")
    // drive THIS DataFrame's QueryExecution (a .count() would build its
    // own and leave this adaptive plan unfinalized)
    val nSkew = skewed.collect().length
    val planStr = skewed.queryExecution.executedPlan.toString
    if (sys.env.contains("GRAFT_DEBUG_PLAN")) println(planStr)
    println(s"AQE_SKEW_SPLIT=${planStr.toLowerCase.contains("skewed")} ROWS=$nSkew")
    spark.stop()
  }
}
