package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Quality
import graft.sources.SqlitePacker

/** CLI pipeline driver with the reference's control contract
  * (SURVEY.md §2.11): month discovery, `--month latest|yyyy-MM`
  * selection (C1; the reference's interactive off-by-one C3 is
  * deliberately NOT replicated), up-to-date short-circuit with exit
  * code 1 (C4, reference src/main.rs:241-244), phase logging (C5), and
  * the clean→dedup→enrich→pack data path.
  *
  * Offline re-scope of S1–S4: discovery enumerates fact months from the
  * input data instead of scraping a catalogue; the freshness probe
  * compares input mtimes against the packed artifact.
  *
  * Usage: PriceCatcherApp <sfDir> <outDir> [--month latest|yyyy-MM]
  */
object PriceCatcherApp {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/pricecatcher_out")
    val monthArg = args.sliding(2).collectFirst {
      case Array("--month", m) => m }.getOrElse("latest")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // -- freshness short-circuit (C4): artifact newer than inputs → exit 1
    val zip = Paths.get(outDir, "pricecatcher.zip")
    val inputMtime = {
      val stream = Files.list(Paths.get(sfDir))
      try {
        val it = stream.iterator()
        var m = 0L
        while (it.hasNext) {
          val t = Files.getLastModifiedTime(it.next()).toMillis
          if (t > m) m = t
        }
        m
      } finally stream.close()
    }
    if (Files.exists(zip) &&
        Files.getLastModifiedTime(zip).toMillis >= inputMtime) {
      println("Data is up to date; nothing to do.")
      spark.stop()
      sys.exit(1)
    }

    // -- discovery + selection (C1/C2, offline re-scope of S1)
    println("Discover available months...")
    val months = PriceCatcher.prices(spark, sfDir)
      .select(date_format(col("date"), "yyyy-MM").as("m"))
      .distinct().orderBy("m").collect().map(_.getString(0))
    if (months.isEmpty) {
      System.err.println(s"No fact months found under '$sfDir' — nothing to build.")
      spark.stop(); sys.exit(2)
    }
    println(s"Found ${months.length} months: ${months.head}..${months.last}")
    val month = monthArg match {
      case "latest" => months.last
      case m if months.contains(m) => m
      case m =>
        System.err.println(s"Unknown month '$m'; available: ${months.mkString(", ")}")
        spark.stop(); sys.exit(2); ""
    }
    println(s"Selected month: $month")

    // -- build (C5 phase logging mirrors main.rs:246-282)
    println("Build database...")
    val prices = PriceCatcher.prices(spark, sfDir)
      .filter(date_format(col("date"), "yyyy-MM") === month)
    val premises = PriceCatcher.premises(spark, sfDir)
    val items = PriceCatcher.items(spark, sfDir)

    // A2: dimension-key uniqueness, abort semantics of main.rs:42,57
    Quality.assertUnique(premises, "premise_code")
    Quality.assertUnique(items, "item_code")

    println("Filter latest prices...")
    val latest = graft.operators.Dedup.latestPerGroup(
      prices, Seq("premise_code", "item_code"),
      Seq(col("date").desc, col("__tb1").asc, col("__tb2").asc))
      .drop("__tb1", "__tb2")
    println(s"Latest price rows: ${latest.count()}")

    println("Export artifact...")
    val path = SqlitePacker.pack(outDir, latest, premises, items)
    println(s"Packed: $path (${Files.size(path)} bytes)")
    println("Wrote pricecatcher.db (native SQLite file) + CSV/schema.sql parity artifact")
    if (SqlitePacker.sqliteJdbcAvailable)
      println("sqlite-jdbc also detected: JDBC write path available")
    spark.stop()
  }
}
