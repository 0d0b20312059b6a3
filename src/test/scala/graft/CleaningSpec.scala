package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.operators.{Cleaning, Quality}

/** Edge cases from the reference's coercion semantics (SURVEY.md §2.2):
  * null→UNKNOWN, trim, double-key rounding (4.0→4, 4.6→5), dirty-row
  * drop, timestamp→date truncation, duplicate-key abort. */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("cleanString trims and defaults nulls to UNKNOWN") {
    val df = Seq(Some("  hi  "), None, Some("x")).toDF("s")
      .select(Cleaning.cleanString($"s").as("c"))
    assert(df.as[String].collect().toSeq == Seq("hi", "UNKNOWN", "x"))
  }

  test("roundedCode rounds half-up like the reference's f64::round") {
    val df = Seq(4.0, 4.4, 4.5, 4.6).toDF("d")
      .select(Cleaning.roundedCode($"d").as("c"))
    assert(df.as[Long].collect().toSeq == Seq(4L, 4L, 5L, 5L))
  }

  test("cleanPremises drops rows whose key fails coercion") {
    val schema = StructType(Seq(
      StructField("premise_code", DoubleType, nullable = true),
      StructField("premise", StringType, nullable = true),
      StructField("address", StringType, nullable = true),
      StructField("premise_type", StringType, nullable = true),
      StructField("state", StringType, nullable = true),
      StructField("district", StringType, nullable = true)))
    val rows = Seq(
      Row(1.2, " A ", null, "t", "s", "d"),
      Row(null, "B", "addr", null, "s", "d"))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val out = Cleaning.cleanPremises(raw).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L)
    assert(out.head.getString(1) == "A")
    assert(out.head.getString(2) == "UNKNOWN")
  }

  test("truncToDate truncates timestamps to their UTC civil date") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-03-05 23:59:58"))
      .toDF("ts").select(Cleaning.truncToDate($"ts").as("d"),
        Cleaning.dateToString($"ts").as("s"))
    val r = df.collect().head
    assert(r.getDate(0).toString == "2024-03-05")
    assert(r.getString(1) == "2024-03-05")
  }

  test("tolerance asymmetry: try-cast nulls bad values, plain cast fails fast") {
    // permissive path (dimension, P4): bad value → null → row dropped
    val dirty = Seq("12", "x", "4.5").toDF("s")
    val permissive = dirty.select(Cleaning.tryLong($"s").as("v"))
      .filter($"v".isNotNull).as[Long].collect().toSeq
    assert(permissive == Seq(12L)) // "4.5" is not a valid long either
    // fail-fast path (fact, reference panic semantics): ANSI cast throws
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try intercept[Exception] {
      dirty.select($"s".cast("long").as("v")).collect()
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
  }

  test("assertUnique aborts on duplicate dimension keys") {
    val dup = Seq((1L, "a"), (1L, "b")).toDF("k", "v")
    intercept[IllegalStateException](Quality.assertUnique(dup, "k"))
    Quality.assertUnique(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k")
  }
}
