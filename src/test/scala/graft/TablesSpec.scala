package graft

import graft.sources.Tables

/** Tables.events must not leave session conf mutated (a read is not
  * allowed session-wide side effects), and the returned DataFrame must
  * stay executable AFTER the conf is restored. */
class TablesSpec extends SparkSpec {

  private val key = "spark.sql.legacy.parquet.nanosAsLong"

  test("events read restores nanosAsLong and the frame still executes") {
    spark.conf.unset(key)
    // the conf has a registered default of "false", so getOption is never
    // empty — assert the visible value is back to that default
    val df = Tables.events(spark, sf())
    assert(spark.conf.get(key) == "false",
      "events() leaked nanosAsLong into the session")
    // execution after restore: the scan captured its conf at relation
    // creation, so unsetting must not break it
    assert(df.count() > 0)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("events read restores a pre-existing explicit value") {
    spark.conf.set(key, "false")
    Tables.events(spark, sf()).count()
    assert(spark.conf.get(key) == "false")
    spark.conf.unset(key)
  }
}
