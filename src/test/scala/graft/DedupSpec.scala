package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dedup invariants (SURVEY.md §5.2): output keyset == distinct input
  * keyset; survivor carries the max order key; window and max_by
  * formulations agree. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
  private val keys = Seq("l_suppkey", "l_partkey")

  private lazy val deduped = Dedup.latestPerGroup(li, keys,
    Seq($"l_shipdate".desc, $"l_orderkey".asc, $"l_linenumber".asc))

  test("keyset preserved, one row per key") {
    val inKeys = li.select(keys.map(col): _*).distinct().count()
    assert(deduped.count() == inKeys)
    assert(deduped.select(keys.map(col): _*).distinct().count() == inKeys)
  }

  test("survivor has the group-max ship date") {
    val maxDates = li.groupBy(keys.map(col): _*)
      .agg(max($"l_shipdate").as("max_date"))
    val bad = deduped.join(maxDates, keys)
      .filter($"l_shipdate" =!= $"max_date").count()
    assert(bad == 0)
  }

  test("window and max_by formulations agree") {
    val viaAgg = Dedup.latestPerGroupAgg(li, keys,
      struct($"l_shipdate", -$"l_orderkey", -$"l_linenumber"))
    val a = deduped.select("l_suppkey", "l_partkey", "l_orderkey", "l_linenumber")
    val b = viaAgg.select("l_suppkey", "l_partkey", "l_orderkey", "l_linenumber")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }
}
