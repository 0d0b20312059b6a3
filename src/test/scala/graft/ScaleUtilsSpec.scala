package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.operators.Salt
import graft.sources.Bucketing

/** Scale utilities: bucketed joins plan without shuffles; salted
  * aggregation matches the plain aggregation. */
class ScaleUtilsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans with no shuffle exchange") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val o = spark.read.parquet(s"${sf()}/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    // clear any stale managed-table locations from a previous test JVM
    // (the in-memory catalog forgets the table, the directory survives)
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", 4)

    // force SMJ so the assertion is about bucketing, not broadcast; AQE
    // off so collect() actually traverses the join plan (AQE's wrapper
    // node is a leaf and would hide any Exchange from the assertion)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty, s"expected no shuffles, got ${shuffles.size}")
      // sanity: the same assertion CAN fail — a non-bucketed join shows
      // exchanges under the same confs
      val unbucketed = li.join(o, "l_orderkey")
      val unbucketedShuffles = unbucketed.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(unbucketedShuffles.nonEmpty, "assertion harness is blind")
      // and it still computes the right thing
      val expect = li.join(o, "l_orderkey").count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("salted aggregation equals plain aggregation") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val salted = Salt.saltedAgg(li, Seq("l_returnflag"),
      Seq("total" -> ("l_extendedprice", "sum"),
          "n" -> ("l_extendedprice", "count"),
          "mn" -> ("l_quantity", "min"),
          "mx" -> ("l_quantity", "max"),
          "avg_p" -> ("l_extendedprice", "avg")), factor = 8)
      .withColumn("total", round($"total", 2))
      .withColumn("avg_p", round($"avg_p", 2))
    val plain = li.groupBy($"l_returnflag").agg(
      round(sum($"l_extendedprice"), 2).as("total"),
      count($"l_extendedprice").as("n"),
      min($"l_quantity").as("mn"),
      max($"l_quantity").as("mx"),
      round(avg($"l_extendedprice"), 2).as("avg_p"))
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }
}
