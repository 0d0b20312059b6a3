package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}

/** Diagnostic main for the ScaleDemo AQE skew section: prints the
  * per-reduce-partition shuffle sizes the OptimizeSkewedJoin rule
  * actually saw, so threshold tuning is measurement, not guesswork. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.files.maxPartitionBytes", "262144")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "8KB")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.internal.SQLConf
    println("CONF threshold=" +
      SQLConf.get.getConf(SQLConf.SKEW_JOIN_SKEWED_PARTITION_THRESHOLD) +
      " factor=" + SQLConf.get.getConf(SQLConf.SKEW_JOIN_SKEWED_PARTITION_FACTOR) +
      " enabled=" + SQLConf.get.getConf(SQLConf.SKEW_JOIN_ENABLED) +
      " advisory=" + SQLConf.get.getConf(SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    // range() parallelizes natively (4 real map tasks each holding hot
    // rows) — a single-row-group parquet fixture puts ALL rows in one
    // mapper no matter how many byte-range splits exist, and a skewed
    // partition whose bytes come from one mapper is unsplittable
    val fact = spark.range(0, 1200000, 1, 4)
      .selectExpr("CASE WHEN id % 5 > 0 THEN 0L ELSE id % 100 END AS k",
        "CAST(id AS DOUBLE) AS v")
    val dim = spark.read.parquet(s"$sfDir/supplier.parquet")
      .selectExpr("CAST(s_suppkey AS LONG) AS k", "s_acctbal")
    val j = fact.join(dim, "k")
    println("ROWS=" + j.collect().length)
    for (sid <- Seq(0, 1)) {
      val (mapSizes, nSpecs) =
        org.apache.spark.sql.graftglue.GraftGlueDiag.skewSpecs(sid, 1, 470014L)
      println(s"SHUFFLE=$sid MAPSIZES=" + mapSizes.mkString(",") +
        " NSPECS=" + nSpecs)
    }
    j.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec =>
        // query stages are traversal leaves — recurse through .plan
        def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
          p match {
            case s: ShuffleQueryStageExec =>
              val st = s.mapStats
              println(s"STAGE ${s.id} mappers=${s.shuffle.numMappers} " +
                s"bytes=${st.map(_.bytesByPartitionId.mkString(",")).getOrElse("?")}")
              walk(s.plan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              walk(q.plan)
            case other => other.children.foreach(walk)
          }
        }
        walk(a.executedPlan)
      case p => println("NOT ADAPTIVE: " + p.getClass)
    }
    spark.stop()
  }
}
