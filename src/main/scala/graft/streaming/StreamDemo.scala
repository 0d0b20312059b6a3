package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/** File-source streaming demo/smoke: replays the events fixture through
  * readStream → tumblingAgg → memory sink and prints the window count.
  * Usage: StreamDemo [sfDir] */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // file streaming source needs a directory; the schema comes from the
    // batch reader (which also handles the NANOS→micros conversion)
    val batch = Tables.events(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("stream_events")
    batch.write.mode("overwrite").parquet(dir.toString)

    val stream = spark.readStream
      .schema(batch.schema)
      .parquet(dir.toString)
    val q = EventStreams.tumblingAgg(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("demo_out").start()
    q.processAllAvailable()
    // append mode only emits watermark-closed windows; the tail stays open
    val n = spark.table("demo_out").count()
    val total = spark.table("demo_out")
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    println(s"STREAM_WINDOWS=$n STREAM_EVENTS=$total")
    q.stop()

    // stream-stream interval join over the same file source
    val stream2 = spark.readStream.schema(batch.schema).parquet(dir.toString)
    val qj = EventStreams.clickErrorJoin(stream2)
      .writeStream.outputMode("append")
      .format("memory").queryName("demo_join").start()
    qj.processAllAvailable()
    println(s"STREAM_JOIN_PAIRS=${spark.table("demo_join").count()}")
    qj.stop()
    spark.stop()
  }
}
