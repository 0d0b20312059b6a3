package graft

import org.apache.spark.sql.functions._

import graft.functions.MeanVector

/** MeanVector Aggregator: agrees with the explode+avg formulation,
  * handles empty groups and null vectors. */
class VectorAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")

  test("centroids equal explode+avg formulation") {
    val viaAgg = emb.groupBy($"label")
      .agg(MeanVector.meanVector($"embedding").as("c"))
      .select($"label", posexplode($"c"))
      .select($"label", $"pos", round($"col", 9).as("v"))
    val viaExplode = emb.select($"label", posexplode($"embedding"))
      .groupBy($"label", $"pos")
      .agg(round(avg($"col".cast("double")), 9).as("v"))
    assert(viaAgg.except(viaExplode).count() == 0)
    assert(viaExplode.except(viaAgg).count() == 0)
  }

  test("null vectors are skipped, not counted") {
    val df = Seq(
      (1, Some(Array(2f, 4f))),
      (1, None),
      (1, Some(Array(4f, 8f)))
    ).toDF("g", "v")
    val out = df.groupBy($"g").agg(MeanVector.meanVector($"v").as("c"))
      .select($"c").as[Array[Double]].head()
    assert(out.toSeq == Seq(3.0, 6.0))
  }

  test("VectorStats (sums, n) divides to exactly MeanVector's mean") {
    import graft.functions.VectorStats
    val stats = emb.groupBy($"label")
      .agg(VectorStats.vectorStats($"embedding").as("st"))
      .select($"label", $"st.n".as("n"), posexplode($"st.sums"))
      .select($"label", $"pos", ($"col" / $"n").as("v"))
    val means = emb.groupBy($"label")
      .agg(MeanVector.meanVector($"embedding").as("c"))
      .select($"label", posexplode($"c"))
      .select($"label", $"pos", $"col".as("v"))
    // same accumulation path -> bit-identical division results
    assert(stats.except(means).count() == 0)
    assert(means.except(stats).count() == 0)
  }
}
