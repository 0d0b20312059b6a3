package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SumIntVector
import graft.plans.{NearestCentroidFunctions, QuantizeFunctions}

/** ======== LLOYD K-MEANS CONTRACT ========
  * Distributed Lloyd k-means over int8-quantized embeddings — the
  * full-corpus REFINEMENT complement of [[Similarity.clusterAssign]]
  * (which fits on an O(trainCap) sample and never iterates over
  * everything). This is the canonical iterative-ML-on-Spark shape, and
  * every step is the scale-correct version of it:
  *
  *  - codes   = int8 quantization under the QUANTIZATION CONTRACT
  *              (QuantizeExpressions.scaladoc) — exact integers from
  *              IEEE-deterministic arithmetic, so every later step is
  *              integer-only and bit-reproducible on any engine.
  *  - seeds   = the k codes with the smallest
  *              (md5(vec_id ++ ":km"), vec_id) — deterministic
  *              hash-ranked init, planned as TakeOrderedAndProject
  *              (per-partition k-heaps, no global sort). cid = seed
  *              rank 0..k-1.
  *  - assign  = [[graft.plans.NearestCentroid]]: a PROJECTION with the
  *              k×dim centroid matrix in the task closure — no join,
  *              no shuffle, ties to the smallest cid.
  *  - update  = one [[SumIntVector]] aggregation per iteration:
  *              map-side combined (sums[], n) buffers, shuffle carries
  *              k × dim longs per partition; the k result rows land on
  *              the driver (holding k centroids on the driver is the
  *              k-means state model, same as every production
  *              implementation). New centroid dim =
  *              floorDiv(Σ code_d, n) — EXPLICIT floor semantics
  *              (Math.floorDiv here; the oracle's `//`-on-divisible-
  *              numerator form computes the same value, sidestepping
  *              the floor-vs-truncate engine divergence on negatives).
  *              A cluster that captured no vectors keeps its previous
  *              centroid (documented, deterministic).
  *
  * Per iteration the corpus is touched exactly twice (assign-in-agg +
  * nothing else); codes are localCheckpointed once up front (at
  * cluster scale: persist(DISK_ONLY) — the checkpoint is the round-7
  * Graph.scala hygiene for iterative frames). Cost: iters × (1 scan +
  * 1 k×dim-sized shuffle). Nothing is all-pairs, nothing collects
  * corpus-sized data.
  *
  * @return (idCol, cid int, dist bigint, cluster_n bigint) — final
  *         assignment, its exact integer squared-L2, and the cluster
  *         population.
  */
object KMeansLloyd {
  def fitPredict(emb: DataFrame, k: Int, iters: Int,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && iters >= 0, "k > 0, iters >= 0")
    val scales = Similarity.quantScales(emb, vecCol)
    val codes = emb.select(col(idCol).as("vid"),
        QuantizeFunctions.quantize(col(vecCol), scales).as("q"))
      .localCheckpoint(true)

    val seedRows = codes
      .sort(md5(concat(col("vid").cast("string"), lit(":km"))),
        col("vid"))
      .limit(k).collect()
    require(seedRows.nonEmpty, "empty corpus")
    var cent: Array[Array[Long]] =
      seedRows.map(_.getSeq[Int](1).map(_.toLong).toArray)

    for (_ <- 1 to iters) {
      val bufs = codes
        .select(NearestCentroidFunctions.nearestCentroid(col("q"), cent)
          .getField("cid").as("cid"), col("q"))
        .groupBy(col("cid"))
        .agg(SumIntVector.sumIntVector(col("q")).as("b"))
        .select(col("cid"), col("b.sums"), col("b.n"))
        .collect()
      val next = cent.map(_.clone())
      bufs.foreach { r =>
        val cid = r.getInt(0)
        val sums = r.getSeq[Long](1)
        val n = r.getLong(2)
        if (n > 0L)
          next(cid) = sums.map(s => Math.floorDiv(s, n)).toArray
      }
      cent = next
    }

    val assigned = codes
      .withColumn("nn",
        NearestCentroidFunctions.nearestCentroid(col("q"), cent))
      .select(col("vid").as(idCol), col("nn.cid").as("cid"),
        col("nn.dist").as("dist"))
    val sizes = assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("cluster_n"))
    assigned.join(broadcast(sizes), "cid")
      .select(col(idCol), col("cid"), col("dist"), col("cluster_n"))
  }
}
