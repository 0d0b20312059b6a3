package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.VectorFunctions

/** Similarity search over an `array<float>` embedding column
  * (SURVEY.md §7.5): brute-force cosine top-k as the correctness
  * baseline, and a random-hyperplane LSH variant as the scale path.
  *
  * Scale design:
  *  - The query set is always the broadcast side; the corpus is never
  *    shuffled for brute force — each corpus partition scores its rows
  *    against the broadcast queries and only (query, candidate, score)
  *    triples move, then a per-query top-k window runs on #queries
  *    partitions.
  *  - The cosine kernel is the codegen'd [[graft.plans.CosineSimilarity]]
  *    expression, not interpreted higher-order lambdas.
  *  - The LSH path buckets corpus and queries by sign-pattern bands of
  *    random hyperplane projections; only same-bucket pairs are scored.
  *    Bands OR-amplify recall; `nTables × planesPerTable` trade recall
  *    for candidate volume.
  */
object Similarity {

  /** Brute-force exact top-k neighbors for each query vector. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("sim", VectorFunctions.cosine(col("cand_vec"), col("query_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** Deterministic random hyperplanes: `n` planes of dimension `dim`,
    * seeded — identical across driver restarts and executors. */
  private[graft] def hyperplanes(n: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Embedding dimensionality probed from the first corpus row (one
    * tiny job). Hardcoding a dim silently truncates wider vectors
    * (DotProduct folds over min length) and wastes plane components on
    * narrower ones. */
  private def probeDim(corpus: DataFrame, vecCol: String): Int =
    corpus.select(size(col(vecCol))).head().getInt(0)

  /** Sign-pattern bucket id for one LSH table: bit i = sign(v · plane_i). */
  private def bucketFor(vec: Column, planes: Array[Array[Float]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*).cast("array<float>")
      when(VectorFunctions.dot(vec, plane) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed approximate top-k: `nTables` independent sign-LSH
    * tables; candidates = corpus rows sharing any table bucket with the
    * query; exact cosine re-rank of candidates. Recall for neighbors at
    * angle θ is 1-(1-(1-θ/π)^planes)^tables. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nTables: Int = 16, planesPerTable: Int = 6, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val dim = probeDim(corpus, vecCol)
    val tables = (0 until nTables).map(t =>
      hyperplanes(planesPerTable, dim, seed + t))

    // bucket ids only — the candidate distinct() must never shuffle
    // 64-float vectors, just (query_id, cand_id) pairs
    def bucketed(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id),
        posexplode(array(tables.map(p => bucketFor(col(vecCol), p)): _*)))
        .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")

    val candidates = bucketed(corpus, "cand_id")
      .join(broadcast(bucketed(queries, "query_id")), Seq("table", "bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .select("query_id", "cand_id").distinct()

    // re-attach vectors by id (queries stay broadcast; corpus join is an
    // equi-join on the corpus' own key — co-partitioned at scale)
    val withVecs = candidates
      .join(corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec")), "cand_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))), "query_id")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id").asc)
    withVecs
      .withColumn("sim", VectorFunctions.cosine(col("cand_vec"), col("query_vec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** IVF (inverted-file) approximate top-k: k-means partitions the
    * corpus into nLists cells; each query probes only its nProbe nearest
    * cells and exact-reranks the candidates.
    *
    * Scale shape: training samples the corpus (k-means on a bounded
    * sample), assignment is one codegen'd argmin pass over the corpus,
    * and the probe join touches nProbe/nLists of the data — the
    * classic recall/cost dial. Centroids are tiny and broadcast.
    * Uses Spark MLlib KMeans (cosine distance) — public API. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nLists: Int = 16, nProbe: Int = 4, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val featurized = corpus.select(col(idCol).as("cand_id"),
      col(vecCol).as("cand_vec"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nLists).setSeed(seed)
      .setDistanceMeasure("cosine").setMaxIter(5)
      .fit(featurized)

    val assigned = model.transform(featurized)
      .select(col("cand_id"), col("cand_vec"), col("prediction").as("cell"))

    // centroids → a tiny broadcast frame of (cell, centroid float array)
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }.toSeq.toDF("cell", "centroid")

    // each query ranks cells by cosine-to-centroid, keeps nProbe
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cell").asc)
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("csim", VectorFunctions.cosine(col("query_vec"), col("centroid")))
      .withColumn("prnk", row_number().over(probeW))
      .filter(col("prnk") <= nProbe)
      .select("query_id", "query_vec", "cell")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id").asc)
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("sim", VectorFunctions.cosine(col("cand_vec"), col("query_vec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** Embedding near-duplicate pairs: all corpus pairs with cosine >=
    * threshold, found via the same sign-LSH tables (both sides bucketed,
    * self-join per table/bucket) then exact cosine verify. */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   nTables: Int = 16, planesPerTable: Int = 4, seed: Long = 42L,
                   idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val dim = probeDim(corpus, vecCol)
    val tables = (0 until nTables).map(t =>
      hyperplanes(planesPerTable, dim, seed + t))
    val bucketed = corpus.select(col(idCol).as("id"),
      posexplode(array(tables.map(p => bucketFor(col(vecCol), p)): _*)))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")

    val l = bucketed.select(col("table"), col("bucket"), col("id").as("id_a"))
    val r = bucketed.select(col("table"), col("bucket"), col("id").as("id_b"))

    // distinct over bare id pairs, vectors re-attached afterwards — the
    // dedup shuffle carries 16 bytes/row instead of 2×64 floats
    l.join(r, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .join(corpus.select(col(idCol).as("id_a"), col(vecCol).as("vec_a")), "id_a")
      .join(corpus.select(col(idCol).as("id_b"), col(vecCol).as("vec_b")), "id_b")
      .withColumn("sim", VectorFunctions.cosine(col("vec_a"), col("vec_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }
}
