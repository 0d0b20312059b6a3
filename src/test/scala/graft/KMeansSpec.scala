package graft

import org.apache.spark.sql.functions._

import graft.operators.KMeansLloyd

/** LLOYD K-MEANS CONTRACT behavior vs a from-first-principles
  * sequential reference (plain Scala collections — no Spark, no shared
  * kernels), plus the forced-empty-cluster branch and the
  * codegen≡interpreted guarantee for [[graft.plans.NearestCentroid]]. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Sequential replay of the whole contract: quantize → hash-ranked
    * seeds → iters × (argmin assign, floorDiv update) → final assign. */
  private def ref(vecs: Map[Long, Array[Float]], k: Int, iters: Int)
      : Map[Long, (Int, Long, Long)] = {
    val dim = vecs.head._2.length
    val s = Array.tabulate(dim)(d =>
      vecs.values.map(v => math.abs(v(d).toDouble)).max)
    def quant(v: Array[Float]): Array[Long] = Array.tabulate(dim) { d =>
      if (s(d) == 0.0) 0L
      else math.max(-127.0, math.min(127.0,
        math.floor(v(d).toDouble * 127.0 / s(d) + 0.5))).toLong
    }
    val codes = vecs.map { case (id, v) => id -> quant(v) }
    var cent = codes.keys.toSeq
      .sortBy(id => (md5hex(s"$id:km"), id)).take(k)
      .map(id => codes(id).clone()).toArray
    def assign(q: Array[Long]): (Int, Long) = {
      var best = (-1, Long.MaxValue)
      for (j <- cent.indices) {
        var dist = 0L
        for (d <- 0 until dim) {
          val diff = q(d) - cent(j)(d); dist += diff * diff
        }
        if (dist < best._2) best = (j, dist)
      }
      best
    }
    for (_ <- 1 to iters) {
      val byCid = codes.values.toSeq.groupBy(q => assign(q)._1)
      cent = cent.zipWithIndex.map { case (old, j) =>
        byCid.get(j) match {
          case Some(members) =>
            Array.tabulate(dim)(d =>
              Math.floorDiv(members.map(_(d)).sum, members.size.toLong))
          case None => old
        }
      }
    }
    val fin = codes.map { case (id, q) => id -> assign(q) }
    val sizes = fin.values.groupBy(_._1).map { case (c, g) => c -> g.size.toLong }
    fin.map { case (id, (c, dist)) => id -> ((c, dist, sizes(c))) }
  }

  test("fitPredict matches the sequential reference on a 2-blob fixture") {
    val rnd = new scala.util.Random(17)
    val vecs: Map[Long, Array[Float]] = (0L until 40L).map { id =>
      val base = if (id % 2 == 0) 2.0f else -2.0f
      id -> Array.fill(4)(base + rnd.nextFloat() * 0.5f)
    }.toMap
    val df = vecs.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
    val got = KMeansLloyd.fitPredict(df, k = 3, iters = 2)
      .as[(Long, Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == ref(vecs, 3, 2))
  }

  test("all-identical corpus: one live cluster, empties keep centroids") {
    val df = (0L until 9L).map(id => (id, Seq.fill(3)(1.5f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
    val got = KMeansLloyd.fitPredict(df, k = 2, iters = 2)
      .as[(Long, Int, Long, Long)].collect()
    // identical codes -> every vector ties -> smallest cid wins; the
    // other cluster is empty every round and must not divide by zero
    assert(got.forall { case (_, cid, dist, n) =>
      cid == 0 && dist == 0L && n == 9L })
  }

  test("NearestCentroid: tie-break, nulls, codegen == interpreted") {
    import graft.plans.NearestCentroidFunctions.nearestCentroid
    val cents = Array(Array(0L, 0L), Array(0L, 0L), Array(5L, 5L))
    val df = Seq((1L, Some(Seq(0, 0))), (2L, Some(Seq(4, 4))),
        (3L, None)).toDF("id", "q")
      .select(col("id"), nearestCentroid(col("q"), cents).as("nn"))
    val whole = df.orderBy("id").collect()
    // exact tie between cid 0 and 1 -> smallest wins
    assert(whole(0).getStruct(1).getInt(0) == 0 &&
      whole(0).getStruct(1).getLong(1) == 0L)
    // (4,4): dist 32 to origin twins, 2 to (5,5) -> cid 2
    assert(whole(1).getStruct(1).getInt(0) == 2 &&
      whole(1).getStruct(1).getLong(1) == 2L)
    assert(whole(2).isNullAt(1))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp =
      try df.orderBy("id").collect()
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(whole.map(_.toString).toSeq == interp.map(_.toString).toSeq)
  }

  test("NearestCentroid: ragged vector fails loudly, never truncates") {
    import graft.plans.NearestCentroidFunctions.nearestCentroid
    val cents = Array(Array(0L, 0L), Array(5L, 5L))
    val df = Seq((1L, Seq(1, 2, 3))).toDF("id", "q")
      .select(col("id"), nearestCentroid(col("q"), cents).as("nn"))
    val e = intercept[Exception] { df.collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("mixed dimensions")))
  }
}
