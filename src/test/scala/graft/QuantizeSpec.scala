package graft

import org.apache.spark.sql.functions._

import graft.functions.MaxAbsVector
import graft.operators.Similarity
import graft.plans.QuantizeFunctions

/** Int8 quantization: contract values, clamp/zero-scale edges, codegen
  * vs interpreted agreement, scale-vector exactness, and end-to-end
  * ranking quality vs exact brute force. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("quantize follows the contract formula, clamps, zero-scale dims") {
    val df = Seq((1L, Array(1.0f, -0.5f, 0.0f, 9.9f))).toDF("id", "v")
    // scales: dim0 s=2 -> floor(1*127/2+.5)=floor(64)=64; dim1 s=0.5 ->
    // floor(-0.5*127/0.5+.5)=-127; dim2 s=0 -> 0; dim3 s=1 -> clamp 127
    val got = df.select(QuantizeFunctions.quantize($"v",
      Array(2.0, 0.5, 0.0, 1.0)).as("q")).as[Array[Int]].head()
    assert(got.toSeq == Seq(64, -127, 0, 127))
  }

  test("int dot product is exact long arithmetic") {
    val df = Seq((Array(127, -127, 3), Array(127, 127, -1)))
      .toDF("a", "b")
    val got = df.select(QuantizeFunctions.intDot($"a", $"b")).as[Long].head()
    assert(got == 127L * 127 - 127L * 127 - 3L)
  }

  test("maxAbs scales are exact and match a per-dim SQL max") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val scales = Similarity.quantScales(emb)
    val dim = scales.length
    assert(dim > 0)
    val viaSql = (0 until dim).map { i =>
      emb.agg(max(abs(element_at($"embedding", i + 1).cast("double"))))
        .head().getDouble(0)
    }
    assert(scales.toSeq == viaSql)
  }

  test("codegen and interpreted quantization agree on real embeddings") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet").limit(50)
    val scales = Similarity.quantScales(emb)
    val viaExpr = emb.orderBy($"vec_id")
      .select(QuantizeFunctions.quantize($"embedding", scales))
      .as[Array[Int]].collect()
    val local = emb.orderBy($"vec_id").select($"embedding")
      .as[Array[Float]].collect()
      .map(_.zip(scales).map { case (v, s) =>
        if (s == 0.0) 0
        else math.max(-127.0,
          math.min(127.0, math.floor(v.toDouble * 127.0 / s + 0.5))).toInt
      })
    viaExpr.zip(local).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }

  test("quantized top-10 stays close to the exact brute-force top-10") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, q, k = 10)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val quant = Similarity.quantizedTopK(emb, q, k = 10)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // int8 over 64 dims loses little: expect >= 7/10 overlap per query
    quant.foreach { case (qid, cands) =>
      val hit = cands.intersect(exact(qid)).size
      assert(hit >= 7, s"query $qid: only $hit/10 overlap with exact")
    }
  }

  test("MaxAbsVector rejects ragged dimensions, skips empty rows") {
    val ragged = Seq(Array(1f, 2f), Array(1f, 2f, 3f)).toDF("v")
    intercept[Exception] {
      ragged.agg(MaxAbsVector.maxAbsVector($"v")).head()
    }
    val withEmpty = Seq(Array(1f, -4f), Array.empty[Float], Array(2f, 3f))
      .toDF("v")
    val got = withEmpty.agg(MaxAbsVector.maxAbsVector($"v"))
      .head().getSeq[Double](0)
    assert(got == Seq(2.0, 4.0))
  }
}
