package graft

import org.apache.spark.sql.functions._

import graft.plans.VectorFunctions

/** CosineSimilarity / DotProduct: algebraic identities, codegen vs
  * interpreted agreement, SQL registration, null/zero handling. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
    (2L, Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
    (3L, Array(1f, 2f, 3f), Array(-1f, -2f, -3f)),
    (4L, Array(0f, 0f, 0f), Array(1f, 1f, 1f))
  ).toDF("id", "a", "b")

  test("cosine identities: self=1, orthogonal=0, opposite=-1, zero=0") {
    val out = vecs.select($"id", VectorFunctions.cosine($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    assert(math.abs(out(2L)) < 1e-12)
    assert(math.abs(out(3L) + 1.0) < 1e-12)
    assert(out(4L) == 0.0)
  }

  test("dot product matches manual sum") {
    val out = vecs.filter($"id" === 3L)
      .select(VectorFunctions.dot($"a", $"b")).as[Double].head()
    assert(out == -14.0)
  }

  test("codegen and interpreted paths agree on real embeddings") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet").limit(50)
    val pairs = emb.select($"vec_id".as("ia"), $"embedding".as("va"))
      .crossJoin(emb.select($"vec_id".as("ib"), $"embedding".as("vb")))
      .filter($"ia" < $"ib")
    val viaExpr = pairs
      .select(VectorFunctions.cosine($"va", $"vb").as("c")).as[Double].collect()
    // interpreted reference: higher-order-function formulation
    val viaHof = pairs.select(
      (aggregate(zip_with($"va", $"vb", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x) /
        (sqrt(aggregate(transform($"va", x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x)) *
         sqrt(aggregate(transform($"vb", x => x.cast("double") * x.cast("double")),
           lit(0.0), (acc, x) => acc + x)))).as("c")).as[Double].collect()
    viaExpr.zip(viaHof).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("SQL registration exposes cosine_sim/dot_product") {
    VectorFunctions.register(spark)
    vecs.createOrReplaceTempView("v")
    val r = spark.sql(
      "SELECT cosine_sim(a, b) c, dot_product(a, b) d FROM v WHERE id = 1")
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 && r.getDouble(1) == 1.0)
  }

  test("null vector yields null (BinaryExpression null semantics)") {
    val df = Seq((Some(Array(1f)), Option.empty[Array[Float]]))
      .toDF("a", "b").select(VectorFunctions.cosine($"a", $"b").as("c"))
    assert(df.collect().head.isNullAt(0))
  }

  test("null ELEMENT yields null, not an executor NPE (both codegen paths)") {
    val df = Seq(
      (1L, Array[java.lang.Float](1f, null, 3f), Array[java.lang.Float](1f, 2f, 3f)),
      (2L, Array[java.lang.Float](1f, 2f, 3f), Array[java.lang.Float](1f, 2f, 3f)))
      .toDF("id", "a", "b")
    // codegen path
    val rows = df.select($"id", VectorFunctions.cosine($"a", $"b").as("c"),
      VectorFunctions.dot($"a", $"b").as("d")).orderBy($"id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(math.abs(rows(1).getDouble(1) - 1.0) < 1e-12 && rows(1).getDouble(2) == 14.0)
    // interpreted path (eval through a literal-free filter barrier)
    import graft.plans.{CosineSimilarity, DotProduct}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val at = ArrayType(FloatType, containsNull = true)
    val withNull = Literal.create(new GenericArrayData(Array[Any](1f, null, 3f)), at)
    val clean = Literal.create(new GenericArrayData(Array[Any](1f, 2f, 3f)), at)
    assert(CosineSimilarity(withNull, clean).eval() == null)
    assert(DotProduct(withNull, clean).eval() == null)
    assert(DotProduct(clean, clean).eval() == 14.0)
  }

  test("SignBuckets: codegen == interpreted == per-plane dot signs; null elem -> null") {
    import graft.plans.{SignBuckets, SignBucketsFunctions}
    import graft.operators.Similarity
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val tables = (0 until 3).map(t => Similarity.hyperplanes(4, 8, 7L + t))
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet").limit(20)
    // codegen path through the DataFrame API
    val viaDf = emb.select($"vec_id",
      SignBucketsFunctions.signBuckets($"embedding", tables).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // reference: per-plane dot signs computed driver-side
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for ((id, v) <- vecs) {
      val expect = tables.map { planes =>
        planes.zipWithIndex.map { case (p, i) =>
          val dot = p.zip(v).map { case (a, b) => a.toDouble * b.toDouble }.sum
          if (dot > 0.0) 1L << i else 0L
        }.reduce(_ | _)
      }
      assert(viaDf(id) == expect, s"vec $id")
    }
    // interpreted path + null element
    val at = ArrayType(FloatType, containsNull = true)
    val flat = tables.flatten.toArray
    val clean = Literal.create(
      new GenericArrayData(Array.tabulate[Any](8)(i => (i + 1).toFloat)), at)
    val dirty = Literal.create(
      new GenericArrayData(Array[Any](1f, null, 3f, 4f, 5f, 6f, 7f, 8f)), at)
    assert(SignBuckets(clean, flat, 4).eval() != null)
    assert(SignBuckets(dirty, flat, 4).eval() == null)
  }

  test("ProjectVector: codegen == interpreted == driver-side dots; null elem -> null") {
    import graft.plans.{ProjectVector, ProjectVectorFunctions}
    import graft.operators.Similarity
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val planes = Similarity.hyperplanes(5, 8, 11L)
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet").limit(20)
      .select($"vec_id", expr("slice(embedding, 1, 8)").as("v8"))
    // codegen path through the DataFrame API
    val viaDf = emb.select($"vec_id",
      ProjectVectorFunctions.projectVector($"v8", planes).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // reference: driver-side dots with the same double-accumulate order
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for ((id, v) <- vecs) {
      val expect = planes.map { p =>
        var dot = 0.0
        for (j <- v.indices) dot += v(j).toDouble * p(j)
        dot.toFloat
      }.toSeq
      assert(viaDf(id) == expect, s"vec $id")
    }
    // interpreted path + null element
    val at = ArrayType(FloatType, containsNull = true)
    val clean = Literal.create(
      new GenericArrayData(Array.tabulate[Any](8)(i => (i + 1).toFloat)), at)
    val dirty = Literal.create(
      new GenericArrayData(Array[Any](1f, null, 3f, 4f, 5f, 6f, 7f, 8f)), at)
    assert(ProjectVector(clean, planes).eval() != null)
    assert(ProjectVector(dirty, planes).eval() == null)
  }

  test("minhash skips null shingles instead of NPE (codegen + interpreted)") {
    import graft.plans.{MinHashFunctions, MinHashSignature}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val df = Seq(
      (1L, Array[String]("ab", null, "cd")),
      (2L, Array[String]("ab", "cd")))
      .toDF("id", "sh")
      .select($"id", MinHashFunctions.minhashSignature($"sh", 4).as("sig"))
    val bySig = df.orderBy($"id").collect().map(_.getSeq[Long](1))
    assert(bySig(0) == bySig(1)) // null element is simply absent from the set
    val at = ArrayType(StringType, containsNull = true)
    val lit = Literal.create(new GenericArrayData(
      Array[Any](UTF8String.fromString("ab"), null, UTF8String.fromString("cd"))), at)
    val interp = MinHashSignature(lit, 4, 42L).eval()
      .asInstanceOf[GenericArrayData].toLongArray().toSeq
    assert(interp == bySig(0))
  }
}
