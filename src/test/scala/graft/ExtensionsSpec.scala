package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

import graft.plans.{CosineSimilarity, DotProduct, MinHashSignature}

/** Expression-level checks for the types the GraftExtensions builders
  * construct (the fresh-session SQL injection path is driven end-to-end
  * by `graft.ExtDemo` — getOrCreate in a shared test JVM reuses the
  * existing session, so withExtensions can't be tested in-suite). */
class ExtensionsSpec extends SparkSpec {

  private def farr(xs: Float*) =
    Literal.create(xs.toArray, ArrayType(FloatType))

  test("expression eval matches expected values and types") {
    val cos = CosineSimilarity(farr(3f, 4f), farr(3f, 4f))
    assert(math.abs(cos.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
    val dot = DotProduct(farr(2f), farr(3f))
    assert(dot.eval(null).asInstanceOf[Double] == 6.0)
    val mh = MinHashSignature(
      Literal.create(Array("a", "b", "c"),
        ArrayType(org.apache.spark.sql.types.StringType)), 8, 7L)
    assert(mh.dataType == ArrayType(LongType, containsNull = false))
    assert(mh.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() == 8)
  }

  test("type checking rejects wrong argument types") {
    val bad = CosineSimilarity(Literal(1L), Literal(2L))
    assert(!bad.checkInputDataTypes().isSuccess)
    val badK = MinHashSignature(
      Literal.create(Array("a"),
        ArrayType(org.apache.spark.sql.types.StringType)), 0, 1L)
    assert(!badK.checkInputDataTypes().isSuccess)
  }

  test("fused shingle-minhash expression evals and type-checks") {
    import graft.plans.MinHashShingleSignature
    val toks = Literal.create(Array("a", "b", "c", "d"),
      ArrayType(org.apache.spark.sql.types.StringType))
    val e = MinHashShingleSignature(toks, 3, 8, 42L)
    assert(e.checkInputDataTypes().isSuccess)
    assert(e.dataType == ArrayType(LongType, containsNull = false))
    assert(e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() == 8)
    assert(!MinHashShingleSignature(toks, 0, 8, 42L)
      .checkInputDataTypes().isSuccess)
  }
}
