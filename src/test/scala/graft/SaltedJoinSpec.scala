package graft

import org.apache.spark.sql.functions._

import graft.operators.Salt

/** Salted join: result equivalence to the plain join, and the spread
  * property that motivates it (a hot key's rows land on `factor`
  * distinct (key, salt) buckets instead of one). */
class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain inner join, including duplicate matches") {
    // skewed big side: key 1 dominates; other side has dup rows for key
    // 2 so the bag-semantics (per-match multiplicity) path is exercised
    val big = ((1 to 40).map(i => (1L, s"b$i")) ++
      Seq((2L, "x"), (3L, "y"))).toDF("k", "payload")
    val other = Seq((1L, "dim1"), (2L, "dim2a"), (2L, "dim2b"))
      .toDF("k", "name")
    val plain = big.join(other, Seq("k"))
    val salted = Salt.saltedJoin(big, other, "k", factor = 4)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.select(concat_ws("|", col("k"), col("payload"), col("name")))
        .as[String].collect().sorted.toSeq
    assert(key(salted) == key(plain))
  }

  test("hot key occupies multiple salt buckets") {
    val big = (1 to 100).map(i => (1L, i)).toDF("k", "v")
    val buckets = big.withColumn("__salt", Salt.saltCol(8))
      .select("__salt").distinct().count()
    assert(buckets > 1, "position salt must spread a single hot key")
  }

  test("factor must be positive") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Salt.saltedJoin(df, df, "k", factor = 0)
    }
  }
}
