package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

import graft.plans.{BloomFunctions, BloomMightContain}

/** Bloom-pruned join building blocks: the codegen predicate has no
  * false negatives (the property the exact join's correctness rests
  * on), interpreted and codegen paths agree, and nulls stay null. */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (0L until 1000L).filter(_ % 7 == 0)
  private lazy val bloom = keys.toDF("k").stat.bloomFilter("k", 10000L, 0.01)

  test("no false negatives: every inserted key passes the predicate") {
    val survivors = (0L until 1000L).toDF("k")
      .filter(BloomFunctions.mightContain(col("k"), bloom))
      .as[Long].collect().toSet
    assert(keys.forall(survivors.contains),
      "a Bloom filter must never drop an inserted key")
    // and it actually prunes: at fpp 1% the non-members mostly vanish
    assert(survivors.size < 300, s"pruned to ${survivors.size} of 1000")
  }

  test("interpreted eval agrees with the filter path; null stays null") {
    assert(keys.forall(k =>
      BloomMightContain(Literal(k), bloom).eval() == true))
    assert(BloomMightContain(Literal(null, org.apache.spark.sql.types
      .LongType), bloom).eval() == null)
  }

  test("bloom prune is output-invisible: q38 equals the plain join") {
    val dim = spark.read.parquet(s"${sf()}/supplier.parquet")
      .filter(col("s_acctbal") > 5000.0)
      .select(col("s_suppkey").cast("long").as("s_suppkey"))
    val plain = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .join(dim, col("l_suppkey").cast("long") === col("s_suppkey"))
      .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSet
    val pruned = SparkEntry.queries("q38_bloom_join")(spark, sf())
      .select(col("suppkey"), col("n_items")).as[(Long, Long)].collect().toSet
    assert(pruned == plain)
  }
}
