package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.{Dedup, Salt, TextDedup}

/** ScalaCheck properties (SURVEY.md §5.2.3): dedup invariants against a
  * plain-Scala reference implementation, Jaccard against set algebra,
  * MinHash permutation invariance, salted-agg equivalence. */
object DedupProps extends Properties("graft") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rowGen = for {
    key <- Gen.choose(0, 5)
    date <- Gen.choose(1, 28)
    tiebreak <- Gen.choose(0L, 1000000L)
    value <- Gen.choose(0.0, 1000.0)
  } yield (key, f"2024-01-$date%02d", tiebreak, value)

  property("latestPerGroup matches plain-Scala reference") =
    Prop.forAll(Gen.listOfN(40, rowGen)) { rows =>
      rows.isEmpty || {
        import spark.implicits._
        val df = rows.toDF("k", "d", "tb", "v")
        val got = Dedup.latestPerGroup(df, Seq("k"),
          Seq(col("d").desc, col("tb").asc))
          .select("k", "d", "tb").as[(Int, String, Long)].collect().toSet
        val expect = rows.groupBy(_._1).map { case (k, g) =>
          val maxDate = g.map(_._2).max
          val best = g.filter(_._2 == maxDate).minBy(_._3)
          (k, best._2, best._3)
        }.toSet
        got == expect
      }
    }

  property("jaccard expression equals set algebra") =
    Prop.forAll(Gen.listOf(Gen.choose(0, 20)), Gen.listOf(Gen.choose(0, 20))) {
      (a, b) =>
        import spark.implicits._
        val (sa, sb) = (a.distinct, b.distinct)
        val df = Seq((sa, sb)).toDF("x", "y")
          .select(TextDedup.jaccard(col("x"), col("y")).as("j"))
        val got = df.as[Double].head()
        val expect =
          if (sa.isEmpty && sb.isEmpty) 1.0
          else sa.toSet.intersect(sb.toSet).size.toDouble /
            sa.toSet.union(sb.toSet).size
        math.abs(got - expect) < 1e-9
    }

  property("minhash signature is permutation- and duplication-invariant") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))) { xs =>
      import spark.implicits._
      val shuffled = scala.util.Random.shuffle(xs ++ xs.take(2))
      val df = Seq((xs, shuffled)).toDF("a", "b").select(
        TextDedup.minhashSignature(col("a"), 16).as("sa"),
        TextDedup.minhashSignature(col("b"), 16).as("sb"))
      val r = df.head()
      r.getSeq[Long](0) == r.getSeq[Long](1)
    }

  property("fused shingle+minhash kernel equals unfused pipeline") =
    Prop.forAll(Gen.listOf(Gen.oneOf(
      Gen.alphaStr.suchThat(_.nonEmpty), Gen.numStr.suchThat(_.nonEmpty)))) { xs =>
      import spark.implicits._
      val toks = xs.distinct // tokenSet semantics: distinct, order kept
      val df = Seq(Tuple1(toks)).toDF("toks").select(
        TextDedup.minhashSignature(
          graft.functions.TextFunctions.shingles(col("toks"), 3), 16).as("a"),
        graft.plans.MinHashShingleFunctions
          .minhashShingleSignature(col("toks"), 3, 16).as("b"))
      val r = df.head()
      r.getSeq[Long](0) == r.getSeq[Long](1)
    }

  property("asofBackward equals naive range-join + max reference") =
    Prop.forAll(
      Gen.listOfN(15, Gen.zip(Gen.choose(0, 3), Gen.choose(0, 50))),
      Gen.listOfN(15, Gen.zip(Gen.choose(0, 3), Gen.choose(0, 50)))) {
      (left, right) =>
        import spark.implicits._
        val l = left.zipWithIndex
          .map { case ((k, t), i) => (k, new java.sql.Timestamp(t * 60000L), s"L$i") }
          .toDF("k", "t", "tag")
        val r = right
          .map { case (k, t) => (k, new java.sql.Timestamp(t * 60000L)) }
          .toDF("k", "qt")
        val got = graft.operators.AsOfJoin
          .asofBackward(l, r, "k", "k", "t", "qt", Seq("tag"), "m")
          .select($"tag", $"m".cast("long")).as[(String, Long)].collect().toMap
        // cast("long") on a timestamp yields epoch SECONDS
        val expect = left.zipWithIndex.flatMap { case ((k, t), i) =>
          val matches = right.filter(q => q._1 == k && q._2 <= t)
          if (matches.isEmpty) None
          else Some(s"L$i" -> matches.map(_._2).max * 60L)
        }.toMap
        got == expect
    }

  property("saltedAgg sum/count equals plain groupBy") =
    Prop.forAll(Gen.listOfN(30, rowGen)) { rows =>
      rows.isEmpty || {
        import spark.implicits._
        val df = rows.toDF("k", "d", "tb", "v")
        val salted = Salt.saltedAgg(df, Seq("k"),
          Seq("s" -> ("v", "sum"), "n" -> ("v", "count")), factor = 4)
          .select(col("k"), round(col("s"), 6).as("s"), col("n"))
          .as[(Int, Double, Long)].collect().toSet
        val plain = df.groupBy(col("k"))
          .agg(round(sum(col("v")), 6).as("s"), count(col("v")).as("n"))
          .as[(Int, Double, Long)].collect().toSet
        salted == plain
      }
    }
}
