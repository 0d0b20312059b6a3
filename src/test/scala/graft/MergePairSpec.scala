package graft

import org.apache.spark.sql.functions._

import graft.plans.MergePairFunctions.mergePair

/** Greedy-merge semantics of [[graft.plans.MergePair]] — the chained
  * "a a a" case every BPE implementation must agree on — plus a
  * from-first-principles sequential trainer reference for the t29
  * round structure (count → argmax → apply). */
class MergePairSpec extends SparkSpec {
  import spark.implicits._

  test("greedy left-to-right non-overlapping; nulls; codegen==interp") {
    val df = Seq(
        (1L, Some(Seq("a", "a", "a"))),
        (2L, Some(Seq("a", "a", "a", "a", "a"))),
        (3L, Some(Seq("x", "a", "a", "y", "a"))),
        (4L, Some(Seq("b", "c"))),
        (5L, Some(Seq[String]())),
        (6L, None))
      .toDF("id", "toks")
      .select(col("id"), mergePair(col("toks"), "a", "a").as("m"))
    val got = df.orderBy("id").collect()
    assert(got(0).getSeq[String](1) == Seq("aa", "a"))
    assert(got(1).getSeq[String](1) == Seq("aa", "aa", "a"))
    assert(got(2).getSeq[String](1) == Seq("x", "aa", "y", "a"))
    assert(got(3).getSeq[String](1) == Seq("b", "c"))
    assert(got(4).getSeq[String](1) == Seq())
    assert(got(5).isNullAt(1))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp =
      try df.orderBy("id").collect()
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(got.map(_.toString).toSeq == interp.map(_.toString).toSeq)
  }

  /** Sequential BPE trainer: identical round structure, plain Scala. */
  private def refTrain(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var vocab = words.map { case (w, c) => w.map(_.toString).toList -> c }
      .toList
    (1 to rounds).map { round =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (toks, wc) =>
        toks.zip(toks.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + wc
        }
      }
      val ((l, r), c) = counts.toSeq.minBy { case ((pl, pr), pc) =>
        (-pc, pl, pr)
      }
      def apply(toks: List[String]): List[String] = toks match {
        case a :: b :: rest if a == l && b == r => (a + b) :: apply(rest)
        case a :: rest => a :: apply(rest)
        case Nil => Nil
      }
      vocab = vocab.map { case (toks, wc) => apply(toks) -> wc }
      (round, l, r, c)
    }
  }

  test("3-round trainer on a planted corpus matches the reference") {
    // "banana" dominates: round 1 merges the most frequent pair
    val docs = Seq(
      (1L, "banana banana banana band"),
      (2L, "ananas and banana"),
      (3L, "a banal canal plan")).toDF("doc_id", "text")
    // replicate t29's engine loop on this fixture
    var cur = docs
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z0-9]+"), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(split(col("w"), "").as("toks"), col("wc"))
    val got = (1 to 3).map { round =>
      val win = cur.filter(size(col("toks")) >= 2)
        .select(col("wc"), explode(transform(
          sequence(lit(1), size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("l"),
            element_at(col("toks"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wc")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()(0)
      val (l, r, c) = (win.getString(0), win.getString(1), win.getLong(2))
      cur = cur.withColumn("toks", mergePair(col("toks"), l, r))
      (round, l, r, c)
    }
    val words = Seq("banana", "banana", "banana", "band", "ananas",
      "and", "banana", "a", "banal", "canal", "plan")
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    assert(got == refTrain(words, 3))
  }
}
