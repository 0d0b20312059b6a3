package graft

import org.apache.spark.sql.functions._

import graft.plans.SortedIntersectFunctions.sortedIntersectCount

/** The sorted-merge intersect count must equal size(array_intersect)
  * on every input shape its callers produce: sorted-ascending DISTINCT
  * string arrays (sort_array output / canonically sorted doc arrays) —
  * the verify stage of every prefix-filter Jaccard join rides it. */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  test("== size(array_intersect) over random sorted-distinct arrays") {
    // seeded generator: deterministic across runs/partitionings
    val rnd = new scala.util.Random(42)
    def arr(): Seq[String] = {
      val n = rnd.nextInt(12)
      Seq.fill(n)(s"t${rnd.nextInt(20)}").distinct.sorted
    }
    val rows = Seq.fill(300)((arr(), arr()))
    val df = rows.toDF("a", "b")
      .select(sort_array($"a").as("a"), sort_array($"b").as("b"))
    val diff = df.select(
        sortedIntersectCount($"a", $"b").as("m"),
        size(array_intersect($"a", $"b")).as("e"))
      .filter(!($"m" <=> $"e"))
    assert(diff.count() == 0)
  }

  test("== size(array_intersect) on the real fixture token sets") {
    // the exact verify-stage shape: sorted token sets of the documents
    // fixture, self-paired within source
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val tv = docs.select($"doc_id", $"source",
      sort_array(graft.functions.TextFunctions.tokenSet($"text")).as("t"))
    val diff = tv.as("a").join(tv.as("b"),
        $"a.source" === $"b.source" && $"a.doc_id" < $"b.doc_id")
      .select(sortedIntersectCount($"a.t", $"b.t").as("m"),
        size(array_intersect($"a.t", $"b.t")).as("e"))
      .filter(!($"m" <=> $"e"))
    assert(diff.count() == 0)
  }

  test("edges: empty arrays, null array, null elements") {
    val df = Seq(
      (Some(Seq.empty[String]), Some(Seq("a", "b"))),
      (Some(Seq.empty[String]), Some(Seq.empty[String])),
      (None, Some(Seq("a"))),
      (Some(Seq("a")), None)
    ).toDF("a", "b")
    val rows = df.select(sortedIntersectCount($"a", $"b").as("m"),
      size(array_intersect($"a", $"b")).as("e")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getInt(0) == r.getInt(1), r.toString)
    }
    // null ELEMENTS sort first under sort_array(asc); shared null
    // counts once, like array_intersect
    val withNulls = Seq((Seq[String](null, "a", "x"), Seq[String](null, "x")))
      .toDF("a", "b")
      .select(sort_array($"a").as("a"), sort_array($"b").as("b"))
      .select(sortedIntersectCount($"a", $"b").as("m"),
        size(array_intersect($"a", $"b")).as("e"))
      .head()
    assert(withNulls.getInt(0) == 2 && withNulls.getInt(1) == 2)
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def lit(xs: String*) = Literal(
      new GenericArrayData(xs.map(UTF8String.fromString).toArray),
      ArrayType(StringType))
    val e = graft.plans.SortedIntersectCount(
      lit("a", "c", "e", "f"), lit("b", "c", "d", "f", "g"))
    assert(e.eval(null) == 2)
    val viaSql = spark.range(1)
      .select(sortedIntersectCount(
        typedLit(Seq("a", "c", "e", "f")),
        typedLit(Seq("b", "c", "d", "f", "g"))).as("v"))
      .head().getInt(0)
    assert(viaSql == 2)
  }
}
