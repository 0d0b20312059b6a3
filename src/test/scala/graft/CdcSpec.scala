package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Cdc.applyChanges: the five semantic cases from the Scaladoc table,
  * each on a planted row. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("apply covers keep/update/delete/insert/ignored-miss") {
    val snapshot = Seq(
      (1L, "a", 10.0), // no change -> kept
      (2L, "b", 20.0), // U -> updated payload
      (3L, "c", 30.0)  // D -> dropped
    ).toDF("k", "name", "bal")
    val changes = Seq(
      (2L, "U", 99.0),
      (3L, "D", 0.0),
      (7L, "I", 70.0), // insert (new key)
      (8L, "U", 80.0), // U on missing key -> ignored
      (9L, "D", 0.0)   // D on missing key -> ignored
    ).toDF("k", "op", "new_bal")

    val out = Cdc.applyChanges(snapshot, changes, "k", "op",
      updates = Map("bal" -> col("new_bal")),
      insertSelect = ins => ins.select(col("k"), lit("ins").as("name"),
        col("new_bal").as("bal")))
      .as[(Long, String, Double)].collect().sortBy(_._1)

    assert(out.toSeq == Seq(
      (1L, "a", 10.0),
      (2L, "b", 99.0),
      (7L, "ins", 70.0)))
  }

  test("snapshot diff recovers the effective changeset (q56 closure)") {
    val snapshot = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "bal")
    val changes = Seq(
      (2L, "U", 99.0), (3L, "D", 0.0), (7L, "I", 70.0),
      (1L, "U", 10.0) // no-op update: new value equals old -> not a diff
    ).toDF("k", "op", "new_bal")
    val after = Cdc.applyChanges(snapshot, changes, "k", "op",
      updates = Map("bal" -> col("new_bal")),
      insertSelect = ins => ins.select(col("k"), col("new_bal").as("bal")))
    val before = snapshot.select(col("k"), col("bal").as("b"))
    val diff = before.join(after.select(col("k"), col("bal").as("a")),
        Seq("k"), "full_outer")
      .withColumn("kind", when(col("b").isNull, "added")
        .when(col("a").isNull, "removed")
        .when(col("b") =!= col("a"), "changed").otherwise("unchanged"))
      .filter(col("kind") =!= "unchanged")
      .select(col("k"), col("kind"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(diff.toSeq == Seq((2L, "changed"), (3L, "removed"),
      (7L, "added")))
  }

  test("delete-all and empty-changeset degenerate cases") {
    val snapshot = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val del = Seq((1L, "D", 0.0), (2L, "D", 0.0)).toDF("k", "op", "nv")
    val none = Seq.empty[(Long, String, Double)].toDF("k", "op", "nv")
    def apply0(ch: org.apache.spark.sql.DataFrame) =
      Cdc.applyChanges(snapshot, ch, "k", "op",
        updates = Map("v" -> col("nv")),
        insertSelect = ins => ins.select(col("k"), col("nv").as("v")))
    assert(apply0(del).count() == 0)
    assert(apply0(none).as[(Long, Double)].collect().sorted.toSeq ==
      Seq((1L, 1.0), (2L, 2.0)))
  }
}
