package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking with NO unpartitioned window anywhere in
  * the plan — the fix for the "vocab-bounded" single-partition
  * `row_number().over(Window.orderBy(...))` funnel (round-7 verdict
  * item 3): a 100 TB web corpus's `[a-z0-9]+` vocabulary is 10⁸+ rows,
  * far past what one window partition should ever hold.
  *
  * The decomposition for rank under (count DESC, tie ASC), with unique
  * tie keys:
  *
  *   rank(t) = |{t' : c(t') > c(t)}|                       (level A)
  *           + |{t' : c(t') = c(t) ∧ tie(t') < tie(t)}|    (level B)
  *           + 1
  *
  * Level A runs over the DISTINCT-COUNT frame (≤ √(2N) rows for N
  * total observations — the distinct counts present must sum to ≤ N),
  * itself two-leveled by the count's log₂ bucket: per-bucket totals
  * (≤64 rows) get their exclusive higher-bucket sums from a broadcast
  * self-join, and the within-bucket suffix sums ride a window
  * PARTITIONED by that bucket. Level B two-levels the tie-break the
  * same way `Curate.md5RankByStratum` does, except the sub-bucket must
  * be ORDER-CONSISTENT with the tie column, so it range-buckets on the
  * tie's 2-char prefix instead of an md5.
  *
  * Every meta frame is counters, never rows; the row-bearing windows
  * are hash-partitioned by (count, prefix); the two tiny self-joined
  * frames broadcast. `PlanShapeSpec` pins zero `SinglePartition`
  * exchanges in t24's plan.
  */
object Ranks {

  /** Exclusive prefix totals over a SMALL keyed count frame, computed
    * by a broadcast self-join instead of an unpartitioned window. The
    * frame is localCheckpoint-materialized first so the (possibly
    * expensive) lineage producing it runs once, not once per join
    * side. Returns (keyCol, base) where base = Σ totCol over rows with
    * a strictly smaller key. */
  def exclusivePrefixTotals(counts: DataFrame, keyCol: String,
                            totCol: String): DataFrame = {
    val m = counts.localCheckpoint(true)
    m.as("a")
      .join(broadcast(m.as("b")), col(s"b.$keyCol") < col(s"a.$keyCol"),
        "left")
      .groupBy(col(s"a.$keyCol").as(keyCol))
      .agg(coalesce(sum(col(s"b.$totCol")), lit(0L)).as("base"))
  }

  /** Appends `outCol` = the 1-based global rank of each row under the
    * TOTAL order (`cntCol` DESC, `tieCol` ASC). Requires `tieCol`
    * (string) globally unique and `cntCol` a positive integral — the
    * vocabulary-frame shape (token, frequency).
    *
    * The input is localCheckpoint-materialized once (it is typically
    * itself an aggregate of a corpus-sized scan; the rank needs three
    * counter-frame passes over it and must not re-run that scan). */
  def rankByCountDesc(df: DataFrame, cntCol: String, tieCol: String,
                      outCol: String): DataFrame = {
    val v = df.localCheckpoint(true)

    // ---- level A: rows ranked ahead by COUNT alone ------------------
    // distinct-count frame (≤ √(2N) rows), log₂-bucketed
    val cf = v.groupBy(col(cntCol)).agg(count(lit(1)).as("__nc"))
      .withColumn("__lb", floor(log2(col(cntCol))).cast("long"))
      .localCheckpoint(true)
    // per-bucket totals (≤64 rows): exclusive HIGHER-bucket sums via a
    // broadcast self-join — never a global window
    val bt = cf.groupBy(col("__lb")).agg(sum(col("__nc")).as("__bt"))
      .localCheckpoint(true)
    val btHi = bt.as("a")
      .join(broadcast(bt.as("b")), col("b.__lb") > col("a.__lb"), "left")
      .groupBy(col("a.__lb").as("__lb"))
      .agg(coalesce(sum(col("b.__bt")), lit(0L)).as("__hibase"))
    // within-bucket suffix sums, window PARTITIONED by the log₂ bucket
    // (count values are distinct inside cf, so the order is total)
    val wA = Window.partitionBy(col("__lb")).orderBy(col(cntCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val gt = cf
      .withColumn("__wgt", coalesce(sum(col("__nc")).over(wA), lit(0L)))
      .join(broadcast(btHi), "__lb")
      .select(col(cntCol), (col("__hibase") + col("__wgt")).as("__gt"))

    // ---- level B: ties within a count, ranked by the tie column -----
    // the sub-bucket must be order-consistent with tieCol, so it is the
    // tie's own 2-char prefix (a range bucket), not a hash
    val keyed = v.withColumn("__pfx", substring(col(tieCol), 1, 2))
    val localW = Window.partitionBy(col(cntCol), col("__pfx"))
      .orderBy(col(tieCol).asc)
    val local = keyed
      .withColumn("__lrn", row_number().over(localW).cast("long"))
    val baseW = Window.partitionBy(col(cntCol)).orderBy(col("__pfx").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = keyed.groupBy(col(cntCol), col("__pfx"))
      .agg(count(lit(1)).as("__pc"))
      .withColumn("__pbase",
        coalesce(sum(col("__pc")).over(baseW), lit(0L)))
      .select(col(cntCol), col("__pfx"), col("__pbase"))

    local
      .join(bases, Seq(cntCol, "__pfx"))
      .join(gt, Seq(cntCol))
      .withColumn(outCol, col("__gt") + col("__pbase") + col("__lrn"))
      .drop("__pfx", "__lrn", "__pbase", "__gt")
  }
}
