package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.sources.VersionedLake

/** Change-feed-driven INCREMENTAL VIEW MAINTENANCE over a versioned
  * lake (st22): each micro-batch is an exactly-once txn-deduped upsert
  * commit; the commit's CHANGE FEED ([[VersionedLake.changesBetween]])
  * — not the batch payload, and never the base table — then maintains
  * a materialized aggregate view with q88's counting algebra
  * (added → (+1, +after), removed → (−1, −before), changed →
  * (0, after − before), one re-combine groupBy, HAVING n > 0). This
  * closes the loop the table layer's CDF exists for: the view's
  * maintenance cost is ∝ churn + view size per batch, and a replayed
  * batch is skipped at BOTH layers (the commit dedups on txn; the view
  * only advances when a commit actually lands). l19 is the
  * oracle-gated batch twin; the per-batch `require` here asserts the
  * IVM invariant — maintained == full recompute — after EVERY commit,
  * so a drive that diverges fails loudly rather than benching garbage.
  *
  * Expected batch schema: (l_orderkey, l_linenumber, month, qty_c) —
  * the staged full-state restatements; the view is per-month
  * (n_rows, qty_cents), integer-exact.
  */
object LakeIvm {

  private val Keys = Seq("l_orderkey", "l_linenumber", "month")

  private def viewOf(df: DataFrame): DataFrame =
    df.groupBy(col("month"))
      .agg(count(lit(1)).as("n_rows"), sum(col("qty_c")).as("qty_cents"))

  /** One micro-batch: commit, consume the change feed, maintain the
    * view, assert the IVM invariant. Public so StreamingSpec can drive
    * replay directly. */
  def step(batch: DataFrame, batchId: Long, lakePath: String,
           viewPath: String): Unit = {
    val s = batch.sparkSession
    val prev = VersionedLake.latestVersion(s, lakePath)
    val v = VersionedLake.commitBatchUpsert(batch, "month", lakePath,
      txn = batchId)
    if (v == prev) return // replayed txn: the view already reflects it
    val next =
      if (prev == 0) viewOf(VersionedLake.readVersion(s, lakePath, v))
      else {
        val cf = VersionedLake.changesBetween(s, lakePath, prev, v,
          Keys, "qty_c")
        val deltaAgg = cf.groupBy(col("month")).agg(
          sum(when(col("change_kind") === "added", 1L)
            .when(col("change_kind") === "removed", -1L)
            .otherwise(0L)).as("n_rows"),
          sum(when(col("change_kind") === "added", col("qty_c_after"))
            .when(col("change_kind") === "removed", -col("qty_c_before"))
            .otherwise(col("qty_c_after") - col("qty_c_before")))
            .as("qty_cents"))
        s.read.parquet(viewPath).unionByName(deltaAgg)
          .groupBy(col("month"))
          .agg(sum(col("n_rows")).as("n_rows"),
            sum(col("qty_cents")).as("qty_cents"))
          .filter(col("n_rows") > 0)
      }
    // materialize BEFORE overwriting the store it reads from (the
    // overwriteBuckets read-then-overwrite rule)
    next.localCheckpoint(true)
      .write.mode("overwrite").parquet(viewPath)
    // the IVM invariant, checked after EVERY commit (view-sized
    // collects — months, not rows)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = rows(s.read.parquet(viewPath)
      .select(col("month"), col("n_rows"), col("qty_cents")))
    val want = rows(viewOf(VersionedLake.readLatest(s, lakePath))
      .select(col("month"), col("n_rows"), col("qty_cents")))
    require(got == want,
      s"st22 IVM diverged at batch $batchId: $got vs $want")
  }

  /** Streaming form: the caller picks trigger/checkpoint. */
  def maintainedView(states: DataFrame, lakePath: String,
                     viewPath: String): DataStreamWriter[Row] =
    states.writeStream.foreachBatch {
      (batch: Dataset[Row], batchId: Long) =>
        step(batch.toDF(), batchId, lakePath, viewPath)
    }
}
