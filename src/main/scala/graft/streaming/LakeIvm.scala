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
  * advances by VERSION, below).
  *
  * Crash recovery: the view persists the lake version it reflects
  * (`__v`). Maintenance always catches up FROM THE VIEW'S OWN VERSION
  * to the lake head — never from "the previous batch" — so a crash in
  * the window between a successful commit and the view write cannot
  * diverge silently: the replayed batch's commit is a txn no-op, but
  * the view sees `__v < head` and applies the missed feed(s) in one
  * [[VersionedLake.changesBetween]] call. A replay after a fully
  * successful batch sees `__v == head` and does nothing.
  *
  * l19 is the oracle-gated batch twin; the per-batch `require` here
  * asserts the IVM invariant — maintained == full recompute — after
  * EVERY commit, so a drive that diverges fails loudly rather than
  * benching garbage.
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

  /** Probe through the Hadoop FileSystem, as every other path in this
    * file does — a java.io.File probe reports false for any non-local
    * store (hdfs://, s3a://) and would silently turn every batch into
    * the full-recompute branch (r11 advice). */
  private def hasView(s: org.apache.spark.sql.SparkSession,
                      viewPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(viewPath)
    val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    f.exists(p) && f.getFileStatus(p).isDirectory &&
      f.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** One micro-batch: commit, then catch the view up from ITS version
    * to the lake head through the change feed, then (with `verify`)
    * assert the IVM invariant. Public so StreamingSpec can drive
    * replay and the crash-window recovery directly.
    *
    * `verify = false` is the OPERATOR form (the benchOverrides rule,
    * r11 verdict): the invariant check re-derives the view from
    * `readLatest` of the BASE every batch — O(base) verification
    * harness next to O(churn) maintenance. Correctness gates
    * (StreamingSpec, the st22 registered drive, l19's oracle twin)
    * keep it on; the bench measures the maintenance itself. */
  def step(batch: DataFrame, batchId: Long, lakePath: String,
           viewPath: String, verify: Boolean = true): Unit = {
    val s = batch.sparkSession
    val v = VersionedLake.commitBatchUpsert(batch, "month", lakePath,
      txn = batchId)
    val (viewV, cur) =
      if (!hasView(s, viewPath)) (0, None)
      else {
        val df = s.read.parquet(viewPath)
        (df.agg(max(col("__v"))).head().getInt(0), Some(df))
      }
    if (viewV >= v) return // view already reflects this head
    val next =
      cur match {
        case None => viewOf(VersionedLake.readVersion(s, lakePath, v))
        case Some(df) =>
          // ONE feed covers any catch-up distance: changesBetween
          // diffs manifests, not adjacent pairs
          val cf = VersionedLake.changesBetween(s, lakePath, viewV, v,
            Keys, "qty_c")
          val deltaAgg = cf.groupBy(col("month")).agg(
            sum(when(col("change_kind") === "added", 1L)
              .when(col("change_kind") === "removed", -1L)
              .otherwise(0L)).as("n_rows"),
            sum(when(col("change_kind") === "added", col("qty_c_after"))
              .when(col("change_kind") === "removed",
                -col("qty_c_before"))
              .otherwise(col("qty_c_after") - col("qty_c_before")))
              .as("qty_cents"))
          df.drop("__v").unionByName(deltaAgg)
            .groupBy(col("month"))
            .agg(sum(col("n_rows")).as("n_rows"),
              sum(col("qty_cents")).as("qty_cents"))
            .filter(col("n_rows") > 0)
      }
    // materialize BEFORE overwriting the store it reads from (the
    // overwriteBuckets read-then-overwrite rule, blocks released per
    // batch — Checkpoints); stamp the version the view now reflects
    Checkpoints.withLocal(next.withColumn("__v", lit(v))) {
      _.write.mode("overwrite").parquet(viewPath)
    }
    if (verify) {
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
  }

  /** Streaming form: the caller picks trigger/checkpoint. */
  def maintainedView(states: DataFrame, lakePath: String,
                     viewPath: String,
                     verify: Boolean = true): DataStreamWriter[Row] =
    states.writeStream.foreachBatch {
      (batch: Dataset[Row], batchId: Long) =>
        step(batch.toDF(), batchId, lakePath, viewPath, verify)
    }
}
