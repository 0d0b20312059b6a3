package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Rows.Event

/** Structured Streaming operators over the events stream (SURVEY.md
  * §2.9 / §7.5). The reference is strictly batch; these are the
  * streaming-native twins of q15 (tumbling agg) and q16 (sessions).
  *
  * Scale design: all state is keyed and watermark-bounded. The tumbling
  * agg keeps one row per (window, event_type) in the state store and
  * drops it at watermark + window; sessionization state is one small
  * case class per active user, timed out by event-time gap. Nothing
  * driver-side, nothing unbounded.
  */
object EventStreams {

  /** Tumbling 5-minute counts/sums with a 10-minute watermark — append
    * mode: a window emits exactly once, when the watermark passes its
    * end. Identical semantics to batch q15 for on-time data. */
  def tumblingAgg(events: DataFrame,
                  windowLen: String = "5 minutes",
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** CHAINED stateful operators in ONE streaming query (Spark's
    * multiple-stateful-operator support): watermarked exact dedup
    * (dropDuplicatesWithinWatermark on event_id) feeding a tumbling
    * event-time aggregation downstream — an at-least-once source
    * counted effectively-once in windowed metrics without the
    * dedup-materialize-reread hop between two jobs that pipelines ran
    * before chaining existed. One watermark bounds BOTH state stores:
    * dedup keys evict at the horizon, windows finalize at it. Output
    * shape = [[tumblingAgg]]'s; the q85 batch twin oracle-gates the
    * combined semantics with a deterministic-representative batch
    * dedup. */
  def dedupedTumblingAgg(events: DataFrame,
                         windowLen: String = "5 minutes",
                         watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** In-flight pipeline OBSERVABILITY (st17): ingest health counters —
    * rows, clicks, null-prop rows, value cents — ride every micro-batch
    * as OBSERVED METRICS (`Dataset.observe`) on the same scan that
    * feeds the tumbling aggregate. No second pass over the stream, no
    * extra state: the counters are accumulator-style aggregates
    * surfaced per batch through
    * `StreamingQueryProgress.observedMetrics("ingest")` — how a 100 TB
    * ingest audits itself (q89 is the batch form of the same contract).
    * Output rows are [[tumblingAgg]]'s; StreamingSpec asserts the
    * per-batch observed counters sum to the directly-computed batch
    * totals. */
  def observedTumblingAgg(events: DataFrame,
                          windowLen: String = "5 minutes",
                          watermark: String = "10 minutes"): DataFrame =
    events
      .observe("ingest",
        count(lit(1)).as("rows_in"),
        count(when(col("event_type") === "click", 1)).as("clicks"),
        count(when(col("props").isNull, 1)).as("null_props"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding windows: each event lands in windowLen/slide overlapping
    * windows — state is per (window, event_type), so the store carries
    * overlap-factor × the tumbling cardinality; the watermark bounds it
    * the same way. Append mode, same emit-once discipline as
    * [[tumblingAgg]]. */
  def slidingAgg(events: DataFrame,
                 windowLen: String = "10 minutes",
                 slide: String = "5 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Windowed approximate-distinct: per tumbling window, the HLL
    * approx_count_distinct of active users — the q17/q52 mergeable-
    * sketch family lifted into the stream. State per window is KBs of
    * sketch buffer regardless of user cardinality; an exact windowed
    * distinct would hold every user id in the store, which is exactly
    * what a 100 TB event stream cannot afford. Append mode, same
    * emit-once discipline as [[tumblingAgg]]. */
  def tumblingApproxDistinct(events: DataFrame,
                             windowLen: String = "5 minutes",
                             watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("approx_users"),
        col("n"))

  /** Tumbling-window frequent items: per-window approx_top_k heavy
    * hitters over the user stream — the t26/q77 mergeable
    * frequent-items sketch riding the watermarked window state, KBs
    * per window regardless of key cardinality (an exact per-key count
    * would hold every key in the store; at 100 TB-of-events scale the
    * sketch IS the only windowed-top-k state that fits). Emits the
    * top items as a canonical "item:count" string under the
    * (count desc, item asc) total order so downstream consumers (and
    * the spec) read a deterministic rendering. */
  def tumblingTopK(events: DataFrame, k: Int = 5,
                   windowLen: String = "5 minutes",
                   watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(expr(s"approx_top_k(user_id, $k, 64)").as("top"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"),
        array_join(transform(
          array_sort(col("top"), (a, b) =>
            when(a.getField("count") > b.getField("count"), -1)
              .when(a.getField("count") < b.getField("count"), 1)
              .when(a.getField("item") < b.getField("item"), -1)
              .when(a.getField("item") > b.getField("item"), 1)
              .otherwise(0)),
          x => concat(x.getField("item").cast("string"), lit(":"),
            x.getField("count").cast("string"))), " ").as("top_items"))

  /** Built-in session windows: gap-based (30 min), watermark-bounded. */
  def sessionWindowAgg(events: DataFrame,
                       gap: String = "30 minutes",
                       watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Stream-static enrichment + windowed aggregation: the unbounded
    * events stream broadcast-joined to a bounded dimension, then
    * tumbling-window aggregated per dim attribute. The static side
    * never enters the state store — it is (re)planned per micro-batch
    * and shipped as a broadcast, so streaming state stays one row per
    * (window, segment) exactly as in [[tumblingAgg]]. The SAME code
    * path runs in batch (withWatermark is a documented batch no-op),
    * which is what q39's oracle checks. */
  def enrichedTumblingAgg(events: DataFrame, dim: DataFrame,
                          eventKey: String = "user_id",
                          dimKey: String = "c_custkey",
                          segment: String = "c_mktsegment",
                          windowLen: String = "5 minutes",
                          watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim.select(col(dimKey), col(segment))),
        col(eventKey) === col(dimKey))
      .groupBy(window(col("ts"), windowLen).as("w"), col(segment))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"),
        col(segment).as("segment"), col("n"), col("sum_value"))

  /** Streaming exact deduplication: drop repeated event_ids within the
    * watermark horizon — the streaming twin of the batch exact-dedup
    * operator. State is one entry per distinct key inside the watermark
    * window, evicted automatically as the watermark advances (the
    * unbounded-state variant `dropDuplicates` would OOM on an infinite
    * stream). */
  def dedupWithinWatermark(events: DataFrame,
                           watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: pair each error event with click
    * events by the same user in the preceding `window` — both sides
    * watermarked so the join state is bounded (Spark buffers only rows
    * inside the watermark + interval horizon). */
  def clickErrorJoin(events: DataFrame,
                     window: String = "10 minutes",
                     watermark: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("error_id"))
      .withWatermark("e_ts", watermark)
    clicks.join(errors,
      col("c_user") === col("e_user")
        && col("c_ts") <= col("e_ts")
        && col("c_ts") >= col("e_ts") - expr(s"INTERVAL $window"))
      .select(col("e_user").as("user_id"), col("error_id"),
        col("click_id"), col("c_ts"), col("e_ts"))
  }

  /** LEFT OUTER stream-stream interval join — [[clickErrorJoin]] with
    * the unmatched side kept: every error emits, paired with each
    * same-user click in the preceding `window`, or exactly once with
    * NULL click columns (the "error with no recent interaction"
    * alerting shape, which an inner join silently drops). The outer
    * row is emitted only once the watermark PROVES no matching click
    * can still arrive — that is what makes the result append-only and
    * the join state bounded: both sides are watermarked and the join
    * condition carries the time range, so Spark evicts buffered rows
    * at the watermark + interval horizon. In batch execution the
    * watermark is a no-op and the same plan is a plain left outer
    * range join — q84 oracle-gates that single code path. */
  def clickErrorJoinLeftOuter(events: DataFrame,
                              window: String = "10 minutes",
                              watermark: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("error_id"))
      .withWatermark("e_ts", watermark)
    errors.join(clicks,
      col("c_user") === col("e_user")
        && col("c_ts") <= col("e_ts")
        && col("c_ts") >= col("e_ts") - expr(s"INTERVAL $window"),
      "left_outer")
      .select(col("e_user").as("user_id"), col("error_id"),
        col("click_id"), col("c_ts"), col("e_ts"),
        col("click_id").isNotNull.as("matched"))
  }

  /** Streaming ingest into the month-partitioned lake
    * ([[graft.sources.PartitionedLake.upsertBatch]]): each micro-batch
    * writes its rows under (month, ingest_batch) with dynamic partition
    * overwrite, so a replayed batch (restart from checkpoint,
    * at-least-once delivery) rewrites exactly its own files and lake
    * state stays effectively-once — while batches sharing a month
    * accumulate instead of clobbering. Returns the DataStreamWriter;
    * the caller picks trigger/checkpoint. */
  def toLake(events: DataFrame, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sources.PartitionedLake.upsertBatch(
          batch.toDF(), "ts", batchId, path)
    }

  /** Streaming ingest into the VERSIONED lake
    * ([[graft.sources.VersionedLake]]): each micro-batch commits one
    * month-partitioned APPEND with batchId as the transaction id —
    * batches sharing a month accumulate, and a checkpoint replay
    * after a sink failure is SKIPPED at the commit (exactly-once lake
    * versions from at-least-once delivery — the Delta txn protocol;
    * [[toLake]] gets the same guarantee by byte-identical rewrite,
    * this one by commit dedup). Every batch is a readable snapshot:
    * the lake's version history IS the ingest audit log, and a reader
    * pinned to version k is immune to the batches still landing. */
  def toVersionedLake(events: DataFrame, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sources.VersionedLake.commitBatchAppend(
          batch.toDF().withColumn("month",
            date_format(col("ts"), "yyyy-MM")),
          "month", path, txn = batchId)
        ()
    }

  /** [[toVersionedLake]]'s GOVERNED form (st25): the partition value
    * derives through the lake's RECORDED transform
    * ([[graft.sources.HiddenPartitioning]], l27) instead of a
    * sink-side formula, and any table constraints (l26) validate the
    * micro-batch inside the commit — layout and quality rules live in
    * the TABLE, so no stream can bypass them; a violating batch
    * aborts before a version is claimed. */
  def toGovernedLake(events: DataFrame, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sources.HiddenPartitioning.commitBatchAppend(
          batch.toDF(), path, txn = batchId)
        ()
    }

  /** [[toVersionedLake]] fanned out to TWO lakes under ONE
    * coordinator record per micro-batch (st29 — the streaming form of
    * l36): the batch's rows land in the FACTS lake and its per-month
    * counts in the AGGREGATE lake, each an exactly-once txn commit
    * (batchId), then [[graft.sources.CommitCoordinator.commitAll]]
    * pins both resulting versions in one atomic claim. Coordinated
    * readers can never observe the facts without their counts (or
    * vice versa): a crash between the two lake commits leaves the
    * coordinator un-advanced, and the checkpoint replay re-lands the
    * same txns (no-op commits, version numbers unchanged) before a
    * fresh record publishes the completed pair — recovery is a
    * re-pin, never an undo. The micro-batch persists across its two
    * consumers (facts write + counts aggregate), the one-pass rule a
    * 100 TB ingest needs. */
  def toCoordinatedLakes(events: DataFrame, factsPath: String,
                         countsPath: String, coordPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.toDF()
          .withColumn("month", date_format(col("ts"), "yyyy-MM"))
          .persist()
        try {
          val vA = graft.sources.VersionedLake.commitBatchAppend(
            b, "month", factsPath, txn = batchId)
          val vB = graft.sources.VersionedLake.commitBatchAppend(
            b.groupBy(col("month")).agg(count(lit(1)).as("cnt")),
            "month", countsPath, txn = batchId)
          graft.sources.CommitCoordinator.commitAll(b.sparkSession,
            coordPath,
            Seq(() => (factsPath, vA), () => (countsPath, vB)))
        } finally b.unpersist()
        ()
    }

  /** [[toVersionedLake]] with STREAMING INDEX MAINTENANCE (st26):
    * after each micro-batch's exactly-once commit, the lake's
    * Bloom file-skipping index catches up through
    * [[graft.sources.BloomIndex.ensure]] — filters attach to
    * immutable files, so the per-batch cost is exactly this batch's
    * fresh files (never a rebuild), a replayed batch re-ensures into
    * a no-op, and point lookups stay index-served throughout the
    * ingest. `onEnsure` receives each batch's newly indexed rel count
    * (drive-side witness plumbing). */
  def toIndexedLake(events: DataFrame, path: String,
                    onEnsure: Int => Unit = _ => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val v = graft.sources.VersionedLake.commitBatchAppend(
          batch.toDF().withColumn("month",
            date_format(col("ts"), "yyyy-MM")),
          "month", path, txn = batchId)
        onEnsure(graft.sources.BloomIndex
          .ensure(batch.sparkSession, path, v).size)
        ()
    }

  /** Streaming keyed CHANGESET maintenance through DV-MERGE (st27 —
    * the continuous form of l33): each micro-batch reduces to one row
    * per user (the batch's latest event by (ts, event_id): payload,
    * or a tombstone when that event is an error) and lands as ONE
    * [[graft.sources.VersionedLake.commitBatchMergeDv]] — matched
    * stored rows die via DV sidecars, the changeset appends, every
    * base data file carries forward by pointer. Per-batch write cost
    * is ∝ the batch's changed rows, NEVER the store's size — the
    * property that keeps a continuous MERGE alive against a 100 TB
    * store; txn = batchId makes checkpoint replays no-ops. The store
    * must exist (seed it with the schema-recording overwrite the
    * drive performs) — partition is the stable `user_id mod 8`
    * bucket, the MERGE partition-stability contract. */
  def toDvMergeStore(events: DataFrame, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val delta = batch.toDF()
          .groupBy(col("user_id"))
          .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
            col("value"))).as("m"))
          .select(col("user_id"),
            col("m.ts").as("last_ts"),
            col("m.event_type").as("last_type"),
            col("m.value").as("last_value"))
          .withColumn("bucket",
            pmod(col("user_id"), lit(8L)).cast("string"))
          .withColumn("is_del", col("last_type") === "error")
        graft.sources.VersionedLake.commitBatchMergeDv(delta,
          Seq("user_id"), "bucket", path, txn = batchId,
          deleteCol = Some("is_del"))
        ()
    }

  /** A closed session emitted by [[sessionizeStateful]]. */
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** Per-user open-session state (public: the state encoder's generated
    * code must reach the constructor). */
  case class SessionState(start: Long, last: Long, n: Long)

  /** Custom sessionization via flatMapGroupsWithState — the
    * arbitrary-state path for session semantics the built-in
    * session_window can't express (e.g. per-user custom close rules).
    * State: (start, last, n) per user; a session closes when event-time
    * timeout fires (gap elapsed past the watermark). */
  def sessionizeStateful(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
                        (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.last), s.n))
          } else {
            // events within a micro-batch are not ordered — sort this
            // group's slice; cross-batch ordering is the watermark's job.
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val t = e.ts.getTime
              st match {
                case null =>
                  st = SessionState(t, t, 1)
                case s if t - s.last > gapMs =>
                  closed ::= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n)
                  st = SessionState(t, t, 1)
                case s =>
                  st = SessionState(s.start, math.max(s.last, t), s.n + 1)
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(st.last + gapMs)
            closed.reverseIterator
          }
      }
  }
}
