package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.model.Rows.Event

/** Per-key ingestion QUOTA enforcement on the event stream — the
  * curation rule "no source/user contributes more than N items" (the
  * cap that keeps one crawler loop or bot account from flooding a
  * training corpus), enforced continuously via `transformWithState`,
  * Spark 4's arbitrary-state API v2 (SPARK-46815; the successor to
  * [[EventStreams.sessionizeStateful]]'s flatMapGroupsWithState with
  * composable named state, per-state TTL, and timers).
  *
  * Semantics: per user, the first `quota` events in (ts, event_id)
  * order are accepted; every event gets a verdict carrying n_before =
  * how many were accepted before it. Within a micro-batch the group's
  * rows are explicitly sorted by (ts, event_id) — the input iterator's
  * order is an implementation detail, and an order-dependent operator
  * must pin one. Across batches acceptance is arrival-order dependent
  * by NATURE (a quota admits whoever comes first); when batches
  * respect per-key event-time order the result equals the batch
  * window form (q82's row_number ≤ quota), which is what the spec and
  * the oracle gate.
  *
  * Scale shape: state is ONE long per key (the RocksDB provider —
  * required by transformWithState — keeps it off-heap and disk-backed),
  * the per-batch sort is per-GROUP (a user's slice of one micro-batch,
  * never the batch), and the output is append-only verdicts. TTL is
  * surfaced as a parameter: a production quota usually resets by
  * retention window; TTLConfig.NONE keeps the lifetime contract
  * explicit rather than implicit.
  */
object Quota {
  /** One verdict per input event. */
  case class Verdict(user_id: Long, event_id: Long, n_before: Long,
                     accepted: Boolean)

  /** `transformWithState` processor: named ValueState "n" = accepted
    * count for the key. */
  class QuotaProcessor(quota: Int, ttl: TTLConfig)
      extends StatefulProcessor[Long, Event, Verdict] {
    @transient private var nState: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      nState = getHandle.getValueState[Long]("n", Encoders.scalaLong, ttl)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[Verdict] = {
      var n = if (nState.exists()) nState.get() else 0L
      // Full Timestamp ordering (compareTo includes nanos) — getTime is
      // millisecond-precision while Spark timestamps carry microseconds,
      // and the gated batch twin (q82) orders by the full ts.
      implicit val tsOrd: Ordering[java.sql.Timestamp] =
        (a: java.sql.Timestamp, b: java.sql.Timestamp) => a.compareTo(b)
      val out = rows.toSeq.sortBy(e => (e.ts, e.event_id)).map { e =>
        val accepted = n < quota
        val v = Verdict(key, e.event_id, n, accepted)
        if (accepted) n += 1
        v
      }
      nState.update(n)
      out.iterator
    }
  }

  /** Append-mode quota verdicts keyed by user_id. */
  def enforce(events: Dataset[Event], quota: Int = 3,
              ttl: TTLConfig = TTLConfig.NONE): Dataset[Verdict] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new QuotaProcessor(quota, ttl),
        TimeMode.None(), OutputMode.Append())
  }
}
