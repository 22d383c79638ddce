package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface over the `events` stream shape
  * (event_id, ts, user_id, event_type, value, props). The reference has
  * no streaming (SURVEY §2.8); these are the incremental forms of the
  * batch event operators (graft.queries.EventQueries), built so every
  * transform works identically under `readStream` and batch `read`:
  *   - watermarked tumbling-window aggregation (windowedTypeStats)
  *   - stateful sessionization via flatMapGroupsWithState (sessionize)
  *
  * Scale: both shuffle once on their natural key (window+type / user_id);
  * state is per-key and bounded by the watermark/timeout, so a
  * 1000-executor cluster partitions state horizontally.
  */
object Streaming {

  /** Tumbling-window per-type stats with late-data handling. `events`
    * must carry a TimestampType `ts` column (use tsFromNanos for the
    * nanos-bigint shape Tables produces).
    */
  def windowedTypeStats(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("cnt"), col("total_value"))

  /** nanos-bigint -> TimestampType (micros precision, matching Spark). */
  def tsFromNanos(nanos: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros((nanos / 1000L).cast("long"))

  /** Streaming exact dedup: drop repeats of `idCols` with state bounded
    * by the watermark (late duplicates beyond the delay age out of
    * state — the incremental form of d01's hash-groupBy dedup).
    */
  def dedupStream(events: DataFrame, idCols: Seq[String],
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicates(idCols :+ "ts")

  /** Stream-static enrichment join: the static side is broadcast per
    * micro-batch (dimension lookup, no stream-side shuffle).
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), key)

  case class Event(user_id: Long, ts_ns: Long, event_id: Long, value: Double)
  case class SessionState(startNs: Long, lastNs: Long, firstEvent: Long,
      lastEvent: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start_ns: Long, n_events: Long,
      first_event: Long, last_event: Long, total_value: Double)

  /** Inactivity-gap sessionization as explicit keyed state — the
    * streaming twin of EventQueries.e01 (same 30-min default gap).
    *
    * State is BOUNDED: only the one open session per key is kept. A
    * session is emitted exactly once, when it closes — either because a
    * later event exceeded the gap, or because the event-time watermark
    * passed `last_event_ts + gap` (EventTimeTimeout flushes idle keys
    * and removes their state). At 100 TB scale this means per-key state
    * is O(1) and total state is O(active users within the watermark
    * horizon), not O(all sessions ever).
    *
    * Streaming callers MUST set a watermark on a TimestampType `ts`
    * column before `.as[Event]` (EventTimeTimeout requires it):
    * {{{
    *   df.withColumn("ts", Streaming.tsFromNanos(col("ts_ns")))
    *     .withWatermark("ts", "10 minutes").as[Streaming.Event]
    * }}}
    *
    * In batch mode Spark calls the function once per key with the full
    * history and timeouts never fire, so the open session is emitted
    * too — the complete, final answer (pinned against e01's oracle
    * semantics in StreamingSpec). The per-key sort materializes that
    * key's history only in batch; the declarative window-function form
    * (EventQueries e01) remains the batch path of record.
    */
  def sessionize(
      events: Dataset[Event],
      gapNs: Long = 30L * 60 * 1000 * 1000 * 1000): Dataset[Session] = {
    import events.sparkSession.implicits._
    val isStreaming = events.isStreaming
    val timeoutConf =
      if (isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          def finish(s: SessionState): Session =
            Session(userId, s.startNs, s.n, s.firstEvent, s.lastEvent, s.total)
          if (state.hasTimedOut) {
            // watermark passed lastNs+gap: no event can extend this
            // session any more — flush it and drop the key's state
            val idle = state.get
            state.remove()
            Iterator.single(finish(idle))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts_ns, e.event_id))
            val closed = List.newBuilder[SessionState]
            var open: Option[SessionState] = state.getOption
            sorted.foreach { e =>
              open = open match {
                // within gap of the open session's span — including a LATE
                // event older than lastNs (a prior trigger ran ahead): the
                // merge must extend whichever END the event falls on, never
                // regress lastNs (that would shrink the timeout horizon)
                case Some(o) if e.ts_ns >= o.startNs - gapNs && e.ts_ns - o.lastNs <= gapNs =>
                  val first = e.ts_ns < o.startNs ||
                    (e.ts_ns == o.startNs && e.event_id < o.firstEvent)
                  val last = e.ts_ns > o.lastNs ||
                    (e.ts_ns == o.lastNs && e.event_id > o.lastEvent)
                  Some(SessionState(
                    startNs = math.min(o.startNs, e.ts_ns),
                    lastNs = math.max(o.lastNs, e.ts_ns),
                    firstEvent = if (first) e.event_id else o.firstEvent,
                    lastEvent = if (last) e.event_id else o.lastEvent,
                    n = o.n + 1, total = o.total + e.value))
                case Some(o) if e.ts_ns < o.startNs - gapNs =>
                  // predates the open session by more than the gap: its
                  // session already aged out of single-open-session state —
                  // emit as its own closed singleton (documented tradeoff)
                  closed += SessionState(e.ts_ns, e.ts_ns, e.event_id, e.event_id, 1, e.value)
                  Some(o)
                case other =>
                  other.foreach(closed += _)
                  Some(SessionState(e.ts_ns, e.ts_ns, e.event_id, e.event_id, 1, e.value))
              }
            }
            if (isStreaming) {
              open match {
                case Some(o) =>
                  state.update(o)
                  // flush once the watermark passes the gap horizon
                  state.setTimeoutTimestamp((o.lastNs + gapNs) / 1000000L)
                case None => state.remove()
              }
              closed.result().iterator.map(finish)
            } else {
              // batch: one call with complete data — everything is final
              (closed.result() ++ open.toList).iterator.map(finish)
            }
          }
      }
  }
}
