package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Scale notes: windowed aggregation state is partitioned by
  * (window, event_type) — bounded keyspace, no skew concern; the
  * watermark bounds state size. Sessionization state is per user_id —
  * at 100 TB/day scale the state store shards across executors by
  * user hash; the event-time timeout both closes sessions and evicts
  * state, so memory is O(active users), not O(history).
  */
object Streams {

  final case class EventRow(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, total_value: Double)

  /** Internal accumulator for [[sessionize]] (public: Catalyst encoder
    * codegen must be able to construct it).
    */
  final case class SessionState(start: Long, last: Long, n: Int, total: Double)

  /** Tumbling hourly counts per event type with a watermark for late
    * data — the streaming twin of the batch `ev_hourly_agg` query.
    */
  def hourlyEventCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact-dedup on an id column: duplicates arriving within
    * the watermark horizon are dropped; state for ids older than the
    * watermark is evicted (bounded memory). The streaming twin of the
    * corpus exact-dedup operator.
    */
  def streamingDedup(
      events: DataFrame, idCol: String, watermark: String = "1 hour",
  ): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Watermarked stream-stream interval join (event attribution):
    * each `effects` row joins the `causes` rows with the same `key`
    * whose timestamp precedes the effect's by at most
    * `maxDelayMinutes` — the classic view→click attribution shape.
    * Inputs must expose distinct column names apart from `key`
    * (pre-project/rename before calling); `causeTs`/`effectTs` name
    * each side's event-time column.
    *
    * Scale: the watermark plus the interval predicate bound BOTH
    * state stores — Spark evicts cause rows once the effect-side
    * watermark passes `causeTs + maxDelay` and effect rows once their
    * own watermark passes, so state is O(events inside the horizon),
    * the requirement for an unbounded-stream join. Inner joins emit
    * in append mode as soon as a match arrives; no watermark wait.
    */
  def intervalJoin(
      causes: DataFrame, effects: DataFrame, key: String,
      causeTs: String, effectTs: String,
      maxDelayMinutes: Int, watermark: String = "1 hour",
  ): DataFrame = {
    require(maxDelayMinutes >= 1,
      s"maxDelayMinutes $maxDelayMinutes must be >= 1 (a non-positive " +
        "window makes the join condition unsatisfiable)")
    val c = causes.withWatermark(causeTs, watermark).alias("c")
    val e = effects.withWatermark(effectTs, watermark).alias("e")
    c.join(e,
      col(s"c.$key") === col(s"e.$key") &&
        col(s"e.$effectTs") >= col(s"c.$causeTs") &&
        col(s"e.$effectTs") <=
          col(s"c.$causeTs") + expr(s"INTERVAL $maxDelayMinutes MINUTES"))
      .drop(col(s"e.$key"))
  }

  /** Stream-static decontamination: drop stream rows whose normalized
    * fingerprint ([[graft.text.TextFunctions.fingerprint]] of
    * `textCol`) appears in the static `blocklist` frame (one
    * fingerprint column named `fp`) — the streaming twin of the batch
    * contamination scan, for ingest-time filtering of benchmark text
    * arriving in a document/event stream.
    *
    * Scale: a stream-static LEFT ANTI join. The static side's SCAN
    * re-executes per micro-batch and broadcasts when small (benchmark
    * fingerprint sets are a few MB); no streaming state at all, so
    * nothing to watermark or evict. Caveat on "re-executes": a
    * file-backed frame caches its FILE LISTING (and per-file sizes)
    * at DataFrame creation — rewriting or adding files behind an
    * existing frame yields stale or failing reads. To update the
    * blocklist without restarting the query, point the frame at a
    * table format that versions its listing (Delta/Iceberg) or
    * recreate the static DataFrame and restart; in-place file swaps
    * are NOT picked up.
    */
  def decontaminateStream(
      stream: DataFrame, textCol: String, blocklist: DataFrame,
  ): DataFrame = {
    require(!stream.columns.contains("__fp"),
      "decontaminateStream reserves the column name __fp; rename it on the input")
    val fp = graft.text.TextFunctions.fingerprint(col(textCol))
    stream.withColumn("__fp", fp)
      .join(blocklist.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  final case class FunnelOut(
      user_id: Long, step_idx: Int, step: String, ts: Timestamp)

  /** Internal accumulator for [[funnelStream]] (public: Catalyst
    * encoder codegen must be able to construct it). `times` holds the
    * epoch-ms completion time of each step reached so far, in step
    * order.
    */
  final case class FunnelStepsState(times: List[Long])

  /** Streaming ordered funnel: emits `(user, step_idx, step, ts)` the
    * moment a user advances to the next funnel step — same greedy
    * earliest-first, STRICTLY-later semantics as the batch
    * [[graft.ops.Funnel]], evaluated online. Events are processed in
    * event-time order WITHIN each micro-batch; under in-order delivery
    * (or single-batch replay) the advancement times equal the batch
    * operator's. A cross-batch straggler older than an already-taken
    * step cannot rewind it — the price of O(k) state; re-run the batch
    * operator for exact retrospective funnels.
    *
    * Scale: state is k longs per user. The event-time timeout evicts
    * users idle past `idleHorizonMinutes` (funnels are campaign-scoped;
    * an evicted user who returns restarts from step 1), so state is
    * O(active users), not O(all users ever seen).
    */
  def funnelStream(
      events: Dataset[EventRow], steps: Seq[String],
      watermark: String = "2 hours", idleHorizonMinutes: Int = 1440,
  ): Dataset[FunnelOut] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct: $steps")
    require(idleHorizonMinutes >= 1,
      s"idleHorizonMinutes $idleHorizonMinutes must be >= 1")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelStepsState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[FunnelStepsState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var times = state.getOption.map(_.times).getOrElse(Nil)
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var out = List.empty[FunnelOut]
            sorted.foreach { e =>
              val next = times.length
              if (next < steps.length && e.event_type == steps(next) &&
                  (times.isEmpty || e.ts.getTime > times.last)) {
                times = times :+ e.ts.getTime
                out ::= FunnelOut(userId, next + 1, steps(next), e.ts)
              }
            }
            state.update(FunnelStepsState(times))
            val wm = state.getCurrentWatermarkMs()
            val lastSeen = sorted.lastOption.map(_.ts.getTime).getOrElse(wm)
            state.setTimeoutTimestamp(
              math.max(lastSeen + idleHorizonMinutes * 60000L, wm + 1))
            out.reverseIterator
          }
      }
  }

  /** Gap-based sessionization with `flatMapGroupsWithState`: events
    * within `gapMinutes` of each other belong to one session; a
    * session is emitted (and its state evicted) when the event-time
    * watermark passes its gap timeout.
    */
  def sessionize(
      events: Dataset[EventRow],
      gapMinutes: Int = 30,
      watermark: String = "2 hours",
  ): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(
              userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // within the gap after the end — extend forward
                case Some(s) if t >= s.last && t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                // late event inside or gap-adjacent to the session —
                // merge, extending the start backward if needed
                case Some(s) if t < s.last && t >= s.start - gapMs =>
                  cur = Some(SessionState(math.min(s.start, t), s.last,
                    s.n + 1, s.total + e.value))
                // too late to belong to the open session: emit it as
                // its own completed session (it cannot be extended —
                // anything near it is older than what we already saw)
                case Some(s) if t < s.start - gapMs =>
                  closed ::= SessionOut(userId, e.ts, e.ts, 1, e.value)
                // beyond the gap after the end — close and start anew
                case Some(s) =>
                  closed ::= SessionOut(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // a timeout at-or-before the current watermark is
              // rejected by Spark — clamp just past it (fires on the
              // next batch, which is also semantically correct: the
              // session's gap has already fully elapsed in event time)
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(s.last + gapMs, wm + 1))
            }
            closed.reverseIterator
          }
      }
  }
}
