package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming re-expression of the reference's incremental
  * ingestion (SURVEY.md §2 Streaming row: the `search_after` pagination
  * loop IS a resumable-cursor source; arriving hit files are the stream).
  *
  * Batch/stream parity: [[tumblingHourCounts]] over a bounded batch frame
  * equals the batch hour histogram — same plan, plus watermark-driven
  * state eviction when the input is unbounded.
  */
object StreamingOps {

  /** Streaming ingestion of raw DataJud hits: the reference's
    * `search_after` pagination loop is a resumable cursor over arriving
    * pages (SURVEY.md §2 Streaming row); re-hosted as files, that cursor
    * IS Structured Streaming's file-source offset — each new hit file is
    * a page, checkpointing replaces the cursor-repeat guards
    * (/root/reference/src/jurimetria_pipeline.py:114-158), and the whole
    * flatten tail runs unchanged on the streaming frame. */
  def streamHits(spark: org.apache.spark.sql.SparkSession, dir: String,
                 tribunal: String,
                 options: Map[String, String] = Map.empty): DataFrame =
    graft.pipeline.Hits.parseHits(
      spark.readStream.options(options)
        .schema(graft.pipeline.Hits.hitSchema).json(dir),
      lit(tribunal))

  /** Tumbling-window event counts with late-data tolerance. Works on both
    * streaming and batch frames (watermark is a no-op in batch). */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col(keyCol), col("cnt"))

  /** Sliding-window event counts: overlapping windows (one row per
    * covering window × key — windowLen/slide windows per event). Works on
    * both streaming and batch frames; the watermark bounds streaming
    * state to the horizon × key cardinality. */
  def slidingCounts(events: DataFrame, tsCol: String, keyCol: String,
                    windowLen: String = "1 hour", slide: String = "15 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col(keyCol), col("cnt"))

  /** Streaming exact dedup with bounded state: re-deliveries of the same
    * key within the watermark horizon are dropped, and the state store
    * evicts keys once the watermark passes them. Plain `dropDuplicates`
    * on a stream keeps ALL keys forever — at 100 TB/day of re-deliverable
    * ingest (the reference's paginated fetch CAN re-deliver on cursor
    * retry — /root/reference/src/jurimetria_pipeline.py:150-157), the
    * watermark-bounded variant is the only sustainable shape. Batch
    * frames pass through it unchanged semantically (watermark is a
    * no-op there). */
  def dedupWithinWatermark(df: DataFrame, tsCol: String,
                           keyCols: Seq[String],
                           watermark: String = "2 hours"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-static enrichment: the municipio broadcast lookup
    * ([[graft.pipeline.JurimetriaPipeline.enrichMunicipio]]) applied to a
    * streaming hit frame. Stream-static joins need no state: the static
    * side broadcasts to every micro-batch. */
  def enrichStreamingHits(streamedHits: DataFrame,
                          municipios: DataFrame): DataFrame =
    graft.pipeline.JurimetriaPipeline.enrichMunicipio(streamedHits, municipios)

  /** Stream-stream inner join with bounded state: both sides carry
    * watermarks and the join condition carries a time bound, so each
    * side's state store evicts rows once the other side's watermark
    * passes them — the only join shape that runs indefinitely on two
    * unbounded inputs. Here: click→view attribution within `windowSec`
    * (the streaming analog of [[graft.operators.Temporal.asofJoinBackward]];
    * the batch as-of picks THE latest click, the streaming join emits all
    * clicks inside the window — exact as-of needs the batch pass). */
  def joinWithinWindow(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTs: String, rightTs: String,
                       windowSec: Long, watermark: String = "1 hour"): DataFrame = {
    // distinct left/right key names keep the output unambiguous (and a
    // same-name condition on two frames derived from ONE source stream
    // would risk trivially-true self-join resolution); the right key is
    // dropped after the join — it equals the left key by construction
    require(leftKey != rightKey,
      "leftKey and rightKey must be distinct column names")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, col(leftKey) === col(rightKey) &&
        col(rightTs) <= col(leftTs) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $windowSec SECONDS"))
      .drop(rightKey)
  }

  /** One user's open-session accumulator. */
  case class SessionState(start: Long, last: Long, n: Long)
  /** Emitted when a session closes (gap exceeded or state timeout). */
  case class ClosedSession(user: Long, start: Long, end: Long, n: Long)
  /** Minimal event for stateful sessionization. */
  case class UserEvent(user: Long, tsMillis: Long)

  /** Streaming per-key admission quota: passes through the first `n`
    * arrivals of each key and drops the rest — the streaming face of
    * [[graft.operators.Sampling.quotaPerGroup]] (arrival order replaces
    * the deterministic hash draw; a stream gets no second pass). State is
    * one counter per key, capped at `n` — O(1) regardless of arrival
    * volume, so the store is bounded by key cardinality alone. */
  def quotaPerKey(events: Dataset[UserEvent], n: Int): Dataset[UserEvent] = {
    import events.sparkSession.implicits._
    require(n > 0, "quota must be positive")
    events
      .groupByKey(_.user)
      .flatMapGroupsWithState[Long, UserEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, it, state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val room = (n - admitted).toInt
          val batch = it.take(math.max(room, 0)).toSeq
          if (batch.nonEmpty) state.update(admitted + batch.size)
          batch.iterator
      }
  }

  /** Minimal event for token-budget admission: `toks` is the event's
    * token cost, `eventId` the within-timestamp tiebreak. */
  case class TokenEvent(user: Long, tsMillis: Long, eventId: Long, toks: Long)

  /** Streaming per-key TOKEN-budget admission: the streaming face of
    * [[graft.operators.Sampling.tokenBudgetPerSource]], as
    * [[quotaPerKey]] is of `quotaPerGroup` — admission counts the
    * tokens a mixture actually buys, not document/event counts, so a
    * key emitting long documents exhausts its budget in fewer events.
    * An event is admitted iff the tokens admitted BEFORE it are under
    * the budget (boundary event included — the same contract as the
    * batch op), so the budget can be crossed MID-batch; within a batch
    * events are processed in (tsMillis, eventId) order, making the
    * admitted set deterministic under a time-ordered drain regardless
    * of iterator order. State is one Long per key — O(1), bounded by
    * key cardinality alone. */
  def tokenBudgetPerKey(events: Dataset[TokenEvent], budget: Long): Dataset[TokenEvent] = {
    import events.sparkSession.implicits._
    require(budget > 0, "budget must be positive")
    events
      .groupByKey(_.user)
      .flatMapGroupsWithState[Long, TokenEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, it, state: GroupState[Long]) =>
          var acc = state.getOption.getOrElse(0L)
          val admitted = Seq.newBuilder[TokenEvent]
          it.toSeq.sortBy(e => (e.tsMillis, e.eventId)).foreach { e =>
            if (acc < budget) { admitted += e; acc += e.toks }
          }
          state.update(acc)
          admitted.result().iterator
      }
  }

  /** Custom-state sessionization: the streaming analog of
    * [[graft.operators.Sessions]] — gap-bounded sessions maintained in the
    * state store via flatMapGroupsWithState, emitting sessions as they
    * close. State is per-user and O(1); eviction via timeout keeps the
    * store bounded on 100 TB-scale key cardinality.
    *
    * Timeout modes (the eviction arm is the `hasTimedOut` branch):
    *  - `ProcessingTimeTimeout` — idle keys close after `gapMillis` of
    *    WALL-CLOCK silence; production default, but untestable in a
    *    bounded drain (micro-batches run back-to-back, so no idle gap
    *    ever elapses).
    *  - `EventTimeTimeout` — a session times out once the WATERMARK
    *    strictly exceeds last + gapMillis; deterministic under a
    *    time-ordered drain, so this is the arm the oracle gate exercises
    *    (`streaming_sessionize_evict`). Requires `withWatermark` on an
    *    event-time column upstream; the +1 below keeps an event landing
    *    at exactly last + gap an EXTENSION (gap ≤ gapMillis admits it),
    *    never a race with its own eviction.
    *  - `NoTimeout` — no eviction; sessions close only by gap-exceedance
    *    of a later event (the sentinel-drain design of
    *    `streaming_sessionize`). */
  def sessionize(events: Dataset[UserEvent], gapMillis: Long,
                 timeout: GroupStateTimeout =
                   GroupStateTimeout.ProcessingTimeTimeout()): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), timeout) {
        (user, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => ClosedSession(user, s.start, s.last, s.n))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(_.tsMillis)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMillis - s.last <= gapMillis =>
                  cur = Some(s.copy(last = e.tsMillis, n = s.n + 1))
                case Some(s) =>
                  closed ::= ClosedSession(user, s.start, s.last, s.n)
                  cur = Some(SessionState(e.tsMillis, e.tsMillis, 1))
                case None =>
                  cur = Some(SessionState(e.tsMillis, e.tsMillis, 1))
              }
            }
            cur.foreach { open =>
              state.update(open)
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout())
                state.setTimeoutDuration(gapMillis)
              else if (timeout == GroupStateTimeout.EventTimeTimeout())
                // clamp to watermark + 1: flatMapGroupsWithState does NOT
                // drop late rows, so a very late event can make
                // last + gap + 1 fall at or below the current watermark —
                // an un-clamped setTimeoutTimestamp THROWS there, killing
                // the query on out-of-order production streams. The
                // clamped session times out on the next watermark
                // advance, which is exactly the eviction it was due.
                state.setTimeoutTimestamp(
                  math.max(open.last + gapMillis + 1,
                    state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }
}
