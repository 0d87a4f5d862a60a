package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarked late-event handling.
  *
  * The reference has no windowing at all — its exponential decay IS the
  * alternative to sliding windows (SURVEY.md §2.2 "Streaming"): instead
  * of dropping observations at a window edge, counts fade continuously.
  * An engine replacing it in a large-scale pipeline needs both forms, so
  * this exposes the standard Structured-Streaming surface:
  *
  *   - tumbling/sliding windows over the event-time column,
  *   - a watermark bounding state: windows older than
  *     `max(event time) - watermark` are finalized and their state
  *     dropped; events arriving later than that are discarded.
  *
  * Works identically on batch DataFrames (the watermark is a no-op
  * there), which is what makes the batch query oracle-checkable while
  * the streaming path is covered by StreamOpsSpec.
  */
object StreamOps {

  /** Per-(dist, bin) counts in event-time windows.
    *
    * @param events    input with columns (dist, bin, ts: timestamp)
    * @param windowDur window length, e.g. "1 day"
    * @param slideDur  slide, equal to windowDur for tumbling windows
    * @param watermark lateness bound, e.g. "1 hour" (streaming only)
    */
  def windowedBinCounts(events: DataFrame, windowDur: String,
                        slideDur: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur), col("dist"), col("bin"))
      .agg(count(lit(1)).as("count"))
      .select(
        col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("dist"), col("bin"), col("count"))

  /** Per-dist window totals (the windowed analog of Z). */
  def windowedTotals(events: DataFrame, windowDur: String,
                     slideDur: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur), col("dist"))
      .agg(count(lit(1)).as("z"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("dist"), col("z"))

  /** Streaming ingestion dedup: drop events whose id was already seen
    * within the watermark horizon — the exactly-once guard in front of
    * an at-least-once source (a Kafka redelivery, a producer retry).
    * `dropDuplicatesWithinWatermark` keys state by `idCols` only and
    * expires each key once the watermark passes its event time +
    * delay, so state is bounded by the delivery-delay bound instead of
    * growing with the stream (plain `dropDuplicates` on a stream holds
    * every id forever). Batch: falls back to plain dropDuplicates —
    * batch inputs have no redelivery, so the semantics coincide.
    *
    * @param events  input with an event-time `ts` column
    * @param idCols  the identity columns (e.g. "event_id")
    * @param watermark lateness/redelivery bound, e.g. "1 hour"
    */
  def dedupWithinWatermark(events: DataFrame, idCols: Seq[String],
                           watermark: String): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(idCols)
    else events.dropDuplicates(idCols)

  /** Stream-stream event-time INTERVAL JOIN — the attribution primitive:
    * each left row (a purchase) matches right rows (clicks) of the same
    * key whose event time falls in `[leftTs - lookback, leftTs]`.
    *
    * The time-range predicate is what makes this viable as a
    * stream-stream join: with both sides watermarked, Spark derives a
    * state-eviction bound from watermark + lookback and drops buffered
    * rows that can no longer match — WITHOUT the range bound a
    * stream-stream inner join must buffer both streams forever. At
    * pipeline scale the state held per key is `lookback` worth of
    * events, independent of stream length.
    *
    * On batch frames the watermark is a no-op and this is a plain
    * equi-join with a range predicate — the form the driver oracle
    * checks (`rel_interval_join`), so batch and stream run the same
    * code path.
    *
    * @param keys (leftKeyCol, rightKeyCol) equality pairs — at least one
    *             is required to keep the join an equi-join (hash/SMJ by
    *             key), never a time-only theta join
    * @param joinType "inner" (default) or "left_outer" — outer emits the
    *                 unmatched left row with nulls once the watermark
    *                 passes its join window (streaming) / immediately
    *                 (batch), the shape an attribution-gap audit needs
    */
  def intervalJoin(left: DataFrame, leftTs: String,
                   right: DataFrame, rightTs: String,
                   keys: Seq[(String, String)],
                   lookback: String, watermark: String,
                   joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "interval join requires at least one key equality")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val keyCond = keys.map { case (lk, rk) => l(lk) === r(rk) }.reduce(_ && _)
    val cond = keyCond &&
      r(rightTs) <= l(leftTs) &&
      r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lookback")
    l.join(r, cond, joinType)
  }

  /** Per-(dist, bin) event-time SESSIONS: maximal event runs where each
    * gap to the previous event stays under `gap`; the session closes at
    * `last event + gap`. Spark's `session_window` aggregation — the
    * dynamic-window form tumbling/sliding can't express, and the shape
    * user-activity analysis actually wants.
    *
    * Scale note: session merging inherently needs all of a key's events
    * together in event-time order — that ordering constraint is the
    * semantics, not an implementation accident. Keying by the COMPOSITE
    * (dist, bin) keeps the shuffle spread over bins (no hot-dist
    * straggler, same argument as `counts`' groupBy key); sessionizing
    * per dist alone would concentrate a hot distribution on one task.
    *
    * Streaming: requires the watermark; finalized sessions emit in
    * Append mode once the watermark passes their close (state for open
    * sessions is bounded by the watermark delay). Batch: watermark is a
    * no-op, every session finalizes — which is what makes the query
    * oracle-checkable.
    */
  def sessionCounts(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("dist"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("dist"), col("bin"), col("n"))
}
