package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-user click buffer cap for the streaming funnel. Exactness holds
    * while a user buffers fewer candidate stage events than this; the
    * cap keeps a pathological bot user's state bounded (the smallest
    * candidates are kept — the ones the min-chain can still pick).
    */
  final val FunnelBufferCap = 256

  /** Streaming FUNNEL — the stateful form of `rel_funnel`: per user,
    * first view, first click strictly after it within `clickWindowMs`,
    * first purchase strictly after that within `buyWindowMs`.
    *
    * Semantics & state bound: a user's funnel is immutable once the
    * watermark passes `t_view + clickWindow + buyWindow` (both stage
    * windows closed; a later-arriving view is necessarily younger than
    * the watermark, hence younger than t_view, and cannot change the
    * min), so the state finalizes on EventTimeTimeout at exactly that
    * instant and emits ONE row per viewing user (Append mode) — ever:
    * a finalized user leaves a tView tombstone behind, so a returning
    * user's later activity (necessarily above the watermark, hence
    * outside the emitted funnel's windows) is drained without
    * emitting a second row. By default the tombstone is retained
    * forever (strict one-row-per-user-ever, state grows with distinct
    * viewing users); passing `tombstoneTtlMs > 0` arms an eviction
    * timeout on the tombstone instead, bounding state at the cost that
    * a user returning after the TTL starts a fresh funnel. Until
    * then the state buffers the min view plus candidate click/purchase
    * times, pruned by the bounds that only tighten as t_view decreases
    * (clicks above `t_view + clickWindow` can never re-enter the
    * window; with no view yet, candidates below the current watermark
    * can never follow a future view, which must sit at or above the
    * watermark) and capped at [[FunnelBufferCap]] smallest. Out-of-order
    * delivery within the watermark is therefore handled exactly — a
    * late-arriving earlier view re-evaluates the buffered candidates —
    * which is what the batch-equivalence spec exercises.
    *
    * On batch frames this computes the same chain relationally (the
    * driver-oracle-checked `rel_funnel` shape: per-user partial-min
    * aggregates before 1-row-per-user joins), so batch and stream share
    * one contract; `StreamOpsSpec` pins stream == batch on the same
    * events.
    *
    * Output: (user_id, t_view, reached, t_click, t_purchase), missing
    * stages as epoch sentinels — the null-free driver shape.
    */
  def funnel(events: DataFrame, clickWindowMs: Long, buyWindowMs: Long,
             watermark: String, tombstoneTtlMs: Long = 0L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    if (!events.isStreaming) {
      val ev = events.select(col("user_id"), col("event_type"), col("ts"))
      def stage(t: String) = ev.filter(col("event_type") === t)
        .select("user_id", "ts")
      val v = stage("view").groupBy("user_id").agg(min("ts").as("t_view"))
      val c = stage("click").join(v, "user_id")
        .filter(col("ts") > col("t_view")
          && col("ts") <= col("t_view") + expr(s"INTERVAL $clickWindowMs MILLISECONDS"))
        .groupBy("user_id").agg(min("ts").as("t_click"))
      val p = stage("purchase").join(c, "user_id")
        .filter(col("ts") > col("t_click")
          && col("ts") <= col("t_click") + expr(s"INTERVAL $buyWindowMs MILLISECONDS"))
        .groupBy("user_id").agg(min("ts").as("t_purchase"))
      val epoch = lit("1970-01-01 00:00:00").cast("timestamp")
      v.join(c, Seq("user_id"), "left_outer")
        .join(p, Seq("user_id"), "left_outer")
        .select(col("user_id"), col("t_view"),
          (lit(1L) + when(col("t_click").isNull, 0L).otherwise(1L)
            + when(col("t_purchase").isNull, 0L).otherwise(1L)).as("reached"),
          coalesce(col("t_click"), epoch).as("t_click"),
          coalesce(col("t_purchase"), epoch).as("t_purchase"))
    } else {
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      val w1 = clickWindowMs * 1000L // micros
      val w2 = buyWindowMs * 1000L
      events
        .withWatermark("ts", watermark)
        .select(col("user_id").cast("long"), col("event_type"), col("ts"))
        .as[(Long, String, java.sql.Timestamp)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout)(
          FunnelFn.fn(w1, w2, tombstoneTtlMs * 1000L))
        .toDF()
    }
  }

  /** Deterministic micro-batch REPLAY of the funnel's stateful
    * transition — the driver-gateable form of the streaming branch (the
    * [[graft.streaming.ForgetStream]] `ft_stream_replay` treatment
    * applied to [[FunnelFn]]): every event is assigned to a staged
    * micro-batch by `batchCol` (0-based, dense), the batches are folded
    * through the LITERAL `FunnelFn.fn` transition via Spark's public
    * [[org.apache.spark.sql.streaming.TestGroupState]] harness, and the
    * watermark follows the FIXED `wmScheduleMs` (entry i = the
    * watermark in force AFTER batch i: below-watermark arrivals in
    * batch i+1 are dropped pre-fn exactly like the streaming runtime,
    * and armed EventTimeTimeouts fire once the schedule passes them —
    * so stage an out-of-order arrival by scheduling its batch's
    * watermark below its event time). The last entry should sit past
    * every funnel horizon so all states finalize and emit.
    *
    * Replacing the runtime's data-derived watermark with a fixed
    * schedule is what makes the fold bit-deterministic (the same reason
    * `ft_stream_replay` doubles its clock); the funnel's finalization
    * proof — state immutable once the watermark passes
    * `t_view + both windows` — holds for ANY monotone schedule, so the
    * replay converges to the batch `rel_funnel` result by construction.
    * Scale shape: one shuffle on user_id, then the per-user fold is
    * row-local and batch-bounded; output is 1 row per viewing user.
    */
  def funnelReplay(events: DataFrame, clickWindowMs: Long, buyWindowMs: Long,
                   batchCol: Column, wmScheduleMs: Seq[Long]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w1 = clickWindowMs * 1000L // micros
    val w2 = buyWindowMs * 1000L
    events
      .select(col("user_id").cast("long"), col("event_type"), col("ts"),
        batchCol.cast("int").as("batch"))
      .as[(Long, String, java.sql.Timestamp, Int)]
      .groupByKey(_._1)
      .flatMapGroups { (user: Long, it: Iterator[(Long, String, java.sql.Timestamp, Int)]) =>
        FunnelFn.replayUser(user, it.toSeq, w1, w2, wmScheduleMs)
      }
      .toDF()
  }
}

/** State + transition for [[StreamOps.funnel]]. Times are epoch micros;
  * `tView == Long.MaxValue` means no view yet.
  */
final case class FunnelSt(tView: Long, clicks: List[Long], buys: List[Long],
                          done: Boolean = false)

final case class FunnelRow(user_id: Long, t_view: java.sql.Timestamp,
                           reached: Long, t_click: java.sql.Timestamp,
                           t_purchase: java.sql.Timestamp)

private[streaming] object FunnelFn {
  import org.apache.spark.sql.streaming.GroupState

  /** One user's deterministic micro-batch fold for
    * [[StreamOps.funnelReplay]]: drive the literal [[fn]] through
    * [[org.apache.spark.sql.streaming.TestGroupState]] (the public
    * state harness the streaming runtime semantics are specified
    * against), batch by batch, mimicking the runtime's order of
    * operations — late-drop below the in-force watermark, data
    * invocation, watermark advance to the schedule, timeout invocation
    * once the armed timestamp falls below the new watermark. Timeout
    * timestamps behave like the runtime's: cleared on every data
    * invocation unless the function re-arms (fn always re-arms live
    * states; tombstones deliberately don't).
    */
  def replayUser(user: Long, evs: Seq[(Long, String, java.sql.Timestamp, Int)],
                 w1: Long, w2: Long, wmScheduleMs: Seq[Long]): Iterator[FunnelRow] = {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val out = scala.collection.mutable.ArrayBuffer.empty[FunnelRow]
    var stateOpt: Option[FunnelSt] = None
    var timeout: Option[Long] = None
    var wm = 0L
    def invoke(events: Iterator[(Long, String, java.sql.Timestamp)],
               timedOut: Boolean): Unit = {
      val tgs = TestGroupState.create[FunnelSt](
        stateOpt.map(Optional.of[FunnelSt]).getOrElse(Optional.empty[FunnelSt]()),
        GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(wm), timedOut)
      out ++= fn(w1, w2)(user, events, tgs)
      if (tgs.isRemoved) { stateOpt = None; timeout = None }
      else {
        if (tgs.isUpdated) stateOpt = Some(tgs.get)
        timeout =
          if (tgs.getTimeoutTimestampMs.isPresent)
            Some(tgs.getTimeoutTimestampMs.get.asInstanceOf[Long])
          else None
      }
    }
    val byBatch = evs.groupBy(_._4)
    wmScheduleMs.zipWithIndex.foreach { case (wmAfter, b) =>
      val live = byBatch.getOrElse(b, Nil)
        .filter(e => e._3.getTime >= wm) // the runtime's pre-fn late drop
        .map(e => (e._1, e._2, e._3))
      if (live.nonEmpty) invoke(live.iterator, timedOut = false)
      wm = math.max(wm, wmAfter)
      // "timeout occurs when the watermark advances beyond the set
      // timestamp" — fn's re-arm guard keeps new timestamps above the
      // current watermark, so one firing pass per advance suffices
      if (timeout.exists(_ < wm)) invoke(Iterator.empty, timedOut = true)
    }
    out.iterator
  }

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L

  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  private def finalize(user: Long, st: FunnelSt, w1: Long, w2: Long): Iterator[FunnelRow] =
    if (st.tView == Long.MaxValue) Iterator.empty
    else {
      val tc = st.clicks.filter(t => t > st.tView && t <= st.tView + w1)
        .sorted.headOption
      val tp = tc.flatMap(c => st.buys.filter(t => t > c && t <= c + w2)
        .sorted.headOption)
      val reached = 1L + (if (tc.isDefined) 1L else 0L) + (if (tp.isDefined) 1L else 0L)
      Iterator.single(FunnelRow(user, toTs(st.tView), reached,
        toTs(tc.getOrElse(0L)), toTs(tp.getOrElse(0L))))
    }

  def fn(w1: Long, w2: Long, tombTtlUs: Long = 0L)(
      user: Long, it: Iterator[(Long, String, java.sql.Timestamp)],
      state: GroupState[FunnelSt]): Iterator[FunnelRow] =
    if (state.hasTimedOut) {
      val st = state.get
      if (st.done) {
        // tombstone TTL fired: evict. From here a returning user's
        // events start a FRESH funnel — the bounded re-emission window
        // the TTL knob trades for bounded state.
        state.remove()
        Iterator.empty
      } else if (st.tView == Long.MaxValue) {
        // never viewed: nothing emitted, buffer drops entirely — a
        // future view starts a legitimately fresh funnel
        state.remove()
        Iterator.empty
      } else {
        // keep a tombstone (tView only) so a returning user's later
        // activity — necessarily above the watermark, hence above
        // tView + both windows — can neither change the emitted funnel
        // nor re-emit a second row. One row per viewing user, ever:
        // the batch contract. The tombstone is the price of
        // exactly-once emission (a few dozen bytes per viewing user,
        // the same trade a streaming dedup's key state makes). With
        // tombTtlUs > 0 the tombstone self-evicts TTL past the current
        // watermark — state stays bounded for long-running deployments
        // at the cost that a user who returns after the TTL re-emits a
        // fresh funnel row; with the default 0 it is retained forever
        // (the strict one-row-ever contract).
        state.update(FunnelSt(st.tView, Nil, Nil, done = true))
        if (tombTtlUs > 0L)
          state.setTimeoutTimestamp(
            state.getCurrentWatermarkMs() + tombTtlUs / 1000L + 1L)
        finalize(user, st, w1, w2)
      }
    } else {
      var st = state.getOption.getOrElse(FunnelSt(Long.MaxValue, Nil, Nil))
      if (st.done) {
        // finalized user: drain and ignore — no timeout is re-armed,
        // so the tombstone never fires or re-emits
        it.foreach(_ => ())
        Iterator.empty
      } else {
      it.foreach { case (_, typ, ts) =>
        val t = micros(ts)
        typ match {
          case "view" => if (t < st.tView) st = st.copy(tView = t)
          case "click" => st = st.copy(clicks = t :: st.clicks)
          case "purchase" => st = st.copy(buys = t :: st.buys)
          case _ => ()
        }
      }
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // candidate bounds that only tighten: with a view, nothing above
      // tView + w1 (+ w2 for buys) can ever enter a window; without
      // one, nothing below the watermark can follow a future view
      val (cUb, floor) =
        if (st.tView == Long.MaxValue) (Long.MaxValue, wmUs)
        else (st.tView + w1, Long.MinValue)
      st = st.copy(
        clicks = st.clicks.filter(t => t <= cUb && t >= floor)
          .sorted.take(StreamOps.FunnelBufferCap),
        buys = st.buys.filter(t =>
            (cUb == Long.MaxValue || t <= cUb + w2) && t >= floor)
          .sorted.take(StreamOps.FunnelBufferCap))
      if (st.tView == Long.MaxValue && st.clicks.isEmpty && st.buys.isEmpty) {
        if (state.exists) state.remove()
        Iterator.empty
      } else {
        state.update(st)
        val doneAtMs =
          if (st.tView == Long.MaxValue)
            // nothing can finalize yet; park the timeout one full funnel
            // horizon past the newest buffered candidate (event-time
            // anchored — the first-batch watermark is still epoch 0, so
            // anchoring on the watermark would park in the past and
            // drop the buffer spuriously)
            (st.clicks ++ st.buys).max / 1000L + (w1 + w2) / 1000L + 1L
          else (st.tView + w1 + w2) / 1000L + 1L
        state.setTimeoutTimestamp(
          math.max(doneAtMs, state.getCurrentWatermarkMs() + 1L))
        Iterator.empty
      }
      }
    }
}
