package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** Watermarked windowed aggregation: append-mode emission of finalized
  * windows, late-event drop past the watermark, batch/stream agreement.
  */
class StreamOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  private val T0 = 1706659200L // 2024-01-31T00:00:00Z, window-aligned
  private def ts(offsetSec: Long) = new Timestamp((T0 + offsetSec) * 1000L)

  private def row(dist: String, bin: String, off: Long) = (dist, bin, ts(off))

  test("streaming append: windows finalize when the watermark passes; late events drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Timestamp)]
    val events = mem.toDF().toDF("dist", "bin", "ts")
    val out = StreamOps.windowedBinCounts(events, "10 minutes", "10 minutes", "5 minutes")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("win_counts").start()
    try {
      // batch 1: two events inside window [T0, T0+600)
      mem.addData(row("click", "u1", 0), row("click", "u1", 300))
      q.processAllAvailable()
      // window not finalized yet (watermark = 300 - 300 = 0 < 600)
      assert(spark.table("win_counts").count() == 0)

      // batch 2: event at +21 min pushes watermark to 21-5=16 min > 10 min
      mem.addData(row("click", "u2", 1260))
      q.processAllAvailable()
      val emitted = spark.table("win_counts")
        .select("dist", "bin", "count").as[(String, String, Long)].collect().toSet
      assert(emitted == Set(("click", "u1", 2L)))

      // batch 3: a late event for the finalized window is discarded
      mem.addData(row("click", "u1", 60))
      q.processAllAvailable()
      assert(spark.table("win_counts").count() == 1)
    } finally q.stop()
  }

  test("batch and streaming produce the same windowed counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      row("click", "u1", 0), row("click", "u1", 300), row("view", "u2", 650),
      row("click", "u3", 1300))

    val batchDf = data.toDF("dist", "bin", "ts")
    val batchRes = StreamOps.windowedBinCounts(batchDf, "10 minutes", "10 minutes", "5 minutes")
      .select("w_start", "dist", "bin", "count")
      .as[(Timestamp, String, String, Long)].collect().toSet

    val mem = MemoryStream[(String, String, Timestamp)]
    val out = StreamOps.windowedBinCounts(
      mem.toDF().toDF("dist", "bin", "ts"), "10 minutes", "10 minutes", "5 minutes")
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("win_parity").start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      val streamRes = spark.table("win_parity")
        .select("w_start", "dist", "bin", "count")
        .as[(Timestamp, String, String, Long)].collect().toSet
      assert(streamRes == batchRes)
    } finally q.stop()
  }

  test("session windows merge within the gap, close at last+gap, finalize on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Timestamp)]
    val events = mem.toDF().toDF("dist", "bin", "ts")
    val out = StreamOps.sessionCounts(events, "200 seconds", "10 seconds")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_counts").start()
    try {
      // one session: gaps of 100s < 200s merge; a second bin is isolated
      mem.addData(row("click", "u1", 0), row("click", "u1", 100),
        row("click", "u1", 200), row("click", "u2", 50))
      q.processAllAvailable()
      assert(spark.table("sess_counts").count() == 0) // nothing finalized yet
      // event far in the future pushes the watermark past both sessions
      mem.addData(row("click", "u1", 100000))
      q.processAllAvailable()
      val got = spark.table("sess_counts")
        .select(col("bin"), unix_timestamp(col("s_start")),
          unix_timestamp(col("s_end")), col("n"))
        .as[(String, Long, Long, Long)].collect().toSet
      // u1: one session [T0, T0+200+200), 3 events; u2: singleton
      assert(got == Set(
        ("u1", T0, T0 + 400L, 3L),
        ("u2", T0 + 50L, T0 + 250L, 1L)))
    } finally q.stop()
  }

  test("streaming ingestion dedup: redeliveries within the watermark drop, state expires after it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val events = mem.toDF().toDF("event_id", "dist", "ts")
    val out = StreamOps.dedupWithinWatermark(events, Seq("event_id"), "100 seconds")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_stream").start()
    try {
      // first delivery + an in-batch duplicate
      mem.addData((1L, "click", ts(0)), (1L, "click", ts(0)), (2L, "view", ts(10)))
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
      // redelivery in a later micro-batch, still inside the watermark
      mem.addData((1L, "click", ts(5)))
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
      // advance the watermark far past id 1's expiry, then redeliver:
      // state for id 1 is gone, so the "duplicate" passes — exactly the
      // documented dropDuplicatesWithinWatermark contract (dedup within
      // the delivery-delay bound, bounded state; NOT forever-dedup)
      mem.addData((99L, "click", ts(100000)))
      q.processAllAvailable()
      mem.addData((1L, "click", ts(100010)))
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 4)
    } finally q.stop()
  }

  test("ingestion dedup on a batch frame coincides with plain dropDuplicates") {
    import spark.implicits._
    val df = Seq((1L, "click", ts(0)), (1L, "click", ts(5)), (2L, "view", ts(10)))
      .toDF("event_id", "dist", "ts")
    val got = StreamOps.dedupWithinWatermark(df, Seq("event_id"), "100 seconds")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L))
  }

  test("session window boundary: an event exactly at previous + gap MERGES") {
    import spark.implicits._
    // Spark's merge condition is non-strict at the session end — an event
    // at ts == prev + gap joins the session (verified here, mirrored by
    // the ft_sessions oracle's strictly-greater break condition) — while
    // one microsecond past the gap starts a new session.
    val df = Seq(row("click", "u1", 0), row("click", "u1", 200)).toDF("dist", "bin", "ts")
    val res = StreamOps.sessionCounts(df, "200 seconds", "0 seconds")
      .select(unix_timestamp(col("s_start")).as[Long], col("n").as[Long])
      .collect().toSet
    assert(res == Set((T0, 2L)))
    val df2 = Seq(row("click", "u1", 0), row("click", "u1", 201)).toDF("dist", "bin", "ts")
    val res2 = StreamOps.sessionCounts(df2, "200 seconds", "0 seconds")
      .select(unix_timestamp(col("s_start")).as[Long], col("n").as[Long])
      .collect().toSet
    assert(res2 == Set((T0, 1L), (T0 + 201L, 1L)))
  }

  test("windowed totals align 1-day windows to the epoch") {
    import spark.implicits._
    val df = Seq(row("click", "u1", 3600), row("click", "u2", 90000))
      .toDF("dist", "bin", "ts")
    val res = StreamOps.windowedTotals(df, "1 day", "1 day", "0 seconds")
      .select(unix_timestamp(col("w_start")).as[Long], col("z").as[Long]).collect().toSet
    assert(res == Set((T0, 1L), (T0 + 86400, 1L)))
  }

  test("stream-stream interval join: in-window clicks attribute, outside-window never match") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    val cdf = clicks.toDF().toDF("c_user", "click_id", "c_ts")
    val bdf = buys.toDF().toDF("user_id", "buy_id", "b_ts")
    val joined = StreamOps.intervalJoin(bdf, "b_ts", cdf, "c_ts",
        Seq("user_id" -> "c_user"), "30 minutes", "10 minutes")
      .select(col("buy_id"), col("click_id"))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attrib").start()
    try {
      clicks.addData((1L, 101L, ts(0)), (2L, 201L, ts(0)))
      buys.addData((1L, 11L, ts(600))) // 10 min after u1's click: inside 30 min
      q.processAllAvailable()
      def got = spark.table("attrib").as[(Long, Long)].collect().toSet
      assert(got == Set((11L, 101L)))

      buys.addData((2L, 21L, ts(7200))) // 2 h after u2's click: outside window
      q.processAllAvailable()
      assert(got == Set((11L, 101L)))

      // a click AFTER the purchase must not attribute to it
      clicks.addData((1L, 102L, ts(900)))
      q.processAllAvailable()
      assert(got == Set((11L, 101L)))

      // but a later purchase picks up both of u1's in-window clicks
      buys.addData((1L, 12L, ts(1500)))
      q.processAllAvailable()
      assert(got == Set((11L, 101L), (12L, 101L), (12L, 102L)))
    } finally q.stop()
  }

  test("left-outer interval join: unmatched purchase emits with nulls after the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    val cdf = clicks.toDF().toDF("c_user", "click_id", "c_ts")
    val bdf = buys.toDF().toDF("user_id", "buy_id", "b_ts")
    val joined = StreamOps.intervalJoin(bdf, "b_ts", cdf, "c_ts",
        Seq("user_id" -> "c_user"), "30 minutes", "10 minutes", "left_outer")
      .select(col("buy_id"), col("click_id"))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attrib_outer").start()
    try {
      clicks.addData((1L, 101L, ts(0)))
      buys.addData((1L, 11L, ts(600)), (2L, 21L, ts(600))) // u2 has no click
      q.processAllAvailable()
      def got = spark.table("attrib_outer")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      // inner match emits immediately; the unmatched row waits on the watermark
      assert(got == Set((11L, 101L)))

      // push the watermark far past buy 21's join window => null row emits
      clicks.addData((9L, 901L, ts(7200)))
      buys.addData((9L, 91L, ts(7200)))
      q.processAllAvailable()
      assert(got.contains((21L, -1L)), s"unmatched purchase never emitted: $got")
    } finally q.stop()
  }

  test("interval join state is bounded by watermark + lookback, not stream length") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    val cdf = clicks.toDF().toDF("c_user", "click_id", "c_ts")
    val bdf = buys.toDF().toDF("user_id", "buy_id", "b_ts")
    val joined = StreamOps.intervalJoin(bdf, "b_ts", cdf, "c_ts",
        Seq("user_id" -> "c_user"), "10 minutes", "1 minute")
      .select(col("buy_id"), col("click_id"))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attrib_state").start()
    try {
      def stateRows: Long = {
        val p = q.lastProgress
        if (p == null) 0L else p.stateOperators.map(_.numRowsTotal).sum
      }
      // feed 20 batches, each 1 hour later — every batch's rows age far
      // past watermark + lookback before the next arrives
      var peak = 0L
      for (h <- 0 until 20) {
        val t0 = h * 3600L
        clicks.addData((1L, 1000L + h, ts(t0)), (2L, 2000L + h, ts(t0)))
        buys.addData((1L, 100L + h, ts(t0 + 60)))
        q.processAllAvailable()
        if (h >= 3) peak = math.max(peak, stateRows)
      }
      // 60 click rows + 20 buy rows entered; bounded state must hold
      // only the un-evicted tail (one batch's worth + watermark slack),
      // nowhere near the 80-row total
      assert(peak > 0L, "no state observed — join not stream-stream?")
      assert(peak <= 12L, s"state grew with the stream: peak $peak rows")
      // every in-window pair still attributed exactly once
      assert(spark.table("attrib_state").count() == 20L)
    } finally q.stop()
  }

  test("streaming funnel: finalizes on watermark, handles late earlier views, equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val W1 = 6L * 3600 * 1000 // 6h click window
    val W2 = 24L * 3600 * 1000 // 24h purchase window
    val events = Seq(
      // u1: full chain inside both windows
      (1L, "view", ts(0)), (1L, "click", ts(600)), (1L, "purchase", ts(1200)),
      // u2: only click is OUTSIDE the 6h window -> stalls at view
      (2L, "view", ts(0)), (2L, "click", ts(7 * 3600)),
      // u3: view only
      (3L, "view", ts(0)),
      // u4: click+purchase arrive BEFORE their view (out of order); the
      // late earlier view must make the buffered candidates eligible
      (4L, "click", ts(1800)), (4L, "purchase", ts(3600)))
    val lateView = (4L, "view", ts(900))

    val in = MemoryStream[(Long, String, Timestamp)]
    val df = in.toDF().toDF("user_id", "event_type", "ts")
    // 8h delay: the late view (15 min) stays inside the watermark even
    // after batch 1's 7h max event time
    val out = StreamOps.funnel(df, W1, W2, "8 hours")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("funnel_st").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(lateView)
      q.processAllAvailable()
      assert(spark.table("funnel_st").count() == 0, "finalized before watermark")
      // push the watermark past every t_view + 30h (+8h delay)
      in.addData((99L, "view", ts(40 * 3600)))
      q.processAllAvailable()
      in.addData((99L, "click", ts(41 * 3600)))
      q.processAllAvailable()
      val got = spark.table("funnel_st")
        .as[(Long, Timestamp, Long, Timestamp, Timestamp)].collect().toSet
      val batch = StreamOps.funnel(
          (events :+ lateView).toDF("user_id", "event_type", "ts"), W1, W2, "8 hours")
        .as[(Long, Timestamp, Long, Timestamp, Timestamp)].collect()
        .filter(_._1 != 99L).toSet
      assert(got == batch, s"stream $got != batch $batch")
      val reached = got.map(r => r._1 -> r._3).toMap
      assert(reached == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 3L))
      // RETURNING user: u1 engages again long after finalization; the
      // tombstone must swallow it — still exactly one u1 row (and the
      // batch chain over the full data agrees: the new events sit
      // outside u1's original windows)
      val ret = Seq((1L, "view", ts(48 * 3600)), (1L, "click", ts(49 * 3600)),
        (99L, "view", ts(80 * 3600)), (99L, "view", ts(81 * 3600)))
      in.addData(ret: _*)
      q.processAllAvailable()
      in.addData((99L, "view", ts(82 * 3600)))
      q.processAllAvailable()
      val rows1 = spark.table("funnel_st")
        .as[(Long, Timestamp, Long, Timestamp, Timestamp)].collect()
        .filter(_._1 == 1L)
      assert(rows1.length == 1, s"returning user re-emitted: ${rows1.toList}")
      val batch2 = StreamOps.funnel(
          ((events :+ lateView) ++ ret).toDF("user_id", "event_type", "ts"),
          W1, W2, "8 hours")
        .as[(Long, Timestamp, Long, Timestamp, Timestamp)].collect()
        .filter(_._1 == 1L)
      assert(rows1.toSet == batch2.toSet, "returning-user stream != batch")
    } finally q.stop()
  }

  test("streaming funnel: tombstone TTL evicts state; a user returning after it starts a fresh funnel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val W1 = 6L * 3600 * 1000
    val W2 = 24L * 3600 * 1000
    val in = MemoryStream[(Long, String, Timestamp)]
    val df = in.toDF().toDF("user_id", "event_type", "ts")
    // 10h tombstone TTL: finalized state self-evicts once the watermark
    // advances 10h past finalization — the bounded-state trade
    val out = StreamOps.funnel(df, W1, W2, "8 hours", tombstoneTtlMs = 10L * 3600 * 1000)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("funnel_ttl").start()
    try {
      def u1rows() = spark.table("funnel_ttl")
        .as[(Long, Timestamp, Long, Timestamp, Timestamp)].collect()
        .filter(_._1 == 1L).toList
      in.addData((1L, "view", ts(0)), (1L, "click", ts(600)), (1L, "purchase", ts(1200)))
      q.processAllAvailable()
      // finalize u1: wm = 40h - 8h = 32h > view + 30h horizon
      in.addData((99L, "view", ts(40 * 3600)))
      q.processAllAvailable()
      assert(u1rows().map(_._3) == List(3L), "u1 not finalized once")
      // evict the tombstone: wm = 43h > 32h + 10h TTL
      in.addData((99L, "view", ts(51 * 3600)))
      q.processAllAvailable()
      // u1 returns AFTER the TTL: a fresh funnel must start and emit a
      // SECOND row (view+click only -> reached 2) once finalized
      in.addData((1L, "view", ts(52 * 3600)), (1L, "click", ts(53 * 3600)))
      q.processAllAvailable()
      in.addData((99L, "view", ts(91 * 3600))) // wm = 83h > 52h + 30h
      q.processAllAvailable()
      val rows = u1rows()
      assert(rows.map(_._3).sorted == List(2L, 3L),
        s"expected the original chain plus a fresh post-TTL funnel, got $rows")
    } finally q.stop()
  }

  test("funnelReplay: staged out-of-order micro-batch fold equals the batch funnel") {
    import spark.implicits._
    val W1 = 6L * 3600 * 1000
    val W2 = 24L * 3600 * 1000
    val events = Seq(
      (1L, "view", ts(0), 0), (1L, "click", ts(600), 0), (1L, "purchase", ts(1200), 0),
      (2L, "view", ts(0), 0), (2L, "click", ts(7 * 3600), 0),
      (3L, "view", ts(0), 1),
      // u4's click+purchase land a batch BEFORE the earlier view — the
      // replay's held-back re-evaluation path
      (4L, "click", ts(1800), 0), (4L, "purchase", ts(3600), 0),
      (4L, "view", ts(900), 1))
    val df = events.toDF("user_id", "event_type", "ts", "batch")
    val replay = StreamOps.funnelReplay(df, W1, W2, col("batch"),
        Seq(T0 * 1000L, T0 * 1000L + 3600L * 1000L, Long.MaxValue / 2))
      .as[(Long, Timestamp, Long, Timestamp, Timestamp)].collect().toSet
    val batch = StreamOps.funnel(
        df.select("user_id", "event_type", "ts"), W1, W2, "8 hours")
      .as[(Long, Timestamp, Long, Timestamp, Timestamp)].collect().toSet
    assert(replay == batch, s"replay $replay != batch $batch")
    assert(replay.map(r => r._1 -> r._3).toMap ==
      Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 3L))
  }

  test("interval join on batch frames equals the explicit range-predicate join") {
    import spark.implicits._
    val cdf = Seq((1L, 101L, ts(0)), (1L, 102L, ts(900)), (2L, 201L, ts(0)))
      .toDF("c_user", "click_id", "c_ts")
    val bdf = Seq((1L, 11L, ts(600)), (1L, 12L, ts(1500)), (2L, 21L, ts(7200)))
      .toDF("user_id", "buy_id", "b_ts")
    val viaOp = StreamOps.intervalJoin(bdf, "b_ts", cdf, "c_ts",
        Seq("user_id" -> "c_user"), "30 minutes", "10 minutes")
      .select(col("buy_id"), col("click_id")).as[(Long, Long)].collect().toSet
    val manual = bdf.join(cdf, bdf("user_id") === cdf("c_user") &&
        cdf("c_ts") <= bdf("b_ts") &&
        cdf("c_ts") >= bdf("b_ts") - expr("INTERVAL 30 minutes"))
      .select(col("buy_id"), col("click_id")).as[(Long, Long)].collect().toSet
    assert(viaOp == manual && viaOp == Set((11L, 101L), (12L, 101L), (12L, 102L)))
  }

  test("incremental funnel equals the one-shot chain and holds the watermark state bound") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val storeDir = graft.sources.TempDirs.scratch("graft_funi_spec_")
    val inc = graft.queries.RelationalQueries
      .funnelIncremental(spark, ev, Some(storeDir))
      .as[(Long, Timestamp, Long, Timestamp, Timestamp)].collect().toSeq
    val oneShot = StreamOps.funnel(ev,
        graft.queries.RelationalQueries.FunnelClickWindowHours * 3600L * 1000L,
        graft.queries.RelationalQueries.FunnelBuyWindowHours * 3600L * 1000L,
        "1 hour")
      .orderBy("user_id")
      .as[(Long, Timestamp, Long, Timestamp, Timestamp)].collect().toSeq
    assert(inc == oneShot, "incremental fold diverged from the one-shot funnel")
    // BOTH store branches must be live on this corpus (the lagging
    // watermark schedule exists for exactly this — a schedule that
    // finalized everyone would leave the pending carry-over/prune path
    // and the read-time union branch dead code, and this spec vacuous);
    // the probe is the QUERY'S OWN hasPartData, so the check cannot
    // drift from what the fold actually reads
    def hasData(p: String) = graft.queries.RelationalQueries.hasPartData(spark, p)
    assert(hasData(s"$storeDir/results"),
      "no user finalized — the maintained-results branch never ran")
    assert(hasData(s"$storeDir/pending"),
      "no user pending after the last ingest — the read-time chain branch never ran")
    // state bound: after the last ingest (watermark = Jan 6) the pending
    // buffer holds no event below wm - horizon — the watermark-lag bound
    // that keeps the buffered state bounded by lateness, not history
    val horizonMs = (graft.queries.RelationalQueries.FunnelClickWindowHours +
      graft.queries.RelationalQueries.FunnelBuyWindowHours) * 3600L * 1000L
    val floor = new Timestamp(
      java.sql.Timestamp.valueOf("2024-01-06 00:00:00").getTime - horizonMs)
    val below = spark.read.parquet(s"$storeDir/pending")
      .filter(col("ts") < lit(floor)).count()
    assert(below == 0, s"$below pending events below watermark - horizon")
    // tombstone/append discipline: every finalized user appears exactly once
    val dup = spark.read.parquet(s"$storeDir/results")
      .groupBy("user_id").count().filter(col("count") > 1).count()
    assert(dup == 0, s"$dup users finalized more than once")
    // bloom sidecar receipts: (a) loadable; (b) COMPLETE over finalized
    // ids — never a false negative, the property that makes the routed
    // tombstone check byte-exact; (c) selective — non-finalized users
    // mostly bypass the finalized scan entirely (the fp sliver is the
    // only extra exact-join traffic), which is the finalized-scan-
    // bytes drop the sidecar exists for
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(
        spark.read.parquet(s"$storeDir/bloom").head().getAs[Array[Byte]]("bf")))
    val finIds = spark.read.parquet(s"$storeDir/results")
      .select("user_id").collect().map(_.getLong(0))
    assert(finIds.nonEmpty && finIds.forall(bf.mightContain),
      "bloom sidecar missed a finalized id")
    val nonFin = ev.select("user_id").distinct()
      .join(spark.read.parquet(s"$storeDir/results").select("user_id"),
        Seq("user_id"), "left_anti")
      .collect().map(_.getLong(0)) // sf0.001 user set — spec-bounded
    val fps = nonFin.count(bf.mightContain)
    assert(nonFin.nonEmpty && fps <= math.max(2, nonFin.length / 10),
      s"$fps/${nonFin.length} non-finalized users false-positive — sidecar not selective")
  }

  test("funnel bloom resize: past-50% fill triggers a doubled rebuild that stays complete and convergent") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val storeDir = graft.sources.TempDirs.scratch("graft_fbr_spec_")
    // initial capacity 4 — far under this corpus's finalized count, so
    // the first ingest already blows past 50% fill and the maintenance
    // MUST take the resize path (doubling until half-empty)
    val inc = graft.queries.RelationalQueries
      .funnelIncremental(spark, ev, Some(storeDir), bloomItems = 4L)
      .as[(Long, Timestamp, Long, Timestamp, Timestamp)].collect().toSeq
    val oneShot = StreamOps.funnel(ev,
        graft.queries.RelationalQueries.FunnelClickWindowHours * 3600L * 1000L,
        graft.queries.RelationalQueries.FunnelBuyWindowHours * 3600L * 1000L,
        "1 hour")
      .orderBy("user_id")
      .as[(Long, Timestamp, Long, Timestamp, Timestamp)].collect().toSeq
    assert(inc == oneShot,
      "resize path broke the fold's convergence to the one-shot funnel")
    val row = spark.read.parquet(s"$storeDir/bloom").head()
    val (nItems, cap) =
      (row.getAs[Long]("n_items"), row.getAs[Long]("capacity"))
    val finIds = spark.read.parquet(s"$storeDir/results")
      .filter(col("user_id").isNotNull)
      .select("user_id").collect().map(_.getLong(0))
    // exact item accounting and the post-resize fill invariant
    assert(nItems == finIds.length.toLong,
      s"n_items $nItems != finalized count ${finIds.length}")
    assert(cap > 4L && (cap & (cap - 1L)) == 0L,
      s"capacity $cap not a doubled power of two")
    assert(2L * nItems <= cap, s"store still past 50% fill: $nItems/$cap")
    // the rebuilt bloom is COMPLETE over the finalized set — the
    // never-false-negative contract survives the re-freeze
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("bf")))
    assert(finIds.nonEmpty && finIds.forall(bf.mightContain),
      "rebuilt bloom missed a finalized id")
  }

  test("funnel bloom recovery: results-without-bloom store rebuilds from the FULL finalized set, not the batch") {
    import spark.implicits._
    // stage the crash state the bloomless fallback tolerates: a
    // results store holding earlier-finalized users A=1, B=2 with NO
    // sidecar (crash landed between the results append and the bloom
    // write). The next staged fold finalizes a NEW user C=3 in its
    // first ingest — recovery must rebuild the bloom from the STORE
    // (A, B, C), because a batch-only bloom would read A as
    // definitely-not-finalized and re-admit A's later event.
    val storeDir = graft.sources.TempDirs.scratch("graft_fbrec_spec_")
    val seeded = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L,
        null.asInstanceOf[Timestamp], null.asInstanceOf[Timestamp]),
      (2L, Timestamp.valueOf("2024-01-01 01:00:00"), 1L,
        null.asInstanceOf[Timestamp], null.asInstanceOf[Timestamp]))
      .toDF("user_id", "t_view", "reached", "t_click", "t_purchase")
    seeded.withColumn("part", pmod(col("user_id"), lit(16L)))
      .repartition(col("part"))
      .write.partitionBy("part").parquet(s"$storeDir/results")
    val ev = Seq(
      (3L, "view", Timestamp.valueOf("2024-01-01 02:00:00")), // finalizes ingest 1
      (1L, "view", Timestamp.valueOf("2024-01-22 00:00:00")), // A again — must tombstone
      (4L, "view", Timestamp.valueOf("2024-01-11 00:00:00"))) // stays pending
      .toDF("user_id", "event_type", "ts")
    val out = graft.queries.RelationalQueries
      .funnelIncremental(spark, ev, Some(storeDir))
      .collect()
    // A appears exactly once (the seeded row) — a batch-only recovery
    // bloom would re-admit A's Jan-22 view and emit a second A row
    val aRows = out.filter(_.getAs[Long]("user_id") == 1L)
    assert(aRows.length == 1, s"user A emitted ${aRows.length} rows")
    assert(aRows.head.getAs[Timestamp]("t_view") ==
      Timestamp.valueOf("2024-01-01 00:00:00"),
      "user A's seeded finalized row was overwritten")
    assert(out.map(_.getAs[Long]("user_id")).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // the rebuilt sidecar covers the WHOLE finalized set with exact
    // accounting
    val row = spark.read.parquet(s"$storeDir/bloom").head()
    assert(row.getAs[Long]("n_items") == 3L,
      s"n_items ${row.getAs[Long]("n_items")} != 3 finalized users")
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("bf")))
    assert(Seq(1L, 2L, 3L).forall(bf.mightContain),
      "recovered bloom missed a previously finalized id")
  }

  test("incremental funnel carries null-ts views to the one-shot result") {
    import spark.implicits._
    // the events contract admits null ts: a range-staged fold would
    // silently drop user 1 (only null-ts views), while the one-shot
    // chain emits their null-t_view row — the first batch's
    // isNull-inclusive filter and the prune's null-safe <=> keep them
    val ev = Seq(
      (1L, "view", null.asInstanceOf[Timestamp]),
      (1L, "click", ts(0)), // can never chain to a null view
      (2L, "view", Timestamp.valueOf("2024-01-02 00:00:00")),
      (2L, "click", Timestamp.valueOf("2024-01-02 01:00:00")))
      .toDF("user_id", "event_type", "ts")
    val w1 = graft.queries.RelationalQueries.FunnelClickWindowHours * 3600L * 1000L
    val w2 = graft.queries.RelationalQueries.FunnelBuyWindowHours * 3600L * 1000L
    val inc = graft.queries.RelationalQueries.funnelIncremental(spark, ev)
      .collect().map(_.toSeq).toSeq
    val one = StreamOps.funnel(ev, w1, w2, "1 hour")
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(inc == one, s"null-ts divergence: $inc vs $one")
    assert(inc.exists(r => r.head == 1L && r(1) == null),
      "the all-null-view user's row went missing")
  }

  test("bulk-staged funnel store is content-identical to the staged ingests") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val stagedDir = graft.sources.TempDirs.scratch("graft_fbulk_a_")
    val bulkDir = graft.sources.TempDirs.scratch("graft_fbulk_b_")
    graft.queries.RelationalQueries.funnelIncremental(spark, ev, Some(stagedDir))
    graft.queries.RelationalQueries.funnelBulkStage(spark, bulkDir, ev)
    def rows(p: String) = spark.read.parquet(p)
      .collect().map(_.toSeq).toSet
    for (leg <- Seq("results", "pending"))
      assert(rows(s"$stagedDir/$leg") == rows(s"$bulkDir/$leg"),
        s"funnel $leg diverged between staged and bulk staging")
    // the sidecar must be BIT-identical (bloom insert is an idempotent
    // OR, so one build over the full finalized set at the grown
    // capacity equals the per-batch merge), geometry row included
    val a = spark.read.parquet(s"$stagedDir/bloom").head()
    val b = spark.read.parquet(s"$bulkDir/bloom").head()
    assert(a.getAs[Long]("n_items") == b.getAs[Long]("n_items") &&
      a.getAs[Long]("capacity") == b.getAs[Long]("capacity"),
      "bloom geometry diverged")
    assert(java.util.Arrays.equals(
      a.getAs[Array[Byte]]("bf"), b.getAs[Array[Byte]]("bf")),
      "bloom bit pattern diverged between staged merge and bulk build")
  }

  test("bulk-staged retention stores are content-identical to the staged ingests") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val stagedDir = graft.sources.TempDirs.scratch("graft_rbulk_a_")
    val bulkDir = graft.sources.TempDirs.scratch("graft_rbulk_b_")
    graft.queries.RelationalQueries.retentionIngestStaged(spark, stagedDir, ev)
    graft.queries.RelationalQueries.retentionBulkStage(spark, bulkDir, ev)
    def rows(p: String) = spark.read.parquet(p)
      .collect().map(_.toSeq).toSet
    for (leg <- Seq("cohort", "pairs"))
      assert(rows(s"$stagedDir/$leg") == rows(s"$bulkDir/$leg"),
        s"retention $leg diverged between staged and bulk staging")
  }
}
