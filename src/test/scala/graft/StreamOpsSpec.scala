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

  test("windowed totals align 1-day windows to the epoch") {
    import spark.implicits._
    val df = Seq(row("click", "u1", 3600), row("click", "u2", 90000))
      .toDF("dist", "bin", "ts")
    val res = StreamOps.windowedTotals(df, "1 day", "1 day", "0 seconds")
      .select(unix_timestamp(col("w_start")).as[Long], col("z").as[Long]).collect().toSet
    assert(res == Set((T0, 1L), (T0 + 86400, 1L)))
  }
}
