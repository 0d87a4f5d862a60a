package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ForgetTable
import graft.sources.Tables
import graft.streaming.{BinSnapshot, ForgetStream, IncrEvent}

/** End-to-end streaming ingestion from a real file source: the events
  * parquet replayed through `readStream` -> ForgetStream must land on
  * exactly the state the batch path computes from the same files
  * (rate 0 isolates ingestion semantics from decay, which has its own
  * specs). This is the production wiring: a file/Kafka increment feed
  * into the stateful forget-table.
  */
class StreamSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  test("readStream over events parquet -> ForgetStream == batch fromEvents") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"

    // Batch truth: counts via the batch constructor (no decay at rate 0).
    val batchCounts = ForgetTable.fromEvents(Tables.events(spark, dir))
      .counts.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    // Streaming: same data as an unbounded source. The file source wants
    // a directory (testdata ships single files), so stage a copy; the
    // nanos-timestamp shim applies here too (schema captured AFTER the
    // conf is set).
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_src_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("part-0.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(stage.toString).schema
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .select(
        col("event_type").as("dist"),
        col("user_id").cast("string").as("bin"),
        lit(1L).as("n"),
        expr("ts DIV 1000000000").as("tsSec"))
      .as[IncrEvent]

    val fixedNow = 1706659200L
    val out = ForgetStream(events, ForgetStream.Params(rate = 0.0),
      clock = () => fixedNow, withExpiry = false)
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("stream_ingest").start()
    try {
      q.processAllAvailable()
      val snaps = spark.table("stream_ingest").as[BinSnapshot].collect()
      // counts only grow at rate 0: the final value per key is the max
      val streamed = snaps.groupBy(s => (s.dist, s.bin))
        .map { case (k, ss) => k -> ss.map(_.count).max }
      assert(streamed == batchCounts)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
