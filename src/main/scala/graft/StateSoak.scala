package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{ForgetStream, IncrEvent}

/** Dev tool: state-store capacity soak for the streaming forget-table.
  *
  * The reference's ambition is "millions of distributions" (reference
  * README.md:5); [[graft.RocksDBStreamSpec]] proves the RocksDB wiring
  * engages, but engagement != capacity. This harness pushes 10^4-10^5
  * distributions (one `flatMapGroupsWithState` state row each, gaining
  * one bin per batch) through ForgetStream on BOTH providers and prints
  * per-batch latency, state rows, and state memory, so BASELINE.md can
  * record where the default in-heap provider's growth curve bends and
  * RocksDB's stays flat (off-heap + changelog checkpoints — state bound
  * by local disk, not executor heap). Not part of the driver contract.
  *
  * Usage: runMain graft.StateSoak [nDists] [batches] [providers]
  */
object StateSoak {

  private val T0 = 1706659200L

  final case class BatchStat(batch: Int, sec: Double, stateRows: Long,
                             stateMemMB: Double, updatedRows: Long)

  private def soak(spark: SparkSession, provider: String,
                   nDists: Int, batches: Int): (Seq[BatchStat], Map[String, Long]) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    if (provider == "rocksdb") graft.sources.GraftSession.enableRocksDBStateStore(spark)
    else graft.sources.GraftSession.disableRocksDBStateStore(spark)
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft_soak_$provider").toString
    val mem = MemoryStream[IncrEvent]
    // rate ~0: nothing prunes, state only grows — the capacity worst case
    val out = ForgetStream(mem.toDS(), ForgetStream.Params(rate = 1e-9),
      clock = () => T0 + 1L, withExpiry = false)
    val q = out.writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[_], _: Long) =>
        df.count(); () // drain the batch without accumulating driver memory
      }
      .start()
    try {
      val stats = (0 until batches).map { b =>
        // every batch touches EVERY distribution and adds a new bin to
        // each: state rows stay nDists, state bytes grow linearly —
        // maximal per-batch write amplification for the store
        mem.addData((0 until nDists).map(d => IncrEvent(s"d$d", s"b$b", 1L, T0)))
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        val so = q.lastProgress.stateOperators.head
        BatchStat(b, sec, so.numRowsTotal, so.memoryUsedBytes / 1e6, so.numRowsUpdated)
      }
      val rocksMetrics = {
        import scala.jdk.CollectionConverters._
        q.lastProgress.stateOperators.head.customMetrics.asScala.collect {
          case (k, v) if k.toLowerCase.contains("rocksdb") && v.longValue() != 0L =>
            (k, v.toLong)
        }.toMap
      }
      (stats, rocksMetrics)
    } finally {
      q.stop()
      graft.sources.GraftSession.disableRocksDBStateStore(spark)
    }
  }

  def main(args: Array[String]): Unit = {
    val nDists = if (args.length > 0) args(0).toInt else 50000
    val batches = if (args.length > 1) args(1).toInt else 5
    val providers =
      if (args.length > 2) args(2).split(",").toSeq else Seq("default", "rocksdb")
    val spark = graft.sources.GraftSession.local("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")
    providers.foreach { p =>
      val (stats, rocks) = soak(spark, p, nDists, batches)
      println(f"[soak] provider=$p nDists=$nDists")
      println(f"[soak] batch   sec   stateRows   stateMemMB   updated")
      stats.foreach { s =>
        println(f"[soak] ${s.batch}%5d ${s.sec}%6.2f ${s.stateRows}%10d ${s.stateMemMB}%11.1f ${s.updatedRows}%9d")
      }
      rocks.toSeq.sortBy(_._1).foreach { case (k, v) =>
        println(s"[soak] rocksdb metric $k = $v")
      }
    }
    spark.stop()
  }
}
