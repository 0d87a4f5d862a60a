package graft

import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries

/** Dev tool: the READ-SIDE receipt for the epoch-order / curriculum
  * artifact contract (not part of the driver contract).
  *
  * `pipe_seqs_epoch_order` / `pipe_seqs_curriculum` prove no sort is
  * run or shipped when the KEYS are produced — the key IS the order.
  * This probe drives the other half: a dataloader consuming the shipped
  * token artifact in key order, the standard sort-by-key read —
  *
  *   shipped rows  JOIN  epoch-0 keys (seq-level, broadcast)
  *     -> repartitionByRange(order_key)   (the ONE exchange)
  *     -> sortWithinPartitions(order_key, pos)  (split-local, no global
  *        sort — each split is an independent, contiguous key interval)
  *     -> consume every column (the Bench checksum harness)
  *
  * and reports rows/s at 1x/10x plus the split-balance receipt
  * (max/mean rows per split — salted uniform keys mean no hot split)
  * and a plan audit (exactly one RangePartitioning exchange, zero
  * global SortExec). Run: `runMain graft.LoaderProbe [factors...]`,
  * default 1 10. `cur` as first arg reads in CURRICULUM order instead
  * (same shape, cur_key); `mm` reads the MULTIMODAL artifact with
  * epoch keys derived by the same salted arithmetic over ITS seq
  * inventory — the key contract is generic over (shard, seq_id), so a
  * VLM loader needs no separate relation, just the same derivation.
  */
object LoaderProbe {
  def main(args: Array[String]): Unit = {
    val (mode, factorArgs) = args.toList match {
      case ("cur" | "mm") :: rest => (args.head, rest)
      case rest                   => ("epoch", rest)
    }
    val cur = mode == "cur"
    val mm = mode == "mm"
    val factors = if (factorArgs.nonEmpty) factorArgs.map(_.toInt) else List(1, 10)
    val base = "/root/testdata/sf0.1"
    val spark = graft.sources.GraftSession.local("local[8]", 16)
    spark.sparkContext.setLogLevel("WARN")

    factors.foreach { f =>
      val stage = graft.sources.TempDirs.scratch(s"graft_loadprobe${f}x_")
      ProbeStaging.stageDocuments(spark, base, stage, f)

      // ship the artifact once (not timed as part of the read)
      val exp = graft.sources.TempDirs.scratch(s"graft_loadprobe_exp${f}x_")
      PipelineQueries.exportShip(
        (if (mm) PipelineQueries.seqMmTokens(spark, stage)
         else PipelineQueries.seqTokens(spark, stage)), exp)

      val valueCols = if (mm) Seq("token_id", "patch_idx") else Seq("token_id")
      val art = spark.read.parquet(exp)
        .select(Seq(col("shard").cast("long").as("shard"), col("seq_id"),
          col("pos"), col("doc_id")) ++ valueCols.map(col): _*)

      val keyCol = if (cur) "cur_key" else "order_key"
      val keys = (
        if (cur) PipelineQueries.seqCurriculum(spark, stage)
          .select("shard", "seq_id", "cur_key")
        else if (mm)
          // the generic key derivation applied to the MM artifact's own
          // seq inventory — the same expression seqEpochOrder uses
          art.select("shard", "seq_id").distinct()
            .select(col("shard"), col("seq_id"),
              PipelineQueries.epochOrderKey(lit(0L)).as("order_key"))
        else PipelineQueries.seqEpochOrder(spark, stage)
          .filter(col("epoch") === 0L)
          .select("shard", "seq_id", "order_key")
        ).localCheckpoint(true) // seq-level, small; built once, read twice
      val nSplits = 32
      def stream = art
        .join(broadcast(keys), Seq("shard", "seq_id"))
        .repartitionByRange(nSplits, col(keyCol))
        .sortWithinPartitions(col(keyCol), col("pos"))

      // plan audit: one range exchange, zero GLOBAL sorts. Both checks
      // grep the plan STRING — under AQE the executedPlan root is an
      // AdaptiveSparkPlanExec leaf, so a typed collect over SortExec
      // would see nothing and report 0 vacuously; toString prints the
      // full initial tree (a local sort renders "], false," where a
      // global one renders "], true,").
      val planStr = stream.queryExecution.executedPlan.toString
      val nRange = planStr.linesIterator
        .count(_.contains("rangepartitioning"))
      val globalSorts = planStr.linesIterator
        .count(l => l.contains("Sort [") && l.contains("], true,"))

      // timed read: every column consumed (xxhash checksum per row,
      // xor-combined — the Bench.force discipline)
      val t0 = System.nanoTime()
      Bench.force(stream)
      val readS = (System.nanoTime() - t0) / 1e9

      // split-balance receipt over the SAME read shape. The mean is
      // over the REQUESTED split count: groupBy(pid) only returns
      // non-empty splits, and a degenerate keying that vacated most of
      // them must read as imbalance, not as a small balanced run.
      val counts = stream.withColumn("pid", spark_partition_id())
        .groupBy("pid").count()
        .collect().map(_.getLong(1))
      val nRows = counts.sum
      val maxOverMean =
        if (counts.isEmpty) 0.0
        else counts.max.toDouble / (nRows.toDouble / nSplits)

      println(f"""{"probe":"loader_read","order":"$mode%s","factor":$f,""" +
        f""""n_rows":$nRows,"read_s":$readS%.2f,""" +
        f""""rows_per_s":${nRows / readS}%.0f,"n_splits":${counts.length},""" +
        f""""max_over_mean":$maxOverMean%.3f,"range_exchanges":$nRange,""" +
        f""""global_sorts":$globalSorts}""")
    }
    spark.stop()
  }
}
