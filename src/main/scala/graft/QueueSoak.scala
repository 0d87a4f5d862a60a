package graft

import org.apache.spark.sql.functions._

/** Dev tool (not part of the driver contract): wall-clock receipt for
  * the fuzzy fallback queue under SUSTAINED backlog. Stages N runs
  * whose arrival rate (3 starved probes/run) permanently exceeds the
  * drain cap (2/run) — queue depth ends at N — and times the whole
  * staged sequence at several N. If per-run cost were a function of
  * queue DEPTH (the failure mode the drain cap exists to prevent), the
  * marginal seconds-per-run would grow with N; a flat marginal rate is
  * the receipt that each run's cost is bounded by its own batch + the
  * cap-bounded drain, regardless of backlog.
  */
object QueueSoak {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(3, 6, 12, 24)
    val spark = graft.sources.GraftSession.local("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cust = (1L to 2000L).map(i => (i, f"Customer#$i%09d"))
      .toDF("c_custkey", "c_name").localCheckpoint(true)
    def stage(runs: Int): (Double, Long) = {
      val batches = (1 to runs).map(r => (1 to 3)
        .map(j => (r * 100L + j, s"zzqqy${r}xx${j}zzqqy"))
        .toDF("probe_key", "dirty_name"))
      val t0 = System.nanoTime()
      val out = graft.queries.RelationalQueries.fuzzyQueueStaged(
        spark, cust, batches, gram = 3, dfCap = -1, drainCap = 2,
        storeDir = graft.sources.TempDirs.scratch("graft_qsoak_"))
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val depth = out.map(_.getAs[Long]("depth_after")).max
      (secs, depth)
    }
    stage(3) // warm-up (session + codegen)
    val rows = sizes.map { n =>
      val (secs, depth) = stage(n)
      println(f"""{"runs":$n,"secs":$secs%.2f,"final_depth":$depth,"secs_per_run":${secs / n}%.3f}""")
      (n, secs)
    }
    val marg = rows.sliding(2).map { case Seq((n1, s1), (n2, s2)) =>
      f"${(s2 - s1) / (n2 - n1)}%.3f s/run over runs $n1->$n2"
    }.mkString("; ")
    println(s"marginal: $marg")
    spark.stop()
  }
}
