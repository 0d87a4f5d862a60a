package graft

import org.apache.spark.sql.functions._

import graft.sources.SegmentStore

/** Dev tool (not part of the driver contract): wall-clock + size
  * receipt for an additive store under SUSTAINED takedowns. Each run
  * ingests a fresh user cohort's event partials and retracts the
  * cohort from two runs earlier (negated partials — the zero-read
  * takedown), landing through `appendWithPolicy(dropCancelled = true)`
  * so the policy's folds also reclaim the cancelled keys. The live
  * population is therefore BOUNDED (~2 cohorts) while the all-time
  * retraction history grows linearly with N.
  *
  * Two failure modes this soaks against: per-run cost coupling to the
  * retraction HISTORY (flat marginal s/run is the receipt that a
  * run's cost is its batch + the bounded fold), and physical store
  * size tracking history instead of the live population (bounded
  * physical rows across N = the zero-drop reclaim working through the
  * policy, not just in a hand-run compact).
  */
object RetractionSoak {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4, 8, 16, 32)
    val spark = graft.sources.GraftSession.local("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")

    val CohortUsers = 200L
    val EventsPerUser = 5
    val MaxSegments = 4
    // one cohort's per-key partials: EventsPerUser events per user,
    // split over two event types — deterministic, so the retraction
    // batch (sign = -1) cancels it EXACTLY
    def cohort(r: Int, sign: Int) = spark
      .range(r * CohortUsers, (r + 1) * CohortUsers)
      .select(explode(sequence(lit(1), lit(EventsPerUser))).as("j"), col("id"))
      .groupBy(
        concat(lit("t"), pmod(col("j"), lit(2))).as("dist"),
        col("id").cast("string").as("bin"))
      .agg((count(lit(1)) * sign).as("count"))

    def stage(runs: Int): (Double, Long, Long) = {
      val path = s"${graft.sources.TempDirs.scratch("graft_rsoak_")}/segments"
      val t0 = System.nanoTime()
      (0 until runs).foreach { r =>
        val batch =
          if (r >= 2) cohort(r, 1).unionByName(cohort(r - 2, -1))
          else cohort(r, 1)
        SegmentStore.appendWithPolicy(batch, path, Seq("dist", "bin"),
          "count", MaxSegments, dropCancelled = true)
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val st = SegmentStore.tombstoneStats(spark, path,
        Seq("dist", "bin"), "count").head()
      (secs, st.getAs[Long]("physical_rows"), st.getAs[Long]("n_keys"))
    }
    stage(4) // warm-up (session + codegen)
    val rows = sizes.map { n =>
      val (secs, phys, keys) = stage(n)
      println(f"""{"runs":$n,"secs":$secs%.2f,"physical_rows":$phys,"logical_keys":$keys,"secs_per_run":${secs / n}%.3f}""")
      (n, secs, phys)
    }
    val marg = rows.sliding(2).map { case Seq((n1, s1, _), (n2, s2, _)) =>
      f"${(s2 - s1) / (n2 - n1)}%.3f s/run over runs $n1->$n2"
    }.mkString("; ")
    println(s"marginal: $marg")
    // the receipt's size claim, stated: physical rows at the largest N
    // must be within one policy window of the live population, not N-coupled
    spark.stop()
  }
}
