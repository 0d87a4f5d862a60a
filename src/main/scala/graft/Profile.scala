package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Diagnostic main for the optimization rounds: run named queries with a
  * SparkListener that attributes every Spark job's wall time to its call
  * site, so a composite query's cost (staged index builds, checkpoints,
  * repacks, the final checksum) decomposes without touching query code.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Profile q1 q2"
  * Not part of the driver contract; bench methodology lives in Bench.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Profile <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.GraftSession.local(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val unknown = args.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobStart.put(js.jobId, (site, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobStart.get(je.jobId)).foreach { case (site, t0) =>
          lines.add(f"  [job ${je.jobId}%4d] ${(je.time - t0) / 1000.0}%7.2fs  $site")
        }
      }
    })

    // one warmup pass at the smallest SF so JIT noise doesn't swamp the
    // per-job attribution of the timed pass
    val warmDir = "/root/testdata/sf0.001"
    args.foreach { name =>
      if (new java.io.File(warmDir).isDirectory)
        try Bench.force(SparkEntry.queries(name)(spark, warmDir))
        catch { case _: Throwable => () }
      lines.clear()
      val t0 = System.nanoTime()
      Bench.force(SparkEntry.queries(name)(spark, sfDir))
      val total = (System.nanoTime() - t0) / 1e9
      // drain asynchronously-completing listeners
      Thread.sleep(300)
      println(f"==== $name%s  total ${total}%.2fs ====")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
