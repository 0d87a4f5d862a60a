package graft

/** Diagnostic main for the optimization rounds: run named queries while a
  * sampler thread polls the driver thread's stack every few ms and
  * aggregates wall time by the innermost `graft.` frame — so a composite
  * query's cost (staged index builds, checkpoints, repacks, the final
  * checksum force) decomposes by helper call site regardless of whether
  * the time is Catalyst planning, AQE job waits, or file I/O.
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

    val main = Thread.currentThread()
    val agg = new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
    @volatile var sampling = false
    val intervalMs = 5L
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = main.getStackTrace
          // innermost frame in graft code that is NOT the harness
          val frame = st.find { e =>
            val c = e.getClassName
            c.startsWith("graft.") && !c.startsWith("graft.Profile") &&
              !c.startsWith("graft.Bench")
          }.map(e => s"${e.getClassName.stripPrefix("graft.")}.${e.getMethodName}" +
            s"(${e.getFileName}:${e.getLineNumber})")
            .getOrElse {
              // no graft frame: attribute to the outermost interesting spark op
              st.find { e =>
                val c = e.getClassName
                c.contains("Dataset") || c.contains("DataFrameWriter") ||
                  c.contains("QueryExecution") || c.contains("SparkPlan")
              }.map(e => s"[spark] ${e.getClassName.split('.').last}.${e.getMethodName}")
                .getOrElse("[other]")
            }
          agg.computeIfAbsent(frame, _ => Array(0L))(0) += 1
        }
        Thread.sleep(intervalMs)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val warmDir = "/root/testdata/sf0.001"
    args.foreach { name =>
      if (new java.io.File(warmDir).isDirectory)
        try Bench.force(SparkEntry.queries(name)(spark, warmDir))
        catch { case _: Throwable => () }
      agg.clear()
      val t0 = System.nanoTime()
      sampling = true
      Bench.force(SparkEntry.queries(name)(spark, sfDir))
      sampling = false
      val total = (System.nanoTime() - t0) / 1e9
      println(f"==== $name%s  total ${total}%.2fs ====")
      import scala.jdk.CollectionConverters._
      agg.asScala.toSeq.sortBy(-_._2(0)).take(25).foreach { case (site, n) =>
        println(f"  ${n(0) * intervalMs / 1000.0}%7.2fs  $site")
      }
    }
    spark.stop()
  }
}
