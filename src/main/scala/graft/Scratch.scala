package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing/debug main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.sources.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    names.foreach { n =>
      if (explain) {
        println(s"========== $n ==========")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      } else {
        val t0 = System.nanoTime()
        val cnt = try SparkEntry.queries(n)(spark, sfDir).count()
                  catch { case e: Throwable => println(s"FAIL $n: $e"); -1L }
        println(f"[scratch] $n%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$cnt")
      }
    }
    spark.stop()
  }
}
