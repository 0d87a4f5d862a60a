package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: exercises SparkEntry.entry exactly as the driver
  * does (rows > 0 on sf0.001) and prints a small sample.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(12, truncate = false)
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
