package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence that AQE's skew-join mitigation actually fires in this
  * engine's sessions — several query docs lean on "AQE skew-join
  * handles the middle" for hot-but-not-broadcastable keys, and that
  * claim is only real if the session config leaves AQE able to split
  * skewed partitions at runtime. Thresholds are lowered to make a
  * test-sized skew visible; the assertion is on the ADAPTIVE final
  * plan containing a skew=true sort-merge join.
  */
class SkewJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = graft.sources.GraftSession.local().newSession()
    // test-sized skew thresholds (defaults target 256 MiB partitions)
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s
  }

  test("a planted hot key splits under AQE skew-join at runtime") {
    import spark.implicits._
    // left: one hot key carrying 50k rows + a uniform tail
    val left = spark.range(50000).select(lit(0L).as("k"), col("id").as("payload"))
      .unionByName(spark.range(5000).select((col("id") % 100 + 1).as("k"), col("id").as("payload")))
    val right = spark.range(101).select(col("id").as("k"), (col("id") * 7).as("attr"))
    val joined = left.join(right, "k")
    // drive THIS dataset's QueryExecution — AQE re-plans at runtime, so
    // the skew marker only exists on the executed final plan (count()
    // would build a separate QueryExecution and leave this one unrun)
    assert(joined.collect().length == 55000)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"AQE did not mark the skewed join:\n$finalPlan")
  }
}
