package graft

import org.apache.spark.sql.functions._

import graft.queries.RelationalQueries

/** Dev tool: the band-dial receipt for BASELINE.md (not part of the
  * driver contract). Stages the customer table at 1x and Nx (the
  * ScaleProbe key-shift + name-follow recipe), then compares the FULL
  * four-family banded fuzzy join against the DEPLOYED band set
  * ([[RelationalQueries.FuzzyBandsDeployed]] — stride-2 dropped): the
  * per-probe best-match set must be IDENTICAL, and the receipt is the
  * clean-side gram mass the dropped family gives back.
  */
object BandDialProbe {
  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val base = "/root/testdata/sf0.1"
    val spark = graft.sources.GraftSession.local("local[8]", 16)
    spark.sparkContext.setLogLevel("WARN")
    val CustStride = 100000000L

    for (f <- Seq(1, factor)) {
      val stage = graft.sources.TempDirs.scratch("graft_banddial_")
      (0 until f).map { c =>
        spark.read.parquet(s"$base/customer.parquet")
          .withColumn("c_custkey", col("c_custkey") + lit(c.toLong * CustStride))
      }.reduce(_ unionByName _)
        .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
        .write.mode("overwrite").parquet(s"$stage/customer.parquet")

      val cust = graft.sources.Tables.customer(spark, stage)
      val q = RelationalQueries.scaledFuzzyGram(cust.count())

      def run(bands: Seq[Int]): (Map[Long, (Long, Long)], Long, Double) = {
        val t0 = System.nanoTime()
        val (_, verified) = RelationalQueries
          .fuzzyBandedVerified(spark, stage, q, bands)
        val ms = verified.filter(col("dist") >= 0)
          .select("probe_key", "c_custkey", "dist").collect()
          .groupBy(_.getAs[Long]("probe_key"))
          .view.mapValues(_.map(r => (r.getAs[Number]("dist").longValue(),
            r.getAs[Long]("c_custkey"))).min).toMap
        val mass = RelationalQueries
          .fuzzyBandedGrams(cust.select("c_custkey", "c_name"),
            "c_custkey", "c_name", q, probe = false, bands)
          .count()
        (ms.toMap, mass, (System.nanoTime() - t0) / 1e9)
      }
      val (fullSet, fullMass, tFull) = run(0 until RelationalQueries.FuzzyBands)
      val (depSet, depMass, tDep) = run(RelationalQueries.FuzzyBandsDeployed)
      val same = fullSet == depSet
      println(f"BANDS ${f}x q=$q matches full=${fullSet.size} " +
        f"deployed=${depSet.size} identical=$same " +
        f"gram_mass ${fullMass} -> ${depMass} " +
        f"(-${100.0 * (fullMass - depMass) / fullMass}%.1f%%) " +
        f"wall ${tFull}%.1f -> ${tDep}%.1f s")
      require(same, "deployed band set changed the match set at this scale")
    }
    spark.stop()
  }
}
