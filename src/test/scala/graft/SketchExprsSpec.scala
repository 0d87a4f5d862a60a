package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchExprs

/** Bloom-filter prefilter semantics: never false-negative (the exactness
  * contract pipe_decontam_bloom leans on), actually selective (the scale
  * contract), and result-identical to the unfiltered plan.
  */
class SketchExprsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  test("mightContain: no false negatives over the inserted set") {
    val build = spark.range(0, 1000).select((col("id") * 7919L).as("fp"))
    val bloom = build.agg(SketchExprs.bloomFilterAgg(col("fp"), 1L << 12, 1L << 16).as("bf"))
    val missed = build.filter(!SketchExprs.mightContain(bloom, col("fp"))).count()
    assert(missed == 0L)
  }

  test("mightContain: prefilter is selective on a disjoint probe side") {
    val build = spark.range(0, 1000).select((col("id") * 7919L).as("fp"))
    val bloom = build.agg(SketchExprs.bloomFilterAgg(col("fp"), 1L << 12, 1L << 16).as("bf"))
    // probe keys offset so none are in the build set
    val probe = spark.range(0, 10000).select((col("id") * 7919L + 3L).as("fp"))
    val passed = probe.filter(SketchExprs.mightContain(bloom, col("fp"))).count()
    // ~16 bits/item sizing => fp rate well under 1%; allow 2% slack
    assert(passed < 200L, s"bloom passed $passed of 10000 disjoint keys")
  }

  test("pipe_decontam_bloom == pipe_decontam (prefilter changes volume, not results)") {
    val dir = "/root/testdata/sf0.001"
    val plain = graft.queries.PipelineQueries.queries("pipe_decontam")(spark, dir)
      .collect().map(_.toSeq).toSet
    val bloomed = graft.queries.PipelineQueries.queries("pipe_decontam_bloom")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(plain == bloomed)
  }
}
