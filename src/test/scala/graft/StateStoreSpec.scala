package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ForgetParams, ForgetTable}
import graft.sources.{StateStore, Tables}

/** Bucketed persistent layout: round-trip fidelity and single-dist
  * partition pruning (one bucket directory scanned, not all).
  */
class StateStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  private def tmpDir = Files.createTempDirectory("graft_state_").toString

  private def fixture: ForgetTable =
    ForgetTable.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))

  test("save/load round-trips counts and meta exactly") {
    val dir = tmpDir
    val ft = fixture
    StateStore.save(ft, dir, nBuckets = 8)
    val back = StateStore.load(spark, dir)
    assert(back.counts.orderBy("dist", "bin").collect()
      .sameElements(ft.counts.orderBy("dist", "bin").collect()))
    assert(back.meta.orderBy("dist").collect()
      .sameElements(ft.meta.orderBy("dist").collect()))
  }

  test("loadDist prunes to one bucket partition") {
    val dir = tmpDir
    StateStore.save(fixture, dir, nBuckets = 8)
    val one = StateStore.loadDist(spark, dir, "click", nBuckets = 8)
    val formatted = one.counts.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // partition filter present and only matching-bucket files selected
    assert(formatted.contains("PartitionFilters: [isnotnull(dist_bucket"), formatted)
    assert(formatted.contains("PushedFilters: [IsNotNull(dist), EqualTo(dist,click)"), formatted)
    // values: identical to filtering the in-memory table
    val expected = fixture.counts.filter(col("dist") === "click")
      .orderBy("bin").collect()
    assert(one.counts.orderBy("bin").collect().sameElements(expected))
  }

  test("single-dist query over the store matches the unpartitioned path") {
    val dir = tmpDir
    val ft = fixture
    StateStore.save(ft, dir, nBuckets = 8)
    val params = ForgetParams(rate = 0.002, nowEpoch = 1706659200L)
    val fromStore = StateStore.loadDist(spark, dir, "click", 8).dist(params).collect()
    val direct = ft.dist(params, Some("click")).collect()
    assert(fromStore.sameElements(direct))
  }
}
