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

  test("compact drops expired distributions (persistent Redis-EXPIRE analog)") {
    val dir = tmpDir
    val ft = fixture
    StateStore.save(ft, dir, nBuckets = 8)
    // rate 0.001 at sf0.001: 2 of the 5 dists outlive their TTL
    val params = ForgetParams(rate = 0.001, nowEpoch = 1706659200L)
    val expectedAlive = ft.alive(params).collect().map(_.getString(0)).toSet
    val allDists = ft.meta.select("dist").collect().map(_.getString(0)).toSet
    assert(expectedAlive.nonEmpty && expectedAlive != allDists,
      s"fixture must have both alive and expired dists: $expectedAlive of $allDists")
    val nAlive = StateStore.compact(spark, dir, params, nBuckets = 8)
    assert(nAlive == expectedAlive.size)
    val back = StateStore.load(spark, dir)
    assert(back.meta.select("dist").collect().map(_.getString(0)).toSet == expectedAlive)
    assert(back.counts.select("dist").distinct()
      .collect().map(_.getString(0)).toSet == expectedAlive)
    // surviving rows are untouched (compact only deletes, never rewrites values)
    val kept = expectedAlive.head
    assert(back.counts.filter(col("dist") === kept).orderBy("bin").collect()
      .sameElements(ft.counts.filter(col("dist") === kept).orderBy("bin").collect()))
  }

  test("a compact that expires EVERY dist leaves a loadable typed-empty store that still accepts upserts") {
    // an empty partitioned parquet write leaves no part directories, so
    // schema inference has nothing to read — the all-expired store is
    // legal state (sf0.001 hit this: rate 0.006 expires all 5 dists)
    // and every read path must type it instead of throwing
    val dir = tmpDir
    StateStore.save(fixture, dir, nBuckets = 8)
    val nAlive = StateStore.compact(spark, dir,
      ForgetParams(rate = 100.0, nowEpoch = 1706659200L), nBuckets = 8)
    assert(nAlive == 0, s"$nAlive dists survived a TTL meant to expire all")
    val back = StateStore.load(spark, dir)
    assert(back.counts.count() == 0 && back.meta.count() == 0)
    assert(StateStore.loadDist(spark, dir, "click", 8).counts.count() == 0)
    // the empty store is a working store: an upsert repopulates it
    import spark.implicits._
    val snaps = Seq(("d1", "b1", 5L, 5L, 1706659200L))
      .toDF("dist", "bin", "count", "z", "t")
    StateStore.upsertDistributions(spark, dir, snaps, nBuckets = 8)
    val re = StateStore.load(spark, dir)
    assert(re.counts.count() == 1 && re.meta.count() == 1)
    assert(re.meta.head().getAs[Double]("rate") == 0.5) // reference default
  }

  test("warm restart: stream resumes from store-loaded initial state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{BinSnapshot, ForgetStream, IncrEvent}
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir
    val T0 = 1706659200L
    val ft = fixture
    StateStore.save(ft, dir, nBuckets = 8)
    val restored = StateStore.load(spark, dir)
    val clickBefore = ft.counts.filter(col("dist") === "click")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap

    val mem = MemoryStream[IncrEvent]
    val out = ForgetStream(mem.toDS(), ForgetStream.Params(rate = 0.0),
      clock = () => T0, withExpiry = false,
      initial = Some(ForgetStream.initialStateFrom(restored.counts, restored.meta)))
    val q = out.writeStream.outputMode(
        org.apache.spark.sql.streaming.OutputMode.Update())
      .format("memory").queryName("warm_restart").start()
    try {
      mem.addData(IncrEvent("click", "1", 5L, T0))
      q.processAllAvailable()
      val got = spark.table("warm_restart").as[BinSnapshot].collect()
        .map(r => r.bin -> r.count).toMap
      // the store's full click distribution came back as state: bin "1"
      // merged on top of its stored count, every other stored bin intact
      assert(got == clickBefore.updated("1", clickBefore.getOrElse("1", 0L) + 5L))
      assert(got.size == clickBefore.size || !clickBefore.contains("1"))
    } finally q.stop()
  }

  test("streaming write-back: micro-batches replace whole distributions in the store") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{ForgetStream, IncrEvent}
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir
    val T0 = 1706659200L
    StateStore.save(fixture, dir, nBuckets = 8)
    val beforeView = StateStore.load(spark, dir).counts
      .filter(col("dist") === "view").orderBy("bin").collect()

    val mem = MemoryStream[IncrEvent]
    val out = ForgetStream(mem.toDS(), ForgetStream.Params(rate = 0.0),
      clock = () => T0, withExpiry = false)
    val q = StateStore.streamInto(out, dir,
      Files.createTempDirectory("graft_wb_ckpt_").toString, nBuckets = 8)
    try {
      // batch 1: the stream takes ownership of "click" (replacing the
      // batch-written rows — the stream's state IS the dist now) and
      // creates a brand-new distribution
      mem.addData(IncrEvent("click", "1", 5L, T0), IncrEvent("newdist", "x", 3L, T0))
      q.processAllAvailable()
      val after1 = StateStore.load(spark, dir)
      assert(after1.counts.filter(col("dist") === "click")
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap == Map("1" -> 5L))
      assert(after1.counts.filter(col("dist") === "newdist")
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap == Map("x" -> 3L))
      // untouched dist in an untouched-or-rewritten bucket survives intact
      assert(after1.counts.filter(col("dist") === "view").orderBy("bin")
        .collect().sameElements(beforeView))
      // meta: new z/t from the stream, rate preserved / defaulted
      val meta1 = after1.meta.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
      assert(meta1("click") == (5L, 0.5))
      assert(meta1("newdist") == (3L, 0.5))

      // batch 2: stream state carries bin 1 forward; store shows the FULL
      // surviving set after the second micro-batch
      mem.addData(IncrEvent("click", "2", 1L, T0))
      q.processAllAvailable()
      val after2 = StateStore.load(spark, dir)
      assert(after2.counts.filter(col("dist") === "click")
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap ==
        Map("1" -> 5L, "2" -> 1L))
    } finally q.stop()
  }
}
