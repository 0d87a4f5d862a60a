package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BinSnapshot, DistState, ForgetStream, IncrEvent}

/** Streaming forget-table: pure transition semantics + an end-to-end
  * micro-batch run through MemoryStream, checked against the same
  * increments replayed through the pure transition (batch equivalence).
  */
class ForgetStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  private val T0 = 1706659200L
  private val params = ForgetStream.Params(rate = 0.5)

  test("transition merges increments like ZINCRBY/INCRBY (no elapsed time => no decay)") {
    val incrs = Seq(
      IncrEvent("colors", "red", 3L, T0),
      IncrEvent("colors", "blue", 1L, T0),
      IncrEvent("colors", "red", 2L, T0))
    val s = ForgetStream.transition("colors", incrs, None, T0, params)
    assert(s.counts == Map("red" -> 5L, "blue" -> 1L))
    assert(s.z == 6L)
    assert(s.t == T0)
  }

  test("transition decays existing state before the new epoch (lazy read-repair)") {
    val prev = DistState(Map("red" -> 100L), 100L, T0)
    // rate 0.5, dt huge => wipe-out guard fires, prune empties the bin
    val s = ForgetStream.transition("colors", Seq.empty, Some(prev), T0 + 100000L, params)
    assert(s.counts.isEmpty && s.z == 0L)
    // no-prune floors at 1
    val s2 = ForgetStream.transition("colors", Seq.empty, Some(prev), T0 + 100000L,
      params.copy(prune = false))
    assert(s2.counts == Map("red" -> 1L) && s2.z == 1L)
  }

  test("expirySec matches the O9 formula") {
    val s = DistState(Map("a" -> 3L), 3L, T0)
    // eta = sqrt(3/0.5) = sqrt(6); ttl = floor((2+eta)*eta) = 10
    assert(ForgetStream.expirySec(s, params) == 10L)
    assert(ForgetStream.expirySec(DistState(Map.empty, 0L, T0), params) == 0L)
  }

  test("end-to-end micro-batch run equals pure-transition replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fixedNow = T0 + 10L
    val mem = MemoryStream[IncrEvent]
    val out = ForgetStream(mem.toDS(), params, clock = () => fixedNow, withExpiry = false)
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("ft_stream").start()
    try {
      val batch = Seq(
        IncrEvent("colors", "red", 30L, T0),
        IncrEvent("colors", "blue", 10L, T0),
        IncrEvent("pets", "cat", 7L, T0))
      mem.addData(batch: _*)
      q.processAllAvailable()
      val got = spark.table("ft_stream").as[BinSnapshot].collect()
        .map(r => (r.dist, r.bin) -> (r.count, r.z)).toMap

      val colorsExpected = ForgetStream.transition("colors",
        batch.filter(_.dist == "colors"), None, fixedNow, params)
      val petsExpected = ForgetStream.transition("pets",
        batch.filter(_.dist == "pets"), None, fixedNow, params)
      val expected =
        colorsExpected.counts.map { case (b, c) => ("colors", b) -> (c, colorsExpected.z) } ++
          petsExpected.counts.map { case (b, c) => ("pets", b) -> (c, petsExpected.z) }
      assert(got == expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("second micro-batch continues from checkpointed state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fixedNow = T0
    val mem = MemoryStream[IncrEvent]
    val out = ForgetStream(mem.toDS(), params, clock = () => fixedNow, withExpiry = false)
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("ft_stream2").start()
    try {
      mem.addData(IncrEvent("d", "x", 5L, T0))
      q.processAllAvailable()
      mem.addData(IncrEvent("d", "x", 2L, T0), IncrEvent("d", "y", 1L, T0))
      q.processAllAvailable()
      val rows = spark.sql("select * from ft_stream2").as[BinSnapshot].collect()
      // last update for (d,x) reflects both batches: 5 + 2 (no decay, dt=0)
      val lastX = rows.filter(r => r.bin == "x").maxBy(_.z)
      assert(lastX.count == 7L)
      assert(lastX.z == 8L)
    } finally q.stop()
  }
}
