package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fuzzy-join fallback queue under SUSTAINED backlog: a 12-run
  * staging whose arrival rate (3 starved probes/run) permanently
  * exceeds the drain cap (2/run). Pins the queue's load-shedding
  * contract at depth, not just the driver staging's 3-run carry-over:
  * depth grows exactly linearly (one probe/run of excess), every drain
  * serves the OLDEST pending probes (the exact FIFO schedule, computed
  * by simulation), and nothing is ever dropped — overflow is deferred,
  * not lost.
  */
class QueueBacklogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  test("12-run backlog: depth linear, exact oldest-first drain schedule, nothing dropped") {
    import spark.implicits._
    val runs = 12
    val perRun = 3
    val drainCap = 2
    val cust = (1L to 50L).map(i => (i, f"Customer#$i%09d"))
      .toDF("c_custkey", "c_name")
    // probe names share no grams with the roster: every probe starves
    // under ANY cap, and the drained fallback finds zero candidates —
    // the queue mechanics are isolated from matching
    def probes(r: Int) = (1 to perRun)
      .map(j => (r * 100L + j, s"zzqqy${r}xx${j}zzqqy"))
    val batches = (1 to runs).map(r => probes(r).toDF("probe_key", "dirty_name"))
    val out = graft.queries.RelationalQueries.fuzzyQueueStaged(
      spark, cust, batches, gram = 3, dfCap = -1, drainCap = drainCap,
      storeDir = graft.sources.TempDirs.scratch("graft_qsoak_"))
      .collect()
    // every probe appears exactly once — deferred, never dropped
    assert(out.length == runs * perRun)
    assert(out.map(_.getAs[Long]("probe_key")).distinct.length == out.length)
    // FIFO simulation: each run enqueues its arrivals then serves the
    // drainCap oldest by (enq_run, probe_key)
    var pending = Vector.empty[(Long, Long)] // (enq_run, probe_key)
    val expected = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for (r <- 1 to runs) {
      pending ++= probes(r).map { case (k, _) => (r.toLong, k) }
      val (served, rest) = pending.sorted.splitAt(drainCap)
      served.foreach { case (enq, k) => expected(k) = (enq, r.toLong) }
      pending = rest
    }
    pending.foreach { case (enq, k) => expected(k) = (enq, -1L) }
    out.foreach { r =>
      val k = r.getAs[Long]("probe_key")
      assert((r.getAs[Long]("enq_run"), r.getAs[Long]("drained_run")) ==
        expected(k), s"probe $k off the FIFO schedule")
      // starved-by-construction probes never false-link
      assert(r.getAs[Long]("match_key") == -1L)
    }
    // depth after run r is exactly r (arrivals − drains = 1/run) and the
    // final backlog carries the terminal depth
    val depthByRun = out.filter(_.getAs[Long]("drained_run") > 0)
      .map(r => r.getAs[Long]("drained_run") -> r.getAs[Long]("depth_after"))
      .toMap
    (1 to runs).foreach { r =>
      assert(depthByRun(r.toLong) == r.toLong, s"depth after run $r")
    }
    val queued = out.filter(_.getAs[Long]("drained_run") == -1L)
    assert(queued.length == runs * (perRun - drainCap))
    queued.foreach(r => assert(r.getAs[Long]("depth_after") == runs.toLong))
  }
}
