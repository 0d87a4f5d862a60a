package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Poisson

/** One `/incr` request: distribution, bin, weight, event-time seconds. */
final case class IncrEvent(dist: String, bin: String, n: Long, tsSec: Long)

/** Per-distribution streaming state — the live analog of the reference's
  * three Redis keys (counts sorted-set, `._Z`, `._T`;
  * goforget/redis_utils.go:222-233).
  */
final case class DistState(counts: Map[String, Long], z: Long, t: Long)

/** Emitted snapshot row after each state update. */
final case class BinSnapshot(dist: String, bin: String, count: Long, z: Long, t: Long)

/** Structured-Streaming forget-table: `flatMapGroupsWithState` keyed by
  * distribution, mirroring the reference's update-worker loop
  * (goforget/redis_utils.go:124-196):
  *
  *   - increments merge into the counts map, bump Z, SETNX T
  *   - every update lazily decays the distribution (seeded Poisson — the
  *     reference's stochastic semantics, but replay-stable so micro-batch
  *     retries converge) and prunes empty bins
  *   - the state timeout is set to the O9 expiry formula
  *     `(sigma + eta) * eta`, `eta = sqrt(maxCount / rate)` — on timeout
  *     the state is removed, exactly Redis `EXPIRE` of all three keys
  *     (goforget/redis_utils.go:184-189)
  *
  * The checkpointed state store replaces the reference's WATCH/MULTI
  * optimistic concurrency: exactly-once state commits per micro-batch.
  * For the 100 TB ambition run with the RocksDB state store provider
  * (unbounded bins-per-dist stay off-heap and incremental-checkpoint).
  */
object ForgetStream {

  final case class Params(rate: Double, prune: Boolean = true, sigma: Double = 2.0)

  /** Pure state transition: merge a batch of increments, then decay.
    * `nowSec` is the processing time injected by the caller (tests pass a
    * fixed clock; production passes the micro-batch time).
    */
  def transition(dist: String, incrs: Seq[IncrEvent], prev: Option[DistState],
                 nowSec: Long, p: Params): DistState = {
    val base = prev.getOrElse(DistState(Map.empty, 0L, incrs.headOption.map(_.tsSec).getOrElse(nowSec)))
    // ZINCRBY + INCRBY: counts and Z grow by the batch's increments
    val merged = incrs.foldLeft(base.counts) { (m, e) =>
      m.updated(e.bin, m.getOrElse(e.bin, 0L) + e.n)
    }
    val z = base.z + incrs.map(_.n).sum
    // lazy decay at read-repair time (UpdateDistribution: Fill -> Decay ->
    // Normalize; goforget/redis_utils.go:146-152)
    val dt = math.max(0L, nowSec - base.t)
    val decayed = merged.map { case (bin, count) =>
      val seed = scala.util.hashing.MurmurHash3.stringHash(s"$dist:$bin").toLong ^ (nowSec << 20)
      val raw = Poisson.decayAmount(count, p.rate, dt, seed)
      val l =
        if (raw >= count) { if (p.prune) count else count - 1 }
        else raw
      bin -> (count - l)
    }
    val pruned = if (p.prune) decayed.filter(_._2 > 0L) else decayed
    DistState(pruned, pruned.values.sum, nowSec)
  }

  /** Expiry timeout (seconds) for a state snapshot — O9. */
  def expirySec(s: DistState, p: Params): Long = {
    val maxCount = if (s.counts.isEmpty) 0L else s.counts.values.max
    val eta = math.sqrt(maxCount.toDouble / p.rate)
    ((p.sigma + eta) * eta).toLong
  }

  def updateFn(p: Params, clock: () => Long, withExpiry: Boolean = true)(
      dist: String, events: Iterator[IncrEvent],
      state: GroupState[DistState]): Iterator[BinSnapshot] = {
    if (state.hasTimedOut) {
      // Redis EXPIRE fired: the distribution self-destructs.
      state.remove()
      Iterator.empty
    } else {
      val now = clock()
      val next = transition(dist, events.toSeq, state.getOption, now, p)
      if (next.z == 0L && p.prune) {
        // empty after decay: DISCARD branch (goforget/redis_utils.go:158-161)
        state.remove()
        Iterator.empty
      } else {
        state.update(next)
        if (withExpiry)
          state.setTimeoutDuration(math.max(1L, expirySec(next, p)) * 1000L)
        next.counts.iterator.map { case (bin, c) => BinSnapshot(dist, bin, c, next.z, next.t) }
      }
    }
  }

  /** Wire a stream of increments into the stateful forget-table.
    *
    * @param withExpiry true (production) arms ProcessingTimeTimeout so
    *        idle distributions self-destruct like Redis EXPIRE. Note the
    *        engine then schedules continuous timeout-check micro-batches;
    *        deterministic tests pass false (the expiry formula itself is
    *        covered by pure-function tests on [[expirySec]]).
    */
  def apply(events: Dataset[IncrEvent], p: Params,
            clock: () => Long = () => System.currentTimeMillis() / 1000L,
            withExpiry: Boolean = true): Dataset[BinSnapshot] = {
    implicit val stateEnc = Encoders.product[DistState]
    implicit val outEnc = Encoders.product[BinSnapshot]
    val timeout =
      if (withExpiry) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.dist)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(updateFn(p, clock, withExpiry))
  }
}
