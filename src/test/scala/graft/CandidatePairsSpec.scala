package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The hot-bucket guard in banded candidate generation: a (band, key)
  * bucket whose population exceeds the cap must be dropped BEFORE the
  * pair self-join (it is the skewed-key quadratic blowup at corpus
  * scale), while its members still pair through their other,
  * non-degenerate bands.
  */
class CandidatePairsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  private def pairs(rows: Seq[(Long, Seq[String])], cap: Int): Set[(Long, Long)] = {
    import spark.implicits._
    val df = rows.toDF("id", "keys")
    Dedup.candidatePairs(df, "id", "keys", cap).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("uncapped: every co-bucketed pair surfaces") {
    val rows = Seq(
      1L -> Seq("hot", "x1"),
      2L -> Seq("hot", "x2"),
      3L -> Seq("hot", "x2"))
    assert(pairs(rows, Int.MaxValue) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("a bucket above the cap emits no pairs; other bands still pair its members") {
    // ids 1..10 all share band-0 key "hot" (population 10 > cap 5), so
    // the 45 hot pairs must vanish; ids 1 and 2 also share band-1 key
    // "b12" (population 2), so (1,2) must survive via that band.
    val rows = (1L to 10L).map { i =>
      i -> Seq("hot", if (i <= 2) "b12" else s"b$i")
    }
    assert(pairs(rows, 5) == Set((1L, 2L)))
  }

  test("across: probe pairs only with index side, never probe x probe, never self") {
    import spark.implicits._
    val index = Seq(1L -> Seq("k1", "k2"), 2L -> Seq("k1", "x")).toDF("id", "keys")
    // probe 5 shares k1 with both index docs; probes 5 and 6 share k9
    // with EACH OTHER only (must not pair); probe 1 is an unchanged
    // re-crawl of index doc 1 (identical keys — must not self-pair,
    // but must pair with index doc 2 via k1)
    val probe = Seq(5L -> Seq("k1", "k9"), 6L -> Seq("k9", "y"),
      1L -> Seq("k1", "k2")).toDF("id", "keys")
    val got = Dedup.candidatePairsAcross(index, probe, "id", "keys", Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 5L), (2L, 5L), (2L, 1L)))
  }

  test("across: the combined-population cap matches the symmetric path's bucket membership") {
    import spark.implicits._
    // band key "hot" has combined population 6 (3 index + 3 probe) > cap 5
    // => no pairs through it; "ok" (1 index + 1 probe) survives
    val index = Seq(1L -> Seq("hot"), 2L -> Seq("hot"), 3L -> Seq("hot", "ok")).toDF("id", "keys")
    val probe = Seq(11L -> Seq("hot"), 12L -> Seq("hot"), 13L -> Seq("hot", "ok")).toDF("id", "keys")
    val got = Dedup.candidatePairsAcross(index, probe, "id", "keys", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((3L, 13L)))
  }

  test("cap at exactly the bucket population keeps the bucket") {
    val rows = (1L to 4L).map(i => i -> Seq("k", s"u$i"))
    assert(pairs(rows, 4) ==
      Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(pairs(rows, 3) == Set.empty[(Long, Long)])
  }
}
