package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DecayMode, ForgetParams, ForgetTable}

/** Distribution-algebra invariants over ScalaCheck-generated state tables
  * (SURVEY.md §5.3). Each property runs on a handful of generated
  * forget-tables — DataFrame evaluation is too heavy for hundreds of
  * samples, so the generator is seeded and the tables are diverse by
  * construction (empty dists excluded by generation, singleton and hot
  * distributions included).
  */
class InvariantSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  private val T0 = 1706659200L

  private val tableGen: Gen[Seq[(String, String, Long)]] = for {
    nDists <- Gen.choose(1, 6)
    rows <- Gen.sequence[Seq[Seq[(String, String, Long)]], Seq[(String, String, Long)]](
      (0 until nDists).map { d =>
        for {
          nBins <- Gen.choose(1, 40)
          counts <- Gen.listOfN(nBins, Gen.choose(1L, 5000L))
        } yield counts.zipWithIndex.map { case (c, b) => (s"d$d", s"b$b", c) }
      })
  } yield rows.flatten

  /** Deterministic samples from a seeded generator. */
  private def samples(n: Int): Seq[Seq[(String, String, Long)]] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => tableGen.apply(params, rng.Seed(20240812L + i)))
  }

  private def tableOf(rows: Seq[(String, String, Long)]): ForgetTable = {
    import spark.implicits._
    val counts = rows.toDF("dist", "bin", "count")
    val meta = rows.groupBy(_._1).map { case (d, rs) =>
      (d, rs.map(_._3).sum, T0, 0.5)
    }.toSeq.toDF("dist", "z", "t", "rate")
    new ForgetTable(counts, meta)
  }

  test("dist(): probabilities per distribution sum to 1 (or Z=0)") {
    for (rows <- samples(5)) {
      val res = tableOf(rows)
        .dist(ForgetParams(rate = 0.001, nowEpoch = T0 + 3600))
        .groupBy("dist").agg(sum("p").as("sp"), sum("count").as("z2"))
        .collect()
      res.foreach { r =>
        val (sp, z2) = (r.getDouble(1), r.getLong(2))
        if (z2 == 0L) assert(sp == 0.0, r) else assert(math.abs(sp - 1.0) < 1e-9, r)
      }
    }
  }

  test("decay is monotone non-increasing and prune keeps counts positive") {
    for (rows <- samples(5); mode <- Seq(DecayMode.Expected, DecayMode.Sampled)) {
      val ft = tableOf(rows)
      val before = rows.map { case (d, b, c) => (d, b) -> c }.toMap
      val after = ft.compacted(ForgetParams(rate = 0.05, nowEpoch = T0 + 600, mode = mode))
        .counts.collect()
      after.foreach { r =>
        val c = r.getLong(2)
        assert(c > 0L, r)
        assert(c <= before((r.getString(0), r.getString(1))), r)
      }
    }
  }

  test("no-prune floors every bin at count >= 1") {
    for (rows <- samples(3)) {
      val res = tableOf(rows)
        .decayedState(ForgetParams(rate = 1.0, nowEpoch = T0 + 1000000, prune = false))
        .collect()
      assert(res.length == rows.length) // no bin disappears
      res.foreach(r => assert(r.getLong(2) >= 1L, r))
    }
  }

  test("topK rows are a subset of the full distribution, ranked by stored count") {
    for (rows <- samples(3)) {
      val ft = tableOf(rows)
      val k = 5
      val top = ft.topK(k, ForgetParams(rate = 0.0, nowEpoch = T0)).collect()
      val full = rows.map { case (d, b, c) => (d, b) -> c }.toMap
      top.groupBy(_.getString(0)).foreach { case (_, rs) =>
        assert(rs.length <= k)
        // rnk ordering follows stored counts descending
        val byRank = rs.sortBy(_.getLong(1))
        val counts = byRank.map(r => full((r.getString(0), r.getString(2))))
        assert(counts.sameElements(counts.sorted(Ordering[Long].reverse)), rs.mkString(","))
      }
      top.foreach(r => assert(full.contains((r.getString(0), r.getString(2))), r))
    }
  }

  test("merged() preserves total mass: sum(counts) = old + increments") {
    import spark.implicits._
    for (rows <- samples(3)) {
      val ft = tableOf(rows)
      val incr = rows.take(10).map { case (d, b, _) => (d, b + "_new", 3L, T0 + 10) }
        .toDF("dist", "bin", "n", "t")
      val mergedSum = ft.merged(incr).counts.agg(sum("count")).head().getLong(0)
      val oldSum = rows.map(_._3).sum
      assert(mergedSum == oldSum + 3L * math.min(10, rows.length))
    }
  }
}
