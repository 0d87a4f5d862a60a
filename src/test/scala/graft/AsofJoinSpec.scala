package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

/** The as-of join's determinism contract on the cases native ASOF
  * implementations leave unspecified: exact-timestamp matches, ties on
  * the right side, no-match rows, and multiple left rows per key.
  */
class AsofJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  private val T0 = 1706659200L
  private def ts(off: Long) = new Timestamp((T0 + off) * 1000L)

  private def frames = {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts(50)),  // after r1/r2, before r3
      (101L, 1L, ts(20)),  // exactly AT r2's ts — r2 must match (<=)
      (102L, 1L, ts(5)),   // before every right row: no match
      (103L, 2L, ts(99))   // key with no right rows at all
    ).toDF("p_id", "k", "p_ts")
    val right = Seq(
      (10L, 1L, ts(10), 1.0),
      (11L, 1L, ts(20), 2.0), // tie on ts with r12
      (12L, 1L, ts(20), 3.0), // same ts, higher id — must win the tie
      (13L, 1L, ts(80), 4.0)
    ).toDF("r_id", "k", "r_ts", "r_v")
    (left, right)
  }

  test("inner: latest at-or-before match per left row; ties pick highest order; no-match drops") {
    import spark.implicits._
    val (left, right) = frames
    val got = AsofJoin.join(left, right, key = "k",
        leftTs = "p_ts", rightTs = "r_ts", rightOrder = "r_id",
        rightCols = Seq("r_id", "r_v"))
      .select("p_id", "r_id", "r_v").as[(Long, Long, Double)]
      .collect().toSet
    assert(got == Set(
      (100L, 12L, 3.0), // ts(20) tie resolved to the higher r_id
      (101L, 12L, 3.0)  // exact-instant match is eligible
    ))
  }

  test("outer: no-match left rows survive with null right columns") {
    import spark.implicits._
    val (left, right) = frames
    val got = AsofJoin.join(left, right, key = "k",
        leftTs = "p_ts", rightTs = "r_ts", rightOrder = "r_id",
        rightCols = Seq("r_id", "r_v"), inner = false)
      .select("p_id", "r_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == Set((100L, 12L), (101L, 12L), (102L, -1L), (103L, -1L)))
  }

  test("forward: earliest at-or-after match; ties pick LOWEST order; naive reference on 2k rows") {
    import spark.implicits._
    val (left, right) = frames
    val got = AsofJoin.join(left, right, key = "k",
        leftTs = "p_ts", rightTs = "r_ts", rightOrder = "r_id",
        rightCols = Seq("r_id", "r_v"), forward = true)
      .select("p_id", "r_id", "r_v").as[(Long, Long, Double)]
      .collect().toSet
    assert(got == Set(
      (100L, 13L, 4.0), // next right after ts(50)
      (101L, 11L, 2.0), // exact-instant match eligible; tie -> LOWEST id
      (102L, 10L, 1.0)  // before everything: earliest right row matches
      // 103L: key 2 has no right rows -> dropped (inner)
    ))
    // randomized-shape cross-check against a naive per-key scan
    val leftRows = (0 until 800).map { i =>
      (i.toLong, (i * 7 % 40).toLong, ts((i * 13) % 97))
    }
    val rightRows = (0 until 1200).map { j =>
      (j.toLong, (j * 11 % 40).toLong, ts((j * 17) % 97), j * 0.5)
    }
    val gotBig = AsofJoin.join(leftRows.toDF("p_id", "k", "p_ts"),
        rightRows.toDF("r_id", "k", "r_ts", "r_v"), key = "k",
        leftTs = "p_ts", rightTs = "r_ts", rightOrder = "r_id",
        rightCols = Seq("r_id", "r_v"), forward = true)
      .select("p_id", "r_id").as[(Long, Long)].collect().toMap
    val byKey = rightRows.groupBy(_._2)
    val want = leftRows.flatMap { case (pId, k, pTs) =>
      byKey.getOrElse(k, Seq.empty)
        .filter { case (_, _, rTs, _) => !rTs.before(pTs) }
        .sortBy { case (rId, _, rTs, _) => (rTs.getTime, rId) }
        .headOption.map { case (rId, _, _, _) => pId -> rId }
    }.toMap
    assert(gotBig == want)
  }

  test("an integer rightOrder column widens instead of clashing with the sentinel") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts(50))).toDF("p_id", "k", "p_ts")
    val right = Seq((7, 1L, ts(10), 1.0), (8, 1L, ts(10), 2.0))
      .toDF("r_id", "k", "r_ts", "r_v") // r_id is Int, not Long
    val got = AsofJoin.join(left, right, key = "k",
        leftTs = "p_ts", rightTs = "r_ts", rightOrder = "r_id",
        rightCols = Seq("r_id", "r_v"))
      .select("p_id", "r_id").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 8)))
  }

  test("matches a naive per-key reference on 2k rows with engineered ts ties") {
    import spark.implicits._
    // Deterministic synthetic load: 40 keys, colliding timestamps by
    // construction (ts mod 97 buckets), so tie-break paths actually run.
    val leftRows = (0 until 800).map { i =>
      (i.toLong, (i * 7 % 40).toLong, ts((i * 13) % 97))
    }
    val rightRows = (0 until 1200).map { j =>
      (j.toLong, (j * 11 % 40).toLong, ts((j * 17) % 97), j * 0.5)
    }
    val left = leftRows.toDF("p_id", "k", "p_ts")
    val right = rightRows.toDF("r_id", "k", "r_ts", "r_v")
    val got = AsofJoin.join(left, right, key = "k",
        leftTs = "p_ts", rightTs = "r_ts", rightOrder = "r_id",
        rightCols = Seq("r_id", "r_v"))
      .select("p_id", "r_id").as[(Long, Long)].collect().toMap
    // naive reference: per left row, scan all right rows of the key
    val byKey = rightRows.groupBy(_._2)
    val want = leftRows.flatMap { case (pId, k, pTs) =>
      byKey.getOrElse(k, Seq.empty)
        .filter { case (_, _, rTs, _) => !rTs.after(pTs) }
        .sortBy { case (rId, _, rTs, _) => (rTs.getTime, rId) }
        .lastOption.map { case (rId, _, _, _) => pId -> rId }
    }.toMap
    assert(got.size == want.size)
    assert(got == want)
  }

  test("null fields on the matched right row are NOT spliced from older rows") {
    import spark.implicits._
    // r21 (the latest match) has a null r_v; the old carry-per-column
    // form would splice r20's 1.0 into the output — whole-row struct
    // carry must yield (r21, null).
    val left = Seq((1L, 1L, ts(50))).toDF("p_id", "k", "p_ts")
    val right = Seq(
      (20L, 1L, ts(10), Some(1.0)),
      (21L, 1L, ts(40), Option.empty[Double])
    ).toDF("r_id", "k", "r_ts", "r_v")
    val got = AsofJoin.join(left, right, key = "k",
        leftTs = "p_ts", rightTs = "r_ts", rightOrder = "r_id",
        rightCols = Seq("r_id", "r_v"))
      .select("p_id", "r_id", "r_v").collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 21L)
    assert(got(0).isNullAt(2), "null field must come from the matched row, not an older one")
  }

  test("joinBucketed == join on the synthetic load at several bucket widths") {
    import spark.implicits._
    val leftRows = (0 until 800).map { i =>
      (i.toLong, (i * 7 % 40).toLong, ts((i * 13) % 97))
    }
    val rightRows = (0 until 1200).map { j =>
      (j.toLong, (j * 11 % 40).toLong, ts((j * 17) % 97), j * 0.5)
    }
    val left = leftRows.toDF("p_id", "k", "p_ts")
    val right = rightRows.toDF("r_id", "k", "r_ts", "r_v")
    val want = AsofJoin.join(left, right, key = "k",
        leftTs = "p_ts", rightTs = "r_ts", rightOrder = "r_id",
        rightCols = Seq("r_id", "r_v"))
      .select("p_id", "r_id", "r_v").as[(Long, Long, Double)].collect().toSet
    for (width <- Seq(1L, 7L, 30L, 1000L)) {
      val got = AsofJoin.joinBucketed(left, right, key = "k",
          leftTs = "p_ts", rightTs = "r_ts", rightOrder = "r_id",
          rightCols = Seq("r_id", "r_v"), bucketSeconds = width)
        .select("p_id", "r_id", "r_v").as[(Long, Long, Double)].collect().toSet
      assert(got == want, s"bucketSeconds=$width")
    }
  }

  test("joinBucketed outer: parity on no-match rows; single hot key stays correct") {
    import spark.implicits._
    // ALL rows on one key — the skew shape joinBucketed exists for.
    val left = (0 until 500).map(i => (i.toLong, 1L, ts(i))).toDF("p_id", "k", "p_ts")
    val right = (0 until 300).map(j => (j.toLong, 1L, ts(j * 2 + 1), j * 1.0))
      .toDF("r_id", "k", "r_ts", "r_v")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("p_id", "r_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val want = norm(AsofJoin.join(left, right, "k", "p_ts", "r_ts", "r_id",
      Seq("r_id", "r_v"), inner = false))
    val got = norm(AsofJoin.joinBucketed(left, right, "k", "p_ts", "r_ts", "r_id",
      Seq("r_id", "r_v"), bucketSeconds = 60L, inner = false))
    assert(got == want)
    assert(got.exists(_._2 == -1L), "expected at least one no-match left row")
  }

  test("plan: single window pass, no cartesian/nested-loop fallback") {
    val (left, right) = frames
    val plan = AsofJoin.join(left, right, key = "k",
        leftTs = "p_ts", rightTs = "r_ts", rightOrder = "r_id",
        rightCols = Seq("r_id", "r_v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    val windows = plan.linesIterator.filter(l =>
      l.trim.startsWith("Window ") || l.contains("+- Window [")).toList
    assert(windows.size == 1, plan)
  }
}
