package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries

/** The prefix-filtered Jaccard join ([[DedupQueries.prefixJaccardPairs]]
  * — the measured-and-rejected AllPairs/PPJoin alternative, see its
  * scaladoc and BASELINE.md) must return EXACTLY dedup_ngram's pairs:
  * the prefix (rarest-first global order, length sz - ceil(t*sz) + 1)
  * may only prune candidate GENERATION, never results. Pins the
  * pairwise equivalence, including the float-ceil back-off (0.4*5 ->
  * 2.0000000000000004 must not over-ceil and shorten a prefix into a
  * false negative).
  */
class PrefixFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  test("prefix-filtered ngram join returns exactly the full-join pairs") {
    val dir = "/root/testdata/sf0.001"
    val full = DedupQueries.queries("dedup_ngram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val pref = DedupQueries.prefixJaccardPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(full.nonEmpty, "oracle corpus must produce near-dup pairs")
    assert(pref == full)
  }
}
