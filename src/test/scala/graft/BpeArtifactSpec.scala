package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The BPE tokenizer artifact: train → save → load roundtrip, the
  * train-once handoff to apply, and the degenerate-corpus early stop
  * (a merge budget larger than the pair vocabulary must end the loop,
  * not crash it).
  */
class BpeArtifactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  test("artifact roundtrip: saved merge list loads bit-identical, in rank order") {
    import spark.implicits._
    val docs = (0L until 60L).map { i =>
      (i, "the quick brown fox jumps over the lazy dog " +
        s"stream window batch vector doc$i")
    }.toDF("doc_id", "text")
    val rounds = graft.queries.TextQueries.bpeTrainRounds(spark, docs)
    assert(rounds.length == graft.queries.TextQueries.BpeMerges)
    assert(rounds.map(_._1) == (1L to rounds.length.toLong))
    // the trajectory is monotone: every merge shrinks total pieces
    rounds.sliding(2).foreach {
      case Seq(a, b) => assert(b._5 < a._5, s"pieces did not shrink: $a -> $b")
      case _ => ()
    }
    val dir = graft.sources.TempDirs.scratch("graft_bpespec_")
    graft.sources.BpeStore.save(spark, dir, rounds)
    assert(graft.sources.BpeStore.exists(spark, dir))
    assert(graft.sources.BpeStore.load(spark, dir) == rounds)
    // overwrite with a shorter list: the artifact is replaced, not merged
    graft.sources.BpeStore.save(spark, dir, rounds.take(2))
    assert(graft.sources.BpeStore.load(spark, dir) == rounds.take(2))
  }

  test("train-once handoff: ensureArtifact is stable per corpus dir and apply's load equals the trained sequence") {
    val dir = "/root/testdata/sf0.001"
    val a1 = graft.queries.TextQueries.bpeEnsureArtifact(spark, dir)
    val a2 = graft.queries.TextQueries.bpeEnsureArtifact(spark, dir)
    assert(a1 == a2, "per-JVM stable dir must not fork")
    val loaded = graft.sources.BpeStore.load(spark, a1)
    val fresh = graft.queries.TextQueries.bpeTrainRounds(spark,
      graft.sources.Tables.documents(spark, dir))
    assert(loaded == fresh,
      "artifact diverged from a fresh training run on the same corpus")
  }

  test("degenerate corpus: merge budget outruns the pair vocabulary -> early stop, no crash") {
    import spark.implicits._
    // single repeated 2-char word: exactly ONE learnable merge (a,b);
    // afterwards every word is one symbol and no pair exists
    val tiny = Seq((1L, "ab ab ab"), (2L, "ab")).toDF("doc_id", "text")
    val rounds = graft.queries.TextQueries.bpeTrainRounds(spark, tiny)
    assert(rounds.length == 1, s"expected 1 learned round, got $rounds")
    assert((rounds.head._2, rounds.head._3) == ("a", "b"))
    assert(rounds.head._6 == 1L) // one piece type remains: "ab"
    // an all-single-char vocab has NO pair at all: zero rounds
    val none = Seq((1L, "a b c a")).toDF("doc_id", "text")
    assert(graft.queries.TextQueries.bpeTrainRounds(spark, none).isEmpty)
  }
}
