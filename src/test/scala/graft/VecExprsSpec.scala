package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** The codegen vector kernels must be BIT-identical to the interpreted
  * HOF algebra they replace — the oracle's DuckDB folds replay the HOF
  * op order, so any drift here breaks hash parity on every sim_ann /
  * dedup_embedding query.
  *
  * Inputs come from spark.range (a local relation would constant-fold
  * through ConvertToLocalRelation and bypass codegen entirely).
  */
class VecExprsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  /** Deterministic 64-dim vectors with mixed signs and magnitudes. */
  private def synthVecs(n: Int) = {
    spark.range(n.toLong).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)),
        j => (pmod(col("id") * lit(37) + j * lit(13), lit(1000)) - lit(500)).cast("double") / lit(250.0)
      ).as("v"))
  }

  test("CosineSimExpr is bit-identical to the HOF fold on 10k pairs") {
    val vecs = synthVecs(200)
    val pairs = vecs.select(col("vec_id").as("ia"), col("v").as("a"))
      .join(vecs.select(col("vec_id").as("ib"), col("v").as("b")),
        col("ia") < col("ib"))
    val rows = pairs.select(
        Dedup.cosine(col("a"), col("b")).as("kernel"),
        Dedup.cosineHof(col("a"), col("b")).as("hof"))
      .collect()
    assert(rows.length == 19900)
    // bit-equality, not epsilon: compare the raw IEEE-754 bit patterns
    val mismatches = rows.count(r =>
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) !=
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    assert(mismatches == 0)
  }

  test("LshBucketExpr is bit-identical to the per-plane HOF fold") {
    val signs = Similarity.signMatrix(6, 64)
    val vecs = synthVecs(500)
    val diff = vecs.select(
        Similarity.lshBucket(col("v"), signs).as("kernel"),
        Similarity.lshBucketHof(col("v"), signs).as("hof"))
      .where(col("kernel") =!= col("hof"))
      .count()
    assert(diff == 0L)
  }

  test("FloatToDoubleVecExpr is bit-identical to the transform(cast) HOF") {
    val vecs = spark.range(500L).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)),
        j => ((pmod(col("id") * lit(37) + j * lit(13), lit(1000)) - lit(500)) / lit(250.0)).cast("float")
      ).as("f"))
    val rows = vecs.select(
        Dedup.toDoubleVec(col("f")).as("kernel"),
        Dedup.toDoubleVecHof(col("f")).as("hof"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val k = r.getSeq[Double](0).map(java.lang.Double.doubleToRawLongBits)
      val h = r.getSeq[Double](1).map(java.lang.Double.doubleToRawLongBits)
      assert(k == h)
    }
  }

  test("kernels run inside whole-stage codegen (the HOF forms cannot)") {
    val signs = Similarity.signMatrix(6, 64)
    val df = synthVecs(10).select(
      Dedup.cosine(col("v"), col("v")).as("c"),
      Similarity.lshBucket(col("v"), signs).as("b"))
    val plan = df.queryExecution.executedPlan.toString
    // WholeStageCodegen shows as *(n) markers in the plan string
    assert(plan.contains("*("), plan)
    val hof = synthVecs(10).select(Dedup.cosineHof(col("v"), col("v")).as("c"))
      .queryExecution.executedPlan.toString
    assert(!hof.split("\n").exists(l => l.contains("*(") && l.contains("aggregate(")),
      s"HOF fold unexpectedly codegen'd — kernels may be redundant now:\n$hof")
  }
}
