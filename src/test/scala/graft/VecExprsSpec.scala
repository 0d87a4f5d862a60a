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

  test("int8 quant kernels are bit-identical to their HOF algebra") {
    val vecs = synthVecs(500)
    val hofMaxAbs = array_max(transform(col("v"), x => abs(x)))
    val hofScale = hofMaxAbs / lit(127.0)
    val hofDq = transform(col("v"), x => floor(x / hofScale + lit(0.5)) * hofScale)
    val dq = graft.functions.Int8DequantExpr(col("v"))
    val rows = vecs.select(
        (graft.functions.VecMaxAbsExpr(col("v")) / lit(127.0)).as("k_scale"),
        hofScale.as("h_scale"),
        dq.as("k_dq"),
        hofDq.as("h_dq"),
        graft.functions.MaxAbsDiffExpr(col("v"), dq).as("k_err"),
        array_max(zip_with(col("v"), hofDq, (a, b) => abs(a - b))).as("h_err"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      val k = r.getSeq[Double](2).map(java.lang.Double.doubleToRawLongBits)
      val h = r.getSeq[Double](3).map(java.lang.Double.doubleToRawLongBits)
      assert(k == h)
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(4)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(5)))
    }
  }

  test("int8 dequant error is bounded by scale/2 and zero vectors stay zero") {
    val vecs = synthVecs(200)
    val dq = graft.functions.Int8DequantExpr(col("v"))
    // scale/2 is the real-arithmetic bound; coordinates landing exactly
    // on a quantization midpoint (x/s + 0.5 integral) can exceed it by
    // one rounding ulp — hence the relative epsilon.
    val bad = vecs.select(
        (graft.functions.VecMaxAbsExpr(col("v")) / lit(127.0)).as("scale"),
        graft.functions.MaxAbsDiffExpr(col("v"), dq).as("err"))
      .where(col("err") > col("scale") * lit(0.5) * lit(1.0 + 1e-9))
      .count()
    assert(bad == 0L)
    val zeros = spark.range(3L).select(
      transform(sequence(lit(1), lit(8)), _ => lit(0.0)).as("v"))
    val out = zeros.select(graft.functions.Int8DequantExpr(col("v")).as("dq")).collect()
    out.foreach(r => assert(r.getSeq[Double](0).forall(_ == 0.0)))
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
