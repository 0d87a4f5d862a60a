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

  test("PqAdcAllExpr/PqAdcForExpr are bit-identical to the broadcast-LUT join algebra") {
    val m = 4
    val sub = 16
    // non-contiguous cent_ids exercise the sorted-directory binary search
    val centIds = Array(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L)
    val qRows = synthVecs(3).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    // deterministic synthetic codebooks: cb(mm)(slot) is a sub-dim vector
    val cbs = Array.tabulate(m) { mm =>
      val cvs = centIds.map { cid =>
        Array.tabulate(sub)(d =>
          (((mm * 97 + cid * 37 + d * 13) % 1000) - 500) / 250.0)
      }
      (centIds, cvs)
    }
    val luts = qRows.map { case (_, qv) =>
      Array.tabulate(m) { mm =>
        cbs(mm)._2.map(cv => graft.functions.VecKernels.dotSlice(qv, mm * sub, cv))
      }
    }
    // code rows over spark.range so the kernel runs codegen, codes drawn
    // from the id set per subspace
    val codeCols = col("id").as("vec_id") +: (0 until m).map(mm =>
      element_at(
        array(centIds.map(lit): _*),
        (pmod(col("id") * lit(7 + mm), lit(centIds.length.toLong)) + 1).cast("int")
      ).as(s"code$mm"))
    val codes = spark.range(200L).select(codeCols: _*)
    val kernel = codes.select(col("vec_id"),
        explode(graft.functions.PqAdcAllExpr(
          array((0 until m).map(i => col(s"code$i")): _*),
          qRows.map(_._1), luts, cbs.map(_._1))).as("s"))
      .select(col("vec_id"), col("s.q_id").as("q_id"), col("s.adc").as("adc"))
    // the join form it replaces: per-subspace LUT frames Dedup.dot'ed in
    // DataFrame algebra, adc = left fold of the joined d columns
    import spark.implicits._
    val qDf = qRows.toSeq.map { case (q, v) => (q, v.toSeq) }.toDF("q_id", "qv")
    val joined = (0 until m).foldLeft(codes) { (acc, mm) =>
      val cbDf = cbs(mm)._1.zip(cbs(mm)._2).toSeq
        .map { case (cid, cv) => (cid, cv.toSeq) }.toDF(s"code$mm", "cv")
      val lut = qDf
        .select(col("q_id"), slice(col("qv"), mm * sub + 1, sub).as("qs"))
        .crossJoin(broadcast(cbDf))
        .select(col("q_id"), col(s"code$mm"),
          Dedup.dot(col("qs"), col("cv")).as(s"d$mm"))
      if (mm == 0) acc.join(broadcast(lut), Seq(s"code$mm"))
      else acc.join(broadcast(lut), Seq(s"code$mm", "q_id"))
    }
    val ref = joined.withColumn("adc",
      (0 until m).map(mm => col(s"d$mm")).reduce(_ + _))
      .select(col("vec_id"), col("q_id"), col("adc").as("adc_ref"))
    val cmp = kernel.join(ref, Seq("vec_id", "q_id")).collect()
    assert(cmp.length == 600) // 200 rows x 3 queries
    cmp.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getAs[Double]("adc")) ==
        java.lang.Double.doubleToRawLongBits(r.getAs[Double]("adc_ref")))
    }
    // the scalar keyed form agrees with the all-queries form
    val forKernel = codes.crossJoin(broadcast(qDf.select("q_id")))
      .select(col("vec_id"), col("q_id"),
        graft.functions.PqAdcForExpr(
          array((0 until m).map(i => col(s"code$i")): _*), col("q_id"),
          qRows.map(_._1), luts, cbs.map(_._1)).as("adc"))
    val cmp2 = forKernel.join(ref, Seq("vec_id", "q_id")).collect()
    assert(cmp2.length == 600)
    cmp2.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getAs[Double]("adc")) ==
        java.lang.Double.doubleToRawLongBits(r.getAs[Double]("adc_ref")))
    }
  }

  test("ivfTopNCells replicates the crossJoin + rank-window routing") {
    val cents = Array.tabulate(8) { c =>
      Array.tabulate(64)(d => (((c * 37 + d * 13) % 1000) - 500) / 250.0)
    }
    val centIds = Array.tabulate(8)(c => (c * 3 + 1).toLong)
    val qs = synthVecs(20)
    import spark.implicits._
    val centDf = centIds.zip(cents).toSeq
      .map { case (cid, cv) => (cid, cv.toSeq) }.toDF("cent_id", "cv")
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("ccos").desc, col("cent_id"))
    val ref = qs.crossJoin(broadcast(centDf))
      .withColumn("ccos", Dedup.cosine(col("v"), col("cv")))
      .withColumn("crn", row_number().over(wRank))
      .filter(col("crn") <= 3)
      .select(col("vec_id"), col("crn"), col("cent_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = qs.collect().flatMap { r =>
      val qid = r.getLong(0)
      graft.functions.VecKernels
        .ivfTopNCells(r.getSeq[Double](1).toArray, cents, centIds, 3)
        .zipWithIndex.map { case (cell, i) => (qid, i + 1, cell) }
    }.toSet
    assert(got == ref)
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
