package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.{Shim => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Tight-loop kernels for the embedding operators (ANN, embedding dedup).
  *
  * The column-algebra forms (`aggregate(zip_with(a, b, *), 0.0, +)` for a
  * dot product; one such fold per hyperplane for an LSH bucket) are
  * oracle-exact but evaluate INTERPRETED — Spark runs higher-order
  * lambda bodies without codegen, boxing every element. On the join hot
  * paths (a cosine per candidate pair; N·k cosines for the IVF
  * assignment) that interpretation dominates the query. These kernels
  * compute the SAME IEEE-754 operation sequence in one codegen'd JVM
  * call per row:
  *
  *   - [[VecKernels.cosine]] folds `a·b`, `a·a`, `b·b` in ascending
  *     index order with one accumulator each — exactly the evaluation
  *     order of the sequential-fold dot in `Dedup.dot` and of DuckDB's
  *     `list_aggregate(..., 'sum')` (see SimilarityQueries.dotSql) —
  *     then combines as `dab / (sqrt(daa) * sqrt(dbb))`. Results are
  *     bit-identical to the HOF form (pinned by VecExprsSpec).
  *   - [[VecKernels.lshBucket]] runs the per-plane sign dot for all
  *     planes in one traversal of the plane matrix, same per-plane fold
  *     order as `Similarity.lshBucketHof`.
  *
  * Assumptions (enforced by the embeddings schema, asserted nowhere
  * hot): vectors are non-null `array<double>` of one fixed dimension.
  * The HOF forms return null / drop a plane on a length mismatch where
  * the kernels compute over the common prefix — a state our tables
  * cannot represent.
  */
object VecKernels {

  /** Cosine similarity; see object scaladoc for the exact op order. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dab = 0.0
    var daa = 0.0
    var dbb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dab += x * y
      daa += x * x
      dbb += y * y
      i += 1
    }
    dab / (math.sqrt(daa) * math.sqrt(dbb))
  }

  /** float[] -> double[] exact widening (identical to elementwise CAST);
    * one primitive-array pass instead of an interpreted transform().
    */
  def floatToDoubleVec(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = v.getFloat(i).toDouble
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Max absolute coordinate — the symmetric-quantization range stat.
    * Fold order is irrelevant (max is exact), but kept ascending for
    * uniformity with the other kernels.
    */
  def maxAbs(v: ArrayData): Double = {
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i))
      if (a > m) m = a
      i += 1
    }
    m
  }

  /** Symmetric int8 quantize-dequantize round trip: s = maxAbs/127,
    * q_i = floor(v_i/s + 0.5) (always in [-127, 127] since |v_i| <=
    * maxAbs — no clamp needed), dq_i = q_i * s. The IEEE op sequence
    * per element is exactly `floor(x / s + 0.5) * s`, the form the
    * DuckDB oracle replays with list_transform. All-zero vectors
    * (s = 0) dequantize to zeros.
    */
  def int8Dequant(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val s = maxAbs(v) / 127.0
    val out = new Array[Double](n)
    if (s != 0.0) {
      var i = 0
      while (i < n) {
        out(i) = math.floor(v.getDouble(i) / s + 0.5) * s
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Max absolute elementwise difference — reconstruction-error stat.
    * Lengths must match: a dimension mismatch is schema drift, not a
    * small error, so it throws instead of silently truncating.
    */
  def maxAbsDiff(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"maxAbsDiff: vector length mismatch ($n vs ${b.numElements()})")
    var m = 0.0
    var i = 0
    while (i < n) {
      val d = math.abs(a.getDouble(i) - b.getDouble(i))
      if (d > m) m = d
      i += 1
    }
    m
  }

  /** Nearest PQ sub-centroid — the encode step as ONE row-local call,
    * replacing the crossJoin(k) + per-vec_id rank window + m-way join
    * chain. Arithmetic replicates the crossJoin form bit-for-bit: the
    * expanded L2 is three sequential ascending-order fold dots combined
    * as `(sv·sv − 2.0·(sv·cv)) + cv·cv` (the `Dedup.dot` op sequence),
    * and the minimizer is picked with Spark's double sort semantics
    * (java.lang.Double.compare: NaN greatest, −0.0 < 0.0), ties to the
    * FIRST row — equal to `orderBy(l2, cent_id)` rank 1 when `cb` rows
    * arrive cent_id-ascending. Returns the winning `centIds` entry.
    */
  def pqNearestCode(v: ArrayData, cb: Array[Array[Double]],
                    centIds: Array[Long], off: Int, sub: Int): Long = {
    val lim = math.min(sub, math.max(v.numElements() - off, 0))
    var dss = 0.0
    var i = 0
    while (i < lim) { val x = v.getDouble(off + i); dss += x * x; i += 1 }
    var bestIdx = -1
    var bestL2 = 0.0
    var j = 0
    while (j < cb.length) {
      val cv = cb(j)
      var dsc = 0.0
      var dcc = 0.0
      var d = 0
      val m2 = math.min(lim, cv.length)
      while (d < m2) { dsc += v.getDouble(off + d) * cv(d); d += 1 }
      d = 0
      while (d < cv.length) { val c = cv(d); dcc += c * c; d += 1 }
      val l2 = dss - 2.0 * dsc + dcc
      if (bestIdx < 0 || java.lang.Double.compare(l2, bestL2) < 0) {
        bestIdx = j; bestL2 = l2
      }
      j += 1
    }
    centIds(bestIdx)
  }

  /** Cosine against a plain double[] — the [[cosine]] op sequence with
    * a driver-collected right side (used by [[ivfNearest]]).
    */
  def cosineArr(a: ArrayData, b: Array[Double]): Double = {
    val n = math.min(a.numElements(), b.length)
    var dab = 0.0
    var daa = 0.0
    var dbb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b(i)
      dab += x * y
      daa += x * x
      dbb += y * y
      i += 1
    }
    dab / (math.sqrt(daa) * math.sqrt(dbb))
  }

  /** Nearest IVF centroid — the cell assignment as one row-local call,
    * replacing crossJoin(k) + the per-vec_id rank window. Picks the
    * centroid maximizing the shared-op-sequence cosine with Spark's
    * descending double sort semantics (Double.compare: NaN greatest =
    * ranked first, −0.0 < 0.0), ties to the FIRST row (= smallest
    * cent_id when rows arrive cent_id-ascending). Returns
    * `(centIds(best), ccos(best))` as an InternalRow struct.
    */
  def ivfNearest(v: ArrayData, cents: Array[Array[Double]],
                 centIds: Array[Long]): org.apache.spark.sql.catalyst.InternalRow = {
    var bestIdx = -1
    var bestCc = 0.0
    var j = 0
    while (j < cents.length) {
      val cc = cosineArr(v, cents(j))
      if (bestIdx < 0 || java.lang.Double.compare(cc, bestCc) > 0) {
        bestIdx = j; bestCc = cc
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](centIds(bestIdx), bestCc))
  }

  /** Top-`n` IVF cells by the [[ivfNearest]] ordering (ccos DESC with
    * Double.compare semantics, ties to the smaller cent_id) — the
    * row-local form of `row_number over (ccos DESC, cent_id) <= n`.
    * Returns an array of `struct(cell, ccos)` in rank order (entry i =
    * rank i+1), at most min(n, k) entries.
    */
  def ivfTopN(v: ArrayData, cents: Array[Array[Double]],
              centIds: Array[Long], n: Int):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val k = cents.length
    val keep = math.min(n, k)
    val idx = new Array[Int](keep)
    val ccs = new Array[Double](keep)
    var filled = 0
    var j = 0
    while (j < k) {
      val cc = cosineArr(v, cents(j))
      // stable descending insertion: strictly-greater moves ahead of an
      // earlier entry; ties keep insertion (= ascending cent_id) order
      var pos = filled
      while (pos > 0 && java.lang.Double.compare(cc, ccs(pos - 1)) > 0) pos -= 1
      if (pos < keep) {
        var t = math.min(filled, keep - 1)
        while (t > pos) { idx(t) = idx(t - 1); ccs(t) = ccs(t - 1); t -= 1 }
        idx(pos) = j
        ccs(pos) = cc
        if (filled < keep) filled += 1
      }
      j += 1
    }
    val out = new Array[Any](filled)
    var i = 0
    while (i < filled) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](centIds(idx(i)), ccs(i)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Driver-side dot of a query slice against a codebook centroid —
    * the LUT builder for the ADC probe kernels. Replicates
    * `Dedup.dot(slice(v, off+1, sub), cv)` bit-for-bit: accumulator
    * starts 0.0, ascending index order, over the common length (the
    * HOF form's zip_with nulls can only arise on a length mismatch our
    * schema cannot represent).
    */
  def dotSlice(q: Array[Double], off: Int, cv: Array[Double]): Double = {
    val n = math.min(cv.length, math.max(q.length - off, 0))
    var d = 0.0
    var i = 0
    while (i < n) { d += q(off + i) * cv(i); i += 1 }
    d
  }

  /** ADC score of one stored code row against ONE probe query (index
    * `qi` into the LUT stack): looks each subspace's code up in that
    * subspace's sorted cent_id directory and folds the per-subspace LUT
    * dots in ascending-subspace order — `adc = ((d0 + d1) + d2)...`,
    * exactly the `reduce(_ + _)` fold of the broadcast-join form it
    * replaces (the first term SEEDS the accumulator, so a -0.0 d0
    * survives where `0.0 + d0` would flush it).
    */
  def pqAdc(codes: ArrayData, qi: Int, luts: Array[Array[Array[Double]]],
            centIds: Array[Array[Long]]): Double = {
    val m = centIds.length
    val lut = luts(qi)
    var adc = lut(0)(java.util.Arrays.binarySearch(centIds(0), codes.getLong(0)))
    var mm = 1
    while (mm < m) {
      adc += lut(mm)(java.util.Arrays.binarySearch(centIds(mm), codes.getLong(mm)))
      mm += 1
    }
    adc
  }

  /** [[pqAdc]] against EVERY probe query — one code row in, an
    * `array<struct(q_id, adc)>` out (entry order = ascending q_id, the
    * order the LUT stack was built in). The exploded form replaces the
    * m-way broadcast-LUT join chain of the pure-ADC probe.
    */
  def pqAdcAll(codes: ArrayData, qIds: Array[Long],
               luts: Array[Array[Array[Double]]],
               centIds: Array[Array[Long]]): ArrayData = {
    val out = new Array[Any](qIds.length)
    var qi = 0
    while (qi < qIds.length) {
      out(qi) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](qIds(qi), pqAdc(codes, qi, luts, centIds)))
      qi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** [[pqAdc]] keyed by q_id value (binary search over the sorted id
    * directory) — the scalar form for rows that already carry their
    * query (the IVF+PQ probe's cell-routed candidates).
    */
  def pqAdcFor(codes: ArrayData, qId: Long, qIds: Array[Long],
               luts: Array[Array[Array[Double]]],
               centIds: Array[Array[Long]]): Double =
    pqAdc(codes, java.util.Arrays.binarySearch(qIds, qId), luts, centIds)

  /** Driver-side [[ivfTopN]] over a plain double[] query — returns the
    * routed cell ids in rank order. Same kernel, same tie semantics;
    * used to fold probe routing into the driver where the probe set is
    * contract-bounded small.
    */
  def ivfTopNCells(qv: Array[Double], cents: Array[Array[Double]],
                   centIds: Array[Long], n: Int): Array[Long] = {
    val ad = ivfTopN(
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(qv),
      cents, centIds, n)
    Array.tabulate(ad.numElements())(i => ad.getStruct(i, 2).getLong(0))
  }

  /** Sign-hyperplane LSH bucket: bit p set iff v · signs(p) >= 0. */
  def lshBucket(v: ArrayData, signs: Array[Array[Double]]): Long = {
    var bucket = 0L
    var p = 0
    while (p < signs.length) {
      val row = signs(p)
      val n = math.min(v.numElements(), row.length)
      var dot = 0.0
      var d = 0
      while (d < n) {
        dot += v.getDouble(d) * row(d)
        d += 1
      }
      if (dot >= 0.0) bucket |= 1L << p
      p += 1
    }
    bucket
  }
}

/** Codegen cosine similarity of two `array<double>` columns. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Codegen sign-hyperplane LSH bucket of an `array<double>` column over
  * a literal ±1 plane matrix.
  */
case class LshBucketExpr(child: Expression, signs: Array[Array[Double]])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override protected def nullSafeEval(v: Any): Any =
    VecKernels.lshBucket(v.asInstanceOf[ArrayData], signs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signs", signs, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernels.lshBucket($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucketExpr {
  def apply(v: Column, signs: Array[Array[Double]]): Column =
    ExpressionUtils.column(LshBucketExpr(ExpressionUtils.expression(v), signs))
}

/** Codegen nearest-PQ-sub-centroid encode of an `array<double>` column
  * against a literal codebook; see [[VecKernels.pqNearestCode]] for the
  * exact op order and tie semantics.
  */
case class PqNearestCodeExpr(child: Expression, cb: Array[Array[Double]],
                             centIds: Array[Long], off: Int, sub: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_nearest_code"

  override protected def nullSafeEval(v: Any): Any =
    VecKernels.pqNearestCode(v.asInstanceOf[ArrayData], cb, centIds, off, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", cb, "double[][]")
    val idRef = ctx.addReferenceObj("centIds", centIds, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecKernels.pqNearestCode($c, $cbRef, $idRef, $off, $sub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqNearestCodeExpr =
    copy(child = newChild)
}

object PqNearestCodeExpr {
  def apply(v: Column, cb: Array[Array[Double]], centIds: Array[Long],
            off: Int, sub: Int): Column =
    ExpressionUtils.column(
      PqNearestCodeExpr(ExpressionUtils.expression(v), cb, centIds, off, sub))
}

/** Codegen nearest-IVF-centroid assignment of an `array<double>` column
  * against literal centroids — returns `struct(cell: long, ccos:
  * double)`; see [[VecKernels.ivfNearest]] for tie semantics.
  */
case class IvfNearestExpr(child: Expression, cents: Array[Array[Double]],
                          centIds: Array[Long])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cell", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("ccos", DoubleType, nullable = false)))
  override def prettyName: String = "ivf_nearest"

  override protected def nullSafeEval(v: Any): Any =
    VecKernels.ivfNearest(v.asInstanceOf[ArrayData], cents, centIds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val idRef = ctx.addReferenceObj("centIds", centIds, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecKernels.ivfNearest($c, $cRef, $idRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfNearestExpr =
    copy(child = newChild)
}

object IvfNearestExpr {
  def apply(v: Column, cents: Array[Array[Double]], centIds: Array[Long]): Column =
    ExpressionUtils.column(
      IvfNearestExpr(ExpressionUtils.expression(v), cents, centIds))
}

/** Codegen top-n IVF cell ranking of an `array<double>` column against
  * literal centroids — returns `array<struct(cell, ccos)>` in rank
  * order; see [[VecKernels.ivfTopN]].
  */
case class IvfTopNExpr(child: Expression, cents: Array[Array[Double]],
                       centIds: Array[Long], n: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("ccos", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "ivf_top_n"

  override protected def nullSafeEval(v: Any): Any =
    VecKernels.ivfTopN(v.asInstanceOf[ArrayData], cents, centIds, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val idRef = ctx.addReferenceObj("centIds", centIds, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecKernels.ivfTopN($c, $cRef, $idRef, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfTopNExpr =
    copy(child = newChild)
}

object IvfTopNExpr {
  def apply(v: Column, cents: Array[Array[Double]], centIds: Array[Long],
            n: Int): Column =
    ExpressionUtils.column(
      IvfTopNExpr(ExpressionUtils.expression(v), cents, centIds, n))
}

/** Codegen max-abs-coordinate of an `array<double>` column. */
case class VecMaxAbsExpr(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_max_abs"

  override protected def nullSafeEval(v: Any): Any =
    VecKernels.maxAbs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernels.maxAbs($c)")

  override protected def withNewChildInternal(newChild: Expression): VecMaxAbsExpr =
    copy(child = newChild)
}

object VecMaxAbsExpr {
  def apply(v: Column): Column =
    ExpressionUtils.column(VecMaxAbsExpr(ExpressionUtils.expression(v)))
}

/** Codegen symmetric int8 quantize-dequantize of an `array<double>`
  * column; see [[VecKernels.int8Dequant]] for the exact op sequence.
  */
case class Int8DequantExpr(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "int8_dequant"

  override protected def nullSafeEval(v: Any): Any =
    VecKernels.int8Dequant(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernels.int8Dequant($c)")

  override protected def withNewChildInternal(newChild: Expression): Int8DequantExpr =
    copy(child = newChild)
}

object Int8DequantExpr {
  def apply(v: Column): Column =
    ExpressionUtils.column(Int8DequantExpr(ExpressionUtils.expression(v)))
}

/** Codegen max absolute elementwise difference of two `array<double>`
  * columns.
  */
case class MaxAbsDiffExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "max_abs_diff"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.maxAbsDiff(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.maxAbsDiff($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxAbsDiffExpr =
    copy(left = newLeft, right = newRight)
}

object MaxAbsDiffExpr {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      MaxAbsDiffExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Codegen float[] -> double[] widening for the embedding scan edge. */
case class FloatToDoubleVecExpr(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "to_double_vec"

  override protected def nullSafeEval(v: Any): Any =
    VecKernels.floatToDoubleVec(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernels.floatToDoubleVec($c)")

  override protected def withNewChildInternal(newChild: Expression): FloatToDoubleVecExpr =
    copy(child = newChild)
}

object FloatToDoubleVecExpr {
  def apply(v: Column): Column =
    ExpressionUtils.column(FloatToDoubleVecExpr(ExpressionUtils.expression(v)))
}

/** Codegen all-queries ADC of a code row (`array<long>` of the m
  * subspace codes) against a literal probe LUT stack — returns
  * `array<struct(q_id, adc)>`; see [[VecKernels.pqAdcAll]] for the
  * exact fold order. Replaces the m-way broadcast-LUT join chain of
  * the pure-ADC PQ probe with one projection + explode.
  */
case class PqAdcAllExpr(child: Expression, qIds: Array[Long],
                        luts: Array[Array[Array[Double]]],
                        centIds: Array[Array[Long]])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("q_id", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("adc", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pq_adc_all"

  override protected def nullSafeEval(codes: Any): Any =
    VecKernels.pqAdcAll(codes.asInstanceOf[ArrayData], qIds, luts, centIds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("qIds", qIds, "long[]")
    val lRef = ctx.addReferenceObj("luts", luts, "double[][][]")
    val cRef = ctx.addReferenceObj("centIds", centIds, "long[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecKernels.pqAdcAll($c, $qRef, $lRef, $cRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcAllExpr =
    copy(child = newChild)
}

object PqAdcAllExpr {
  def apply(codes: Column, qIds: Array[Long], luts: Array[Array[Array[Double]]],
            centIds: Array[Array[Long]]): Column =
    ExpressionUtils.column(
      PqAdcAllExpr(ExpressionUtils.expression(codes), qIds, luts, centIds))
}

/** Codegen single-query ADC of a code row already paired with its
  * `q_id` (the cell-routed IVF+PQ candidates) — the scalar form of
  * [[PqAdcAllExpr]]; see [[VecKernels.pqAdcFor]].
  */
case class PqAdcForExpr(left: Expression, right: Expression, qIds: Array[Long],
                        luts: Array[Array[Array[Double]]],
                        centIds: Array[Array[Long]])
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_for"

  override protected def nullSafeEval(codes: Any, qId: Any): Any =
    VecKernels.pqAdcFor(codes.asInstanceOf[ArrayData], qId.asInstanceOf[Long],
      qIds, luts, centIds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("qIds", qIds, "long[]")
    val lRef = ctx.addReferenceObj("luts", luts, "double[][][]")
    val cRef = ctx.addReferenceObj("centIds", centIds, "long[][]")
    defineCodeGen(ctx, ev, (c, q) =>
      s"graft.functions.VecKernels.pqAdcFor($c, $q, $qRef, $lRef, $cRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcForExpr =
    copy(left = newLeft, right = newRight)
}

object PqAdcForExpr {
  def apply(codes: Column, qId: Column, qIds: Array[Long],
            luts: Array[Array[Array[Double]]],
            centIds: Array[Array[Long]]): Column =
    ExpressionUtils.column(
      PqAdcForExpr(ExpressionUtils.expression(codes), ExpressionUtils.expression(qId),
        qIds, luts, centIds))
}
