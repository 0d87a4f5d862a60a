package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers the engine's custom Catalyst expressions as SQL functions,
  * so every kernel is reachable from `spark.sql(...)` as well as the
  * Column API:
  *
  *   poisson_decay(lambda, seed)   seeded decay draw (LONG)
  *   simhash60(text | tokens)      60-bit SimHash (LONG)
  *   minhash_sig(shingles, k)      k-permutation MinHash (ARRAY<LONG>)
  *   shingle_set(text, n)          distinct word n-grams (ARRAY<STRING>)
  *   md5long60(s, salt)            salted 60-bit fingerprint (LONG)
  *   rolling_fp(text, w)           winnowing rolling-hash fingerprint (LONG)
  *   norm_md5(text)                md5 of normalized token stream (STRING)
  *   min_shingle_fp(text, n)       min md5 over word n-gram shingles (STRING)
  *   cosine_sim(a, b)              cosine of two double vectors (DOUBLE)
  *   to_double_vec(v)              exact float[]->double[] widening (ARRAY<DOUBLE>)
  *   vec_max_abs(v)                max |coordinate| (DOUBLE)
  *   int8_dequant(v)               int8 quantize-dequantize round trip (ARRAY<DOUBLE>)
  *   max_abs_diff(a, b)            max |a_i - b_i| (DOUBLE)
  *
  * Wire up either way:
  *   - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *   - code:   `GraftExtensions.register(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    // optimizer extension: threshold-bounded edit-distance predicates
    // drop to the O(k*n) banded kernel (see the rule's scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.BoundedLevenshteinRule)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)] = Seq(
    (FunctionIdentifier("poisson_decay"),
      info("poisson_decay", "poisson_decay(lambda, seed) - seeded Poisson decay draw"),
      (args: Seq[Expression]) => PoissonDecayExpr(args(0), args(1))),
    (FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(text_or_tokens) - 60-bit SimHash"),
      (args: Seq[Expression]) => SimHash60(args.head)),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k) - k-permutation MinHash signature"),
      (args: Seq[Expression]) => MinHashSig(args(0), intLit(args(1), "minhash_sig k"))),
    (FunctionIdentifier("shingle_set"),
      info("shingle_set", "shingle_set(text, n) - distinct word n-gram shingles"),
      (args: Seq[Expression]) => ShingleSetExpr(args(0), intLit(args(1), "shingle_set n"))),
    (FunctionIdentifier("md5long60"),
      info("md5long60", "md5long60(s, salt) - salted 60-bit md5 fingerprint"),
      (args: Seq[Expression]) => Md5Long60Expr(args(0), intLit(args(1), "md5long60 salt"))),
    (FunctionIdentifier("rolling_fp"),
      info("rolling_fp", "rolling_fp(text, w) - winnowing rolling-hash fingerprint"),
      (args: Seq[Expression]) => RollingFingerprintExpr(args(0), intLit(args(1), "rolling_fp w"))),
    (FunctionIdentifier("norm_md5"),
      info("norm_md5", "norm_md5(text) - md5 of the space-normalized token stream"),
      (args: Seq[Expression]) => NormalizedMd5Expr(args.head)),
    (FunctionIdentifier("min_shingle_fp"),
      info("min_shingle_fp", "min_shingle_fp(text, n) - min md5 over word n-gram shingles"),
      (args: Seq[Expression]) => MinShingleFpExpr(args(0), intLit(args(1), "min_shingle_fp n"))),
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two double vectors"),
      (args: Seq[Expression]) => CosineSimExpr(args(0), args(1))),
    (FunctionIdentifier("to_double_vec"),
      info("to_double_vec", "to_double_vec(v) - exact float[] -> double[] widening"),
      (args: Seq[Expression]) => FloatToDoubleVecExpr(args.head)),
    (FunctionIdentifier("vec_max_abs"),
      info("vec_max_abs", "vec_max_abs(v) - max absolute coordinate of a double vector"),
      (args: Seq[Expression]) => VecMaxAbsExpr(args.head)),
    (FunctionIdentifier("int8_dequant"),
      info("int8_dequant", "int8_dequant(v) - symmetric int8 quantize-dequantize round trip"),
      (args: Seq[Expression]) => Int8DequantExpr(args.head)),
    (FunctionIdentifier("max_abs_diff"),
      info("max_abs_diff", "max_abs_diff(a, b) - max absolute elementwise difference"),
      (args: Seq[Expression]) => MaxAbsDiffExpr(args(0), args(1))))

  /** Imperative registration on an existing session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    descriptors.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
    // the post-hoc seam for optimizer rules on a live session
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BoundedLevenshteinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BoundedLevenshteinRule
  }
}
