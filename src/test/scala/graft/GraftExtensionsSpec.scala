package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Poisson
import graft.functions.GraftExtensions
import graft.operators.Dedup

/** The custom kernels must be reachable from pure SQL — both via the
  * spark.sql.extensions config hook and imperative registration.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  // getOrCreate may hand back a session another suite already built, so
  // SQL tests register imperatively; the spark.sql.extensions hook is
  // verified unit-level against a fresh SparkSessionExtensions below.
  lazy val spark: SparkSession = {
    val s = graft.sources.GraftSession.local()
    GraftExtensions.register(s)
    s
  }

  test("extensions class injects all function descriptors") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    val names = GraftExtensions.descriptors.map(_._1.funcName).toSet
    assert(names == Set("poisson_decay", "simhash60", "minhash_sig",
      "shingle_set", "md5long60", "rolling_fp", "norm_md5", "min_shingle_fp",
      "cosine_sim", "to_double_vec", "vec_max_abs", "int8_dequant",
      "max_abs_diff"))
  }

  test("vector kernels resolve from SQL") {
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS cos,
        |       vec_max_abs(array(-3.0d, 2.0d)) AS ma,
        |       max_abs_diff(array(1.0d, 2.0d), array(1.5d, 1.0d)) AS mad,
        |       int8_dequant(array(0.0d, 127.0d))[1] AS dq1
        |""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 3.0)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 127.0)
  }

  test("functions resolve from SQL") {
    val r = spark.sql(
      """SELECT poisson_decay(2.5d, 42L) AS pd,
        |       simhash60('the quick brown fox') AS sh,
        |       md5long60('abc', 0) AS fp,
        |       size(minhash_sig(shingle_set('a b c d e', 3), 4)) AS k
        |""".stripMargin).head()
    assert(r.getLong(0) == Poisson.decayDraw(2.5, 42L))
    assert(r.getLong(2) >= 0L)
    assert(r.getInt(3) == 4)
  }

  test("SQL form equals Column-API form") {
    import spark.implicits._
    val df = Seq("one two three four five").toDF("text")
    val r = df.select(
      expr("simhash60(text)").as("sql_sim"),
      Dedup.simhashExpr.as("api_sim"),
      expr("shingle_set(text, 3)").as("sql_sh"),
      Dedup.shingleSet(col("text"), 3).as("api_sh")).head()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getSeq[String](2) == r.getSeq[String](3))
  }

  test("imperative register() works on a plain session") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT md5long60('x', 3) AS v").head().getLong(0) >= 0L)
  }

  test("non-literal k is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), cast(rand()*4 as int))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("BoundedLevenshteinRule: predicate rewrites to the banded kernel, same rows") {
    import spark.implicits._
    // range, not a literal Seq — ConvertToLocalRelation would otherwise
    // evaluate the whole filter at optimization time and leave no plan
    // to inspect
    val df = spark.range(6).select(
      concat(lit("name"), col("id")).as("l"),
      when(col("id") % 2 === 0, concat(lit("nmae"), col("id")))
        .otherwise(lit("zzzzzzzz")).as("r"))
    val q = df.filter(levenshtein(col("l"), col("r")) <= 2)
    // the optimized plan must carry the THRESHOLD form (3-arg) — the
    // unbounded 2-arg fills the full DP matrix; the band walks O(k*n)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("levenshtein") && opt.contains("Some(2)) >= 0"),
      s"no bounded rewrite in:\n$opt")
    // transposed pairs (even ids, distance 2) pass; the rest don't
    val got = q.select("l").as[String].collect().toSet
    assert(got == Set("name0", "name2", "name4"),
      s"rewrite changed semantics: $got")
    // strict forms rewrite at k-1, in both literal orientations
    val q2 = df.filter(levenshtein(col("l"), col("r")) < 3)
    assert(q2.queryExecution.optimizedPlan.toString.contains("Some(2)) >= 0"))
    assert(q2.select("l").as[String].collect().toSet == Set("name0", "name2", "name4"))
    val q3 = df.filter(lit(3) > levenshtein(col("l"), col("r")))
    assert(q3.queryExecution.optimizedPlan.toString.contains("Some(2)) >= 0"))
    assert(q3.select("l").as[String].collect().toSet == Set("name0", "name2", "name4"))
    // null inputs stay filtered through the bounded form
    val withNull = spark.range(2).select(
      when(col("id") === 0, lit(null).cast("string"))
        .otherwise(lit("x")).as("l"), lit("x").as("r"))
    assert(withNull.filter(levenshtein(col("l"), col("r")) <= 2).count() == 1)
    // a LONG threshold spelling coerces the distance under a cast; the
    // rule must see through it and still hand back the banded kernel
    val qL = df.filter(levenshtein(col("l"), col("r")) <= 2L)
    assert(qL.queryExecution.optimizedPlan.toString.contains("Some(2)) >= 0"),
      s"long-literal spelling kept the full DP kernel:\n${qL.queryExecution.optimizedPlan}")
    assert(qL.select("l").as[String].collect().toSet == Set("name0", "name2", "name4"))
    // the complement (> k) rewrites to `bounded < 0` — same band, the
    // -1 sentinel IS the predicate
    val qC = df.filter(levenshtein(col("l"), col("r")) > 2)
    assert(qC.queryExecution.optimizedPlan.toString.contains("Some(2)) < 0"),
      s"complement kept the full DP kernel:\n${qC.queryExecution.optimizedPlan}")
    assert(qC.select("l").as[String].collect().toSet ==
      Set("name1", "name3", "name5"))
    // complement strict/oriented forms land on k-1
    val qC2 = df.filter(levenshtein(col("l"), col("r")) >= 3)
    assert(qC2.queryExecution.optimizedPlan.toString.contains("Some(2)) < 0"))
    assert(qC2.select("l").as[String].collect().toSet ==
      Set("name1", "name3", "name5"))
    // complement keeps null-propagation: null input rows filter out on
    // BOTH sides of the partition (within-k and beyond-k)
    assert(withNull.filter(levenshtein(col("l"), col("r")) > 2).count() == 0)
  }
}
