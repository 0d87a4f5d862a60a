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
}
