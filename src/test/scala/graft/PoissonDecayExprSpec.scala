package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Poisson
import graft.functions.PoissonDecayExpr

/** The native codegen expression must agree bit-for-bit with the pure
  * Scala sampler and must not fall out of whole-stage codegen.
  */
class PoissonDecayExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  test("expression agrees with Poisson.decayDraw over a seed/lambda grid") {
    import spark.implicits._
    val rows = for {
      lam  <- Seq(0.0, 0.1, 0.5, 1.0, 5.0, 17.9, 18.5, 100.0)
      seed <- 1L to 200L
    } yield (lam, seed)
    val got = rows.toDF("lambda", "seed")
      .withColumn("draw", PoissonDecayExpr(col("lambda"), col("seed")))
      .collect()
    got.foreach { r =>
      val expected = Poisson.decayDraw(r.getDouble(0), r.getLong(1))
      assert(r.getLong(2) == expected,
        s"lambda=${r.getDouble(0)} seed=${r.getLong(1)}")
    }
  }

  test("wipe-out guard: exp(-lambda) < 1e-8 draws Int.MaxValue") {
    import spark.implicits._
    val r = Seq((19.0, 42L)).toDF("lambda", "seed")
      .select(PoissonDecayExpr(col("lambda"), col("seed")).as("draw"))
      .head()
    assert(r.getLong(0) == Int.MaxValue.toLong)
  }

  test("stays inside WholeStageCodegen (no ScalaUDF in the plan)") {
    // range input: a local relation would be constant-folded by
    // ConvertToLocalRelation before physical planning
    val df = spark.range(1, 101).select(col("id").as("seed"))
      .withColumn("draw", PoissonDecayExpr(lit(2.5), col("seed") * 31L))
      .filter(col("draw") >= 0L)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("ScalaUDF"), physical)
    assert(physical.contains("*("), physical)
    assert(df.count() == 100L)
  }
}
