package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashSig, SimHash60}
import graft.operators.{Dedup, TextAnalysis}

/** The native hash kernels must agree exactly with the SQL column algebra
  * they replace — that equivalence is what keeps every dedup decision
  * DuckDB-oracle-checkable (the oracle computes the SQL form).
  */
class HashExprsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()

  private def sampleDocs = {
    import spark.implicits._
    Seq(
      "the quick brown fox jumps over the lazy dog",
      "one",
      "",
      "  double  spaced   tokens here ",
      "unicode tökens école 北京 mixed in",
      (1 to 500).map(i => s"tok$i").mkString(" ")
    ).toDF("text")
  }

  test("SimHash60 kernel == higher-order-function SQL algebra") {
    val hofSimhash = {
      val hashes =
        "transform(filter(split(text, ' '), t -> t != ''), " +
          "t -> cast(conv(substring(md5(concat('0:', t)), 1, 15), 16, 10) as bigint))"
      val counters =
        s"transform(sequence(0, 59), b -> aggregate($hashes, cast(0 as bigint), " +
          "(acc, h) -> acc + ((cast(shiftright(h, b) & 1 as bigint) * 2) - 1)))"
      expr(
        s"aggregate(transform(sequence(0, 59), b -> " +
          s"if(element_at($counters, b + 1) > 0, shiftleft(cast(1 as bigint), b), cast(0 as bigint))), " +
          "cast(0 as bigint), (acc, x) -> acc + x)")
    }
    val rows = sampleDocs
      .withColumn("fast", Dedup.simhashExpr)
      .withColumn("slow", hofSimhash)
      .collect()
    rows.foreach(r => assert(r.getAs[Long]("fast") == r.getAs[Long]("slow"), r))
  }

  test("MinHashSig kernel == per-permutation array_min algebra") {
    val k = 16
    val sh = Dedup.shingleSet(col("text"))
    val hofSig = array((0 until k).map(i =>
      array_min(transform(sh, s => Dedup.md5Long(s, i)))): _*)
    val rows = sampleDocs.filter(col("text") =!= "")
      .withColumn("fast", Dedup.minhashSignature(sh, k))
      .withColumn("slow", hofSig)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Long]]("fast").toSeq ==
        r.getAs[scala.collection.Seq[Long]]("slow").toSeq, r)
    }
  }

  test("ShingleSet kernel == array_distinct over the HOF shingle algebra") {
    val hof = array_distinct(TextAnalysis.shingles(col("text"), 3))
    val rows = sampleDocs
      .withColumn("fast", Dedup.shingleSet(col("text"), 3))
      .withColumn("slow", hof)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[String]]("fast").toSeq ==
        r.getAs[scala.collection.Seq[String]]("slow").toSeq, r.getString(0))
    }
  }

  test("tokenize kernel == filter(split) SQL semantics") {
    val rows = sampleDocs
      .withColumn("slow", filter(split(col("text"), " "), t => t =!= ""))
      .collect()
    rows.foreach { r =>
      val fast = graft.functions.HashKernels
        .tokenize(org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
        .map(_.toString).toSeq
      assert(fast == r.getAs[scala.collection.Seq[String]]("slow").toSeq, r.getString(0))
    }
  }

  test("MinShingleFp kernel == array_min(transform(shingles, md5)) algebra") {
    val rows = sampleDocs
      .withColumn("fast", TextAnalysis.minShingleFingerprint(col("text"), 3))
      .withColumn("slow", TextAnalysis.minShingleFingerprintAlgebra(col("text"), 3))
      .collect()
    rows.foreach(r =>
      assert(r.getAs[String]("fast") == r.getAs[String]("slow"), r.getString(0)))
  }

  test("NormalizedMd5 kernel == md5(concat_ws(' ', tokens)) algebra") {
    val rows = sampleDocs
      .withColumn("fast", TextAnalysis.fingerprint(col("text")))
      .withColumn("slow", md5(concat_ws(" ", TextAnalysis.tokens(col("text")))))
      .collect()
    rows.foreach(r =>
      assert(r.getAs[String]("fast") == r.getAs[String]("slow"), r.getString(0)))
  }

  test("rolling fingerprint: empty text => -1; short docs hash one window") {
    import graft.functions.HashKernels
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(HashKernels.rollingFingerprint(u(""), 4) == -1L)
    assert(HashKernels.rollingFingerprint(u("   "), 4) == -1L)
    // < w tokens: single window over all tokens, stable value
    val one = HashKernels.rollingFingerprint(u("ab cd"), 4)
    assert(one == HashKernels.rollingFingerprint(u("  ab  cd "), 4))
    assert(one >= 0L && one < 1000000007L)
    // value changes when a window token changes
    assert(HashKernels.rollingFingerprint(u("a b c d e"), 4) !=
      HashKernels.rollingFingerprint(u("a b c d f"), 4))
  }

  test("band keys from kernel signatures are stable") {
    val c = sampleDocs.filter(col("text") =!= "")
      .withColumn("sig", Dedup.minhashSignature(Dedup.shingleSet(col("text")), 16))
      .withColumn("keys", Dedup.bandKeys(col("sig"), 4, 4))
    val rows = c.select(size(col("keys"))).collect()
    rows.foreach(r => assert(r.getInt(0) == 4))
  }

  test("kernels run inside whole-stage codegen") {
    // range (not a local relation): ConvertToLocalRelation would
    // constant-fold a LocalTableScan and hide the codegen stage
    val df = spark.range(64)
      .withColumn("text", concat_ws(" ", lit("alpha"), col("id").cast("string")))
      .withColumn("sim", Dedup.simhashExpr)
      .withColumn("sig", Dedup.minhashSignature(Dedup.shingleSet(col("text")), 4))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    assert(df.count() == 64)
  }
}
