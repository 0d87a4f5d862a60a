package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Shared Nx corpus staging for the dev probes (ScaleProbe,
  * TokenProbe, LoaderProbe — not part of the driver contract): ids
  * shifted per copy, and the TEXT of each copy passed through a
  * DISTINCT deterministic letter permutation so copies are genuinely
  * DIFFERENT documents (distinct BPE statistics, no constructed
  * near-dup pairs). A seeded Fisher–Yates permutation (identity for
  * copy 0, so the 1x corpus is a literal subset) stays collision-free
  * at ANY factor — the earlier `rotate by c % 26` wrapped at factor
  * 27+, making copies 26+k exact text twins of copies k.
  */
private[graft] object ProbeStaging {

  private val rot = "abcdefghijklmnopqrstuvwxyz"

  private def permFor(c: Int): String = {
    val arr = rot.toCharArray
    if (c > 0) {
      val rnd = new scala.util.Random(c)
      for (i <- arr.length - 1 to 1 by -1) {
        val j = rnd.nextInt(i + 1)
        val t = arr(i); arr(i) = arr(j); arr(j) = t
      }
    }
    new String(arr)
  }

  /** Write `factor` permuted copies of `base`'s documents table under
    * `stage/documents.parquet`.
    */
  def stageDocuments(spark: SparkSession, base: String, stage: String,
      factor: Int): Unit = {
    val docs = Tables.documents(spark, base)
    (0 until factor).map { c =>
      docs.select((col("doc_id") + lit(c.toLong * 100000000L)).as("doc_id"),
        translate(col("text"), rot, permFor(c)).as("text"),
        col("lang"),
        // source carries through unchanged: the realistic growth mode
        // is the SAME domains getting more docs (per-source population
        // scales with the corpus)
        col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$stage/documents.parquet")
  }
}
