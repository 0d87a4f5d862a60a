package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two strategies:
  *   - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small)
  *     query set against the corpus scan, rank per query. One corpus
  *     pass, no shuffle of the corpus itself; the per-query rank filter
  *     is a WindowGroupLimit (partial top-k before the shuffle). The
  *     correct baseline at any scale where queries ≪ corpus.
  *   - [[signLsh]] — random-sign hyperplane LSH: an `nBits`-bit signature
  *     per vector (sign of v·w for deterministic ±1 hyperplanes), bucket
  *     join, exact cosine re-rank inside buckets. The 100 TB path: the
  *     corpus is bucketed once (write-side), queries probe single
  *     buckets. Recall is tunable via nBits/multi-probe.
  *
  * The hyperplane signs derive from md5("p:d") parity — reproducible in
  * ANSI SQL, so the oracle builds the identical buckets.
  */
object Similarity {

  /** Deterministic ±1.0 sign for hyperplane `p`, dimension `d`: parity of
    * the first hex nibble of md5("p:d").
    */
  def planeSign(p: Int, d: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$p:$d".getBytes(StandardCharsets.UTF_8))
    if (((hex(0) >> 4) & 1) == 1) 1.0 else -1.0
  }

  /** Literal ±1 sign matrix for `nBits` planes over `dim` dimensions. */
  def signMatrix(nBits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nBits, dim)(planeSign)

  /** LSH bucket id of a double-vector column: bit p set iff
    * sum_d(v[d] * sign[p][d]) >= 0, folded left like the oracle.
    */
  def lshBucket(v: Column, signs: Array[Array[Double]]): Column =
    signs.zipWithIndex.map { case (row, p) =>
      val planeDot = aggregate(
        zip_with(v, array(row.map(lit): _*), (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      when(planeDot >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact cosine top-k of `queries` (small: broadcast) against `corpus`.
    * Both must carry (`idCol`, `vecCol`) with double vectors. Ties broken
    * by corpus id ascending.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v")))
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_v"))
    val scored = q.join(c, col("q_id") =!= col("c_id"))
      .withColumn("cosine", Dedup.cosine(col("q_v"), col("c_v")))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "cosine")
  }
}
