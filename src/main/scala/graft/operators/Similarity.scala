package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *   - [[lshBucket]] — random-sign hyperplane LSH: an `nBits`-bit signature
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

  /** Interpreted HOF bucket — bit-identity reference for VecExprsSpec. */
  def lshBucketHof(v: Column, signs: Array[Array[Double]]): Column =
    signs.zipWithIndex.map { case (row, p) =>
      val planeDot = aggregate(
        zip_with(v, array(row.map(lit): _*), (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      when(planeDot >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH bucket id of a double-vector column: bit p set iff
    * sum_d(v[d] * sign[p][d]) >= 0, folded left like the oracle —
    * native codegen kernel ([[graft.functions.VecKernels.lshBucket]]),
    * one traversal for all planes.
    */
  def lshBucket(v: Column, signs: Array[Array[Double]]): Column =
    graft.functions.LshBucketExpr(v, signs)

  /** Fixed-k seeded k-means centroids for an IVF coarse quantizer.
    *
    * Scale design: every input is bounded INDEPENDENT of corpus size —
    * the training set is the `sampleSize` vectors with the smallest
    * md5-derived hash of their id (a deterministic uniform sample picked
    * by TakeOrderedAndProject, not a modulo slice that grows with N),
    * seeds are the first `k` of those, and Lloyd runs a fixed `iters`
    * rounds. The downstream assignment crossJoin is therefore O(N*k)
    * with a k-row broadcast, never O(N^2/c).
    *
    * Oracle parity: assignment distance is the shared sequential-fold
    * cosine; the centroid update sums member vectors in ascending-id
    * order via a left fold (sort_array + aggregate) and divides by the
    * member count — the exact IEEE op sequence DuckDB's
    * `list_aggregate(list_transform(ms, m -> m[j]), 'sum') / len(ms)`
    * performs, so both engines derive bit-identical centroids. The
    * fold work is bounded by sampleSize, so the interpreted HOFs stay
    * off the hot path.
    *
    * Returns (cent_id: long 1..k, cv: array<double>); cells whose
    * population empties during an iteration drop out on both engines.
    */
  def kmeansCentroids(vecs: DataFrame, k: Int, sampleSize: Int, iters: Int,
                      dim: Int, salt: Int,
                      idCol: String = "vec_id", vecCol: String = "v"): DataFrame = {
    val sample = kmeansSample(vecs, sampleSize, salt, idCol, vecCol)
    localCentroidsFrame(vecs.sparkSession,
      kmeansFitLocal(sample, k, iters, dim),
      vecs.schema(vecCol).dataType)
  }

  /** The deterministic `sampleSize`-row training sample as driver-local
    * `(vec_id, v)` pairs in (md5-hash, vec_id) order — ONE
    * TakeOrderedAndProject pass over the corpus; everything downstream
    * of it (seeding, Lloyd) is O(sampleSize·k·dim) driver arithmetic.
    */
  private[graft] def kmeansSample(vecs: DataFrame, sampleSize: Int, salt: Int,
      idCol: String = "vec_id", vecCol: String = "v"): Array[(Long, Array[Double])] = {
    val h = Dedup.md5Long(col(idCol).cast("string"), salt)
    vecs.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"), h.as("h"))
      .orderBy("h", "vec_id").limit(sampleSize)
      .collect() // <= sampleSize rows, driver-safe by design
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
  }

  /** Driver-local cosine with the exact IEEE op sequence of the codegen
    * kernel ([[graft.functions.VecKernels.cosine]]) and of the
    * sequential-fold HOF form — one ascending pass accumulating a·b,
    * a·a, b·b, combined as dab / (sqrt(daa)·sqrt(dbb)).
    */
  private def cosineLocal(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    dab / (math.sqrt(daa) * math.sqrt(dbb))
  }

  /** Lloyd over an in-memory sample, replicating the distributed form's
    * arithmetic BIT-FOR-BIT (the oracle replays it in SQL): seeds are
    * the first `k` sample rows numbered 1..k; assignment picks the
    * centroid maximizing the shared sequential-fold cosine with Spark's
    * sort semantics on doubles (java.lang.Double.compare — NaN greatest,
    * -0.0 < 0.0), ties to the smaller cent_id; the update sums member
    * vectors in ascending-vec_id order (a left fold, exactly the
    * sort_array + aggregate(zip_with(+)) sequence) and divides by the
    * member count; a cell whose population empties drops out. Returns
    * (cent_id, centroid) in ascending cent_id order.
    */
  private[graft] def kmeansFitLocal(sample: Array[(Long, Array[Double])],
      k: Int, iters: Int, dim: Int): Seq[(Long, Array[Double])] = {
    val seeds: Seq[(Long, Array[Double])] =
      sample.take(k).zipWithIndex.map { case ((_, v), i) => ((i + 1).toLong, v) }.toSeq
    (1 to iters).foldLeft(seeds) { (cents, _) =>
      // members per centroid, then mean in ascending-vec_id member order
      val byCent = scala.collection.mutable.LinkedHashMap
        .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]]
      sample.foreach { case (id, v) =>
        var bestCent = -1L
        var bestCc = 0.0
        var first = true
        cents.foreach { case (cid, cv) =>
          val cc = cosineLocal(v, cv)
          // row_number over (cc DESC, cent_id ASC): strict Double.compare
          // win replaces; ties keep the earlier (smaller) cent_id since
          // cents iterates in ascending cent_id order
          if (first || java.lang.Double.compare(cc, bestCc) > 0) {
            bestCent = cid; bestCc = cc; first = false
          }
        }
        byCent.getOrElseUpdate(bestCent,
          scala.collection.mutable.ArrayBuffer.empty) += ((id, v))
      }
      cents.flatMap { case (cid, _) =>
        byCent.get(cid).map { ms =>
          val sorted = ms.sortBy(_._1)
          val acc = new Array[Double](dim)
          sorted.foreach { case (_, v) =>
            var i = 0
            while (i < dim && i < v.length) { acc(i) += v(i); i += 1 }
          }
          val n = sorted.size.toDouble
          var i = 0
          while (i < dim) { acc(i) = acc(i) / n; i += 1 }
          (cid, acc)
        }
      }
    }
  }

  /** Wrap driver-fit centroids as the small DataFrame the assignment
    * crossJoins broadcast — the exact schema the distributed form
    * produced: (cent_id: long not-null, cv: the input vector type).
    */
  private[graft] def localCentroidsFrame(spark: SparkSession,
      cents: Seq[(Long, Array[Double])],
      vecType: org.apache.spark.sql.types.DataType): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cent_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cv", vecType)))
    val rows = cents.map { case (cid, cv) =>
      org.apache.spark.sql.Row(cid, cv.toSeq)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Exact cosine top-k of `queries` (small: broadcast) against `corpus`.
    * Both must carry (`idCol`, `vecCol`) with double vectors. Ties broken
    * by corpus id ascending.
    *
    * Q-BOUND ASSUMPTION: the non-equi join condition makes this a
    * broadcast nested-loop scoring all Q x N pairs BY DESIGN — it is the
    * exactness baseline for query sets small enough to broadcast
    * (Q in the hundreds, not 10^5). For large query sets use the stored
    * [[graft.sources.AnnIndex]] probes, which join on bucket/cell keys.
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

  /** OPQ-style dimension permutation (the non-parametric allocation
    * idea of Ge et al., "Optimized Product Quantization", CVPR 2013,
    * simplified to a variance-balancing PERMUTATION: the full method
    * learns an orthogonal rotation by alternating SVD, whose
    * floating-point spectrum is not bit-reproducible cross-engine — a
    * permutation IS an orthogonal transform, captures the balanced-
    * information-per-subspace objective on axis-aligned spectra, and
    * stays oracle-exact). Per-dimension variance proxies are
    * ALL-INTEGER on a 1e-4 grid (n·Σq² − (Σq)², q = floor(x·1e4) —
    * order-independent BIGINT sums, headroom past the 30× probe), dims
    * rank by (score desc, dim asc), and a snake round-robin deals them
    * into the `m` subspaces so high-variance dims spread instead of
    * clustering in the first slice. Returns the permutation as
    * 1-based source indices in target order (`dim` rows collected —
    * bounded by the vector width, driver-safe). Persisted next to the
    * codebooks by [[graft.sources.AnnIndex.trainPq]] /
    * [[graft.sources.AnnIndex.trainIvfPq]] as the frozen OPQ artifact
    * a maintained compressed index applies at encode and probe time.
    */
  def opqPermutation(vecs: DataFrame, dim: Int, m: Int,
                     vecCol: String = "v"): Seq[Int] = {
    // public operator API: a non-divisible m would make the snake deal
    // write colliding target slots and leave others at 0 — an invalid
    // "permutation" (the perceptualHash nPatch % PHashBands discipline)
    require(dim % m == 0, s"opqPermutation: m=$m must divide dim=$dim")
    val sub = dim / m
    // one quantization, squared IN INTEGER SPACE: q = floor(x·1e4),
    // score = n·Σq² − (Σq)² — the integer variance proxy on a single
    // grid. (Mixing grids — floor(x²·1e4) for the square term — would
    // scale the two terms by 1e4 vs 1e8 and rank dims by |mean|, not
    // variance.) Headroom: |q| ≤ ~1.1e4, so n·Σq² and (Σq)² both stay
    // under 2^63 past the 30× probe's ~150k rows.
    val q = floor(col("x") * lit(10000.0)).cast("long")
    val scores = vecs
      .select(posexplode(col(vecCol)))
      .toDF("pos", "x")
      .groupBy("pos")
      .agg(count(lit(1)).as("n"),
        sum(q).as("sq"),
        sum(q * q).as("sq2"))
      .select(col("pos"), (col("n") * col("sq2") - col("sq") * col("sq")).as("score"))
      .collect() // dim rows
      .map(r => (r.getAs[Int]("pos"), r.getAs[Long]("score")))
    val target = Array.fill(dim)(0)
    scores.sortBy { case (p, sc) => (-sc, p) }.zipWithIndex.foreach {
      case ((p, _), rk) =>
        val round = rk / m
        val r = rk % m
        val subIdx = if (round % 2 == 0) r else m - 1 - r
        target(subIdx * sub + round) = p + 1 // 1-based
    }
    target.toSeq
  }
}
