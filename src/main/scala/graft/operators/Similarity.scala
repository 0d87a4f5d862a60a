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
    val h = Dedup.md5Long(col(idCol).cast("string"), salt)
    val samp = vecs
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"), h.as("h"))
      .orderBy("h", "vec_id").limit(sampleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // Number the <= k seed rows driver-side: the frame is already
    // limit(k)-bounded (TakeOrderedAndProject), and ranking it with an
    // unpartitioned window would make WindowExec warn "Moving all data to
    // a single partition" — noise indistinguishable from a real scale bug
    // in log review (Catalyst strips foldable partitionBy(lit) exprs, so
    // that spelling doesn't avoid it either). collect() here is k rows.
    val spark = vecs.sparkSession
    val seedSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cent_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cv", samp.schema("v").dataType)))
    val seedRows = samp.orderBy("h", "vec_id").limit(k).select("v").collect()
      .zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row((i + 1).toLong, r.get(0))
      }
    val seeds = spark.createDataFrame(
      java.util.Arrays.asList(seedRows: _*), seedSchema)
    val fitted = (1 to iters).foldLeft(seeds) { (cents, _) =>
      val wA = Window.partitionBy("vec_id").orderBy(col("cc").desc, col("cent_id"))
      val assigned = samp.crossJoin(broadcast(cents))
        .withColumn("cc", Dedup.cosine(col("v"), col("cv")))
        .withColumn("rn", row_number().over(wA))
        .filter(col("rn") === 1)
      assigned.groupBy("cent_id")
        .agg(sort_array(collect_list(struct(col("vec_id"), col("v")))).as("ms"))
        .select(col("cent_id"),
          transform(
            aggregate(col("ms"), array_repeat(lit(0.0), dim),
              (acc, m) => zip_with(acc, m.getField("v"), (x, y) => x + y)),
            x => x / size(col("ms")).cast("double")).as("cv"))
    }
    // Materialize the k centroid rows so (a) the training sample cache can
    // be released immediately — callers invoke this repeatedly per session
    // and the cached copies otherwise accumulate — and (b) downstream
    // consumers (an O(N*k) assignment crossJoin, reused by both sim_ann_ivf
    // and sim_ann_recall) never re-execute the Lloyd subtree.
    val centRows = fitted.collect()
    spark.createDataFrame(java.util.Arrays.asList(centRows: _*), fitted.schema)
    } finally samp.unpersist() // release even when Lloyd/collect throws
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
