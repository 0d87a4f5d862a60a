package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash
  * groupBy), MinHash+LSH banding, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Engine-parity design: every hash is derived from md5 (the one hash
  * both Spark and DuckDB compute identically), widened to a 60-bit
  * non-negative long from the first 15 hex chars. xxhash64/murmur would
  * be faster but are engine-specific; md5 keeps every dedup decision
  * oracle-checkable. Swap [[md5Long]] for xxhash64 when oracle parity is
  * not required.
  *
  * Scale notes:
  *   - Exact dedup shuffles on the md5 fingerprint — uniformly
  *     distributed by construction, no skew.
  *   - MinHash signatures and band keys are computed entirely row-local
  *     (array transforms over the shingle set — no explode, no shuffle);
  *     only the band-key equi-join shuffles, and its fan-out is bounded
  *     by the banding scheme, not by document size.
  *   - n-gram Jaccard's shingle join drops "stop shingles" (appearing in
  *     more than `maxDocFreq` docs) before the pair join — the classic
  *     guard against quadratic blowup on hot shingles.
  */
object Dedup {

  /** 60-bit salted hash: first 15 hex chars of md5("salt:value"). */
  def md5Long(c: Column, salt: Int): Column =
    conv(substring(md5(concat(lit(s"$salt:"), c)), 1, 15), 16, 10).cast("long")

  /** Distinct word n-gram shingles of a document. Native kernel
    * ([[graft.functions.ShingleSetExpr]]) with the same semantics as
    * `array_distinct(TextAnalysis.shingles(text, n))`.
    */
  def shingleSet(text: Column, n: Int = 3): Column =
    graft.functions.ShingleSetExpr(text, n)

  /** k-permutation MinHash signature over a shingle-set column.
    * Element i = `array_min(transform(sh, s -> md5Long(s, i)))`, computed
    * by the native kernel ([[graft.functions.MinHashSig]]) — one JVM call
    * per row instead of k interpreted lambda passes.
    */
  def minhashSignature(sh: Column, k: Int): Column =
    graft.functions.MinHashSig(sh, k)

  /** LSH band keys: md5 over each band's comma-joined signature rows.
    * Two docs are candidates iff any band key matches.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws(",",
        (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*))
    }: _*)

  /** SimHash width: 60 bits (all of the md5-derived hash). 32 bits is too
    * narrow for a shared-vocabulary corpus — random documents land within
    * Hamming distance 3 and the candidate set grows quadratically.
    */
  final val SimhashBits = 60

  /** 60-bit SimHash over the (repeated) token stream: per bit, sum +1/-1
    * of each token-hash's (salt 0) bit, sign of the sum. Native kernel
    * ([[graft.functions.SimHash60]]): one md5 pass per token. Expects a
    * column named `text`; yields a non-negative long.
    */
  val simhashExpr: Column =
    graft.functions.SimHash60(expr("text"))

  /** Jaccard similarity of two distinct-shingle arrays: |A∩B| / |A∪B|,
    * one integer division pair -> bit-stable across engines.
    */
  def jaccard(a: Column, b: Column): Column = {
    // one array_intersect evaluation shared by both operands (codegen
    // subexpression elimination usually rescues a duplicate, but a
    // single node needs no rescuing)
    val inter = size(array_intersect(a, b)).cast("double")
    inter / ((size(a) + size(b)).cast("double") - inter)
  }

  /** Default hot-bucket cap for [[candidatePairs]]. A web-scale corpus
    * has boilerplate mega-clusters (thousands of near-identical pages)
    * whose members all share band keys; one such bucket emits
    * |bucket|^2/2 pairs — the skewed-key quadratic blowup that kills
    * banded dedup at 100 TB. 10k bounds any single bucket's pair count
    * at ~5*10^7 (one task's worth) while being far above what honest
    * banding produces on non-degenerate data.
    */
  final val DefaultMaxBucket = 10000

  /** Candidate pairs from any banded key column: self-join on
    * (band_id, key) with id_a < id_b, deduped across bands.
    *
    * `maxBucket` drops (band, key) buckets whose population exceeds the
    * cap BEFORE the self-join — the banded analog of the n-gram path's
    * stop-shingle prune. A capped bucket's members still pair through
    * their other bands (and exact copies are caught by the exact-dedup
    * fast path), so recall degrades gracefully while the worst-case
    * join cost becomes bands * N * maxBucket instead of |hottest|^2.
    * The hot-bucket list is tiny by construction (only buckets with
    * > maxBucket members), so AQE broadcasts the anti-join probe.
    */
  def candidatePairs(banded: DataFrame, idCol: String, keysCol: String,
                     maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val ex = banded.select(col(idCol).as("id"), posexplode(col(keysCol)).as(Seq("band", "key")))
    val kept =
      if (maxBucket == Int.MaxValue) ex
      else {
        val hot = ex.groupBy("band", "key").agg(count(lit(1)).as("n"))
          .filter(col("n") > maxBucket).select("band", "key")
        ex.join(hot, Seq("band", "key"), "left_anti")
      }
    val a = kept.select(col("id").as("id_a"), col("band"), col("key"))
    val b = kept.select(col("id").as("id_b"), col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Cross-snapshot candidate pairs: probe-batch ids pair only with
    * index-side ids sharing a (band, key) — the incremental form of
    * [[candidatePairs]] for "today's crawl vs the stored corpus". The
    * hot-bucket cap applies to the COMBINED (band, key) population
    * (identical bucket membership to the symmetric path over
    * index ∪ probe, so the same oracle checks both), but the pair join
    * itself is index x probe only: cost is bounded by
    * |batch| x bucket-population, never |corpus|² — the property that
    * makes daily dedup against a 100 TB corpus a batch-sized job.
    */
  def candidatePairsAcross(index: DataFrame, probe: DataFrame,
                           idCol: String, keysCol: String,
                           maxBucket: Int = DefaultMaxBucket): DataFrame = {
    def exploded(side: DataFrame, isProbe: Boolean) =
      side.select(col(idCol).as("id"), lit(isProbe).as("is_probe"),
        posexplode(col(keysCol)).as(Seq("band", "key")))
    val ex = exploded(index, isProbe = false).unionByName(exploded(probe, isProbe = true))
    val kept =
      if (maxBucket == Int.MaxValue) ex
      else {
        val hot = ex.groupBy("band", "key").agg(count(lit(1)).as("n"))
          .filter(col("n") > maxBucket).select("band", "key")
        ex.join(hot, Seq("band", "key"), "left_anti")
      }
    val a = kept.filter(!col("is_probe")).select(col("id").as("id_old"), col("band"), col("key"))
    val b = kept.filter(col("is_probe")).select(col("id").as("id_new"), col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      // an UNCHANGED re-crawled doc appears on both sides under one id;
      // it is not a duplicate of itself
      .filter(col("id_old") =!= col("id_new"))
      .select("id_old", "id_new").distinct()
  }

  /** Connected components over duplicate pairs: the step between pair
    * detection and "keep one document per duplicate CLUSTER" — pairwise
    * output alone under-deletes (a∼b, b∼c must retire both b and c even
    * if (a,c) never surfaced as a pair).
    *
    * Algorithm: BSP min-label propagation. label(x) starts as x's own
    * id; each round takes the min of x's label and its neighbors'
    * labels; at fixpoint every member of a component carries the
    * component's minimum id — the canonical keeper. Each round is one
    * equi-join of the (persisted, symmetrized) edge list with the label
    * table plus a groupBy-min — both shuffle on the same id key, so AQE
    * can reuse the partitioning — and rounds are bounded by component
    * DIAMETER, not component size. Duplicate clusters from banded
    * candidate generation are near-cliques (every member shares a band
    * key with most others), so diameter — and the round count — is
    * small and independent of corpus scale; `maxIter` guards the
    * pathological chain. (For adversarial graph shapes the upgrade path
    * is alternating large-star/small-star — Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014 — which bounds
    * rounds at O(log n) with the same join/groupBy primitives.) The
    * driver-side loop holds no data — it only counts changed labels to
    * detect the fixpoint, the standard Pregel-style termination check.
    *
    * Driver chattiness: each round is ONE job (the eager checkpoint of
    * the propagated labels, which carries a `chg` flag computed in the
    * SAME join — no second shuffle join against the previous labels)
    * plus an `isEmpty` scan over the materialized blocks, which
    * early-terminates on the first changed row. Under a contended
    * scheduler per-job latency compounds, so the round structure — not
    * the data volume — is what sets the wall clock here (the round-12
    * driver-bench lesson).
    *
    * @param nodes single-column `id` DataFrame (every corpus member —
    *              isolated docs become their own singleton cluster)
    * @param edges `id_a`/`id_b` pair DataFrame (undirected; symmetrized
    *              internally)
    * @param requireConverged throw instead of returning silently-stale
    *              labels when the loop hits `maxIter` before fixpoint —
    *              MANDATORY on store-mutating paths (a truncated
    *              convergence would persist wrong labels and compound
    *              across later ingests; a one-shot query's error is at
    *              least transient)
    * @return (id, label) — label = min id of the component
    */
  /** Edge-count ceiling for the driver-local union-find fast path: two
    * longs per edge, so the collect is bounded at ~8 MB. The label of a
    * component is its min id — an exact integer — so the local result
    * is bit-identical to the BSP fixpoint; graphs above the ceiling
    * (the genuinely-at-scale case) take the BSP loop unchanged.
    */
  final val LocalCcMaxEdges = 500000L

  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25,
      requireConverged: Boolean = false): DataFrame = {
    // localCheckpoint (eager), NOT persist: persist caches the DATA but
    // every action still re-analyzes the full logical lineage, which here
    // grows by one join+agg layer per round on top of the entire
    // upstream pair pipeline — planning time alone was super-linear in
    // round count before truncation. Checkpointing cuts the plan to the
    // materialized blocks, so every round plans against a 2-column
    // table, whatever produced the edges. (At cluster scale swap in
    // reliable `checkpoint` if executor loss during the short loop
    // matters; the structure is identical.)
    val sym = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true) // re-joined every round (or collected once)
    // SMALL-GRAPH FAST PATH: the dup graph of a maintenance batch (and
    // of a test-SF corpus) is a few thousand edges — running 3-8 BSP
    // rounds of join+agg+checkpoint+emptiness jobs over it costs far
    // more in per-job latency than the data justifies. Under the edge
    // ceiling, collect the symmetrized edges once and union-find on the
    // driver: min-label components of exact integers, bit-identical to
    // the BSP fixpoint, convergence unconditional. The count() is one
    // cheap action against the just-materialized blocks.
    val nEdges = sym.count()
    if (nEdges <= LocalCcMaxEdges) {
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != c) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      sym.select("src", "dst").collect().foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        // union by MIN id so every root is its component's min label
        if (ra != rb) {
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val spark = nodes.sparkSession
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      parent.keySet().forEach { id => rows.add(
        org.apache.spark.sql.Row(id.longValue(), find(id).longValue())) }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("label",
          org.apache.spark.sql.types.LongType, nullable = false)))
      val labels = spark.createDataFrame(rows, schema)
      return nodes.select(col("id")).join(broadcast(labels), Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    }
    // Iterate ONLY over edge-touched nodes: an isolated doc's label can
    // never change, so keeping it in the loop would drag the full corpus
    // through every round's shuffle. At pipeline scale the dup graph is
    // a small fraction of the corpus — the loop works on that fraction,
    // and the untouched majority joins back in one final pass.
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("id")).agg(min("label").as("nbr_min"))
      // prev label is ALREADY on the join — carry the changed flag out
      // of the same pass instead of re-joining next against labels
      // (the re-join was a whole extra shuffle join per round)
      val next = labels.join(nbrMin, Seq("id"))
        .select(col("id"), least(col("label"), col("nbr_min")).as("label"),
          (col("nbr_min") < col("label")).as("chg"))
        .localCheckpoint(true)
      // scan of the materialized blocks, early-out on the first hit
      changed = !next.filter(col("chg")).isEmpty
      labels = next.select("id", "label")
      iter += 1
    }
    if (changed && requireConverged)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIter rounds — a label " +
          "chain longer than maxIter would persist WRONG labels on a " +
          "maintained store; raise maxIter or split the batch")
    // untouched nodes are their own singleton clusters
    nodes.select(col("id")).join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
  }

  // ------------------------------------------------------------ embeddings

  /** Interpreted HOF widening — bit-identity reference for VecExprsSpec. */
  def toDoubleVecHof(v: Column): Column = transform(v, x => x.cast("double"))

  /** Elementwise float->double widening (exact, no rounding) — codegen
    * kernel at the embedding scan edge, so the whole scan->signature->
    * score pipeline stays in one whole-stage-codegen span.
    */
  def toDoubleVec(v: Column): Column =
    graft.functions.FloatToDoubleVecExpr(v)

  /** Sequential left-fold dot product — matches DuckDB's list_aggregate
    * 'sum' evaluation order so doubles agree bit-for-bit. HOF form:
    * interpreted; kept for bounded inputs (k-means centroid update) and
    * as the bit-identity reference for the codegen kernel.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Interpreted HOF cosine — reference implementation for VecExprsSpec. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine similarity — native codegen kernel with the identical IEEE
    * op sequence (one pass instead of three interpreted folds); the form
    * every hot path uses. See [[graft.functions.VecKernels.cosine]].
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimExpr(a, b)

  /** Symmetric int8 quantize-dequantize round trip (one-pass codegen
    * kernel); pair with [[quantScale]] / [[maxAbsDiff]] for the
    * reconstruction report the embed_quant query emits.
    */
  def int8Dequant(v: Column): Column =
    graft.functions.Int8DequantExpr(v)

  /** The symmetric-int8 scale: maxAbs / 127. */
  def quantScale(v: Column): Column =
    graft.functions.VecMaxAbsExpr(v) / lit(127.0)

  /** Max absolute elementwise difference (codegen kernel). */
  def maxAbsDiff(a: Column, b: Column): Column =
    graft.functions.MaxAbsDiffExpr(a, b)

  /** Banded sign-bucket keys: key b = the `bitsPerBand` sign bits of
    * dimensions [b*bitsPerBand, (b+1)*bitsPerBand). Feed to
    * [[candidatePairs]]: a pair is a candidate iff ALL signs of at least
    * one band agree.
    *
    * Scale design (vs a single fixed-width bucket): per-(band, key)
    * population is ~N / 2^bitsPerBand per band, so the self-join cost is
    * bands * N^2 / 2^bitsPerBand — at 100 TB raise `bitsPerBand` (and/or
    * `bands`) so the per-bucket population stays bounded; a single 8-bit
    * bucket is a hard O(N^2/256) floor no parameter can fix. Recall: a
    * near-dup pair (cosine >= 0.999) disagrees on a dimension's sign only
    * where the coordinate is ~0, so the chance all `bands` bands are hit
    * is negligible — and exact copies always collide on every band.
    */
  def signBandKeys(v: Column, bands: Int, bitsPerBand: Int): Column =
    array((0 until bands).map { b =>
      (0 until bitsPerBand).map { i =>
        when(element_at(v, b * bitsPerBand + i + 1) >= 0.0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
}
