package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** LOG-STRUCTURED store for additive aggregates — the one maintenance
  * shape mergeable-by-SUM state admits that key-replace indexes don't:
  *
  *   - [[append]]: an ingest writes its batch's pre-aggregated partial
  *     rows as a NEW parquet segment — zero reads of existing state,
  *     the write path a 100 TB/day firehose needs (contrast
  *     [[AnnIndex]]'s upsert family and the funnel/retention stores,
  *     whose key-replace merges must read and rewrite touched
  *     partitions).
  *   - [[merged]]: read-time aggregation sums partials across segments;
  *     disjoint-batch partial sums equal the one-shot totals exactly,
  *     which is what lets the driver queries converge bit-for-bit on
  *     their one-shot oracles.
  *   - [[compact]]: folds accumulated segments back to one, bounding
  *     read amplification — the LSM trade: ingest O(batch), read
  *     O(segments), compaction amortized.
  *
  * Segments are `seg=N/` subdirectories (one per append), so the store
  * can COUNT its own read amplification: [[segmentStats]] reports
  * segments and rows-per-segment (the pq_code_stats
  * sketch-as-retrain-trigger discipline applied to the LSM trade), and
  * [[appendWithPolicy]] turns that report into a policy — fold
  * whenever live segments would exceed `maxSegments`, so read
  * amplification is BOUNDED by construction, not by operator
  * discipline.
  *
  * [[compact]] is crash-safe: the fold is written to a sibling temp
  * directory first, then swapped in with two directory renames (each
  * atomic on a real filesystem), so a complete on-disk copy of the
  * counts exists at every instant. A crash BETWEEN the renames parks
  * that copy at `path + ".old"` with the live path briefly absent —
  * every store entry point rolls the swap forward (one rename) before
  * touching the data, so readers never see a truncated store and no
  * cleanup step can destroy the only copy. (The earlier form overwrote
  * the directory in place under an executor-local checkpoint of its
  * own input — fine in one JVM, a data-loss window on a cluster.)
  *
  * Shared by `text_lm_incremental` (bigram counts) and
  * `ft_counts_incremental` (the reference's O1 `/incr` counter — its Z
  * sum and SETNX/refresh-T max meta legs are mergeable the same way).
  *
  * SINGLE-WRITER contract: [[append]] derives the next segment id from
  * a directory listing with no coordination, so exactly one writer
  * (job or stream) may ingest into a store at a time. Two concurrent
  * writers can race to the same `seg=N`; `SaveMode.ErrorIfExists`
  * makes the loser FAIL LOUDLY rather than corrupt state (retry the
  * append to take the next id). Readers are unrestricted — [[merged]]
  * sees whatever complete segments exist, and the [[compact]]
  * crash-safety above is about a single writer crashing mid-swap, not
  * about concurrent writers.
  */
object SegmentStore {

  private def fs(spark: SparkSession, path: String): (FileSystem, HPath) = {
    val p = new HPath(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Roll-forward recovery for the [[compact]] swap: a crash between
    * its two renames leaves the store parked at `path + ".old"` with
    * `path` absent — the data is intact but unaddressed. Every store
    * entry point calls this first: if the live path is missing and the
    * staged-aside copy exists, one rename restores it. (Both-present
    * means a crash after publish but before cleanup — the live path
    * wins and the stale copy is dropped by the next compact.)
    */
  private def recover(f: FileSystem, dst: HPath): Unit = {
    val old = new HPath(dst.toString + ".old")
    if (!f.exists(dst) && f.exists(old) && !f.rename(old, dst))
      throw new java.io.IOException(s"compact recovery: cannot restore $old")
  }

  /** Live segment ids, from the directory listing (driver-side, one
    * RPC — bounded by the segment count the compaction policy caps).
    */
  def segmentIds(spark: SparkSession, path: String): Seq[Long] = {
    val (f, p) = fs(spark, path)
    recover(f, p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("seg="))
      .map(_.stripPrefix("seg=").toLong)
      .sorted
  }

  /** Append one batch's partial rows (already aggregated per key) as a
    * new segment. Pure append: no read of existing state — the id
    * comes from one directory listing.
    */
  def append(partials: DataFrame, path: String): Unit = {
    val next = segmentIds(partials.sparkSession, path)
      .lastOption.map(_ + 1L).getOrElse(0L)
    partials.write.mode(SaveMode.ErrorIfExists).parquet(s"$path/seg=$next")
  }

  /** EXACTLY-ONCE ingest for streaming maintenance. Structured
    * Streaming's `foreachBatch` is AT-LEAST-ONCE: after a restart the
    * last micro-batch can be re-delivered, and a plain [[append]]
    * would double-count it — the silent-corruption mode of every
    * additive store under a streaming writer. Keying the segment by
    * the caller's MONOTONE batch id (the `foreachBatch` batchId)
    * makes re-delivery a no-op instead:
    *
    *   - a committed `seg=batchId` dir (job-level `_SUCCESS`) exists
    *     ⇒ this batch already landed — skip;
    *   - the dir exists UNcommitted (writer crashed mid-write) ⇒
    *     delete and rewrite — the retry is idempotent because no
    *     reader-visible commit happened;
    *   - otherwise `batchId <=` the max live segment id ⇒ the batch
    *     landed and was since FOLDED: [[compact]] names its fold
    *     after the max id it covers (a processed-batch WATERMARK), so
    *     history collapse never forgets what was ingested;
    *   - else write `seg=batchId`.
    *
    * Returns true iff this call ingested the batch. Same single-writer
    * contract as [[append]].
    */
  def appendExactlyOnce(partials: DataFrame, path: String,
      batchId: Long): Boolean = {
    val spark = partials.sparkSession
    val (f, p) = fs(spark, path)
    recover(f, p)
    val dst = new HPath(s"$path/seg=$batchId")
    if (f.exists(dst)) {
      if (f.exists(new HPath(dst, "_SUCCESS"))) return false
      f.delete(dst, true) // crashed partial write: retry idempotently
    } else if (segmentIds(spark, path).lastOption.exists(batchId <= _)) {
      return false // at or below the fold watermark: already ingested
    }
    partials.write.mode(SaveMode.ErrorIfExists).parquet(dst.toString)
    true
  }

  /** [[appendExactlyOnce]] + the [[appendWithPolicy]] fold bound — the
    * streaming-sink form: re-delivered batches are no-ops, landed
    * batches keep the live-segment count under `maxSegments`.
    */
  def appendExactlyOnceWithPolicy(partials: DataFrame, path: String,
      keys: Seq[String], sumCol: String, maxSegments: Int, batchId: Long,
      dropCancelled: Boolean = false): Boolean = {
    val landed = appendExactlyOnce(partials, path, batchId)
    if (landed && segmentIds(partials.sparkSession, path).size > maxSegments)
      compact(partials.sparkSession, path, keys, sumCol, dropCancelled)
    landed
  }

  /** Append, then fold if the store's live-segment count passed
    * `maxSegments` — the auto-compaction policy that turns the LSM
    * read-amplification trade into a hard bound. `dropCancelled`
    * forwards to [[compact]]: a store taking continuous takedowns
    * opts in so the policy's folds also reclaim retraction
    * tombstones, bounding physical size by the LIVE population
    * (plus at most `maxSegments` of un-folded churn) instead of the
    * all-time retraction history.
    */
  def appendWithPolicy(partials: DataFrame, path: String, keys: Seq[String],
      sumCol: String, maxSegments: Int,
      dropCancelled: Boolean = false): Unit = {
    append(partials, path)
    if (segmentIds(partials.sparkSession, path).size > maxSegments)
      compact(partials.sparkSession, path, keys, sumCol, dropCancelled)
  }

  /** The read-time merge: sum the partial `sumCol` across all segments
    * per `keys` row. The discovered `seg` partition column is dropped
    * by the groupBy.
    */
  def merged(spark: SparkSession, path: String, keys: Seq[String],
      sumCol: String): DataFrame = {
    val (f, p) = fs(spark, path)
    recover(f, p)
    spark.read.parquet(path)
      .groupBy(keys.map(col): _*)
      .agg(sum(sumCol).cast("long").as(sumCol))
  }

  /** AS-OF read: the store's logical state after segment `maxSeg`
    * landed — the snapshot/time-travel read a log-structured layout
    * gives for FREE, because history is the physical layout. `seg` is
    * the directory partition key, so the filter is PARTITION PRUNING:
    * an as-of read scans only the segments it covers, never the
    * store's full history (plan-pinned in PlanShapeSpec). This is the
    * audit read a takedown pipeline needs — "as of segment k the
    * user's rows existed; as of k+1 they are gone" — and it is what
    * [[compact]] trades away: a fold collapses history into one
    * segment named after the max id it covers (the exactly-once
    * watermark), so snapshots BELOW the fold id become unanswerable
    * (empty) — the compaction policy is also a RETENTION policy for
    * auditability.
    */
  def mergedAsOf(spark: SparkSession, path: String, keys: Seq[String],
      sumCol: String, maxSeg: Long): DataFrame = {
    val (f, p) = fs(spark, path)
    recover(f, p)
    spark.read.parquet(path)
      .filter(col("seg") <= maxSeg)
      .groupBy(keys.map(col): _*)
      .agg(sum(sumCol).cast("long").as(sumCol))
  }

  /** Per-segment row counts — the monitoring report that drives (and
    * audits) the compaction policy. Output is one row per live
    * segment: bounded by the policy itself.
    */
  def segmentStats(spark: SparkSession, path: String): DataFrame = {
    val (f, p) = fs(spark, path)
    recover(f, p)
    spark.read.parquet(path)
      .groupBy(col("seg").cast("long").as("seg"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** Retraction-tombstone report — the health probe that turns
    * [[compact]]'s `dropCancelled` reclaim into a policy, the same
    * stats-as-trigger discipline as [[segmentStats]] for the segment
    * bound (and pq_code_stats / rel_funnel_bloom_stats for their
    * structures). ONE row: distinct keys in the logical view, keys
    * whose partials cancel exactly to zero (tombstones — dead weight
    * every read re-merges and a plain fold carries forever), keys
    * summing negative (over-retraction evidence — never reclaimed),
    * and the store's physical row count (the amplification the
    * tombstone mass adds on top of the segment count). `tombstone_due`
    * fires on any fully-cancelled key; both scans are
    * column-pruned aggregates over the store, safe at any scale.
    */
  def tombstoneStats(spark: SparkSession, path: String, keys: Seq[String],
      sumCol: String): DataFrame = {
    val (f, p) = fs(spark, path)
    recover(f, p)
    val logical = merged(spark, path, keys, sumCol)
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col(sumCol) === 0, 1).otherwise(0)).cast("long")
          .as("n_cancelled"),
        sum(when(col(sumCol) < 0, 1).otherwise(0)).cast("long")
          .as("n_negative"))
    val physical = spark.read.parquet(path)
      .agg(count(lit(1)).cast("long").as("physical_rows"))
    logical.crossJoin(broadcast(physical)) // 1-row × 1-row
      .withColumn("tombstone_due", col("n_cancelled") > 0)
  }

  /** Fold all segments into one, via sibling-temp-then-swap so the
    * fold never overwrites its own input and a full copy of the store
    * survives any single failure (see class doc).
    *
    * `dropCancelled = true` additionally removes keys whose partials
    * sum EXACTLY to zero — the physical reclaim for retraction
    * tombstones (a retracted key's ± rows otherwise survive every
    * fold as a zero row, so a store that takes continuous takedowns
    * grows with its retraction history, not its live population).
    * Opting in asserts the store's semantics treat a zero total as
    * "never existed" (the reference's own prune filter, goforget
    * redis_utils.go:163-166, reads counters that way). NEGATIVE
    * totals are never dropped: a key retracted harder than it was
    * ingested is evidence of a double-takedown upstream, and folding
    * it away would silently absorb the next legitimate ingest.
    */
  def compact(spark: SparkSession, path: String, keys: Seq[String],
      sumCol: String, dropCancelled: Boolean = false): Unit = {
    val (f, dst) = fs(spark, path)
    recover(f, dst) // roll a crashed prior swap forward FIRST —
    // only then is a surviving .old copy stale and safe to drop
    val tmp = new HPath(path + ".compacting")
    val old = new HPath(path + ".old")
    f.delete(tmp, true)
    f.delete(old, true)
    // the fold keeps the MAX id it covers as its name — the
    // processed-batch watermark [[appendExactlyOnce]] checks, so
    // collapsing history never forgets which batch ids landed
    val foldId = segmentIds(spark, path).lastOption.getOrElse(0L)
    val folded = merged(spark, path, keys, sumCol)
    (if (dropCancelled) folded.filter(col(sumCol) =!= 0) else folded)
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/seg=$foldId")
    if (!f.rename(dst, old))
      throw new java.io.IOException(s"compact: cannot stage $dst aside")
    if (!f.rename(tmp, dst)) {
      f.rename(old, dst) // roll back; the store is intact either way
      throw new java.io.IOException(s"compact: cannot publish $tmp")
    }
    f.delete(old, true)
  }
}
