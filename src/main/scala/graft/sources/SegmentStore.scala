package graft.sources

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
  * Shared by `text_lm_incremental` (bigram counts) and
  * `ft_counts_incremental` (the reference's O1 `/incr` counter — its Z
  * sum and SETNX/refresh-T max meta legs are mergeable the same way).
  */
object SegmentStore {

  /** Append one batch's partial rows (already aggregated per key) as a
    * new segment. Pure append: no read, no rewrite.
    */
  def append(partials: DataFrame, path: String): Unit =
    partials.write.mode(SaveMode.Append).parquet(path)

  /** The read-time merge: sum the partial `sumCol` across all segments
    * per `keys` row.
    */
  def merged(spark: SparkSession, path: String, keys: Seq[String],
      sumCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(keys.map(col): _*)
      .agg(sum(sumCol).cast("long").as(sumCol))

  /** Fold all segments into one. localCheckpoint materializes the fold
    * BEFORE the overwrite truncates its own input — load-bearing, not
    * an optimization.
    */
  def compact(spark: SparkSession, path: String, keys: Seq[String],
      sumCol: String): Unit = {
    val folded = merged(spark, path, keys, sumCol).localCheckpoint(true)
    folded.write.mode(SaveMode.Overwrite).parquet(path)
  }
}
