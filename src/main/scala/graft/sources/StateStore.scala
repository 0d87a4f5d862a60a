package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.ForgetTable

/** Persistent layout for forget-table state — the storage side of the
  * 100 TB design.
  *
  * `counts` is written hash-bucketed into `dist_bucket = pmod(xxhash64
  * (dist), nBuckets)` partitions rather than `partitionBy("dist")`
  * directly: at "millions of distributions" (reference README.md:5) a
  * partition directory per dist would melt the file listing and produce
  * millions of tiny files, while a fixed bucket count gives bounded file
  * counts AND still prunes single-dist reads to one bucket (the filter
  * `dist_bucket = pmod(xxhash64(lit(name)), n)` is a literal after
  * folding, so Catalyst partition-prunes the scan — verified in
  * StateStoreSpec). `meta` is tiny (one row per dist) and written flat.
  *
  * This is the batch analog of the reference's per-dist Redis keys: all
  * rows of one distribution land in one bucket, so dist-local operators
  * (decay, normalize, top-K) shuffle at most within a bucket's readers.
  */
object StateStore {

  final val DefaultBuckets = 256

  def bucketCol(dist: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(dist), lit(nBuckets.toLong))

  /** Write state tables under `dir` (overwrites). */
  def save(ft: ForgetTable, dir: String, nBuckets: Int = DefaultBuckets): Unit = {
    ft.counts
      .withColumn("dist_bucket", bucketCol(col("dist"), nBuckets))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("dist_bucket")
      .parquet(s"$dir/counts")
    ft.meta.write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
  }

  /** Load the full state. */
  def load(spark: SparkSession, dir: String): ForgetTable =
    new ForgetTable(
      spark.read.parquet(s"$dir/counts").drop("dist_bucket"),
      spark.read.parquet(s"$dir/meta"))

  /** Load a single distribution: the bucket filter is a literal, so the
    * scan reads exactly one partition directory; the residual
    * `dist = name` predicate is pushed into that bucket's row groups.
    */
  def loadDist(spark: SparkSession, dir: String, name: String,
               nBuckets: Int = DefaultBuckets): ForgetTable = {
    val counts = spark.read.parquet(s"$dir/counts")
      .filter(col("dist_bucket") === bucketCol(lit(name), nBuckets) &&
        col("dist") === name)
      .drop("dist_bucket")
    val meta = spark.read.parquet(s"$dir/meta").filter(col("dist") === name)
    new ForgetTable(counts, meta)
  }
}
