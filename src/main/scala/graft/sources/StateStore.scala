package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.core.ForgetTable
import graft.streaming.BinSnapshot

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

  /** Write state tables under `dir` (overwrites). Clustered by the
    * partition key before the write — without the repartition every
    * write task can open a file in every bucket directory (tasks x
    * nBuckets files at cluster width, the small-files failure); with
    * it each directory gets one file.
    */
  def save(ft: ForgetTable, dir: String, nBuckets: Int = DefaultBuckets): Unit = {
    ft.counts
      .withColumn("dist_bucket", bucketCol(col("dist"), nBuckets))
      .repartition(col("dist_bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("dist_bucket")
      .parquet(s"$dir/counts")
    ft.meta.write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
  }

  /** The stored schemas, for reading a store whose last write was
    * EMPTY: a partitioned parquet write of zero rows leaves no part
    * directories (and a flat one no files), so schema inference has
    * nothing to read — which is exactly the state a TTL [[compact]]
    * that expired every distribution leaves behind. An empty store is
    * a legal store; reads type it explicitly instead of throwing.
    */
  private val countsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("dist", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("bin", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("count", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("dist_bucket", org.apache.spark.sql.types.LongType)))
  private val metaSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("dist", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("z", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("rate", org.apache.spark.sql.types.DoubleType)))

  private def readOrEmpty(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory || st.getPath.getName.endsWith(".parquet"))
    if (hasData) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Load the full state (typed-empty when the store holds no rows). */
  def load(spark: SparkSession, dir: String): ForgetTable =
    new ForgetTable(
      readOrEmpty(spark, s"$dir/counts", countsSchema).drop("dist_bucket"),
      readOrEmpty(spark, s"$dir/meta", metaSchema))

  /** Load a single distribution: the bucket filter is a literal, so the
    * scan reads exactly one partition directory; the residual
    * `dist = name` predicate is pushed into that bucket's row groups.
    */
  def loadDist(spark: SparkSession, dir: String, name: String,
               nBuckets: Int = DefaultBuckets): ForgetTable = {
    val counts = readOrEmpty(spark, s"$dir/counts", countsSchema)
      .filter(col("dist_bucket") === bucketCol(lit(name), nBuckets) &&
        col("dist") === name)
      .drop("dist_bucket")
    val meta = readOrEmpty(spark, s"$dir/meta", metaSchema)
      .filter(col("dist") === name)
    new ForgetTable(counts, meta)
  }

  /** Replace whole distributions in the store with a batch of
    * [[BinSnapshot]]s — the persistent side of the reference's async
    * write-back (goforget/redis_utils.go:156-191, which rewrites a
    * distribution's surviving bins and its `_Z`/`_T` after each
    * update). The snapshot batch must carry each touched dist's FULL
    * surviving bin set (exactly what `ForgetStream.apply` emits per
    * micro-batch), so bins pruned by decay disappear from the store.
    *
    * Scale/correctness shape:
    *   - Only the hash buckets containing touched dists are read and
    *     rewritten (dynamic partition overwrite; untouched buckets'
    *     files are never opened). Per-batch write amplification =
    *     touched buckets' row count, bounded by the bucket fan-out —
    *     the parquet-native upsert; a table format with row-level MERGE
    *     slots in here unchanged.
    *   - The rewrite is DETERMINISTIC given (previous store, batch), so
    *     a foreachBatch retry converges — at-least-once delivery plus
    *     idempotent replacement = effectively-once store contents.
    *   - Kept rows are localCheckpoint'ed before the write: Spark
    *     (correctly) refuses to overwrite a path that an in-flight plan
    *     still reads from; truncating lineage to materialized blocks
    *     breaks the self-read.
    */
  def upsertDistributions(spark: SparkSession, dir: String, snaps: DataFrame,
                          nBuckets: Int = DefaultBuckets): Unit = {
    val touched = snaps.select("dist").distinct()
      .withColumn("dist_bucket", bucketCol(col("dist"), nBuckets))
      .localCheckpoint(true)
    if (touched.isEmpty) return
    val buckets = touched.select("dist_bucket").distinct()
      .collect().map(_.getLong(0)) // bounded by nBuckets, driver-safe
    val existing = readOrEmpty(spark, s"$dir/counts", countsSchema)
      .filter(col("dist_bucket").isin(buckets.map(Long.box): _*))
    val kept = existing
      .join(touched.select("dist"), Seq("dist"), "left_anti")
      .select("dist", "bin", "count", "dist_bucket")
      .localCheckpoint(true)
    val newRows = snaps.select(col("dist"), col("bin"), col("count"))
      .withColumn("dist_bucket", bucketCol(col("dist"), nBuckets))
    kept.unionByName(newRows)
      .repartition(col("dist_bucket"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dist_bucket")
      .parquet(s"$dir/counts")
    // meta: new z/t from the snapshots; rate carried over from the
    // stored row (new dists get the reference default, forget.go:22)
    val newMeta = snaps.groupBy("dist")
      .agg(max("z").as("z"), max("t").as("t"))
    val oldMeta = readOrEmpty(spark, s"$dir/meta", metaSchema)
    val mergedMeta = oldMeta.join(newMeta.select("dist"), Seq("dist"), "left_anti")
      .unionByName(
        newMeta.join(oldMeta.select(col("dist"), col("rate").as("old_rate")),
            Seq("dist"), "left")
          .select(col("dist"), col("z"), col("t"),
            coalesce(col("old_rate"), lit(0.5)).as("rate")))
      .localCheckpoint(true)
    mergedMeta.write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
  }

  /** Drop expired distributions from the store — the persistent analog
    * of Redis EXPIRE firing (O9): a dist whose last write `t` plus its
    * `(σ+η)·η` TTL is behind `now` is removed from counts and meta.
    * The streaming layer self-destructs expired state
    * (`ForgetStream`'s ProcessingTimeTimeout) but can only do so for
    * dists it still sees traffic/timeouts for after a restart; this
    * compaction is the storage-side GC a long-lived store schedules
    * (daily, say). Full rewrite by design — it's the rare maintenance
    * pass, and `alive` needs every dist's max-count anyway.
    */
  def compact(spark: SparkSession, dir: String, params: graft.core.ForgetParams,
              nBuckets: Int = DefaultBuckets): Long = {
    val ft = load(spark, dir)
    val alive = ft.alive(params).localCheckpoint(true)
    val nAlive = alive.count()
    val counts = ft.counts.join(alive, Seq("dist"))
      .withColumn("dist_bucket", bucketCol(col("dist"), nBuckets))
      .localCheckpoint(true)
    val meta = ft.meta.join(alive, Seq("dist")).localCheckpoint(true)
    counts.repartition(col("dist_bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("dist_bucket").parquet(s"$dir/counts")
    meta.write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
    nAlive
  }

  /** Wire a [[graft.streaming.ForgetStream]] snapshot stream into the
    * persistent store: each micro-batch's emissions (the full surviving
    * bin set of every touched dist) replace those distributions —
    * streaming ingest in front, queryable bucketed parquet behind.
    */
  def streamInto(snaps: Dataset[BinSnapshot], dir: String,
                 checkpoint: String, nBuckets: Int = DefaultBuckets): StreamingQuery =
    snaps.writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: Dataset[BinSnapshot], _: Long) =>
        upsertDistributions(df.sparkSession, dir, df.toDF(), nBuckets)
      }
      .start()
}
