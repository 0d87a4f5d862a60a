package graft.sources

import org.apache.spark.sql.SparkSession

/** One place to construct graft SparkSessions so session-level confs are
  * set at build time, not sprinkled through readers:
  *
  *   - `spark.sql.legacy.parquet.nanosAsLong` — `events.ts` is parquet
  *     TIMESTAMP(NANOS), which Spark 4 refuses to map to TimestampType
  *     (micros); with the conf the column arrives as epoch-nanos LONG and
  *     [[Tables.events]] rebuilds a proper timestamp with integer `DIV`.
  *     Session-level because it changes the SCHEMA a scan produces —
  *     setting it per-read mutates shared session state mid-query, a
  *     footgun when streams capture schemas before the conf flips.
  *   - `spark.sql.shuffle.partitions` sized to the worker count (local
  *     mode; a real cluster tunes this to executors × cores).
  *   - UTC session timezone: every oracle comparison assumes it.
  */
object GraftSession {

  /** Builder with graft defaults applied; callers may chain further
    * `.config(...)` (e.g. extensions) before `getOrCreate()`.
    */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** The standard local session used by mains and specs. */
  def local(master: String = "local[4]", shufflePartitions: Int = 4): SparkSession =
    builder(master, shufflePartitions).getOrCreate()

  /** Production state-store wiring for the streaming forget-table: back
    * `flatMapGroupsWithState` state with RocksDB instead of the default
    * in-heap HDFSBackedStateStoreProvider.
    *
    * At the reference's ambition — "millions of distributions"
    * (reference `README.md:5`), each an unbounded bins→count map — the
    * default provider keeps every version of every state row on the
    * executor heap; RocksDB keeps state off-heap with incremental
    * (changelog) checkpoints, so state size is bounded by local disk,
    * not heap. These are dynamic SQL confs: set them on the session
    * before `start()`; each streaming query pins the provider it started
    * with in its checkpoint.
    *
    * [[graft.RocksDBStreamSpec]] proves ForgetStream end-to-end on this
    * provider (and that RocksDB actually served the state, via the
    * query's `rocksdb*` custom metrics).
    */
  def enableRocksDBStateStore(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // incremental checkpointing: upload the changelog per batch, compact
    // full snapshots in the background — the at-scale default
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
  }

  /** Undo [[enableRocksDBStateStore]] (tests restore the default provider
    * so suites sharing the session are unaffected).
    */
  def disableRocksDBStateStore(spark: SparkSession): Unit = {
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    spark.conf.unset(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
  }
}
