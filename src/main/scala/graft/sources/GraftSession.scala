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
}
