package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  * Centralized so every query benefits from the same scan behaviour:
  * parquet columnar scans with Catalyst column pruning + predicate
  * pushdown (verify `PushedFilters` / `ReadSchema` in explain output).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to TimestampType (micros). Under `spark.sql.legacy.parquet.nanosAsLong`
    * (set once at session build — [[GraftSession]]) it arrives as an
    * epoch-nanos long; we rebuild a proper TimestampType column with
    * integer `DIV` (never double division: epoch-nanos ~1.7e18 exceeds a
    * double's 2^53 integer range, so `/ 1000` would corrupt low digits).
    * The reader is pure: it never mutates session conf.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet carries TIMESTAMP(NANOS): build the session via " +
        "graft.sources.GraftSession (or set spark.sql.legacy.parquet.nanosAsLong=true " +
        "BEFORE any events scan captures its schema)")
    table(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
