package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed AS-OF (point-in-time) join — the operator Spark lacks
  * natively: for each left row, the single right row with the greatest
  * event time at or before the left row's time, per join key.
  *
  * Plan shape (the union-merge): tag both sides, hash-partition ONCE on
  * the key, sort each partition ONCE by event time, and carry the
  * latest right row forward with a RUNNING (growing-frame) window that
  * Spark evaluates incrementally — one shuffle per side into a single
  * sort + single-pass WindowExec. No per-row rescan, no range-join row
  * blowup, no unbounded-frame recompute; cost scales with rows, not
  * rows-per-key squared (see the BASELINE.md probe: 10x events in
  * ~2.2x time). Partitioning is by the join key, so skew follows key
  * cardinality — at 100 TB pick a key with bounded rows-per-key (a
  * user id, not a global constant).
  *
  * Determinism: within equal timestamps, right rows sort before left
  * rows (a right row AT the left row's instant matches, i.e. `<=`) and
  * the highest `rightOrder` value wins — total order where native ASOF
  * implementations (e.g. DuckDB's) leave ties unspecified. Sort keys
  * must be null-free: Spark sorts nulls first ascending while DuckDB
  * sorts them last, so the left side substitutes a constant sentinel.
  *
  * @param left       left (probe) side
  * @param right      right (reference) side
  * @param key        equi-join key column name, present on both sides
  * @param leftTs     left event-time column name
  * @param rightTs    right event-time column name
  * @param rightOrder right tie-break column name (highest wins), must
  *                   be non-null and never negative — `-1` is the
  *                   left-side sentinel
  * @param rightCols  right columns to carry onto each left row (names
  *                   must not collide with left columns). All carried
  *                   columns travel as ONE struct, so every output
  *                   column comes from the SAME matched right row even
  *                   when individual right columns are null; the
  *                   struct's nullness is the match indicator.
  * @param inner      true drops left rows with no match (null-free
  *                   output); false keeps them with null right columns
  * @param forward    false (default): greatest right time at or BEFORE
  *                   the left time, ties to the HIGHEST rightOrder.
  *                   true: smallest right time at or AFTER the left
  *                   time, ties to the LOWEST rightOrder — implemented
  *                   by reversing the merge scan order (ts desc), so
  *                   the frame stays the incrementally-evaluated
  *                   growing frame; a currentRow→unboundedFollowing
  *                   frame would recompute per row (quadratic per
  *                   partition in Spark's UnboundedFollowing frame).
  */
object AsofJoin {

  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, rightOrder: String,
           rightCols: Seq[String], inner: Boolean = true,
           forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    // All carried right columns travel as ONE struct so the running
    // last(ignoreNulls) picks whole rows, never splicing a null field
    // from an older right row (the struct is non-null on every right
    // row even when its fields are null).
    val carryType = StructType(rightCols.map(c => right.schema(c)).toArray)
    val rTagged = right.select(
      Seq(col(key), col(rightTs).as("__asof_ts"), lit(0).as("__asof_side"),
        col(rightOrder).cast("long").as("__asof_ord"),
        struct(rightCols.map(col): _*).as("__asof_carry")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      Seq(col(key), col(leftTs).as("__asof_ts"), lit(1).as("__asof_side"),
        lit(-1L).as("__asof_ord"),
        lit(null).cast(carryType).as("__asof_carry")) ++
        leftCols.filterNot(_ == key).map(col): _*)
    // Scan order: time (reversed for forward), right rows before left
    // rows at equal time (a right row AT the left instant matches), the
    // winning tie-break order LAST so the running last() picks it.
    val w = Window.partitionBy(key)
      .orderBy(
        (if (forward) col("__asof_ts").desc else col("__asof_ts").asc) +:
          col("__asof_side") +:
          (if (forward) Seq(col("__asof_ord").desc) else Seq(col("__asof_ord").asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = rTagged.unionByName(lTagged)
      .select(Seq(col(key), col("__asof_side")) ++
        leftCols.filterNot(_ == key).map(col) :+
        last(col("__asof_carry"), ignoreNulls = true).over(w).as("__asof_match"): _*)
      .filter(col("__asof_side") === 1)
    val probe = if (inner) merged.filter(col("__asof_match").isNotNull) else merged
    probe.select(leftCols.map(col) ++
      rightCols.map(c => col("__asof_match").getField(c).as(c)): _*)
  }

  /** Hot-key-safe AS-OF join: identical semantics to [[join]], with the
    * window partitioned by (key, time-bucket) instead of key alone, so
    * one key with 10^8 events no longer lands on one task.
    *
    * Mechanics: both sides bucket into `floor(ts / bucketSeconds)`.
    * A per-(key, bucket) BOUNDARY table — the latest right row of each
    * bucket, ties to the highest `rightOrder` — is carried forward to
    * every later bucket that contains left rows (a running window over
    * the boundary table, whose partitions hold at most one row per
    * bucket: time-span / bucketSeconds rows per key, bounded by the
    * bucket width choice, not by row count). Each (key, bucket)
    * partition then runs the same union-merge as [[join]] over its own
    * rows plus the carried boundary row, so the largest sort partition
    * is the hottest single bucket — pick `bucketSeconds` so that stays
    * task-sized (e.g. hourly buckets for a key with ~10^4 events/hour).
    *
    * Cost vs [[join]]: one extra small shuffle (the boundary aggregate,
    * one row per (key, bucket)) — the price of bounding skew. Use
    * [[join]] when rows-per-key is known-bounded.
    */
  def joinBucketed(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, rightOrder: String,
                   rightCols: Seq[String], bucketSeconds: Long,
                   inner: Boolean = true): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val leftCols = left.columns.toSeq
    val carryType = StructType(rightCols.map(c => right.schema(c)).toArray)
    def bucketOf(ts: Column) = floor(ts.cast("long") / lit(bucketSeconds)).cast("long")
    val rB = right.select(col(key), bucketOf(col(rightTs)).as("__b"),
      col(rightTs).as("__asof_ts"), col(rightOrder).cast("long").as("__asof_ord"),
      struct(rightCols.map(col): _*).as("__asof_carry"))
    // Latest right row per (key, bucket): ties to the highest order —
    // the same total order the merge pass uses.
    val boundary = rB.groupBy(col(key), col("__b"))
      .agg(max_by(struct(col("__asof_ts"), col("__asof_ord"), col("__asof_carry")),
        struct(col("__asof_ts"), col("__asof_ord"))).as("__bd"))
    // Carry each key's latest boundary STRICTLY BEFORE bucket b into
    // every left-occupied bucket b: markers sort before same-bucket
    // boundaries, so the running last() sees only earlier buckets.
    val markers = left.select(col(key), bucketOf(col(leftTs)).as("__b"))
      .distinct()
      .withColumn("__mk", lit(0))
      .withColumn("__bd", lit(null).cast(boundary.schema("__bd").dataType))
    val wCarry = Window.partitionBy(key).orderBy(col("__b"), col("__mk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carriedIn = boundary.withColumn("__mk", lit(1))
      .unionByName(markers)
      .select(col(key), col("__b"), col("__mk"),
        last(col("__bd"), ignoreNulls = true).over(wCarry).as("__bd"))
      .filter(col("__mk") === 0 && col("__bd").isNotNull)
      .select(col(key), col("__b"),
        col("__bd").getField("__asof_ts").as("__asof_ts"),
        col("__bd").getField("__asof_ord").as("__asof_ord"),
        col("__bd").getField("__asof_carry").as("__asof_carry"))
    // Union-merge within (key, bucket): in-bucket right rows + the
    // carried boundary (its ts precedes the bucket, so it sorts first)
    // + left rows; same running-last struct carry as [[join]].
    val rTagged = rB.unionByName(carriedIn)
      .select(Seq(col(key), col("__b"), col("__asof_ts"), lit(0).as("__asof_side"),
        col("__asof_ord"), col("__asof_carry")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      Seq(col(key), bucketOf(col(leftTs)).as("__b"), col(leftTs).as("__asof_ts"),
        lit(1).as("__asof_side"), lit(-1L).as("__asof_ord"),
        lit(null).cast(carryType).as("__asof_carry")) ++
        leftCols.filterNot(_ == key).map(col): _*)
    val w = Window.partitionBy(col(key), col("__b"))
      .orderBy(col("__asof_ts"), col("__asof_side"), col("__asof_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = rTagged.unionByName(lTagged)
      .select(Seq(col(key), col("__asof_side")) ++
        leftCols.filterNot(_ == key).map(col) :+
        last(col("__asof_carry"), ignoreNulls = true).over(w).as("__asof_match"): _*)
      .filter(col("__asof_side") === 1)
    val probe = if (inner) merged.filter(col("__asof_match").isNotNull) else merged
    probe.select(leftCols.map(col) ++
      rightCols.map(c => col("__asof_match").getField(c).as(c)): _*)
  }
}
