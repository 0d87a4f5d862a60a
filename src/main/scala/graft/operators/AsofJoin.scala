package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *                   must not collide with left columns; the FIRST one
  *                   doubles as the match indicator for `inner`, so it
  *                   must be non-null in `right` — an id column)
  * @param inner      true drops left rows with no match (null-free
  *                   output); false keeps them with null right columns
  */
object AsofJoin {

  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, rightOrder: String,
           rightCols: Seq[String], inner: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = rightCols.map(c => s"__asof_$c")
    val rTagged = right.select(
      Seq(col(key), col(rightTs).as("__asof_ts"), lit(0).as("__asof_side"),
        col(rightOrder).cast("long").as("__asof_ord")) ++
        rightCols.zip(carried).map { case (c, a) => col(c).as(a) } ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      Seq(col(key), col(leftTs).as("__asof_ts"), lit(1).as("__asof_side"),
        lit(-1L).as("__asof_ord")) ++
        carried.zip(rightCols).map { case (a, c) => lit(null).cast(right.schema(c).dataType).as(a) } ++
        leftCols.filterNot(_ == key).map(col): _*)
    val w = Window.partitionBy(key)
      .orderBy(col("__asof_ts"), col("__asof_side"), col("__asof_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedCols: Seq[Column] = carried.zip(rightCols).map { case (a, c) =>
      last(col(a), ignoreNulls = true).over(w).as(c)
    }
    val merged = rTagged.unionByName(lTagged)
      .select(Seq(col(key), col("__asof_side")) ++
        leftCols.filterNot(_ == key).map(col) ++ matchedCols: _*)
      .filter(col("__asof_side") === 1)
    val probe = if (inner) merged.filter(col(rightCols.head).isNotNull) else merged
    probe.select(leftCols.map(col) ++ rightCols.map(col): _*)
  }
}
