package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftx.{Shim => X}

/** Column wrappers over Catalyst's internal bloom-filter expressions —
  * the same machinery Spark's own runtime row-level filtering
  * (`InjectRuntimeFilter`) plans, exposed for explicit use in pipeline
  * operators.
  *
  * The pattern they enable is the scale play for any large-join whose
  * build side is small relative to the probe side (train x test
  * decontamination, revocation lists, per-tenant blocklists): aggregate
  * the build side's 8-byte keys into ONE bloom filter row (partial
  * aggregation merges filters executor-side, so the driver sees
  * numBits/8 bytes once), broadcast it, and drop probe-side rows before
  * they reach the shuffle. False positives survive the prefilter and
  * are eliminated by the exact join that follows — the result is
  * byte-identical to the unfiltered plan; only the shuffled volume
  * changes (at 100 TB: from the full probe-side scan to the true-match
  * rows plus an fp-rate sliver).
  */
object SketchExprs {

  /** Aggregate a LONG column into one bloom filter (binary). Sized by
    * `expectedItems`/`numBits` at build time; both are plan literals so
    * the filter's memory is fixed and broadcast-safe.
    */
  def bloomFilterAgg(value: Column, expectedItems: Long, numBits: Long): Column =
    X.column(new BloomFilterAggregate(X.expression(value),
      Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression())

  /** Membership probe of a LONG value against a 1-row bloom-filter
    * frame (typically `side.agg(bloomFilterAgg(...))`). `might_contain`
    * requires its filter operand to be a constant or scalar subquery —
    * the build side must be fully aggregated before any probe row is
    * judged — so the frame's analyzed plan is wrapped as an
    * uncorrelated [[ScalarSubquery]], exactly the plan shape Spark's
    * `InjectRuntimeFilter` emits. Never false-negative; false positives
    * at the rate the numBits/expectedItems sizing implies.
    */
  def mightContain(bloomFrame: DataFrame, value: Column): Column =
    X.column(BloomFilterMightContain(
      ScalarSubquery(bloomFrame.queryExecution.analyzed),
      X.expression(value)))
}
