package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global row ids — the bridge from "unordered distributed
  * table" to "positionally addressed dataset" that sharding, sequence
  * packing and the alternate-encoding transpose all need.
  *
  * `monotonically_increasing_id` is sparse (partition-striped), and the
  * SQL spelling `row_number() OVER (ORDER BY key)` plans a GLOBAL sort
  * into a single partition — a non-starter at 100 TB. This operator is
  * the distributed zipWithIndex in pure DataFrame operators (same
  * two-phase shape as [[PrefixSum]]; the earlier RDD spelling paid a
  * Row decode + re-encode of every row): range-repartition on the sort
  * key (bucketing pinned once so both subplans read the same
  * materialized fact), `row_number` WITHIN each range bucket (a
  * partitioned window, never a global sort), per-bucket counts (≤ P
  * rows, limit-bounded) prefix-summed into offsets and broadcast back.
  *
  * The index is the row's position in the total order of `sortCols`
  * (which must be a unique key for the result to be well-defined) —
  * deterministic regardless of where range-partition boundaries fall.
  */
object RowIndex {

  /** With `pin = true` (default) the result is eagerly
    * `localCheckpoint`ed for callers that fan out from it repeatedly;
    * single-consumer callers pass `pin = false` — re-running the cheap
    * in-bucket window over the (always-pinned) bucketing costs less
    * than the eager output materialization (measured, same accounting
    * as [[PrefixSum]]'s pin flag). The bucketing pin that guarantees
    * boundary consistency is unconditional either way.
    */
  def withContiguousIndex(df: DataFrame, sortCols: Seq[String],
                          pin: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val numParts = spark.sparkContext.defaultParallelism
    val bucketed = df
      .repartitionByRange(numParts, sortCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      // Pinned ONCE: the window subplan and the totals subplan both read
      // this materialized RDD, so the sampled range boundaries and pid
      // assignment are a single fact — never re-derived per subplan
      // (column pruning can make the two subplans canonically different,
      // defeating exchange reuse; re-sampling then yields INCONSISTENT
      // boundaries because aggregate output order is not stable).
      .localCheckpoint(eager = true)
    val w = Window.partitionBy("__pid").orderBy(sortCols.map(col): _*)
    val local = bucketed
      .withColumn("__rn", row_number().over(w).cast("long"))
    // ≤ numParts rows; the limit states the bound explicitly (the plan
    // contract for an unpartitioned window: bounded input only).
    val counts = bucketed.groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"))
      .limit(numParts)
    val wo = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wo), lit(0L)))
      .select(col("__pid"), col("__off"))
    // Checkpointed on request — see PrefixSum for the fan-out rationale.
    val out = local.join(broadcast(offsets), "__pid")
      .withColumn("row_idx", col("__off") + col("__rn") - 1)
      .drop("__pid", "__rn", "__off")
    if (pin) out.localCheckpoint(eager = true) else out
  }
}
