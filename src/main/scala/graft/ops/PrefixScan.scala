package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix scans for associative ops beyond addition —
  * [[PrefixSum]]'s two-phase shape (range-repartition pinned once,
  * partitioned window within each range bucket, per-bucket partials
  * combined and broadcast back) generalized to MAX. Like PrefixSum this
  * is pure DataFrame operators over a single materialized bucketing:
  * one shuffle of the input, whole-stage codegen, no Row decode.
  *
  * The motivating operator is the 2-D skyline / Pareto frontier: a point
  * survives iff its y strictly exceeds the running maximum of y over all
  * strictly-cheaper x — i.e. an EXCLUSIVE prefix-max in x-order. The SQL
  * spelling (`MAX(y) OVER (ORDER BY x ROWS … 1 PRECEDING)`) plans a
  * single-partition global sort; this op keeps full parallelism at any
  * frame size. Results are exact (integer max is associative and
  * insensitive to partition boundaries).
  */
object PrefixScan {

  /** Adds `prefix_max` (exclusive running max of `valueCol` — the max
    * over all STRICTLY PRECEDING rows in the total order of `sortCols`,
    * which must be a unique key). `valueCol` is read as a long and MUST
    * be non-null on every row (callers feed aggregate outputs; a NULL
    * fails the job fast with a clear message rather than being silently
    * skipped by the window max). The first row's prefix is the identity
    * `Long.MinValue`, so a strict `value > prefix_max` filter admits it
    * naturally.
    */
  def withExclusivePrefixMax(df: DataFrame, sortCols: Seq[String],
                             valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val numParts = spark.sparkContext.defaultParallelism
    val checkedValue = when(col(valueCol).isNull,
      raise_error(lit(s"PrefixScan.withExclusivePrefixMax: NULL in " +
        s"value column '$valueCol' — prefix-max is defined over " +
        "non-null values only")).cast("long"))
      .otherwise(col(valueCol).cast("long"))
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
      .withColumn("__v", checkedValue)
    val w = Window.partitionBy("__pid")
      .orderBy(sortCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("__local",
      coalesce(max(col("__v")).over(w), lit(Long.MinValue)))
    // ≤ numParts rows; the limit states the bound explicitly (the plan
    // contract for an unpartitioned window: bounded input only).
    val totals = bucketed.groupBy("__pid")
      .agg(max(col("__v")).as("__tot"))
      .limit(numParts)
    val wo = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off",
        coalesce(max(col("__tot")).over(wo), lit(Long.MinValue)))
      .select(col("__pid"), col("__off"))
    // Checkpointed — see PrefixSum for the fan-out rationale.
    local.join(broadcast(offsets), "__pid")
      .withColumn("prefix_max", greatest(col("__off"), col("__local")))
      .drop("__pid", "__v", "__local", "__off")
      .localCheckpoint(eager = true)
  }
}
