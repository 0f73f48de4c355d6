package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row}

/** Contiguous global row ids — the bridge from "unordered distributed
  * table" to "positionally addressed dataset" that sharding, sequence
  * packing and the alternate-encoding transpose all need.
  *
  * `monotonically_increasing_id` is sparse (partition-striped), and the
  * SQL spelling `row_number() OVER (ORDER BY key)` plans a GLOBAL sort
  * into a single partition — a non-starter at 100 TB. This operator is
  * the distributed zipWithIndex: range-repartition on the sort key +
  * in-partition sort puts rows in global order across partitions; one
  * tiny per-partition count job computes offsets; indices are then
  * assigned map-side. Two jobs, no single-task stage, nothing on the
  * driver but partition counts.
  *
  * The index is the row's position in the total order of `sortCols`
  * (which must be a unique key for the result to be well-defined) —
  * deterministic regardless of where range-partition boundaries fall.
  */
object RowIndex {

  def withContiguousIndex(df: DataFrame, sortCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    // zipWithIndex runs the size-count job itself; cache so the sort isn't
    // executed twice (count + map). Released below once the result is
    // materialized — a public framework op cannot delegate cache hygiene
    // to the caller (one leaked persisted RDD per invocation otherwise).
    val rdd = sorted.rdd.cache()
    try {
      val out = rdd.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(i +: r.toSeq)
      }
      // Eager result materialization (lineage truncated), intermediate
      // cache dropped — see PrefixSum.withExclusivePrefix for rationale.
      spark.createDataFrame(out,
          StructType(StructField("row_idx", LongType, nullable = false) +:
            sorted.schema.fields))
        .localCheckpoint(eager = true)
    } finally { rdd.unpersist(blocking = false); () }
  }
}
