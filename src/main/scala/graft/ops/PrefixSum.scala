package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row}

/** Distributed running totals in a global sort order — the primitive under
  * sequence packing (cut a corpus into fixed-token-budget bins), byte
  * offset assignment, and cumulative-share analytics.
  *
  * The SQL spelling `SUM(v) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)`
  * plans a single-partition global sort at any scale. This is the
  * classic two-phase scan instead: range-repartition + in-partition sort
  * gives global order across partitions; one tiny job sums each
  * partition; the driver prefix-sums those P values (P numbers, not
  * rows); a map-side pass then emits each row's exclusive prefix =
  * partition offset + running local sum. Two jobs, nothing heavier than
  * a per-partition double on the driver.
  */
object PrefixSum {

  /** Adds `prefix` (exclusive running total of `valueCol` — the sum of
    * all STRICTLY PRECEDING rows in the total order of `sortCols`).
    * `sortCols` must either be a unique key, OR ties must be
    * value-homogeneous: every row sharing a `sortCols` tuple carries the
    * same `valueCol`. Under that weaker contract each row's prefix is
    * still only defined up to the arbitrary order WITHIN its tie block,
    * but the multiset of (prefix, value) pairs across a tie block — and
    * every prefix outside it — is deterministic, which is exactly what
    * consumers that reduce tie blocks with order-free aggregates (max,
    * min, sum; e.g. q_peak_concurrency's sweep) rely on. Consumers that
    * read an individual tied row's prefix need the unique-key form.
    * Values are read as doubles; for
    * INTEGER-VALUED inputs (token counts, byte sizes — the packing use
    * cases) every partial sum is exact, so results are bit-identical
    * regardless of where range-partition boundaries fall. Fractional
    * inputs inherit the usual FP grouping sensitivity — pre-scale to
    * integers if exactness matters.
    */
  def withExclusivePrefix(df: DataFrame, sortCols: Seq[String],
                          valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    // Cached so the partition-sum job and the output pass share one sort
    // execution; released below once the result is materialized — this is
    // a public framework op, so it cannot delegate cache hygiene to the
    // caller (a long-running service invoking it per request would
    // otherwise accumulate one persisted RDD per call).
    val rdd = sorted.rdd.cache()
    try {
      val partSums = rdd
        .mapPartitionsWithIndex { (pi, it) =>
          var s = 0.0
          it.foreach(r => s += r.get(vIdx).asInstanceOf[Number].doubleValue())
          Iterator.single(pi -> s)
        }
        .collect().sortBy(_._1).map(_._2)
      val offsets = partSums.scanLeft(0.0)(_ + _)
      val bOffsets = spark.sparkContext.broadcast(offsets)
      val out = rdd.mapPartitionsWithIndex { (pi, it) =>
        var run = bOffsets.value(pi)
        it.map { r =>
          val v = r.get(vIdx).asInstanceOf[Number].doubleValue()
          val row = Row.fromSeq(run +: r.toSeq)
          run += v
          row
        }
      }
      // Eagerly materialize the RESULT (lineage truncated), then drop the
      // intermediate sorted cache — net pinned storage is one copy of the
      // output, released by the ContextCleaner when the returned frame is
      // no longer referenced, instead of an intermediate block that leaks
      // until a global sweep.
      spark.createDataFrame(out,
          StructType(StructField("prefix", DoubleType, nullable = false) +:
            sorted.schema.fields))
        .localCheckpoint(eager = true)
    } finally { rdd.unpersist(blocking = false); () }
  }
}
