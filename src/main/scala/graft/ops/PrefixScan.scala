package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row}

/** Distributed prefix scans for associative ops beyond addition —
  * [[PrefixSum]]'s two-phase shape (range-repartition + in-partition
  * sort, one tiny per-partition reduction job, driver scan over P
  * partials, map-side emission) generalized to MAX.
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
    * be non-null on every row (callers feed aggregate outputs; a
    * nullable input fails fast below rather than surfacing as an opaque
    * NPE inside a task). The first row's prefix is the identity
    * `Long.MinValue`, so a strict `value > prefix_max` filter admits it
    * naturally.
    */
  def withExclusivePrefixMax(df: DataFrame, sortCols: Seq[String],
                             valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    def readValue(r: Row): Long = {
      val raw = r.get(vIdx)
      if (raw == null) throw new IllegalArgumentException(
        s"PrefixScan.withExclusivePrefixMax: NULL in value column " +
          s"'$valueCol' — prefix-max is defined over non-null values only")
      raw.asInstanceOf[Number].longValue()
    }
    // Cached so the partition-reduce job and the output pass share one
    // sort execution; released in finally (see PrefixSum for rationale).
    val rdd = sorted.rdd.cache()
    try {
      val partMaxes = rdd
        .mapPartitionsWithIndex { (pi, it) =>
          var m = Long.MinValue
          it.foreach { r =>
            val v = readValue(r)
            if (v > m) m = v
          }
          Iterator.single(pi -> m)
        }
        .collect().sortBy(_._1).map(_._2)
      val offsets = partMaxes.scanLeft(Long.MinValue)(math.max)
      val bOffsets = spark.sparkContext.broadcast(offsets)
      val out = rdd.mapPartitionsWithIndex { (pi, it) =>
        var run = bOffsets.value(pi)
        it.map { r =>
          val v = readValue(r)
          val row = Row.fromSeq(run +: r.toSeq)
          if (v > run) run = v
          row
        }
      }
      spark.createDataFrame(out,
          StructType(
            StructField("prefix_max", LongType, nullable = false) +:
              sorted.schema.fields))
        .localCheckpoint(eager = true)
    } finally { rdd.unpersist(blocking = false); () }
  }
}
