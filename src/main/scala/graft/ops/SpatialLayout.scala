package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Z-order (Morton) data layout: interleave the bits of two dimension
  * columns so that range-partitioning + sorting on the single z-value
  * co-locates rows that are close in BOTH dimensions — the standard
  * lakehouse trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) that lets parquet
  * min/max row-group stats prune scans filtered on either column, where a
  * plain sort only serves its leading column.
  *
  * The z-value is pure shift/mask column arithmetic (codegen'd built-in
  * expressions, no UDF), so it runs map-side at ingest cost.
  */
object SpatialLayout {

  /** Morton interleave of two non-negative int columns, `bits` low bits
    * each (x at odd positions, y at even): z(1,0)=2, z(0,1)=1, z(3,3)=15.
    * `bits` is capped at 15 so the 2·bits-bit result stays inside a
    * positive Int — beyond that the top bit would land in the sign bit
    * and corrupt the sort order silently.
    */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 15,
      s"bits must be in [1, 15] (z uses 2*bits bits of a signed Int), got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i + 1) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i)
    }.reduce(_ + _)
  }

  /** `df` laid out in z-order of (xCol, yCol): range-partitioned and
    * sorted by the interleaved value (plus the original dims as
    * tie-breakers for determinism). Write the result to parquet and both
    * dimensions prune.
    */
  def zOrdered(df: DataFrame, xCol: String, yCol: String,
               bits: Int): DataFrame = {
    val z = zValue2(col(xCol), col(yCol), bits).as("z")
    df.withColumn("z", z)
      .repartitionByRange(df.sparkSession.sparkContext.defaultParallelism,
        col("z"), col(xCol), col(yCol))
      .sortWithinPartitions(col("z"), col(xCol), col(yCol))
  }
}
