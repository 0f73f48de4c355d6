package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equal-width discretization of a continuous column — the preprocessing
  * step that extends the categorical-only IFS operators (the reference
  * engine consumes pre-discretized integer matrices; see SURVEY.md §1.1)
  * to raw continuous features.
  *
  * Equal-width (not quantile) binning is chosen for the gate because it
  * is exactly reproducible relationally: the bin of a value depends only
  * on the global min/max — two scalar aggregates — so a SQL oracle
  * computes identical bins, whereas quantile splits would drag the whole
  * approx-percentile algorithm into the contract. For quantile binning
  * compose `q_ntile_quartiles`' window shape instead.
  *
  * Scale shape: one exact min/max aggregation (map-side combine to two
  * scalars), then a pure per-row projection — no shuffle, no UDF, stays
  * inside whole-stage codegen.
  */
object Discretize {

  /** Adds `outCol` = equal-width bin of `inCol` over fixed [lo, hi]:
    * floor((x - lo) / ((hi - lo) / nBins)) clamped to [0, nBins-1].
    * Values above `hi` clamp into the top bin, below `lo` into bin 0
    * (floor of a negative ratio is negative — clamped). A degenerate
    * lo == hi range puts everything in bin 0.
    */
  def equalWidth(df: DataFrame, inCol: String, outCol: String,
                 nBins: Int, lo: Double, hi: Double): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val width = (hi - lo) / nBins
    val bin =
      if (width == 0) lit(0L)
      else greatest(least(floor((col(inCol) - lo) / width),
        lit(nBins - 1L)), lit(0L))
    df.withColumn(outCol, bin.cast("long"))
  }

  /** As [[equalWidth]] with [lo, hi] taken from the column's exact
    * min/max (one aggregation job; min/max are order-insensitive, so the
    * resulting splits are deterministic across partitionings and match a
    * relational oracle computing the same two scalars).
    */
  def equalWidthAuto(df: DataFrame, inCol: String, outCol: String,
                     nBins: Int): DataFrame = {
    val r = df.agg(min(col(inCol)).cast("double"),
      max(col(inCol)).cast("double")).head()
    equalWidth(df, inCol, outCol, nBins, r.getDouble(0), r.getDouble(1))
  }
}
