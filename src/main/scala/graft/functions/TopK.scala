package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Bounded top-k per group as an AGGREGATE, not a window.
  *
  * The usual spelling — `row_number() OVER (PARTITION BY g ORDER BY v
  * DESC) <= k` — shuffles and sorts EVERY row of every group before
  * discarding all but k of them: at 100 TB that is a full-data exchange
  * plus a sort whose only purpose is to throw its output away. This
  * operator keeps a k-element bounded heap per group per partition
  * (Catalyst's `CollectTopK`, the same aggregate mllib's ALS
  * `recommendForAllUsers` uses), so the map side emits at most k rows per
  * (group, partition) and the shuffle is bounded by `groups × partitions
  * × k` — independent of input row count. Two-phase ObjectHashAggregate,
  * no sort of anything larger than k.
  */
object TopK {

  /** Aggregate column: collect the k LARGEST (by the struct/value's
    * ordering) values of `e`; `reverse = true` collects the k smallest.
    * The result array is NOT sorted — wrap in `sort_array` (done by
    * [[topKPerGroup]]).
    */
  def collectTopK(e: Column, k: Int, reverse: Boolean = false): Column =
    org.apache.spark.sql.graftfns.bridge.collectTopK(e, k, reverse)

  /** Top-`k` rows per group: for each distinct value of `groupCols`, the
    * `k` rows with the largest `orderCol` (ties broken by `tieCol`
    * descending — pass e.g. a primary key; both ride in one struct whose
    * lexicographic ordering the heap uses). Returns one output row per
    * kept input row: (groupCols..., rnk, tieCol, orderCol).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
                   tieCol: String, k: Int): DataFrame = {
    val packed = struct(col(orderCol), col(tieCol))
    unpackRanked(
      df.groupBy(groupCols.map(col): _*)
        .agg(collectTopK(packed, k).as("tk")),
      groupCols, "tk", orderCol, tieCol)
  }

  /** Unpack a [[collectTopK]] array of (orderCol, tieCol) structs into
    * one row per element: (groupCols..., rnk, tieCol, orderCol), ranked
    * descending. Shared by the batch and streaming query paths so the
    * heap's struct layout and tie order live in exactly one place.
    */
  def unpackRanked(df: DataFrame, groupCols: Seq[String], tkCol: String,
                   orderCol: String, tieCol: String): DataFrame =
    df.select(groupCols.map(col) :+
        posexplode(sort_array(col(tkCol), asc = false)): _*)
      .select(groupCols.map(col) ++ Seq(
        // long rank: DuckDB's row_number() is BIGINT — emitting the same
        // type keeps the oracle relation hash-identical under typed hashing
        (col("pos") + 1).cast("long").as("rnk"),
        col(s"col.$tieCol").as(tieCol),
        col(s"col.$orderCol").as(orderCol)): _*)
}
