package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the latest right row
  * of the same key whose timestamp is `<=` the left row's timestamp.
  *
  * The reference engine has no join surface at all (SURVEY.md §2.5); this
  * is an extension operator for event-stream / market-data shapes that
  * plain Spark SQL lacks as a primitive.
  *
  * Physical shape — the "union merge" plan, not a range join:
  * both sides are tagged and unioned, then a single hash-partition on the
  * key + per-partition sort by (ts, side, tie) lets a running
  * `last(_, ignoreNulls)` window carry the most recent right payload into
  * each left row. Cost is one shuffle of |L|+|R| rows and one sort —
  * independent of time-range density, whereas the naive
  * `L JOIN R ON key AND r.ts <= l.ts` + argmax explodes to O(|L|·|R|)
  * pairs per key before pruning (fatal on 100 TB with hot keys). AQE skew
  * splitting applies to the single shuffle as usual.
  *
  * Semantics (made explicit where the concept is underspecified):
  *   - right rows at exactly `left.ts` DO match (`<=`, the ASOF JOIN
  *     convention);
  *   - among right rows sharing (key, ts), the one with the largest
  *     `tieCol` wins (deterministic replacement for "arbitrary");
  *   - left rows with no prior right row keep NULL right columns
  *     (left-outer convention).
  */
object AsOfJoin {

  /** @param left     probe side; all its columns survive
    * @param right    build side; its columns are attached with `rPrefix`
    * @param key      equi-join key column name (present on both sides)
    * @param ts       event-time column name (present on both sides,
    *                 mutually comparable type)
    * @param tieCol   right-side column breaking (key, ts) ties, largest
    *                 wins; must be orderable
    * @param rPrefix  prefix for the attached right columns
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           tieCol: String, rPrefix: String = "r_"): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(right.columns.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val tieType = right.select(col(tieCol)).schema.head.dataType
    // Tie values keep their native type (a string cast would order "10"
    // before "9"); left rows carry NULL — their within-group order is
    // irrelevant because the running last() is identical across them.
    val l2 = left.select(col(key).as("__k"), col(ts).as("__t"),
      lit(1).as("__side"), lit(null).cast(tieType).as("__tie"),
      lStruct.as("__lp"), lit(null).cast(rType).as("__rp"))
    val r2 = right.select(col(key).as("__k"), col(ts).as("__t"),
      lit(0).as("__side"), col(tieCol).as("__tie"),
      lit(null).cast(lType).as("__lp"), rStruct.as("__rp"))
    // Right rows sort before left rows at equal ts (side 0 < 1) so the
    // running last() includes same-instant right rows — the `<=` semantic.
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l2.union(r2)
      .withColumn("__match", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val lCols = left.columns.map(c => col(s"__lp.$c").as(c))
    val rCols = right.columns.map(c =>
      col(s"__match.$c").as(s"$rPrefix$c"))
    matched.select(lCols ++ rCols: _*)
  }
}
