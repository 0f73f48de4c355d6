// Hosted in Spark's aggregate package only to reach the
// private[aggregate] CollectTopK constructor (the bounded-heap top-k
// aggregate mllib's recommendForAllUsers is built on) — the expression
// itself is stock Spark; nothing here overrides or patches it. Public
// entry point: graft.functions.TopK.
package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftCollectTopK {
  def apply(child: Expression, num: Int, reverse: Boolean): Expression =
    CollectTopK(child, num, reverse).toAggregateExpression()

  /** SQL builder: `collect_top_k(expr, k[, reverse])` — the analyzer wraps
    * the returned AggregateFunction itself.
    */
  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2 || children.length == 3,
      s"collect_top_k expects 2 or 3 arguments, got ${children.length}")
    val num = CollectTopK.expressionToNum(children(1))
    val rev =
      if (children.length == 3) CollectTopK.expressionToReverse(children(2))
      else false
    CollectTopK(children.head, num, rev)
  }
}
