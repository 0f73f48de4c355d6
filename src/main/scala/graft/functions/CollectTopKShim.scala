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
}
