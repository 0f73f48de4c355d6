package graft.functions

import org.apache.spark.sql.Column

/** Public entry points for graft's native Catalyst expressions (the
  * implementations live in `org.apache.spark.sql.graftfns` to reach the
  * private[sql] expression API).
  */
object ArrayMath {
  /** Codegen'd dot product over two array<double> columns — see
    * [[org.apache.spark.sql.graftfns.DotProduct]].
    */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graftfns.bridge.dot(a, b)
}
