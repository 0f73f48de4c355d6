package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Spark extensions entry point for the graft library — the standard way a
  * third-party engine plugs native functions (and, when ever needed, rules
  * / strategies) into every session of a cluster:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // then, in any session:
  *   spark.sql("SELECT dot_product(embedding, embedding) FROM embeddings")
  * }}}
  *
  * Currently injects the codegen'd `dot_product` expression
  * ([[org.apache.spark.sql.graftfns.DotProduct]]) as a SQL function. For
  * an already-running session (no restart), use
  * [[graft.functions.ArrayMath.registerSqlFunctions]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      org.apache.spark.sql.graftfns.bridge.dotProductFunction)
    ext.injectFunction(
      org.apache.spark.sql.graftfns.bridge.collectTopKFunction)
    ext.injectFunction(
      org.apache.spark.sql.graftfns.textBridge.langIdFunction)
    ext.injectFunction(
      org.apache.spark.sql.graftfns.textBridge.fingerprintFunction)
    ext.injectFunction(
      org.apache.spark.sql.graftfns.textBridge.nfcNormalizeFunction)
  }
}
