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

  /** Codegen'd language-ID heuristic over a string column — see
    * [[org.apache.spark.sql.graftfns.LangId]].
    */
  def langId(text: Column): Column =
    org.apache.spark.sql.graftfns.textBridge.langId(text)

  /** Codegen'd winnowing fingerprint (min rolling hash over n-token
    * windows) — see [[org.apache.spark.sql.graftfns.Fingerprint]].
    */
  def fingerprint(text: Column, n: Int): Column =
    org.apache.spark.sql.graftfns.textBridge.fingerprint(text, n)

  /** Codegen'd Unicode NFC normalization (DuckDB `nfc_normalize`
    * parity) — see [[org.apache.spark.sql.graftfns.NfcNormalize]].
    */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graftfns.textBridge.nfcNormalize(text)

  /** Register graft's native functions (`dot_product`) for SQL use in an
    * already-running session; cluster-wide installs should set
    * `spark.sql.extensions=graft.GraftExtensions` instead.
    */
  def registerSqlFunctions(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftfns.bridge.register(spark)
}
