// Hosted in Spark's ml package only to reach the private[ml]
// DefaultParamsWriter/DefaultParamsReader helpers — the canonical
// metadata (de)serialization every Spark ML model writer uses. Nothing
// here overrides or patches Spark; public entry points are the
// FeatureSelectorModel/RowSelectorModel companions in graft.feature.
package org.apache.spark.ml.graft

import org.apache.spark.ml.param.Params
import org.apache.spark.ml.util.{DefaultParamsReader, DefaultParamsWriter}
import org.apache.spark.sql.SparkSession

object PersistShim {

  /** Writes the standard `metadata/` JSON (class, uid, params) for
    * `instance` under `path`.
    */
  def saveMetadata(instance: Params, path: String,
                   spark: SparkSession): Unit =
    DefaultParamsWriter.saveMetadata(instance, path, spark)

  /** Loads the `metadata/` JSON under `path`, validates the class name,
    * constructs the instance via `factory(uid)`, and restores its params.
    */
  def loadWithMetadata[T <: Params](path: String, spark: SparkSession,
                                    expectedClassName: String,
                                    factory: String => T): T = {
    val metadata =
      DefaultParamsReader.loadMetadata(path, spark, expectedClassName)
    val instance = factory(metadata.uid)
    metadata.getAndSetParams(instance)
    instance
  }
}
