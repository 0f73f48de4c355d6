package graft.feature

import org.apache.spark.ml.feature.VectorSlicer
import org.apache.spark.ml.graft.PersistShim
import org.apache.spark.ml.linalg.SQLDataTypes.VectorType
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Params shared by the conventional-encoding selector stages. Mirrors the
  * reference's Param surface, defaults and validators
  * (`reference:src/main/scala/ifs/ml/feature/FeatureSelector.scala:14-31`).
  */
private[feature] trait FeatureSelectorParams extends Params {
  final val numTopFeatures = new IntParam(this, "numTopFeatures",
    "number of features to select (> 0)", ParamValidators.gt(0))
  setDefault(numTopFeatures -> 10)
  final def getNumTopFeatures: Int = $(numTopFeatures)

  final val featuresCol = new Param[String](this, "featuresCol",
    "features column name (VectorType)")
  setDefault(featuresCol -> "features")
  final def getFeaturesCol: String = $(featuresCol)

  final val labelCol = new Param[String](this, "labelCol",
    "label column name (integral, cast to double at fit time)")
  setDefault(labelCol -> "label")
  final def getLabelCol: String = $(labelCol)

  final val outputCol = new Param[String](this, "outputCol",
    "output column name (must not already exist)")
  setDefault(outputCol -> "selectedFeatures")
  final def getOutputCol: String = $(outputCol)

  /** Input checks + output schema, same contract as the reference
    * (`reference:FeatureSelector.scala:101-109`): label integral, features
    * VectorType, outputCol absent; output appends a non-nullable VectorType
    * column.
    */
  protected def validateAndTransformSchema(schema: StructType): StructType = {
    val labelType = schema($(labelCol)).dataType
    require(labelType == IntegerType || labelType == LongType,
      s"label column ${$(labelCol)} must be IntegerType or LongType, " +
        s"was $labelType")
    require(schema($(featuresCol)).dataType == VectorType,
      s"features column ${$(featuresCol)} must be VectorType, " +
        s"was ${schema($(featuresCol)).dataType}")
    require(!schema.fieldNames.contains($(outputCol)),
      s"output column ${$(outputCol)} already exists")
    StructType(schema.fields :+
      StructField($(outputCol), VectorType, nullable = false))
  }
}

/** Greedy mRMR feature selection over the conventional encoding (instances =
  * rows, features = one VectorType column), as an ML pipeline Estimator.
  *
  * API-compatible with the reference stage
  * (`reference:FeatureSelector.scala:33-41` usage contract):
  * {{{
  *   val model = new FeatureSelector()
  *     .setNumTopFeatures(10)
  *     .setLabelCol("label").setFeaturesCol("features")
  *     .setOutputCol("selected")
  *     .fit(df)
  *   model.transform(df)
  * }}}
  */
class FeatureSelector(override val uid: String)
  extends Estimator[FeatureSelectorModel] with FeatureSelectorParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("featureSelector"))

  def setNumTopFeatures(value: Int): this.type = set(numTopFeatures, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setLabelCol(value: String): this.type = set(labelCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  override def fit(dataset: Dataset[_]): FeatureSelectorModel = {
    transformSchema(dataset.schema)
    val selected = IterativeFeatureSelection.selectColumns(
      dataset.toDF(), $(labelCol), $(featuresCol), $(numTopFeatures))
    copyValues(new FeatureSelectorModel(uid, selected.map(_._1).toArray)
      .setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): FeatureSelector = defaultCopy(extra)
}

object FeatureSelector extends DefaultParamsReadable[FeatureSelector]

/** Model produced by [[FeatureSelector]]: holds the selected feature indices
  * in selection order; `transform` projects the features vector down to the
  * selected indices in ascending order via Spark's own `VectorSlicer`
  * (same delegation as `reference:FeatureSelector.scala:119-162`).
  *
  * FULL persistence: `write` saves the params metadata AND the
  * `selectedFeatures` data (parquet under `data/`), and the companion's
  * `read`/`load` restores a working model — the reference persists params
  * only (`reference:FeatureSelector.scala:8,45` — its model cannot be
  * loaded back at all), which is the first thing a real pipeline user
  * hits; this exceeds that on purpose.
  */
class FeatureSelectorModel private[feature](override val uid: String,
                                            val selectedFeatures: Array[Int])
  extends Model[FeatureSelectorModel] with FeatureSelectorParams
    with MLWritable {

  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  private def slicer: VectorSlicer = new VectorSlicer()
    .setIndices(selectedFeatures.sorted)
    .setInputCol($(featuresCol))
    .setOutputCol($(outputCol))

  override def transform(dataset: Dataset[_]): DataFrame =
    slicer.transform(dataset)

  override def transformSchema(schema: StructType): StructType = {
    require(schema($(featuresCol)).dataType == VectorType,
      s"features column ${$(featuresCol)} must be VectorType")
    require(!schema.fieldNames.contains($(outputCol)),
      s"output column ${$(outputCol)} already exists")
    StructType(schema.fields :+
      StructField($(outputCol), VectorType, nullable = false))
  }

  override def copy(extra: ParamMap): FeatureSelectorModel =
    copyValues(new FeatureSelectorModel(uid, selectedFeatures), extra)
      .setParent(parent)

  override def write: MLWriter =
    new FeatureSelectorModel.FeatureSelectorModelWriter(this)
}

object FeatureSelectorModel extends MLReadable[FeatureSelectorModel] {

  private[feature] class FeatureSelectorModelWriter(
      instance: FeatureSelectorModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      PersistShim.saveMetadata(instance, path, sparkSession)
      val spark = sparkSession
      import spark.implicits._
      // one tiny row: the selection order matters, so an array column —
      // not one row per index — keeps it explicit
      Seq(Tuple1(instance.selectedFeatures.toSeq))
        .toDF("selectedFeatures")
        .repartition(1)
        .write.parquet(new org.apache.hadoop.fs.Path(path, "data").toString)
    }
  }

  private class FeatureSelectorModelReader
    extends MLReader[FeatureSelectorModel] {
    override def load(path: String): FeatureSelectorModel = {
      val dataPath = new org.apache.hadoop.fs.Path(path, "data").toString
      val selected = sparkSession.read.parquet(dataPath)
        .select("selectedFeatures").head()
        .getAs[scala.collection.Seq[Int]](0).toArray
      PersistShim.loadWithMetadata(path, sparkSession,
        classOf[FeatureSelectorModel].getName,
        uid => new FeatureSelectorModel(uid, selected))
    }
  }

  override def read: MLReader[FeatureSelectorModel] =
    new FeatureSelectorModelReader

  override def load(path: String): FeatureSelectorModel = super.load(path)
}
