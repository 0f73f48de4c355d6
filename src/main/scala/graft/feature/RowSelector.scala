package graft.feature

import org.apache.spark.ml.graft.PersistShim
import org.apache.spark.ml.linalg.SQLDataTypes.VectorType
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Params for the alternate-encoding selector stages. Mirrors the
  * reference's surface, defaults and validators
  * (`reference:src/main/scala/ifs/ml/feature/RowSelector.scala:14-39`).
  */
private[feature] trait RowSelectorParams extends Params {
  final val numTopRows = new IntParam(this, "numTopRows",
    "number of rows (features in alternate encoding) to select (> 0)",
    ParamValidators.gt(0))
  setDefault(numTopRows -> 10)
  final def getNumTopRows: Int = $(numTopRows)

  final val idCol = new Param[String](this, "idCol",
    "unique integral feature-id column")
  setDefault(idCol -> "id")
  final def getIdCol: String = $(idCol)

  final val featuresCol = new Param[String](this, "featuresCol",
    "features column name (VectorType; one feature's values across all " +
      "instances)")
  setDefault(featuresCol -> "features")
  final def getFeaturesCol: String = $(featuresCol)

  final val labelVector = new DoubleArrayParam(this, "labelVector",
    "per-instance class labels (the label row of the transposed matrix)")
  setDefault(labelVector -> Array.emptyDoubleArray)
  final def getLabelVector: Array[Double] = $(labelVector)

  final val outputCol = new Param[String](this, "outputCol",
    "boolean selected-flag output column (must not already exist)")
  setDefault(outputCol -> "selected")
  final def getOutputCol: String = $(outputCol)

  final val filtered = new BooleanParam(this, "filtered",
    "if true, transform keeps only the selected rows")
  setDefault(filtered -> false)
  final def getFiltered: Boolean = $(filtered)

  /** Input checks + output schema
    * (`reference:RowSelector.scala:144-153, 210-215`): features VectorType,
    * id integral, outputCol absent; appends a non-nullable Boolean flag.
    */
  protected def validateAndTransformSchema(schema: StructType): StructType = {
    require(schema($(featuresCol)).dataType == VectorType,
      s"features column ${$(featuresCol)} must be VectorType, " +
        s"was ${schema($(featuresCol)).dataType}")
    val idType = schema($(idCol)).dataType
    require(idType == IntegerType || idType == LongType,
      s"id column ${$(idCol)} must be IntegerType or LongType, was $idType")
    require(!schema.fieldNames.contains($(outputCol)),
      s"output column ${$(outputCol)} already exists")
    StructType(schema.fields :+
      StructField($(outputCol), BooleanType, nullable = false))
  }
}

/** Greedy mRMR selection over the alternate encoding (features = rows,
  * instances = columns), as an ML pipeline Estimator. Per-instance class
  * labels are passed as the `labelVector` Param, not as data — same contract
  * as the reference (`reference:RowSelector.scala:23-24, 49-67`).
  *
  * Selected ids are kept as Long end-to-end, fixing the reference's Int
  * truncation of `monotonically_increasing_id` values (SURVEY.md §2.4 Q6).
  */
class RowSelector(override val uid: String)
  extends Estimator[RowSelectorModel] with RowSelectorParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("rowSelector"))

  def setNumTopRows(value: Int): this.type = set(numTopRows, value)
  def setIdCol(value: String): this.type = set(idCol, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setLabelVector(value: Array[Double]): this.type =
    set(labelVector, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)
  def setFiltered(value: Boolean): this.type = set(filtered, value)

  override def fit(dataset: Dataset[_]): RowSelectorModel = {
    transformSchema(dataset.schema)
    require($(labelVector).nonEmpty, "labelVector must be set and non-empty")
    val selected = IterativeFeatureSelection.selectRows(
      dataset.toDF(), $(idCol), $(featuresCol), $(numTopRows),
      Vectors.dense($(labelVector)))
    copyValues(new RowSelectorModel(uid, selected.map(_._1).toArray)
      .setParent(this))
  }

  override def transformSchema(schema: StructType): StructType = {
    validateAndTransformSchema(schema)
  }

  override def copy(extra: ParamMap): RowSelector = defaultCopy(extra)
}

object RowSelector extends DefaultParamsReadable[RowSelector]

/** Model produced by [[RowSelector]]: flags each row whose id is in the
  * selected set (`outputCol = id IN (selected)`); with `filtered = true`,
  * keeps only the flagged rows. Pure DataFrame ops, same as
  * `reference:RowSelector.scala:198-205`.
  *
  * FULL persistence (params metadata + `selectedRows` data), restorable
  * via the companion's `load` — see [[FeatureSelectorModel]] for why this
  * deliberately exceeds the reference's params-only save.
  */
class RowSelectorModel private[feature](override val uid: String,
                                        val selectedRows: Array[Long])
  extends Model[RowSelectorModel] with RowSelectorParams
    with MLWritable {

  def setIdCol(value: String): this.type = set(idCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)
  def setFiltered(value: Boolean): this.type = set(filtered, value)

  override def transform(dataset: Dataset[_]): DataFrame = {
    val flagged = dataset.withColumn($(outputCol),
      col($(idCol)).isin(selectedRows.toIndexedSeq: _*))
    if ($(filtered)) flagged.filter(col($(outputCol))) else flagged
  }

  override def transformSchema(schema: StructType): StructType = {
    require(!schema.fieldNames.contains($(outputCol)),
      s"output column ${$(outputCol)} already exists")
    StructType(schema.fields :+
      StructField($(outputCol), BooleanType, nullable = false))
  }

  override def copy(extra: ParamMap): RowSelectorModel =
    copyValues(new RowSelectorModel(uid, selectedRows), extra)
      .setParent(parent)

  override def write: MLWriter =
    new RowSelectorModel.RowSelectorModelWriter(this)
}

object RowSelectorModel extends MLReadable[RowSelectorModel] {

  private[feature] class RowSelectorModelWriter(instance: RowSelectorModel)
    extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      PersistShim.saveMetadata(instance, path, sparkSession)
      val spark = sparkSession
      import spark.implicits._
      Seq(Tuple1(instance.selectedRows.toSeq))
        .toDF("selectedRows")
        .repartition(1)
        .write.parquet(new org.apache.hadoop.fs.Path(path, "data").toString)
    }
  }

  private class RowSelectorModelReader extends MLReader[RowSelectorModel] {
    override def load(path: String): RowSelectorModel = {
      val dataPath = new org.apache.hadoop.fs.Path(path, "data").toString
      val selected = sparkSession.read.parquet(dataPath)
        .select("selectedRows").head()
        .getAs[scala.collection.Seq[Long]](0).toArray
      PersistShim.loadWithMetadata(path, sparkSession,
        classOf[RowSelectorModel].getName,
        uid => new RowSelectorModel(uid, selected))
    }
  }

  override def read: MLReader[RowSelectorModel] = new RowSelectorModelReader

  override def load(path: String): RowSelectorModel = super.load(path)
}
