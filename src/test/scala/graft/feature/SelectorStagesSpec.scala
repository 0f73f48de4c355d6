package graft.feature

import graft.SparkTestBase
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

class SelectorStagesSpec extends AnyFunSuite with Matchers
  with SparkTestBase {

  private def dataset(seed: Int, rows: Int, cols: Int) = {
    import spark.implicits._
    val rnd = new Random(seed)
    val data = Seq.fill(rows)(
      (rnd.nextInt(3), Vectors.dense(Array.fill(cols)(
        rnd.nextInt(4).toDouble)): Vector))
    data.toDF("label", "features")
  }

  test("FeatureSelector fit + transform end-to-end") {
    val df = dataset(1, 100, 6)
    val model = new FeatureSelector()
      .setNumTopFeatures(3)
      .setLabelCol("label").setFeaturesCol("features")
      .setOutputCol("selected")
      .fit(df)
    model.selectedFeatures should have size 3
    model.selectedFeatures.toSet.subsetOf((0 until 6).toSet) shouldBe true
    val out = model.transform(df)
    out.columns should contain("selected")
    val first = out.select("selected").head().getAs[Vector](0)
    first.size shouldBe 3
    // slicer projects in ascending index order
    val sorted = model.selectedFeatures.sorted
    val row0 = df.select("features").head().getAs[Vector](0)
    out.select("features", "selected").head() match {
      case r =>
        val f = r.getAs[Vector](0); val s = r.getAs[Vector](1)
        sorted.zipWithIndex.foreach { case (idx, i) =>
          s(i) shouldBe f(idx)
        }
        f shouldBe row0
    }
  }

  test("FeatureSelector schema validation") {
    val df = dataset(2, 30, 4)
    // non-integral label
    val bad = df.selectExpr("cast(label as double) as label", "features")
    an[Exception] should be thrownBy
      new FeatureSelector().setNumTopFeatures(2).fit(bad)
    // pre-existing output column
    an[Exception] should be thrownBy
      new FeatureSelector().setNumTopFeatures(2).setOutputCol("label").fit(df)
    // invalid param
    an[Exception] should be thrownBy
      new FeatureSelector().setNumTopFeatures(0)
  }

  test("RowSelector fit + transform, flag and filtered modes") {
    import spark.implicits._
    val rnd = new Random(3)
    val rows = 60; val cols = 5
    val labels = Array.fill(rows)(rnd.nextInt(3).toDouble)
    val m = Array.fill(cols, rows)(rnd.nextInt(4).toDouble)
    val df = (0 until cols).map(c =>
      (c.toLong, Vectors.dense(m(c)): Vector)).toDF("id", "features")
    val sel = new RowSelector()
      .setNumTopRows(2).setIdCol("id").setFeaturesCol("features")
      .setLabelVector(labels).setOutputCol("keep")
    val model = sel.fit(df)
    model.selectedRows should have size 2
    val flagged = model.transform(df)
    flagged.filter($"keep").count() shouldBe 2
    flagged.count() shouldBe cols.toLong
    val filtered = model.setFiltered(true).transform(df)
    filtered.count() shouldBe 2
    filtered.select("id").as[Long].collect().toSet shouldBe
      model.selectedRows.toSet
  }

  test("RowSelector requires a non-empty labelVector") {
    import spark.implicits._
    val df = Seq((0L, Vectors.dense(1.0, 2.0): Vector))
      .toDF("id", "features")
    an[Exception] should be thrownBy new RowSelector().fit(df)
  }

  /** Shared fixture for the encoding-routing tests: a vector-layout
    * frame, its blocked twin (two ragged tiles), and the vector-path
    * ground-truth selection.
    */
  private def routingFixture(seed: Int) = {
    import spark.implicits._
    val rnd = new Random(seed)
    val rows = 50; val cols = 5
    val labels = Array.fill(rows)(rnd.nextInt(3).toDouble)
    val m = Array.fill(cols, rows)(rnd.nextInt(4).toDouble)
    val vecDf = (0 until cols).map(c =>
      (c.toLong, Vectors.dense(m(c)): Vector)).toDF("id", "features")
    val cut = 17
    val blockedDf = ((0 until cols).flatMap(c => Seq(
      (c.toLong, 0L, m(c).take(cut)), (c.toLong, 1L, m(c).drop(cut)))) ++
      Seq((-1L, 0L, labels.take(cut)), (-1L, 1L, labels.drop(cut))))
      .toDF("id", "block", "features")
    val want = IterativeFeatureSelection.selectRows(
      vecDf, "id", "features", 2,
      Vectors.dense(labels)).map(_._1)
    (labels, vecDf, blockedDf, want)
  }

  test("RowSelector auto-routes a blocked input schema to the " +
    "scale-free path (labels as data, labelVector unset)") {
    val (_, _, blockedDf, want) = routingFixture(13)
    val model = new RowSelector()
      .setNumTopRows(2).setIdCol("id").setFeaturesCol("features")
      .setOutputCol("keep")
      .fit(blockedDf) // encoding=auto detects the `block` column
    model.selectedRows.toSeq shouldBe want
    // the model flags blocked rows by id like any other frame
    val flagged = model.transform(blockedDf)
    flagged.filter("keep").select("id").distinct().count() shouldBe 2
  }

  test("RowSelector auto re-tiles a vector input wider than " +
    "maxInstances instead of dying on the fence") {
    val (_, vecDf, _, want) = routingFixture(19)
    // fence far below the 50-instance fixture → default usage must
    // route to the blocked spelling, not throw
    val model = new RowSelector()
      .setNumTopRows(2).setIdCol("id").setFeaturesCol("features")
      .setLabelVector(routingFixture(19)._1)
      .setOutputCol("keep").setMaxInstances(8)
      .fit(vecDf)
    model.selectedRows.toSeq shouldBe want
  }

  test("RowSelector explicit encoding=vector keeps the fence error " +
    "(opt-in only)") {
    val (labels, vecDf, _, _) = routingFixture(23)
    val ex = intercept[Exception] {
      new RowSelector()
        .setNumTopRows(2).setIdCol("id").setFeaturesCol("features")
        .setLabelVector(labels).setEncoding("vector").setMaxInstances(8)
        .fit(vecDf)
    }
    ex.getMessage should include("maxInstances")
  }

  test("RowSelector blocked layout requires the label pseudo-row") {
    val (_, _, blockedDf, _) = routingFixture(29)
    val ex = intercept[Exception] {
      new RowSelector()
        .setNumTopRows(2).setIdCol("id").setFeaturesCol("features")
        .setLabelRowId(-99L) // no such pseudo-row
        .fit(blockedDf)
    }
    ex.getMessage should include("label row")
  }

  test("Pipeline composition: VectorAssembler -> FeatureSelector (P6)") {
    import spark.implicits._
    val rnd = new Random(5)
    val df = Seq.fill(80)((rnd.nextInt(3), rnd.nextInt(4).toDouble,
      rnd.nextInt(4).toDouble, rnd.nextInt(4).toDouble))
      .toDF("label", "c0", "c1", "c2")
    val va = new VectorAssembler()
      .setInputCols(Array("c0", "c1", "c2")).setOutputCol("features")
    val fs = new FeatureSelector().setNumTopFeatures(2)
      .setOutputCol("selected")
    val pm = new Pipeline().setStages(Array(va, fs)).fit(df)
    val out = pm.transform(df)
    out.select("selected").head().getAs[Vector](0).size shouldBe 2
  }

  test("estimator params persist via DefaultParamsWritable (P5)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-ml-write").toString + "/fs"
    new FeatureSelector().setNumTopFeatures(7).setOutputCol("sel").save(tmp)
    val loaded = FeatureSelector.load(tmp)
    loaded.getNumTopFeatures shouldBe 7
    loaded.getOutputCol shouldBe "sel"
  }

  test("FeatureSelectorModel full save -> load -> transform round-trip " +
    "(params AND selectedFeatures data; exceeds the reference's " +
    "params-only save)") {
    val df = dataset(7, 100, 6)
    val model = new FeatureSelector()
      .setNumTopFeatures(3).setOutputCol("selected")
      .fit(df)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-ml-write").toString + "/fsm"
    model.save(tmp)
    val loaded = FeatureSelectorModel.load(tmp)
    loaded.uid shouldBe model.uid
    loaded.selectedFeatures shouldBe model.selectedFeatures
    loaded.getOutputCol shouldBe "selected"
    val a = model.transform(df).select("selected").collect().map(_.toString)
    val b = loaded.transform(df).select("selected").collect().map(_.toString)
    b shouldBe a
  }

  test("RowSelectorModel full save -> load -> transform round-trip") {
    import spark.implicits._
    val rnd = new Random(11)
    val rows = 60; val cols = 5
    val labels = Array.fill(rows)(rnd.nextInt(3).toDouble)
    val m = Array.fill(cols, rows)(rnd.nextInt(4).toDouble)
    val df = (0 until cols).map(c =>
      (c.toLong, Vectors.dense(m(c)): Vector)).toDF("id", "features")
    val model = new RowSelector()
      .setNumTopRows(2).setIdCol("id").setFeaturesCol("features")
      .setLabelVector(labels).setOutputCol("keep").setFiltered(true)
      .fit(df)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-ml-write").toString + "/rsm"
    model.save(tmp)
    val loaded = RowSelectorModel.load(tmp)
    loaded.uid shouldBe model.uid
    loaded.selectedRows shouldBe model.selectedRows
    loaded.getFiltered shouldBe true
    val a = model.transform(df).select("id", "keep").collect().map(_.toString)
    val b = loaded.transform(df).select("id", "keep").collect()
      .map(_.toString)
    b shouldBe a
  }
}
