package graft.examples

import graft.queries.IfsQueries
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler: times the expensive building blocks one by one.
  * `runMain graft.examples.Profile <sfDir> [stage...]`
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val stages = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    def on(s: String) = stages.isEmpty || stages(s)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): Unit = if (on(name)) {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    time("matrix_count") {
      IfsQueries.matrix(spark, sfDir).count()
    }
    time("pairmi_6") {
      import org.apache.spark.ml.functions.vector_to_array
      import org.apache.spark.sql.functions.col
      val data = IfsQueries.matrix(spark, sfDir)
        .select(col("label"), col("f"))
      graft.feature.IterativeFeatureSelection.pairMI(
        data, 0 until 6, -1, 10000)
    }
    time("select_topk") {
      graft.SparkEntry.queries("ifs_select_topk")(spark, sfDir).count()
    }
    time("matrix_sorted_collect") {
      IfsQueries.labelsRow(spark, sfDir).length
    }
    time("rowMatrix_fill") {
      IfsQueries.rowMatrix(spark, sfDir).count()
    }
    time("rowMatrix_reuse") {
      IfsQueries.rowMatrix(spark, sfDir).count()
    }
    time("rows_collect_vectors") {
      // raw cost of pulling all 6 feature vectors to the driver
      IfsQueries.rowMatrix(spark, sfDir).collect()
    }
    time("rows_mi_driver") {
      // vector-MI cost outside Spark: 6 relevance MIs, driver-side
      val vecs = IfsQueries.rowMatrix(spark, sfDir).collect()
        .map(_.getAs[org.apache.spark.ml.linalg.Vector](1))
      val labels = org.apache.spark.ml.linalg.Vectors.dense(
        IfsQueries.labelsRow(spark, sfDir))
      vecs.foreach(v => graft.stats.MutualInformation.fromVectors(v, labels))
    }
    time("rows_cands_build") {
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      val bl = spark.sparkContext.broadcast(
        org.apache.spark.ml.linalg.Vectors.dense(
          IfsQueries.labelsRow(spark, sfDir)))
      IfsQueries.rowMatrix(spark, sfDir)
        .select(col("id"), col("features").as("vec"))
        .as[(Long, org.apache.spark.ml.linalg.Vector)]
        .map { case (id, v) =>
          (id, graft.stats.MutualInformation.fromVectors(v, bl.value))
        }.count()
    }
    time("select_rows") {
      graft.SparkEntry.queries("ifs_select_rows")(spark, sfDir).count()
    }
    time("row_model_flags") {
      graft.SparkEntry.queries("ifs_row_model_flags")(spark, sfDir).count()
    }
    spark.stop()
  }
}
