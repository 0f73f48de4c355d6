package graft.examples

import graft.ops.Similarity
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the IVF top-k path.
  * `runMain graft.examples.IvfProfile <sfDir>`
  */
object IvfProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val emb = time("read") {
      val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      df.count(); df
    }
    val corpus = time("normalize+cache") {
      val c = emb.select(col("vec_id").as("nid"),
          col("embedding").cast("array<double>").as("e"))
        .withColumn("nrm", Similarity.norm(col("e")))
        .select(col("nid"),
          transform(col("e"), x => x / col("nrm")).as("nu"))
        .withColumn("nv", array_to_vector(col("nu"))).cache()
      c.count(); c
    }
    val model = time("kmeans_fit") {
      new KMeans().setK(16).setSeed(42L)
        .setInitMode("random").setMaxIter(2)
        .setFeaturesCol("nv").setPredictionCol("cell").fit(corpus)
    }
    time("assign+count") {
      model.transform(corpus).select("nid", "nu", "cell").count()
    }
    time("full_query") {
      graft.SparkEntry.queries("q_emb_ivf_ann")(spark, sfDir).count()
    }
    time("full_query_again") {
      graft.SparkEntry.queries("q_emb_ivf_ann")(spark, sfDir).count()
    }
    spark.stop()
  }
}
