package graft.examples

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler for the IVF top-k path (driver-trained spherical
  * k-means over a hash-ordered bounded sample + broadcast-probed cells —
  * see graft.ops.Similarity.ivfTopK). Cold vs warm runs separate the
  * one-time scan/JIT cost from the steady-state operator cost.
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

    time("read") {
      spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    }
    time("ivf_cold") {
      graft.SparkEntry.queries("q_emb_ivf_ann")(spark, sfDir).count()
    }
    time("ivf_warm") {
      graft.SparkEntry.queries("q_emb_ivf_ann")(spark, sfDir).count()
    }
    time("ivfpq_cold") {
      graft.SparkEntry.queries("q_emb_ivfpq_ann")(spark, sfDir).count()
    }
    time("ivfpq_warm") {
      graft.SparkEntry.queries("q_emb_ivfpq_ann")(spark, sfDir).count()
    }
    spark.stop()
  }
}
