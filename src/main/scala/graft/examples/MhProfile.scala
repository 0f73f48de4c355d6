package graft.examples

import graft.ops.TextAnalysis
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the MinHashLSH near-dup path.
  * `runMain graft.examples.MhProfile <sfDir>`
  */
object MhProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val nPart = spark.sparkContext.defaultParallelism
    val docs = time("shingle") {
      val d = df.select(col("doc_id").cast("long").as("id"),
          col("text").cast("string").as("text"))
        .as[(Long, String)]
        .repartition(nPart)
        .map { case (id, text) => (id, TextAnalysis.shingleSetOf(text, 3).toSeq) }
        .toDF("id", "toks")
        .filter(size(col("toks")) > 0)
      d.cache().count(); d
    }
    val tf = new HashingTF().setInputCol("toks").setOutputCol("tf")
      .setNumFeatures(1 << 18).setBinary(true)
    val featured = tf.transform(docs)
    val model = time("fit") {
      new MinHashLSH().setInputCol("tf").setOutputCol("sig")
        .setNumHashTables(4).setSeed(42L).fit(featured)
    }
    val signed = time("sign+cache") {
      val sg = model.transform(featured).select(col("id"), col("tf"), col("sig"))
        .cache()
      sg.count(); sg
    }
    val nCand = time("candidates") {
      val exploded = signed.select(col("id"),
        posexplode(col("sig")).as(Seq("entry", "hv")))
      val l = exploded.select(col("id").as("id_a"), col("entry"), col("hv"))
      val r = exploded.select(col("id").as("id_b"), col("entry").as("e2"),
        col("hv").as("h2"))
      l.join(r, col("entry") === col("e2") && col("hv") === col("h2") &&
          col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().count()
    }
    println(s"[profile] n_candidates            $nCand")
    time("full_join") {
      model.approxSimilarityJoin(signed, signed, 0.2, "dist")
        .select(col("datasetA.id"), col("datasetB.id"), col("dist"))
        .filter(col("datasetA.id") < col("datasetB.id")).count()
    }
    spark.stop()
  }
}
