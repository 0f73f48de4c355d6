package graft.examples

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the ngram-Jaccard pipeline.
  * `runMain graft.examples.NgramProfile <sfDir>`
  */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[ngram] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    time("scan_count") { df.count() }
    val sh = df.select(col("doc_id").as("id"), col("source").as("blk"),
        TextAnalysis.shingles(col("text"), 3).as("sh"))
      .withColumn("sz", size(col("sh")))
    time("shingles_count") { sh.count() }
    time("shingles_agg") { sh.agg(sum(col("sz"))).head() }
    val ex = sh.select(col("id"), col("blk"), col("sz"),
      explode(col("sh")).as("g"))
    time("explode_count") { ex.count() }
    val exm = ex.localCheckpoint(true)
    time("explode_checkpoint") { exm.count() }
    val a = exm.select(col("id").as("id_a"), col("blk"), col("sz").as("sz_a"),
      col("g"))
    val b = exm.select(col("id").as("id_b"), col("blk").as("blk_b"),
      col("sz").as("sz_b"), col("g").as("g_b"))
    time("join_from_ckpt") {
      a.join(b, col("blk") === col("blk_b") && col("g") === col("g_b") &&
          col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(count(lit(1)).as("inter")).count()
    }
    time("full_query") {
      Dedup.ngramJaccardPairs(df, "doc_id", "text", "source", 3, 0.2).count()
    }
    spark.stop()
  }
}
