package graft.examples

import graft.ops.{Dsir, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for q_dsir_weights (the heaviest sf1 query):
  * isolates tokenize+explode, the md5 bucket hash, and the aggregate.
  * `runMain graft.examples.DsirProfile <sfDir>`
  */
object DsirProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.foreach(_ => ()) // warm page cache

    def time[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[dsir] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val exploded = docs
      .select(col("doc_id"), (col("lang") === "de").as("is_t"),
        TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("is_t"),
        explode(Dsir.featuresFromTokens(col("toks"))).as("f"))
      .filter(col("f") =!= "")
    time("explode_count")(exploded.count())
    time("explode_md5_count") {
      exploded.select(Dsir.bucketOf(col("f"), 10000).as("b")).count()
    }
    time("dc_agg") {
      exploded
        .select(col("doc_id"), col("is_t"),
          Dsir.bucketOf(col("f"), 10000).as("b"))
        .groupBy("doc_id", "is_t", "b").agg(count(lit(1)).as("c")).count()
    }
    time("docf_agg") {
      exploded.groupBy("doc_id", "is_t", "f").agg(count(lit(1)).as("c"))
        .count()
    }
    time("full_query") {
      graft.SparkEntry.queries("q_dsir_weights")(spark, sfDir).count()
    }
    spark.stop()
  }
}
