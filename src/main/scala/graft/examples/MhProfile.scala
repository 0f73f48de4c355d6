package graft.examples

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler for the MinHash near-dup path (seeded MinHashLSH
  * signatures + the narrow hand-rolled candidate join — see
  * graft.ops.Dedup.minHashPairs). Cold vs warm runs separate one-time
  * scan/JIT cost from the operator's steady-state cost.
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

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    time("read") {
      spark.read.parquet(s"$sfDir/documents.parquet").count()
    }
    time("minhash_cold") {
      graft.SparkEntry.queries("q_minhash_neardup")(spark, sfDir).count()
    }
    time("minhash_warm") {
      graft.SparkEntry.queries("q_minhash_neardup")(spark, sfDir).count()
    }
    time("banded_cold") {
      graft.SparkEntry.queries("q_banded_minhash")(spark, sfDir).count()
    }
    time("banded_warm") {
      graft.SparkEntry.queries("q_banded_minhash")(spark, sfDir).count()
    }
    spark.stop()
  }
}
