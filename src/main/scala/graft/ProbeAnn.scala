package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase-timer for the persisted-IVF maintenance cycle (dev). */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.warmScale(spark, dir)
    Bench.resetState(spark)
    def ph[A](n: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      println(f"  [$n%-28s] ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val K = 5; val NQueries = 16L
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val emb = queries.Q.t(spark, dir, "embeddings")
      val part1 = emb.filter((col("vec_id") % 5).isin(1L, 2L))
      val part2 = emb.filter((col("vec_id") % 5).isin(3L, 4L))
      val batch = emb.filter(col("vec_id") % 5 === 0 &&
        col("vec_id") < NQueries * 5)
      val idxPath = System.getProperty("java.io.tmpdir") + "/graft_probe_ivf"
      val A = graft.ops.AnnIndex
      ph("buildAndSaveIvf(part1)")(
        A.buildAndSaveIvf(part1, "vec_id", "embedding", idxPath))
      ph("appendToIvf(part2)")(
        A.appendToIvf(spark, part2, "vec_id", "embedding", idxPath))
      ph("deleteFromIvf")(A.deleteFromIvf(spark,
        emb.filter(col("vec_id") % 10 === 1).select("vec_id"), "vec_id",
        idxPath))
      val pre = ph("pre queryIvf")(A.queryIvf(spark, batch, "vec_id",
        "embedding", idxPath, K, nProbe = 8).localCheckpoint(true))
      ph("compactIvf")(A.compactIvf(spark, idxPath))
      val post = ph("post queryIvf")(A.queryIvf(spark, batch, "vec_id",
        "embedding", idxPath, K, nProbe = 8))
      ph("union-compare")(post.union(pre)
        .groupBy("qid", "rnk", "vec_id", "sim").count()
        .filter(col("count") =!= 2).isEmpty)
      val survivors = emb.filter(col("vec_id") % 5 =!= 0 &&
        col("vec_id") % 10 =!= 1)
      val exact = ph("bruteForceTopK")(graft.ops.Pin.pin(
        graft.ops.Similarity.bruteForceTopK(
          survivors, batch, "vec_id", "embedding", K)))
      println("  exact rows: " + exact.count())
      Bench.resetState(spark)
    }
    spark.stop()
  }
}
