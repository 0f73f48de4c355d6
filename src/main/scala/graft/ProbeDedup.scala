package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase-timer for the dedup-index maintenance cycle (dev-only). */
object ProbeDedup {
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
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val docs = queries.Q.t(spark, dir, "documents")
      val part1 = docs.filter(col("doc_id") % 5 === 1)
      val part2 = docs.filter(col("doc_id") % 5 === 2)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val idxPath = System.getProperty("java.io.tmpdir") +
        "/graft_probe_maint"
      val D = graft.ops.DedupIndex
      ph("buildAndSave(part1)")(D.buildAndSave(part1, "doc_id", "text", idxPath))
      val (cfg, model) = ph("loadModel")(D.loadModel(spark, idxPath))
      ph("append(part2)")(D.appendSigned(
        D.signBatch(part2, "doc_id", "text", cfg, model), idxPath))
      ph("delete")(D.deleteFromIndex(spark,
        docs.filter(col("doc_id") % 10 === 1).select("doc_id"), "doc_id", idxPath))
      val signed = ph("signBatch+ckpt")(
        D.signBatch(batch, "doc_id", "text", cfg, model).localCheckpoint(true))
      val pre = ph("pre dedupSignedBatch")(
        D.dedupSignedBatch(spark, signed, idxPath, 0.2).localCheckpoint(true))
      val kd = ph("compactIndex")(D.compactIndex(spark, idxPath))
      val post = ph("post dedupSignedBatch+cnt")(
        D.dedupSignedBatch(spark, signed, idxPath, 0.2).localCheckpoint(true))
      ph("compare/union")(
        post.union(pre).groupBy("batch_id", "corpus_id", "jaccard_dist")
          .count().filter(col("count") =!= 2).isEmpty)
      ph("tombstone checks")(
        pre.filter(col("corpus_id") % 10 === 1).isEmpty &&
          post.filter(col("corpus_id") % 10 === 1).isEmpty)
      println(s"  kept/dead=$kd")
      Bench.resetState(spark)
    }
    spark.stop()
  }
}
